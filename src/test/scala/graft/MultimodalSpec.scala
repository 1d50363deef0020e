package graft

import graft.operators.Multimodal
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The typed decode pipeline (mapPartitions + pluggable decoder) — the
  * path the DuckDB oracle cannot check by design (the decoder is engine
  * code, not SQL). */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .appName("multimodal-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("media payload round-trips the source text as bytes") {
    import spark.implicits._
    val m = Multimodal.media(spark, Sf).limit(5).collect()
    val docs = Tables.documents(spark, Sf)
      .select($"doc_id", $"text").limit(5)
      .as[(Long, String)].collect().toMap
    assert(m.nonEmpty)
    m.foreach { r =>
      assert(new String(r.payload, "UTF-8") == docs(r.media_id))
    }
  }

  test("metadata shape follows the media type") {
    Multimodal.media(spark, Sf).collect().foreach { r =>
      r.media_type match {
        case "image" | "video" =>
          assert(r.width.isDefined && r.height.isDefined && r.sample_rate.isEmpty)
        case "audio" =>
          assert(r.width.isEmpty && r.sample_rate.isDefined)
      }
      if (r.media_type == "video") assert(r.n_frames.isDefined)
      else assert(r.n_frames.isEmpty)
    }
  }

  test("decodeFeatures is deterministic and consistent with payload bytes") {
    val f1 = Multimodal.decodeFeatures(spark, Sf).collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeFeatures(spark, Sf).collect().sortBy(_.media_id)
    assert(f1.map(_.frame_checksums.toList).toList == f2.map(_.frame_checksums.toList).toList)
    val byId = Multimodal.media(spark, Sf).collect().map(r => r.media_id -> r).toMap
    f1.take(20).foreach { f =>
      val payload = byId(f.media_id).payload
      assert(f.byte_len == payload.length.toLong)
      assert(f.frame_checksums.length == math.min(4,
        (payload.length + Multimodal.FakeDecoder.FrameSize - 1) / Multimodal.FakeDecoder.FrameSize))
      val expectedMean =
        if (payload.isEmpty) 0.0
        else payload.map(b => (b & 0xff).toLong).sum.toDouble / payload.length
      assert(math.abs(f.mean_byte - expectedMean) < 1e-12)
    }
  }
}
// (appended) sentinel-path coverage that the oracle registration can't
// exercise: a MISSING TARGET degrades every pair to the 999 sentinel.
class SentinelSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("missing target id yields sentinel rows for every probe") {
    // Fresh getOrCreate (NOT the shared SparkTest lazy val): suites that
    // stop their session leave a stale stopped context behind it.
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    val out = graft.operators.RadiusSearch.pairDistanceSentinel(
      spark, "/root/testdata/sf0.001", Seq(1L, 2L, 999999999L), targetId = 888888888L)
      .collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getDouble(r.fieldIndex("distance_miles")) == 999.0)
      assert(!r.getBoolean(r.fieldIndex("aggregate_shape")))
    }
  }
}
