package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** The two layouts of the diversity replica's documents table must carry
  * the same values: [[DiversityReplica.build]] writes the single-file
  * gate layout, [[DiversityReplica.buildDocs]] the distributed
  * decade-scale layout the operational-loop rehearsal reads. The
  * transform is one shared definition, so the pin is that the SHARED
  * derivation survives both write paths bit-identically — a drift here
  * would silently re-anchor every loop wall on different data. */
class ReplicaSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .appName("replica-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("buildDocs emits the same documents multiset as the gate builder") {
    val gate = Files.createTempDirectory("graft-replica-gate").toString
    val loop = Files.createTempDirectory("graft-replica-loop").toString
    DiversityReplica.build(spark, "/root/testdata/sf0.001", 3, gate)
    DiversityReplica.buildDocs(spark, "/root/testdata/sf0.001", 3, loop)

    def sig(path: String): (Long, Long) = {
      val df = spark.read.parquet(path)
      val cols = df.columns.sorted.map(col).toSeq
      val r = df
        .agg(count(lit(1)),
          // decimal(38,0) sum: two xxhash64 values can overflow a Long
          sum(xxhash64(cols: _*).cast("decimal(38,0)")))
        .head()
      (r.getLong(0),
        r.getDecimal(1).toBigInteger
          .mod(java.math.BigInteger.ONE.shiftLeft(64)).longValue())
    }
    val (nGate, hGate) = sig(s"$gate/documents.parquet")
    val (nLoop, hLoop) = sig(s"$loop/documents.parquet")
    assert(nGate === 1500L)
    assert(nLoop === nGate)
    assert(hLoop === hGate)

    // replica 0 is the verbatim source in both layouts
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val maxDoc = src.agg(max(col("doc_id"))).head().getLong(0)
    val rep0 = spark.read.parquet(s"$loop/documents.parquet")
      .filter(col("doc_id") <= maxDoc)
    assert(rep0.exceptAll(src).isEmpty && src.exceptAll(rep0).isEmpty)

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(gate))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(loop))
  }
}
