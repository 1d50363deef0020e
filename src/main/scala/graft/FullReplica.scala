package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-table k-fold replica builder for the sf1 correctness dress
  * rehearsal (round-13 verdict item 1).
  *
  * `ServingScaleProbe.replicate` scales only the document-family tables
  * (documents/embeddings/part/customer) and byte-copies the rest — fine
  * for serving-wall probes, but a FULL-suite gate at sf1 needs the
  * relational tables scaled too, with foreign keys shifted consistently
  * so every per-replica join (orders⋈customer, lineitem⋈part/supplier,
  * events sessionization per user) sees a self-consistent world:
  * replica i's orders reference replica i's customers, etc. region and
  * nation are genuine dimension tables (25 rows at every TPC-H scale
  * factor) and stay 1×, as TPC-H itself keeps them.
  *
  * The id shift promotes to BIGINT; every shifted column is cast back to
  * its source type — tools/compare.py is type-exact, so a widened key
  * would fail the very gate this builds the data for. Timestamp columns
  * pass through unchanged (all driver testdata timestamps are
  * TIMESTAMP(MICROS), which Spark round-trips type-exactly).
  *
  * Usage: runMain graft.FullReplica <src>*<k>=<dest>
  * e.g.   /root/testdata/sf0.1*10=/tmp/sf1full
  */
object FullReplica {
  /** Replicate `table` k-fold, shifting each (column -> source max+1
    * stride) in `shifts` by rep*stride so keys stay unique and
    * per-replica FK joins stay closed. */
  private def rep(spark: SparkSession, src: String, dest: String, k: Int,
                  table: String, shifts: Map[String, Long]): Unit = {
    val t = spark.read.parquet(s"$src/$table.parquet")
    val reps = spark.range(k).select(col("id").as("rep"))
    val shifted = shifts.foldLeft(t.crossJoin(reps)) {
      case (df, (c, stride)) =>
        df.withColumn(c,
          (col(c) + col("rep") * stride).cast(t.schema(c).dataType))
    }
    writeSingleFile(shifted.drop("rep"), s"$dest/$table.parquet")
  }

  /** The driver's testdata layout is one parquet FILE per table (DuckDB's
    * oracle views open them as plain files, no glob) — mirror it: write a
    * single-part directory, then promote the part file to the table path. */
  private def writeSingleFile(df: DataFrame, path: String): Unit = {
    val tmp = path + "__tmp"
    df.repartition(1).write.mode("overwrite").parquet(tmp)
    val dir = new java.io.File(tmp)
    val part = dir.listFiles().filter(_.getName.endsWith(".parquet")) match {
      case Array(one) => one
      case other => sys.error(s"expected one part file in $tmp, got ${other.length}")
    }
    val target = new java.io.File(path)
    if (target.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(target)
    }
    java.nio.file.Files.move(part.toPath, target.toPath)
    dir.listFiles().foreach(_.delete())
    dir.delete()
    ()
  }

  private def stride(spark: SparkSession, src: String, table: String,
                     idCol: String): Long =
    spark.read.parquet(s"$src/$table.parquet")
      .agg(coalesce(max(col(idCol).cast("long")), lit(-1L)))
      .head().getLong(0) + 1L

  def build(spark: SparkSession, src: String, k: Int, dest: String): Unit = {
    require(src != dest, s"FullReplica: dest must differ from src ($src)")
    // strides computed once from the SOURCE so referencing tables shift
    // their FKs by exactly the referenced table's key stride
    val maxCust = stride(spark, src, "customer", "c_custkey")
    val maxSupp = stride(spark, src, "supplier", "s_suppkey")
    val maxPart = stride(spark, src, "part", "p_partkey")
    val maxOrder = stride(spark, src, "orders", "o_orderkey")
    val maxDoc = stride(spark, src, "documents", "doc_id")
    val maxVec = stride(spark, src, "embeddings", "vec_id")
    val maxEvent = stride(spark, src, "events", "event_id")
    val maxUser = stride(spark, src, "events", "user_id")
    rep(spark, src, dest, k, "customer", Map("c_custkey" -> maxCust))
    rep(spark, src, dest, k, "supplier", Map("s_suppkey" -> maxSupp))
    rep(spark, src, dest, k, "part", Map("p_partkey" -> maxPart))
    rep(spark, src, dest, k, "orders",
      Map("o_orderkey" -> maxOrder, "o_custkey" -> maxCust))
    rep(spark, src, dest, k, "lineitem",
      Map("l_orderkey" -> maxOrder, "l_partkey" -> maxPart,
          "l_suppkey" -> maxSupp))
    rep(spark, src, dest, k, "events",
      Map("event_id" -> maxEvent, "user_id" -> maxUser))
    rep(spark, src, dest, k, "documents", Map("doc_id" -> maxDoc))
    rep(spark, src, dest, k, "embeddings", Map("vec_id" -> maxVec))
    Seq("region", "nation").foreach { t =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dest))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$src/$t.parquet"),
        java.nio.file.Paths.get(s"$dest/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  def main(args: Array[String]): Unit = {
    val spec = "(.+)\\*(\\d+)=(.+)".r
    val (src, k, dest) = args.headOption match {
      case Some(spec(s, kk, d)) => (s, kk.toInt, d)
      case _ => sys.error("usage: FullReplica <src>*<k>=<dest>")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    build(spark, src, k, dest)
    println(s"""{"metric":"full_replica","src":"$src","k":$k,"dest":"$dest"}""")
  }
}
