package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing probe for the corpus_cadence_served lifecycle anchor —
  * bootstrap writes, the per-batch streaming cadence, the compaction
  * clock, and the dispatched overlay refresh, timed separately (r16; the
  * bench bills the whole lifecycle as one number). */
object CadencePhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.operators.CorpusPrep
    (1 to 2).foreach { rep =>
      println(s"[probe] --- rep $rep")
      spark.catalog.clearCache()
      System.gc()
      val work = java.nio.file.Files
        .createTempDirectory("graft-cadence-probe").toString
      val all = Tables.documents(spark, sfDir)
      t("write standing parquet") {
        all.filter(pmod(col("doc_id"), lit(10L)) < 7L)
          .write.mode("overwrite").parquet(s"$work/documents.parquet")
      }
      t("ensureDocBase") { CorpusPrep.ensureDocBase(spark, work) }
      t("ensureDocGlobal") { CorpusPrep.ensureDocGlobal(spark, work) }
      val incoming = s"$work/incoming"
      t("write incoming files") {
        Seq(7L, 8L, 9L).foreach { r =>
          all.filter(pmod(col("doc_id"), lit(10L)) === r)
            .coalesce(1).write.mode("append").parquet(incoming)
        }
      }
      t("streaming cadence (3 batches)") {
        val stream = spark.readStream.schema(all.schema)
          .option("maxFilesPerTrigger", 1).parquet(incoming)
        val q = graft.streaming.StreamOps.ingestCadenceStream(stream, work,
          availableNow = true)((verdict, _) => { verdict.count(); () })
        q.awaitTermination()
      }
      t("compactCadenceIfDue") {
        CorpusPrep.compactCadenceIfDue(spark, work, maxPending = 2L) }
      val served = t("compactionRefreshAuto") {
        CorpusPrep.compactionRefreshAuto(spark, work, floorDocs = 1L)._1 }
      t("final read+order") {
        spark.read.parquet(served).orderBy(col("doc_id")).count() }
    }
    spark.stop()
  }
}
