package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing probe for the corpus_overlay_delta anchor — where do the
  * seconds go between the four input materializations, the operator's own
  * lineage cuts, and the final assembled query? (r16 measurement tool;
  * the bench times the whole anchor as one number.) */
object OverlayProbe {
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
    import graft.operators.{CorpusPrep, Dedup}
    // component micro-timings
    {
      val all = Tables.documents(spark, sfDir)
      val tk = graft.functions.TextFunctions.tokens(lower(col("text")))
      t("docs count") { all.count() }
      t("token count sum") { all.select(sum(size(tk))).head() }
      (1 to 2).foreach { _ =>
        t("tokens only noop") {
          all.select(col("doc_id"), tk.as("t")).write.format("noop").mode("overwrite").save() }
        t("tokenWindows noop") {
          all.select(col("doc_id"), graft.functions.TextFunctions.tokenWindows(tk, CorpusPrep.ContamWin).as("w"))
            .write.format("noop").mode("overwrite").save() }
        t("docWinRows noop") {
          CorpusPrep.docWinRows(all).write.format("noop").mode("overwrite").save() }
        t("docGlobalOverDocs noop") {
          CorpusPrep.docGlobalOverDocs(all.filter(
            pmod(col("doc_id"), lit(Dedup.IncMod)) =!= Dedup.IncRem))
            .write.format("noop").mode("overwrite").save() }
      }
    }
    (1 to 2).foreach { rep =>
      println(s"[probe] --- rep $rep")
      spark.catalog.clearCache()
      System.gc()
      val all = Tables.documents(spark, sfDir)
      val standing = all.filter(
        pmod(col("doc_id"), lit(Dedup.IncMod)) =!= Dedup.IncRem)
      val nh = t("cut normHashRows") { Lineage.cut(CorpusPrep.normHashRows(all)) }
      val fb = t("cut bandRows") { Lineage.cut(Dedup.bandRows(all)) }
      val dw = t("cut docWinRows") { Lineage.cut(CorpusPrep.docWinRows(all)) }
      val po = t("cut docGlobalOverDocs") { Lineage.cut(CorpusPrep.docGlobalOverDocs(standing)) }
      val df = t("deltaOverlayOver (op cuts)") { CorpusPrep.deltaOverlayOver(nh, fb, dw, po) }
      t("final count") { df.count() }
    }
    spark.stop()
  }
}
