package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Each loader is a plain parquet scan; filters/projections composed on top
  * are pushed into the scan by Catalyst (verify with `PushedFilters` /
  * `ReadSchema` in `.explain("formatted")`).
  */
object Tables {
  /** Every driver table (TESTDATA.md) — the single source for warmup
    * sweeps and fixture loops. */
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "events")

  /** The documents corpus — the one table ingest increments arrive at.
    * Reads `documents*.parquet`: an arriving batch lands as a NEW sibling
    * child (`documents_b<n>.parquet`), which is precisely what the
    * Materialize staleness contract classifies as an increment (new
    * top-level children never mark artifacts stale, so the append
    * lifecycle — docbase labels, band index, posting index — extends
    * rather than rebuilds; see CorpusPrep.ingestIncrement). On the
    * driver-generated dirs the glob matches exactly `documents.parquet`,
    * so gate reads are unchanged. */
  def documents(spark: SparkSession, dir: String): DataFrame = {
    // The glob is resolved DRIVER-SIDE (one listing) instead of being
    // handed to the reader: Spark 4.1's HybridAnalyzer probes the literal
    // glob string as a path first (FileStreamSink.hasMetadata) and prints
    // a caught FileNotFoundException with a full stack into the log on
    // every plan construction before its fixed-point retry globs
    // correctly — harmless but it pollutes the verify/entry gate logs
    // (r15 verdict item). Paths are sorted so the scan order (and any
    // order-dependent downstream tie-break) is deterministic.
    val g = new org.apache.hadoop.fs.Path(s"$dir/documents*.parquet")
    val fs = g.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matches = Option(fs.globStatus(g))
      .map(_.map(_.getPath.toString).sorted.toSeq).getOrElse(Seq.empty)
    if (matches.isEmpty) spark.read.parquet(s"$dir/documents*.parquet")
    else spark.read.parquet(matches: _*)
  }
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
