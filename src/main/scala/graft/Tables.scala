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
  def documents(spark: SparkSession, dir: String): DataFrame  =
    spark.read.parquet(s"$dir/documents*.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
