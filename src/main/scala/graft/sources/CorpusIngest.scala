package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw-corpus ingest: schema'd JSON-lines reading with corrupt-record
  * rescue — the first stage of a crawl/dump pipeline, where some fraction
  * of lines is always mangled and a naive FAILFAST read of 100 TB dies on
  * line one.
  *
  * The gate round-trips `documents` through a JSONL artifact with
  * deterministic corruption injected (every 50th doc's line is truncated
  * mid-string), then reads it back with an EXPLICIT schema (never
  * inferSchema — a schema-inference pass over 100 TB is a full extra scan)
  * in PERMISSIVE mode: parse failures land whole in `_corrupt_record`
  * instead of killing the job, and flow to a quarantine count. The oracle
  * reproduces the expected outcome directly from `documents` (corruption
  * is keyed on doc_id), so no engine ever parses the other's files.
  */
object CorpusIngest {

  val CorruptMod = 50L

  /** Explicit read schema; `_corrupt_record` captures unparseable lines. */
  val JsonlSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("lang", StringType),
    StructField("text", StringType),
    StructField("_corrupt_record", StringType)))

  /** Write-once JSONL artifact with injected corruption. */
  def jsonlPath(spark: SparkSession, dir: String): String =
    graft.Materialize.ensure(spark, "graft_jsonl", dir, version = 1) { p =>
      val line = to_json(struct(col("doc_id"), col("source"), col("lang"), col("text")))
      val corrupted = when(pmod(col("doc_id"), lit(CorruptMod)) === 0,
        concat(substring(line, 1, 20), lit("}{"))).otherwise(line)
      Tables.documents(spark, dir).select(corrupted.as("value"))
        .write.mode("overwrite").text(p)
    }

  /** Rescued read: per-source row counts with corrupt lines quarantined
    * under the `_corrupt` key. Narrow map + one hash agg; at 100 TB this
    * is a single pass over the raw dump. */
  def jsonlRescue(spark: SparkSession, dir: String): DataFrame = {
    val parsed = spark.read.schema(JsonlSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(jsonlPath(spark, dir))
    // Mask doc_id by the corrupt flag: Spark PERMISSIVE keeps PARTIAL
    // parse results (a field parsed before the syntax error survives), so
    // corrupt rows must contribute NULL explicitly, like the oracle's CASE.
    parsed
      .select(when(col("_corrupt_record").isNotNull, lit("_corrupt"))
        .otherwise(col("source")).as("src"),
        when(col("_corrupt_record").isNull, col("doc_id")).as("clean_id"))
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("clean_id")).as("min_id"), max(col("clean_id")).as("max_id"))
      .orderBy(col("src"))
  }

  /** Expected outcome derived straight from `documents`: a doc's line is
    * corrupt iff doc_id ≡ 0 (mod CorruptMod); corrupt rows parse with all
    * fields NULL. */
  val jsonlRescueOracle: String =
    s"""SELECT CASE WHEN doc_id % $CorruptMod = 0 THEN '_corrupt' ELSE source END AS src,
       |       count(*) AS n_rows,
       |       min(CASE WHEN doc_id % $CorruptMod = 0 THEN NULL ELSE doc_id END) AS min_id,
       |       max(CASE WHEN doc_id % $CorruptMod = 0 THEN NULL ELSE doc_id END) AS max_id
       |FROM documents
       |GROUP BY 1
       |ORDER BY src""".stripMargin
}
