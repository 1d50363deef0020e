package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus preparation pass — the composition the
  * individual operators exist FOR: language gate (n-gram stopword
  * heuristic) → quality gate (length/punct/stopword score) → dedup
  * survivors only (transitive canonicalization). One declarative plan:
  * three narrow per-doc projections equi-joined on doc_id, so Catalyst
  * fuses the gates into the scans and the only wide stages are the dedup
  * pipeline's own (audited in SCALE.md). At 100 TB each gate drops its
  * share of the corpus BEFORE the next join ships rows. */
object CorpusPrep {

  val MinQuality = 0.4

  def corpusPrep(spark: SparkSession, dir: String,
                 minQuality: Double = MinQuality): DataFrame = {
    // Both per-doc gates come from ONE fused projection (shared token
    // array — TextAnalysis.docGates), filtered BEFORE the join so only
    // gate survivors ship into it. Dedup is the single-pass
    // canonicalization (the standard default; dedupPipelineTransitive is
    // the opt-in escalation when chain collapse matters).
    val gates = TextAnalysis.docGates(spark, dir)
      .filter(col("lang_pred") === "en" && col("quality_score") >= minQuality)
    val dedup = Dedup.dedupPipeline(spark, dir)
      .filter(col("is_canonical"))
      .select(col("doc_id"))
    gates.join(dedup, "doc_id")
      .select(col("doc_id"), col("lang_pred"), col("quality_score"))
      .orderBy(col("doc_id"))
  }

  def corpusPrepOracle(minQuality: Double = MinQuality): String =
    s"""SELECT l.doc_id, l.lang_pred, q.quality_score
       |FROM (${TextAnalysis.languageIdOracle}) l
       |JOIN (${TextAnalysis.qualityScoreOracle}) q ON l.doc_id = q.doc_id
       |JOIN (${Dedup.dedupPipelineOracle}) d ON l.doc_id = d.doc_id
       |WHERE l.lang_pred = 'en' AND q.quality_score >= $minQuality AND d.is_canonical
       |ORDER BY l.doc_id""".stripMargin

  /** Relative quality cut: keep documents at or above the corpus MEDIAN
    * quality — the data-dependent sibling of corpusPrep's fixed threshold
    * (corpus gates in practice are percentile-anchored: "drop the worst
    * half/decile", robust to corpus drift where a constant is not). The
    * median is an exact sort-based percentile evaluated ONCE as a scalar
    * subquery; the filter then streams. At 100 TB the exact percentile
    * becomes `approx_percentile` (one pass, mergeable sketch) with an
    * identical plan shape; exact is used here because the gate demands
    * bit-equality. */
  def qualityCut(spark: SparkSession, dir: String): DataFrame = {
    val q = TextAnalysis.qualityScore(spark, dir)
      .select(col("doc_id"), col("quality_score"))
    val med = q.agg(
      expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY quality_score)").as("m"))
    q.filter(col("quality_score") >= med.scalar())
      .orderBy(col("doc_id"))
  }

  val qualityCutOracle: String =
    s"""WITH q AS (SELECT doc_id, quality_score
       |           FROM (${TextAnalysis.qualityScoreOracle})),
       |m AS (SELECT quantile_cont(quality_score, 0.5) AS m FROM q)
       |SELECT doc_id, quality_score
       |FROM q, m WHERE quality_score >= m.m
       |ORDER BY doc_id""".stripMargin
}
