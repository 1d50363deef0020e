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
}
