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
    val lang = TextAnalysis.languageId(spark, dir)
      .select(col("doc_id"), col("lang_pred"))
    val qual = TextAnalysis.qualityScore(spark, dir)
      .select(col("doc_id"), col("quality_score"))
    val dedup = Dedup.dedupPipelineTransitive(spark, dir)
      .select(col("doc_id"), col("is_canonical"))
    lang.join(qual, "doc_id").join(dedup, "doc_id")
      .filter(col("lang_pred") === "en" &&
        col("quality_score") >= minQuality && col("is_canonical"))
      .select(col("doc_id"), col("lang_pred"), col("quality_score"))
      .orderBy(col("doc_id"))
  }

  def corpusPrepOracle(minQuality: Double = MinQuality): String =
    s"""SELECT l.doc_id, l.lang_pred, q.quality_score
       |FROM (${TextAnalysis.languageIdOracle}) l
       |JOIN (${TextAnalysis.qualityScoreOracle}) q ON l.doc_id = q.doc_id
       |JOIN (${Dedup.dedupPipelineTransitiveOracle()}) d ON l.doc_id = d.doc_id
       |WHERE l.lang_pred = 'en' AND q.quality_score >= $minQuality AND d.is_canonical
       |ORDER BY l.doc_id""".stripMargin
}
