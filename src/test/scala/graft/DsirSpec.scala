package graft

import graft.operators.Dsir
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** DSIR discrimination on a CRAFTED corpus. The gate corpus has no domain
  * axis (every synthetic source draws one word distribution), so the
  * oracle gates the arithmetic only; THIS pins the semantics the operator
  * exists for — documents resembling the fit slice must outrank the pool
  * — on a corpus where the target vocabulary is genuinely skewed. */
class DsirSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("dsir-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // Target domain (src0) speaks {alpha, beta, gamma}; the pool (srcP)
  // speaks {delta, epsilon, zeta}. Even-doc_id src0 docs are the FIT
  // slice; odd ones are planted held-out positives. doc 20 mixes.
  private def corpus() = {
    import spark.implicits._
    Seq(
      (0L, "src0", "alpha beta gamma alpha beta"),
      (2L, "src0", "beta alpha gamma gamma beta"),
      (4L, "src0", "gamma alpha beta alpha gamma"),
      (1L, "src0", "alpha beta gamma beta alpha"),   // held-out target
      (3L, "src0", "gamma beta alpha alpha beta"),   // held-out target
      (10L, "srcP", "delta epsilon zeta delta zeta"),
      (11L, "srcP", "zeta delta epsilon epsilon delta"),
      (12L, "srcP", "epsilon zeta delta zeta epsilon"),
      (20L, "srcP", "alpha beta delta epsilon zeta") // mixed
    ).toDF("doc_id", "source", "text")
  }

  test("held-out target docs outrank the pool; mixed doc sits between") {
    val w = Dsir.dsirWeightsOver(corpus()).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    // fit docs are not scored; everything else is
    assert(w.keySet == Set(1L, 3L, 10L, 11L, 12L, 20L))
    val heldOut = Set(1L, 3L).map(w)
    val pool = Set(10L, 11L, 12L).map(w)
    assert(heldOut.min > w(20L),
      s"held-out targets must outrank the mixed doc: $w")
    assert(w(20L) > pool.max,
      s"the mixed doc must outrank the pure pool: $w")
  }

  test("selection order: planted targets first, then mixed, then pool") {
    val ranked = Dsir.dsirWeightsOver(corpus())
      .orderBy(org.apache.spark.sql.functions.col("score_mean").desc,
        org.apache.spark.sql.functions.col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ranked.take(2).toSet == Set(1L, 3L), s"order: $ranked")
    assert(ranked(2) == 20L, s"order: $ranked")
  }

  test("gram accounting: unigrams + bigrams, empty text scores zero") {
    import spark.implicits._
    val docs = Seq(
      (0L, "src0", "alpha beta"),        // fit
      (1L, "src0", "alpha beta gamma"),  // 3 uni + 2 bi = 5 grams
      (11L, "srcP", "   ")               // blank → 0 grams, score 0
    ).toDF("doc_id", "source", "text")
    val rows = Dsir.dsirWeightsOver(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(4)))).toMap
    assert(rows(1L)._1 == 5L, s"gram count: $rows")
    assert(rows(11L) == ((0L, 0L)), s"blank doc: $rows")
  }
}
