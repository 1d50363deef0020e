package graft

import graft.operators.FuzzySearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness behind SCALE.md's batch-fuzzy candidate-volume row:
  * the candidate join's input is Σ_g qcount(g)·df(g) rows (g ranges over
  * trigrams; qcount = queries containing g, df = posting-list length), and
  * on a low-entropy corpus that is effectively |Q|·N — quadratic, because
  * BOTH factors grow with the corpus (the query table is a fixed fraction
  * of it). This main measures the formula's terms at increasing scale.
  *
  * Usage (one JSON line per spec, in order):
  *   runMain graft.FuzzyCostProbe <dir> [<srcDir>*<k>=<destDir>] ...
  *
  * The `src*k=dest` form materializes a k× replica of src's part table
  * (ids offset per replica, names IDENTICAL — replication preserves the
  * trigram document-frequency shape, so df scales ×k and qcount ×k, i.e.
  * candidates ×k², which is the honest model of "the same corpus, bigger")
  * and then measures dest. Nothing outside dest is written.
  */
object FuzzyCostProbe {

  private def replicate(spark: SparkSession, src: String, k: Int, dest: String): Unit = {
    val part = Tables.part(spark, src).select(col("p_partkey"), col("p_name"))
    val maxId = part.agg(max(col("p_partkey"))).head().getLong(0)
    val reps = spark.range(k).select(col("id").as("rep"))
    part.crossJoin(reps)
      .select((col("p_partkey") + col("rep") * maxId).as("p_partkey"), col("p_name"))
      // a real table at this size is many files; a single-file replica would
      // serialize every downstream scan-side stage
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dest/part.parquet")
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: FuzzyCostProbe <dir | src*k=dest> ...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spec = "(.+)\\*(\\d+)=(.+)".r
    args.foreach { a =>
      val dir = a match {
        case spec(src, k, dest) => replicate(spark, src, k.toInt, dest); dest
        case d => d
      }
      val c = FuzzySearch.corpus(spark, dir)
      val queries = FuzzySearch.batchQueries(c)
      val qGrams = queries.select(col("qid"),
        explode(graft.functions.TextFunctions.charNgramSet(col("clean_q"), 3)).as("ngram"))
      val postings = c.select(col("id"),
        explode(graft.functions.TextFunctions.charNgrams(col("clean_value"), 3)).as("ngram"))
      val n = c.count()
      val q = queries.count()
      val candidates = postings.join(qGrams, "ngram").count()
      val pairs = postings.join(qGrams, "ngram")
        .select(col("qid"), col("id")).distinct().count()
      // the opt-in stop-gram cut's effect — the OPERATOR's own allowed-set
      // derivation, so the published numbers track the shipped semantics
      val cutCandidates = postings
        .join(broadcast(FuzzySearch.allowedGrams(postings, n, dfCapInverse = 10L)), "ngram")
        .join(qGrams, "ngram").count()
      val t0 = System.nanoTime()
      FuzzySearch.batchFuzzySearch(spark, dir, numResults = 20).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      FuzzySearch.batchFuzzySearchStopGram(spark, dir, numResults = 20, dfCapInverse = 10L).count()
      val cutSecs = (System.nanoTime() - t1) / 1e9
      println(s"""{"dir":"$dir","corpus_n":$n,"queries":$q,"candidate_rows":$candidates,"distinct_pairs":$pairs,"qn_product":${q * n},"stopgram_candidate_rows":$cutCandidates,"batch_secs":${math.round(secs * 100) / 100.0},"stopgram_secs":${math.round(cutSecs * 100) / 100.0}}""")
    }
    spark.stop()
  }
}
