package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement behind the round-14 tier-3 recall work: how much of the
  * UNCUT batch-fuzzy top-k is reachable through a banded-minhash LSH
  * candidate channel over clean_value TRIGRAM sets, at several (bands,
  * rows) operating points — the candidate-level ceiling that decides
  * whether an LSH channel can lift tier 3 past the stop-gram cut's
  * result ceiling (measured 0.61 vs uncut at /tmp/sfdiv1: 38% of true
  * results enter only through hot grams, which no df-cut tier can see).
  * Also prints the bucket-join volume per operating point — the number
  * the admission control will predict.
  *
  *   runMain graft.LshCeilingProbe <dir> ...
  */
object LshCeilingProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LshCeilingProbe <dir> ...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions.{polyHash, charNgrams, HashMod}
    import graft.operators.{Dedup, FuzzySearch}

    val k = SparkEntry.P.FuzzyK
    val qidBound = FuzzySearch.BatchQueryMod * FuzzySearch.RecallQueryCap

    def gramSig(v: Column, numHashes: Int): Column = {
      val gh = array_distinct(transform(
        charNgrams(v, 3), g => polyHash(g)))
      array((0 until numHashes).map { i =>
        array_min(transform(gh,
          h => (h * Dedup.permA(i) + Dedup.permB(i)) % HashMod))
      }: _*)
    }
    def bandCols(sig: Column, bands: Int, rows: Int): Column =
      array((0 until bands).map { b =>
        polyHash(concat_ws("_",
          slice(sig, b * rows + 1, rows).cast("array<string>")))
      }: _*)

    args.foreach { dir =>
      val c = FuzzySearch.corpus(spark, dir)
      val exact = FuzzySearch
        .batchFuzzySearchIndexed(spark, dir, k)
        .filter(col("qid") < qidBound)
        .select(col("qid"), col("clean_value")).cache()
      val kTotal = exact.count()
      val queries = FuzzySearch.batchQueries(c).filter(col("qid") < qidBound)
      val names = c.select(col("clean_value")).distinct().cache()
      val nNames = names.count()
      println(s"""{"metric":"lsh_ceiling_corpus","dir":"$dir","k_total":$kTotal,"n_names":$nNames}""")
      for ((bands, rows) <- Seq((8, 2), (16, 2), (32, 2), (8, 4), (16, 1))) {
        val nh = bands * rows
        val qb = queries.select(col("qid"),
            posexplode(bandCols(gramSig(col("clean_q"), nh), bands, rows)))
          .select(col("qid"), col("pos").as("band_idx"), col("col").as("band_hash"))
        val nb = names.select(col("clean_value"),
            posexplode(bandCols(gramSig(col("clean_value"), nh), bands, rows)))
          .select(col("clean_value"), col("pos").as("band_idx"), col("col").as("band_hash"))
        val joined = qb.join(nb, Seq("band_idx", "band_hash"))
        val volume = joined.count()
        val cand = joined.select(col("qid"), col("clean_value")).distinct().cache()
        val nCand = cand.count()
        val hit = exact.join(cand, Seq("qid", "clean_value")).count()
        cand.unpersist()
        println(f"""{"metric":"lsh_ceiling","dir":"$dir","bands":$bands,"rows":$rows,""" +
          f""""bucket_join_rows":$volume,"candidates":$nCand,""" +
          f""""coverage":${hit.toDouble / kTotal}%.4f}""")
      }
      exact.unpersist(); names.unpersist()
    }
    spark.stop()
  }
}
