package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement behind SCALE.md §champion-recall: what the champion
  * tier's absolute posting truncation costs in RESULT QUALITY at the
  * replica scales where the dispatcher actually selects it. The gate row
  * `fuzzy_batch_champ_recall` measures the full decomposition (vs uncut
  * AND vs stop-gram) at oracle scale; at the 10×/100× replicas the uncut
  * tier-1 join is exactly the plan the ladder exists to avoid (predicted
  * ~24B candidate rows at 100× — hours), so this probe measures the
  * truncation's own loss against the stop-gram tier it replaces:
  * overlap of (qid, clean_value) result entities (the reference's dedup
  * identity — clone replicas make raw ids ambiguous: both tiers return
  * the same entity under different clone ids), champion ∩ stop-gram /
  * stop-gram.
  *
  *   runMain graft.ChampRecallProbe <dir> ...
  */
object ChampRecallProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ChampRecallProbe <dir> ...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = SparkEntry.P.FuzzyK
    val inv = SparkEntry.P.StopGramInv
    args.foreach { dir =>
      val t0 = System.nanoTime()
      val stop = graft.operators.FuzzySearch
        .batchFuzzySearchStopGramIndexed(spark, dir, k, inv)
        .select(col("qid"), col("clean_value")).cache()
      val kStop = stop.count()
      val stopWall = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val champ = graft.operators.FuzzySearch
        .batchFuzzySearchChampIndexed(spark, dir, k, inv)
        .select(col("qid"), col("clean_value")).cache()
      val kChamp = champ.count()
      val champWall = (System.nanoTime() - t1) / 1e9
      val hits = stop.join(champ, Seq("qid", "clean_value")).count()
      val recall = if (kStop == 0) 0.0 else hits.toDouble / kStop
      stop.unpersist(); champ.unpersist()
      println(f"""{"metric":"champ_recall_probe","dir":"$dir",""" +
        f""""k_stop":$kStop,"k_champ":$kChamp,"hits":$hits,""" +
        f""""recall_vs_stopgram":$recall%.4f,""" +
        f""""stop_wall":$stopWall%.1f,"champ_wall":$champWall%.1f}""")
      // The CAPPED instrument (RecallQueryCap = first 64 stride queries),
      // which makes the vs-UNCUT column computable at replica scale: the
      // qid predicate pushes below all three anchors' candidate joins, so
      // the uncut tier-1 anchor pays 64 queries' posting volume instead
      // of the full stride's (~1/58th of the predicted 24B-row join at
      // 100×). This is the gate row `fuzzy_batch_champ_recall` run
      // verbatim at the replica — same estimator, explicit query budget.
      val t2 = System.nanoTime()
      val capped = graft.operators.FuzzySearch
        .batchFuzzyChampRecall(spark, dir, k, inv).head()
      val cappedWall = (System.nanoTime() - t2) / 1e9
      println(f"""{"metric":"champ_recall_capped","dir":"$dir",""" +
        f""""n_queries":${capped.getAs[Long]("n_queries")},""" +
        f""""k_total":${capped.getAs[Long]("k_total")},""" +
        f""""hits_total":${capped.getAs[Long]("hits_total")},""" +
        f""""recall_vs_uncut":${capped.getAs[Double]("recall")}%.4f,""" +
        f""""displaced":${capped.getAs[Long]("displaced")},""" +
        f""""true_loss":${capped.getAs[Long]("true_loss")},""" +
        f""""recall_effective":${capped.getAs[Double]("recall_effective")}%.4f,""" +
        f""""k_stop":${capped.getAs[Long]("k_stop")},""" +
        f""""hits_stop":${capped.getAs[Long]("hits_stop")},""" +
        f""""recall_vs_stopgram":${capped.getAs[Double]("recall_vs_stopgram")}%.4f,""" +
        f""""wall":$cappedWall%.1f}""")
      // the DISPATCHER'S plan at the default budget (the number that IS
      // the product's fuzzy quality where tier 3 is operative), plus a
      // rare-count sweep at the sized cap for the SCALE.md knob table
      val (planBands, planRare, planCap) = graft.operators.FuzzySearch
        .champPlanFor(spark, dir, inv,
          graft.operators.FuzzySearch.BatchCandidateBudget)
      println(s"""{"metric":"champ_plan","dir":"$dir","bands":$planBands,"rare":$planRare,"cap":$planCap}""")
      // the raw admission terms, so ladder-point changes can be sized on
      // paper before they are shipped (volume = lsh_b + rarePart + cost_c)
      val lshCosts = graft.operators.FuzzySearch.lshChannelCosts(spark, dir).head()
      val champCosts = graft.operators.FuzzySearch
        .batchChampCandidateCosts(spark, dir, inv).head()
      val lshJson = graft.operators.FuzzySearch.FuzzyLshBandLadder
        .map(b => s""""lsh_$b":${lshCosts.getAs[Long](s"lsh_$b")}""").mkString(",")
      val capJson = graft.operators.FuzzySearch.ChampCapLadder
        .map(c => s""""cost_$c":${champCosts.getAs[Long](s"cost_$c")},""" +
          s""""rarecut_$c":${champCosts.getAs[Long](s"rarecut_$c")}""").mkString(",")
      println(s"""{"metric":"champ_costs","dir":"$dir",$lshJson,""" +
        s""""rare":${champCosts.getAs[Long]("rare")},$capJson}""")
      // sweep entries "bands:rare" at the sized cap (SCALE.md knob table)
      val sweep = sys.env.get("SPARK_GRAFT_RARE_SWEEP")
        .map(_.split(",").map { e =>
          val parts = e.split(":").map(_.trim.toInt)
          (parts(0), parts(1))
        }.toSeq)
        .getOrElse(Seq((planBands, planRare)))
      sweep.foreach { case (bands, rr) =>
        val t3 = System.nanoTime()
        val r = graft.operators.FuzzySearch
          .batchFuzzyChampRecall(spark, dir, k, inv, planCap,
            rareGrams = rr, lshBands = bands).head()
        val w = (System.nanoTime() - t3) / 1e9
        println(f"""{"metric":"champ_recall_sized","dir":"$dir",""" +
          f""""bands":$bands,"rare":$rr,"cap":$planCap,""" +
          f""""recall_vs_uncut":${r.getAs[Double]("recall")}%.4f,""" +
          f""""displaced":${r.getAs[Long]("displaced")},""" +
          f""""true_loss":${r.getAs[Long]("true_loss")},""" +
          f""""recall_effective":${r.getAs[Double]("recall_effective")}%.4f,""" +
          f""""recall_vs_stopgram":${r.getAs[Double]("recall_vs_stopgram")}%.4f,""" +
          f""""wall":$w%.1f}""")
      }
    }
    spark.stop()
  }
}
