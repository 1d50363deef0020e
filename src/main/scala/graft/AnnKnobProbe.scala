package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement behind SCALE.md §ann-refine-sizing (round-14 verdict item
  * 2): where the compressed ladder's recall goes at fixed knobs —
  * sweeping probe width (cell coverage) against shortlist depth (ADC
  * ranking error) on the single-probe gated geometry, so the budget
  * model sizes the knob that actually pays. Decomposition logic:
  * raising `nprobe` recovers true neighbors in unprobed cells; raising
  * `refine` recovers neighbors the 8-byte ADC ranking mis-ordered inside
  * probed cells (the int8 re-rank is near-exact, recall 0.983-0.994).
  *
  *   runMain graft.AnnKnobProbe <dir> ...
  */
object AnnKnobProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AnnKnobProbe <dir> ...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = SparkEntry.P.IvfK
    val probe = SparkEntry.P.IvfProbe
    args.foreach { dir =>
      val n = Tables.embeddings(spark, dir).count()
      val ncells = graft.operators.Similarity.autoNumCentroids(n)
      val ncoarse = math.max(4, math.sqrt(ncells.toDouble).round.toInt)
      val np1 = math.max(2, ncoarse / 4)
      println(s"""{"metric":"ann_knob_corpus","dir":"$dir","n":$n,""" +
        s""""ncells":$ncells,"ncoarse":$ncoarse,"np1":$np1}""")
      // the budget-sized serving plan and its end-to-end recall — the
      // number ann_refine_recall gates at oracle scale
      val plan = graft.operators.Similarity.annRefinePlan(n, k)
      val ts = System.nanoTime()
      val sized = graft.operators.Similarity
        .ivf2PqRefineRecallSized(spark, dir, probe, k).head()
      println(f"""{"metric":"ann_refine_sized","dir":"$dir","plan":"$plan",""" +
        f""""recall":${sized.getAs[Double]("recall")}%.4f,""" +
        f""""wall":${(System.nanoTime() - ts) / 1e9}%.1f}""")
      for (np <- Seq(2, 4, 8, 16); rf <- Seq(4, 16, 26)) {
        val t0 = System.nanoTime()
        val exact = graft.operators.Similarity.cosineTopK(spark, dir, probe, k)
          .select(col("vec_id"))
        val approx = graft.operators.Similarity
          .ivf2PqRefineTopK(spark, dir, probe, k, nprobe = np,
            numCentroids = ncells, numCoarse = ncoarse, nprobe1 = np1,
            refine = rf)
          .select(col("vec_id").as("a_id"))
        val r = exact.join(broadcast(approx), col("vec_id") === col("a_id"), "left")
          .agg(count(lit(1)).as("k_exact"), count(col("a_id")).as("hits"))
          .withColumn("recall",
            col("hits").cast("double") / col("k_exact").cast("double"))
          .head()
        val w = (System.nanoTime() - t0) / 1e9
        println(f"""{"metric":"ann_knob","dir":"$dir","nprobe":$np,"refine":$rf,""" +
          f""""recall":${r.getAs[Double]("recall")}%.4f,"wall":$w%.1f}""")
      }
    }
    spark.stop()
  }
}
