package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measurement behind the round-15 diversity-axis ANN work (round-14
  * verdict item 2): WHERE the sized refine ladder's recall goes at the
  * diversity replica (0.80 single-probe at /tmp/sfdiv1 vs 1.00 gate /
  * 0.90 sf0.1), decomposed so the fix pays for the loss that exists:
  *
  *  - `coverage` — fraction of the true top-k that lives in the probed
  *    cells at all (the ceiling no ADC/refine work can beat): isolates
  *    the IVF cell-selection loss (centroid quality × nprobe).
  *  - `recall` — the full ladder end to end (ADC shortlist + int8
  *    re-rank), the number `ann_refine_recall` gates.
  *
  * Axes swept batched over the honest probe stride (every 97th vec_id,
  * cap 64 — the `ann_*_recall` convention; the r14 sfdiv1 read was a
  * SINGLE probe, ±0.1 quantization on one number):
  *
  *  - nprobe (cell coverage at fixed centroids),
  *  - Lloyd-trained fine centroids (KMeans.trainedCentroids) vs the
  *    deterministic id-stride sample — the diversity replica is the
  *    first corpus with real cluster structure (2 048 source points ×
  *    10 noisy copies), so training has something to find here even
  *    though it measured flat on the isotropic synthetics,
  *  - Lloyd-trained PQ books vs sample books (ADC metric quality).
  *
  * All variants are computed INLINE (no Materialize artifacts): the
  * ivfpq artifact kind does not carry a centroid/book fingerprint, so a
  * probe writing trained-variant artifacts under the sample kind would
  * recreate the parameter-blind-artifact class this repo just fenced
  * (SCALE.md §param-fingerprint).
  *
  *   runMain graft.AnnDivProbe <dir> ...
  */
object AnnDivProbe {

  private val ProbeCap = 64L

  /** Batched ladder recall at explicit knobs: one row —
    * (coverage, recall) meaned over the probe stride. */
  private[graft] def measure(spark: SparkSession, dir: String,
                             fine: DataFrame, books: DataFrame,
                             ncoarse: Int, np1: Int, nprobe: Int,
                             refine: Int, k: Int): (Double, Double) = {
    import graft.operators.Similarity._
    val e = Tables.embeddings(spark, dir)
    val probes = e.filter(col("vec_id") % BatchProbeMod === 0)
      .orderBy(col("vec_id")).limit(ProbeCap.toInt)
      .select(col("vec_id").as("pid"), col("embedding").as("pemb"))
    val cos = graft.functions.VectorFunctions.cosineF _

    // exact float top-k per probe (the ladder's ground truth)
    val exW = Window.partitionBy(col("pid"))
      .orderBy(col("cs").desc, col("vec_id"))
    val exact = e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id"), cos(col("embedding"), col("pemb")).as("cs"))
      .withColumn("rk", row_number().over(exW)).filter(col("rk") <= k)
      .select(col("pid"), col("vec_id"))

    // per-probe two-level cell selection (batched ivf2ProbeCells)
    val coarse = coarseReps(fine, 25L, 4L, ncoarse)
    val f2c = fineToCoarse(fine, coarse)
    val gW = Window.partitionBy(col("pid")).orderBy(col("gc").desc, col("gid"))
    val pg = coarse.crossJoin(broadcast(probes))
      .select(col("pid"), col("gid"), cos(col("gemb"), col("pemb")).as("gc"))
      .withColumn("grn", row_number().over(gW)).filter(col("grn") <= np1)
      .select(col("pid"), col("gid"))
    val cW = Window.partitionBy(col("pid")).orderBy(col("pc").desc, col("cid"))
    val probeCells = fine.join(broadcast(f2c), "cid")
      .join(broadcast(pg), "gid")
      .join(broadcast(probes), Seq("pid"))
      .select(col("pid"), col("cid"), cos(col("cemb"), col("pemb")).as("pc"))
      .withColumn("crn", row_number().over(cW)).filter(col("crn") <= nprobe)
      .select(col("pid"), col("cid").as("cell"))

    // build-side flat assignment (what the ivfpq artifact stores)
    val assigned = cellAssignment(e, fine)

    // coverage: true top-k rows whose cell is probed
    val coverage = exact.join(assigned, "vec_id")
      .join(probeCells, Seq("pid", "cell"), "left_semi")
      .count().toDouble / exact.count().toDouble

    // ADC shortlist per probe over candidates, refine·k deep
    val cand = probeCells.join(assigned, "cell")
      .filter(col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id"))
    val lut = books.crossJoin(broadcast(probes))
      .select(col("pid"), col("m"), col("cid").as("code"),
        l2sq(slice(col("pemb").cast("array<double>"), col("m") * PqDim + 1,
          lit(PqDim)), col("cemb")).as("d"))
    val aW = Window.partitionBy(col("pid")).orderBy(col("pq_dist"), col("vec_id"))
    val short = pqEncode(e, books).join(cand, "vec_id")
      .join(broadcast(lut), Seq("pid", "m", "code"))
      .groupBy(col("pid"), col("vec_id"))
      .agg(array_sort(collect_list(struct(col("m"), col("d")))).as("ds"))
      .select(col("pid"), col("vec_id"),
        aggregate(col("ds"), lit(0.0), (acc, x) => acc + x("d")).as("pq_dist"))
      .withColumn("rk", row_number().over(aW)).filter(col("rk") <= k * refine)
      .select(col("pid"), col("vec_id"))

    // int8 re-rank of the shortlist (the hot-tier point reads)
    val t = int8CodesOf(spark, dir)
      .withColumn("demb", transform(col("codes"), c => c.cast("double") * col("scale")))
    val pInt8 = t.join(probes.select(col("pid")),
        col("vec_id") === col("pid"))
      .select(col("pid").as("qid"), col("demb").as("qemb"))
    val rW = Window.partitionBy(col("pid")).orderBy(col("rc").desc, col("vec_id"))
    val refined = t.join(short, "vec_id")
      .join(broadcast(pInt8), col("pid") === col("qid"))
      .select(col("pid"), col("vec_id"),
        graft.functions.VectorFunctions.cosineDF(col("demb"), col("qemb")).as("rc"))
      .filter(!isnan(col("rc")))
      .withColumn("rk", row_number().over(rW)).filter(col("rk") <= k)
      .select(col("pid"), col("vec_id"))

    val recall = exact.join(refined, Seq("pid", "vec_id"), "left_semi")
      .count().toDouble / exact.count().toDouble
    (coverage, recall)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AnnDivProbe <dir> ...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = SparkEntry.P.IvfK
    import graft.operators.Similarity._
    args.foreach { dir =>
      val e = Tables.embeddings(spark, dir)
      val n = e.count()
      val (ncells, ncoarse, np1, nprobe, refine) = annRefinePlan(n, k)
      println(s"""{"metric":"ann_div_corpus","dir":"$dir","n":$n,""" +
        s""""plan":"($ncells,$ncoarse,$np1,$nprobe,$refine)"}""")
      // the SHIPPED sized face (post-r15: trained centroids, np from the
      // 8192-row code budget, 512-row refine budget), run per-probe over
      // the same stride — the honest mean the configs below decompose
      if (sys.env.get("SPARK_GRAFT_ANNDIV_SHIPPED").forall(_ == "1")) {
        val t0 = System.nanoTime()
        val pids = e.filter(col("vec_id") % BatchProbeMod === 0)
          .orderBy(col("vec_id")).limit(64)
          .select(col("vec_id")).collect().map(_.getLong(0))
        val perProbe = pids.map { pid =>
          val r = ivf2PqRefineRecallSized(spark, dir, pid, k).head()
          (r.getAs[Long]("k_exact"), r.getAs[Long]("hits"))
        }
        val (kx, hits) = perProbe.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
        println(f"""{"metric":"ann_div_shipped","dir":"$dir","n_probes":${pids.length},""" +
          f""""k_total":$kx,"hits_total":$hits,"recall":${hits.toDouble / kx}%.4f,""" +
          f""""wall":${(System.nanoTime() - t0) / 1e9}%.1f}""")
      }
      val sampleFine = centroids(e, 25L, ncells)
      val sampleBooks = pqCodebooks(e, 25L)
      // trained centroids carry array<double> means; the float cosine
      // kernel of the serving ladder needs array<float>
      lazy val trainedFine = graft.operators.KMeans
        .trainedCentroids(spark, dir, numCentroids = ncells)
        .withColumn("cemb", col("cemb").cast("array<float>"))
      lazy val trainedBooks = graft.operators.KMeans.trainedPqBooks(spark, dir)
      val configs: Seq[(String, () => (DataFrame, DataFrame, Int))] = Seq(
        "sized" -> (() => (sampleFine, sampleBooks, nprobe)),
        "np16" -> (() => (sampleFine, sampleBooks, 16)),
        "np32" -> (() => (sampleFine, sampleBooks, 32)),
        "np64" -> (() => (sampleFine, sampleBooks, 64)),
        "trained_cent" -> (() => (trainedFine, sampleBooks, nprobe)),
        "trained_books" -> (() => (sampleFine, trainedBooks, nprobe)),
        "trained_both" -> (() => (trainedFine, trainedBooks, nprobe)),
        "trained_both_np16" -> (() => (trainedFine, trainedBooks, 16)),
        "trained_both_np32" -> (() => (trainedFine, trainedBooks, 32)),
        "trained_both_np64" -> (() => (trainedFine, trainedBooks, 64)))
      val runConfigs = sys.env.get("SPARK_GRAFT_ANNDIV_CONFIGS").forall(_ == "1")
      (if (runConfigs) configs else Seq.empty).foreach { case (name, cfg) =>
        val t0 = System.nanoTime()
        val (fine, books, np) = cfg()
        val (cov, rec) = measure(spark, dir, fine, books, ncoarse, np1, np, refine, k)
        val w = (System.nanoTime() - t0) / 1e9
        println(f"""{"metric":"ann_div","dir":"$dir","config":"$name",""" +
          f""""nprobe":$np,"coverage":$cov%.4f,"recall":$rec%.4f,"wall":$w%.1f}""")
      }
    }
    spark.stop()
  }
}
