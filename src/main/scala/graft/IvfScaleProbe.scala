package graft

import graft.operators.{Retrieval, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness behind SCALE.md's ncells-growth rehearsal: the
  * round-6 sf1 table held the IVF cell count FIXED at 10× the data, so
  * `search_hybrid_ivf`'s 100× story rested on the unmeasured claim that
  * growing ncells with the corpus bounds the probed read. This probe
  * MEASURES the ncells axis: per (dir, ncells, nprobe) spec it reports
  *
  *  - `probed_rows`  — vectors in the nprobe probed cells for the gate
  *    probe (the coarse candidate volume the read pays),
  *  - `hybrid_read` / `ivf_batch_read` — median of 3 post-warmup runs of
  *    the gate-parameter `search_hybrid_ivf` / `ann_ivf_batch` faces at
  *    that codebook size,
  *  - `pool_coverage` — |IVF-PQ candidate pool ∩ exact cosine top-50| / 50
  *    (the recall side: growing ncells at fixed nprobe shrinks the
  *    corpus fraction read, so coverage is the trade being purchased).
  *
  * Usage (one JSON line per spec, in order):
  *   runMain graft.IvfScaleProbe [<src>*<k>=<dest>] <dir>:<ncells>:<nprobe> ...
  *
  * The replica form delegates to [[ServingScaleProbe.replicate]] (same
  * caveats: identical replica embeddings preserve geometry; ids offset).
  */
object IvfScaleProbe {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s((s.length - 1) / 2)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: IvfScaleProbe [src*k=dest] <dir>:<ncells>:<nprobe> ...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rep = "(.+)\\*(\\d+)=(.+)".r
    val spec = "(.+):(\\d+):(\\d+)".r
    args.foreach {
      case rep(src, k, dest) => ServingScaleProbe.replicate(spark, src, k.toInt, dest)
      case spec(dir, cS, npS) =>
        val (c, np) = (cS.toInt, npS.toInt)
        val e = graft.Tables.embeddings(spark, dir)
        val n = e.count()
        val cent = Similarity.centroids(e, 25L, c)
        val probe = e.filter(col("vec_id") === SparkEntry.P.CosineProbe)
          .select(col("embedding").as("pemb"))
        val probeCells = cent.crossJoin(broadcast(probe))
          .select(col("cid"), Similarity.cosine(col("cemb"), col("pemb")).as("pc"))
          .orderBy(col("pc").desc, col("cid")).limit(np)
          .select(col("cid").as("cell"))
        val probedRows = Similarity.cellAssignment(e, cent)
          .join(broadcast(probeCells), "cell").count()
        def timed(f: => Long): Double = {
          f // warmup (artifact ensure + JIT)
          median((1 to 3).map { _ =>
            spark.catalog.clearCache()
            val t = System.nanoTime()
            f
            (System.nanoTime() - t) / 1e9
          })
        }
        val hybrid = timed(Retrieval.hybridRrfIvf(spark, dir, SparkEntry.P.Bm25Query,
          SparkEntry.P.CosineProbe, SparkEntry.P.Bm25K, np, c).count())
        val batch = timed(Similarity.ivfBatchTopK(spark, dir, SparkEntry.P.IvfK,
          nprobe = np, numCentroids = c).count())
        val exact = Similarity.cosineTopK(spark, dir,
            SparkEntry.P.CosineProbe, Retrieval.RrfPoolN)
          .select(col("vec_id"))
        val pool = Similarity.ivfPqTopK(spark, dir, SparkEntry.P.CosineProbe,
            Retrieval.RrfPoolN * Retrieval.RrfRerankWiden,
            nprobe = np, numCentroids = c)
          .select(col("vec_id"))
        val coverage = exact.join(pool, "vec_id").count().toDouble / Retrieval.RrfPoolN
        println(f"""{"metric":"ivf_scale","dir":"$dir","n":$n,"ncells":$c,"nprobe":$np,"probed_rows":$probedRows,"hybrid_read":$hybrid%.2f,"ivf_batch_read":$batch%.2f,"pool_coverage":$coverage%.3f}""")
      case a => sys.error(s"bad spec: $a")
    }
    spark.stop()
  }
}
