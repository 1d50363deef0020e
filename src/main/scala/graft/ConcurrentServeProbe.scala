package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.{Callable, Executors, TimeUnit}
import scala.jdk.CollectionConverters._

/** Concurrent-serving rehearsal (round-13 verdict item 4): every wall
  * measured so far is SEQUENTIAL (bench median-of-3, probes one query at
  * a time), but a serving deployment runs N requests concurrently on a
  * shared SparkSession. This probe drives a mixed fuzzy / radius / ann /
  * bm25 request stream — each request a DIFFERENT parameterization of its
  * family's indexed serving face, so no two requests share a plan — from
  * a fixed-size thread pool and reports per-family latency quantiles and
  * aggregate throughput at each concurrency level.
  *
  * Scheduler mode is a SparkContext-creation-time config, so FIFO vs FAIR
  * is compared across two invocations (SPARK_GRAFT_SCHED=FIFO|FAIR). In
  * FAIR mode each worker thread claims its own pool: Spark's root pool
  * schedules POOLS fairly while the default pool is internally FIFO, so
  * pool-per-thread is the configuration that actually round-robins
  * concurrent requests (all-in-default-pool FAIR degenerates to FIFO).
  *
  *   runMain graft.ConcurrentServeProbe <dir> [n1,n2,...]   (default 1,8,32)
  */
object ConcurrentServeProbe {

  /** One serving request: family label + a fresh-plan thunk. */
  final case class Req(family: String, run: SparkSession => DataFrame)

  /** 64 deterministic mixed requests (16 per family), parameterized from
    * the corpus itself so replica scale/diversity carries into the
    * request stream. */
  def catalog(spark: SparkSession, dir: String): Seq[Req] = {
    val names = Tables.part(spark, dir)
      .select(col("p_name")).distinct().orderBy(col("p_name"))
      .limit(64).collect().map(_.getString(0)).toSeq
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 3)
      .distinct().orderBy(col("t")).limit(256)
      .collect().map(_.getString(0)).toSeq
    val nVec = Tables.embeddings(spark, dir).count()
    (0 until 16).flatMap { i =>
      val name = names(i * (names.size / 16))
      val typo = if (name.length > 4) name.substring(0, 2) + name.substring(3) else name
      Seq(
        Req("fuzzy", s => operators.FuzzySearch.fuzzySearchIndexed(s, dir, typo, 20)),
        Req("radius", s => operators.RadiusSearch.radiusLatLngSearchIndexed(
          s, dir, 28.0 + (i % 8) * 2.5, -115.0 + (i / 8) * 5.0, 1500.0)),
        Req("ann", s => operators.Similarity.ivf2PqRefineTopKSized(
          s, dir, (i * 37L) % nVec, 10)),
        Req("bm25", s => operators.Retrieval.bm25TopK(
          s, dir, Seq(toks(i * 11 % toks.size), toks((i * 11 + 7) % toks.size)), 10)),
      )
    }
  }

  private def quantile(sorted: Seq[Double], q: Double): Double =
    sorted(math.min(sorted.size - 1, math.max(0, math.ceil(q * sorted.size).toInt - 1)))

  /** Run all requests at pool size n; return (wallSec, per-request
    * (family, latencySec)). */
  def runBatch(spark: SparkSession, reqs: Seq[Req], n: Int,
               fair: Boolean): (Double, Seq[(String, Double)]) = {
    val pool = Executors.newFixedThreadPool(n)
    val t0 = System.nanoTime()
    val tasks = reqs.map { r =>
      new Callable[(String, Double)] {
        def call(): (String, Double) = {
          if (fair) graft.plans.ServingPools.claim(spark)
          val t = System.nanoTime()
          r.run(spark).collect()
          (r.family, (System.nanoTime() - t) / 1e9)
        }
      }
    }
    val lat = pool.invokeAll(tasks.asJava).asScala.map(_.get()).toSeq
    val wall = (System.nanoTime() - t0) / 1e9
    pool.shutdown(); pool.awaitTermination(60, TimeUnit.SECONDS)
    (wall, lat)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ConcurrentServeProbe <dir> [n1,n2,...]")
    val dir = args.head
    val levels = args.lift(1).map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(1, 8, 32))
    val sched = sys.env.getOrElse("SPARK_GRAFT_SCHED", "FIFO")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.scheduler.mode", sched)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reqs = catalog(spark, dir)
    // warmup: one request per family — pays artifact ensure + codegen once,
    // so the measured batches are pure serving reads (artifacts present)
    reqs.groupBy(_.family).values.foreach(_.head.run(spark).collect())

    levels.foreach { n =>
      val (wall, lat) = runBatch(spark, reqs, n, fair = sched == "FAIR")
      val all = lat.map(_._2).sorted
      val fams = lat.groupBy(_._1).toSeq.sortBy(_._1).map { case (f, xs) =>
        val s = xs.map(_._2).sorted
        f"""\"$f\":{"p50":${quantile(s, 0.5)}%.2f,"p95":${quantile(s, 0.95)}%.2f,"max":${s.last}%.2f}"""
      }.mkString(",")
      println(f"""{"metric":"concurrent_serve","sched":"$sched","n":$n,"requests":${reqs.size},"wall":$wall%.2f,"rps":${reqs.size / wall}%.2f,"p50":${quantile(all, 0.5)}%.2f,"p95":${quantile(all, 0.95)}%.2f,"max":${all.last}%.2f,"per_family":{$fams}}""")
    }
    spark.stop()
  }
}
