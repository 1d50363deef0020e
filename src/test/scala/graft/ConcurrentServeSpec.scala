package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.util.concurrent.{Callable, Executors, TimeUnit}
import scala.jdk.CollectionConverters._

/** Pins the concurrent-serving configuration the round-14 rehearsal
  * measured (SCALE.md §concurrent-serve): a shared session under
  * `spark.scheduler.mode=FAIR` with ONE POOL PER REQUEST THREAD
  * ([[graft.plans.ServingPools]]). Two things are pinned:
  *
  *  1. the configuration actually takes — the context schedules FAIR
  *     and each claiming thread lands in its own root-pool child (the
  *     degenerate all-in-default-pool FAIR is exactly what this guards
  *     against: it is internally FIFO and re-introduces head-of-line
  *     blocking);
  *  2. results under concurrency equal the sequential results — the
  *     serving faces share broadcast variables, artifact reads, and
  *     codegen caches across threads, and a correctness race there
  *     would be invisible to every sequential gate.
  */
class ConcurrentServeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    // an earlier suite in this forked JVM may have left a FIFO context
    // running; getOrCreate would reuse it and silently drop the FAIR
    // config below, failing test 1 order-dependently — start clean
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.scheduler.mode", "FAIR")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .appName("concurrent-serve-spec")
    .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()

  test("FAIR mode takes and each serving thread claims a distinct pool") {
    assert(spark.sparkContext.getSchedulingMode.toString == "FAIR",
      "serving session must schedule FAIR (a reused FIFO context would " +
        "silently drop the whole configuration)")
    val pool = Executors.newFixedThreadPool(4)
    val claims = pool.invokeAll(
      (0 until 4).map(_ => new Callable[(Long, String)] {
        def call(): (Long, String) = {
          val p = graft.plans.ServingPools.claim(spark)
          // submit a real job so the pool materializes in the scheduler
          spark.range(100).filter("id % 7 = 0").count()
          (Thread.currentThread().getId, p)
        }
      }).asJava).asScala.map(_.get())
    pool.shutdown(); pool.awaitTermination(60, TimeUnit.SECONDS)
    // slot hashing (bounded pool registry): each thread's pool is exactly
    // its id's slot, and distinct slots get distinct pools
    claims.foreach { case (tid, p) =>
      assert(p == "serve-" + (tid % graft.plans.ServingPools.PoolSlots),
        s"thread $tid claimed unexpected pool $p")
    }
    val claimed = claims.map(_._2).toSet
    assert(claimed.size == claims.map(_._1 % graft.plans.ServingPools.PoolSlots).toSet.size,
      s"distinct slots must claim distinct pools, got $claims")
    val live = spark.sparkContext.getAllPools.map(_.name).toSet
    assert(claimed.subsetOf(live),
      s"claimed pools $claimed not all registered in scheduler pools $live")
  }

  test("concurrent mixed serving requests equal their sequential results") {
    val reqs: Seq[(String, () => Seq[String])] = Seq(
      ("fuzzy", () => operators.FuzzySearch
        .fuzzySearchIndexed(spark, dir, "smal widget", 5)
        .collect().map(_.toString).toSeq),
      ("radius", () => operators.RadiusSearch
        .radiusLatLngSearchIndexed(spark, dir, 34.0, -118.0, 500.0)
        .collect().map(_.toString).toSeq),
      ("ann", () => operators.Similarity
        .ivf2PqRefineTopKSized(spark, dir, 1L, 5)
        .collect().map(_.toString).toSeq),
      ("bm25", () => operators.Retrieval
        .bm25TopK(spark, dir, Seq("the", "spark"), 5)
        .collect().map(_.toString).toSeq))
    // sequential anchors (also pay the artifact ensures once)
    val anchors = reqs.map { case (f, run) => f -> run() }.toMap
    val pool = Executors.newFixedThreadPool(8)
    val results = pool.invokeAll(
      (0 until 2).flatMap(_ => reqs).map { case (f, run) =>
        new Callable[(String, Seq[String])] {
          def call(): (String, Seq[String]) = {
            graft.plans.ServingPools.claim(spark)
            (f, run())
          }
        }
      }.asJava).asScala.map(_.get())
    pool.shutdown(); pool.awaitTermination(120, TimeUnit.SECONDS)
    results.foreach { case (f, rows) =>
      assert(rows == anchors(f), s"$f diverged under concurrency")
    }
  }
}
