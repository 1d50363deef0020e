package graft

import java.nio.file.Files
import java.util.concurrent.{Callable, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Serving DURING artifact mutation — the round-15 lifecycle guarantee
  * (the round-14 verdict's top item): every path Materialize returns or
  * [[Materialize.servingPath]] resolves is an IMMUTABLE COMMITTED
  * GENERATION, so a 24/7 deployment does not need to quiesce reads for a
  * refresh/compact/gc window. Four claims, each pinned here:
  *
  *  1. a lazy plan over the prior generation keeps evaluating correctly
  *     THROUGH a refreshWith / compact / invalidate+ensure swap (the old
  *     delete-then-rename swap failed it with missing-file errors);
  *  2. concurrent readers racing a mutation loop see exactly ONE complete
  *     generation per read — never a torn file set, never two generations
  *     mixed in one result;
  *  3. two threads racing a COLD ensure build exactly once (per-artifact
  *     JVM lock — the round-14 advice item on ServingPools deployments);
  *  4. gc collects a superseded generation only after the reader grace
  *     window ([[Materialize.GcStagingMinAgeMs]]) has passed since the
  *     SUCCESSOR committed — the contract a reader's in-flight request
  *     must finish within.
  */
class MutationServeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val mroot = Files.createTempDirectory("graft-mutserve-art").toString
  private val dataDir = Files.createTempDirectory("graft-mutserve-data").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.graft.materialize.dir", mroot)
    .appName("mutation-serve-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def writeEpoch(path: String, epoch: Int, n: Long = 100L): Unit =
    spark.range(n).toDF("id").withColumn("epoch", lit(epoch))
      .repartition(2).write.mode("overwrite").parquet(path)

  test("a lazy plan over the prior generation survives refresh, compact and invalidate+ensure swaps") {
    val kind = "graft_mutspec_pin"
    Files.writeString(java.nio.file.Paths.get(dataDir, "seed.txt"), "s"): Unit
    val p0 = Materialize.ensure(spark, kind, dataDir, 1)(writeEpoch(_, 0))
    val plan0 = spark.read.parquet(p0).filter(col("id") >= 50L)
    assert(plan0.count() == 50L)

    // refreshWith commits a NEW generation; the pinned plan keeps its view
    val p1 = Materialize.refreshWith(spark, kind, dataDir, 1) { (prior, tmp) =>
      prior.withColumn("epoch", col("epoch") + 1)
        .write.mode("overwrite").parquet(tmp)
    }
    assert(p1 != p0, "refresh must commit a new generation dir, not swap in place")
    assert(Materialize.servingPath(spark, kind, dataDir, 1) == p1)
    assert(plan0.count() == 50L, "prior-generation plan must survive the refresh")
    assert(spark.read.parquet(p0).agg(max(col("epoch"))).head.getInt(0) == 0)
    val plan1 = spark.read.parquet(p1)
    assert(plan1.agg(max(col("epoch"))).head.getInt(0) == 1)

    // compact folds into a further generation; both prior plans stay whole
    val p2 = Materialize.compact(spark, kind, dataDir, 1) { (cur, tmp) =>
      cur.repartition(1).write.mode("overwrite").parquet(tmp)
    }
    assert(p2 != p1 && Materialize.servingPath(spark, kind, dataDir, 1) == p2)
    assert(plan0.count() == 50L && plan1.count() == 100L)
    assert(spark.read.parquet(p2).count() == 100L)

    // invalidate TOMBSTONES (a complete generation keeps serving) and the
    // next ensure rebuilds as a further generation
    assert(Materialize.invalidate(spark, kind, dataDir, 1))
    assert(spark.read.parquet(p2).count() == 100L,
      "tombstoned generation must stay readable")
    assert(Materialize.servingPath(spark, kind, dataDir, 1) == p2,
      "readers keep the tombstoned generation until the rebuild commits")
    assert(!Materialize.isBuilt(spark, kind, dataDir, 1),
      "a tombstoned artifact must read as not-built to the build faces")
    val p3 = Materialize.ensure(spark, kind, dataDir, 1)(writeEpoch(_, 9))
    assert(p3 != p2 && Materialize.servingPath(spark, kind, dataDir, 1) == p3)
    assert(spark.read.parquet(p3).agg(max(col("epoch"))).head.getInt(0) == 9)
    assert(plan1.count() == 100L)
  }

  test("concurrent readers see exactly one complete generation through refresh/compact/gc cycles") {
    val kind = "graft_mutspec_live"
    Materialize.ensure(spark, kind, dataDir, 1)(writeEpoch(_, 0))
    @volatile var stop = false
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reads = new AtomicInteger(0)
    val readers = Executors.newFixedThreadPool(4)
    (0 until 4).foreach { _ =>
      readers.submit(new Runnable {
        def run(): Unit = while (!stop) {
          try {
            // resolve-at-plan-time, like a serving request would
            val rows = spark.read.parquet(
              Materialize.servingPath(spark, kind, dataDir, 1)).collect()
            reads.incrementAndGet()
            if (rows.length != 100)
              failures.add(s"torn read: ${rows.length} rows"): Unit
            else if (rows.map(_.getInt(1)).distinct.length != 1)
              failures.add("mixed generations in one read"): Unit
          } catch {
            case e: Exception =>
              failures.add(s"read failed: ${e.getClass.getSimpleName} ${e.getMessage}"): Unit
          }
        }
      }): Unit
    }
    try {
      (1 to 4).foreach { e =>
        Materialize.refreshWith(spark, kind, dataDir, 1) { (prior, tmp) =>
          prior.withColumn("epoch", lit(e)).write.mode("overwrite").parquet(tmp)
        }
        Materialize.gc(spark, kind, dataDir, 1)
      }
      Materialize.compact(spark, kind, dataDir, 1) { (cur, tmp) =>
        cur.repartition(1).write.mode("overwrite").parquet(tmp)
      }
      Materialize.gc(spark, kind, dataDir, 1)
    } finally {
      stop = true
      readers.shutdown()
      readers.awaitTermination(120, TimeUnit.SECONDS): Unit
    }
    assert(failures.isEmpty,
      s"generation isolation violated (${failures.size} of ${reads.get()} reads): " +
        failures.asScala.toSeq.take(5).mkString("; "))
    assert(reads.get() > 0, "the readers must actually have raced the mutations")
  }

  test("two threads racing a cold ensure build exactly once") {
    val kind = "graft_mutspec_race"
    val builds = new AtomicInteger(0)
    val pool = Executors.newFixedThreadPool(2)
    val ps = pool.invokeAll(Seq.fill(2)(new Callable[String] {
      def call(): String = Materialize.ensure(spark, kind, dataDir, 1) { p =>
        builds.incrementAndGet(): Unit
        Thread.sleep(250) // widen the would-be race window
        writeEpoch(p, 0)
      }
    }).asJava).asScala.map(_.get())
    pool.shutdown(); pool.awaitTermination(60, TimeUnit.SECONDS): Unit
    assert(builds.get() == 1,
      "concurrent cold ensures must serialize on the per-artifact lock")
    assert(ps.toSet.size == 1 && spark.read.parquet(ps.head).count() == 100L)
  }

  test("gc keeps a superseded generation until the grace window after the successor's commit") {
    val kind = "graft_mutspec_gc"
    val p0 = Materialize.ensure(spark, kind, dataDir, 1)(writeEpoch(_, 0))
    val p1 = Materialize.refreshWith(spark, kind, dataDir, 1) { (prior, tmp) =>
      prior.withColumn("epoch", lit(1)).write.mode("overwrite").parquet(tmp)
    }
    // inside the grace window: the superseded generation survives
    assert(Materialize.gc(spark, kind, dataDir, 1).isEmpty)
    assert(spark.read.parquet(p0).count() == 100L)
    // age the CURRENT generation's commit past the grace window — now the
    // superseded one is dead weight (no reader contract protects it)
    Files.setLastModifiedTime(java.nio.file.Paths.get(p1, "_SUCCESS"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - Materialize.GcStagingMinAgeMs - 60000L)): Unit
    val deleted = Materialize.gc(spark, kind, dataDir, 1)
      .map(p => new Path(p).toUri.getPath)
    assert(deleted == Seq(new Path(p0).toUri.getPath),
      s"expected exactly the superseded generation collected, got $deleted")
    assert(spark.read.parquet(
      Materialize.servingPath(spark, kind, dataDir, 1)).count() == 100L)
  }
}
