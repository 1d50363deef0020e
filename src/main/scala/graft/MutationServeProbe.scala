package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.{Callable, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger
import scala.jdk.CollectionConverters._

/** Serving DURING artifact mutation and under concurrent ingest — the
  * measurement half of the round-15 generation-pinning work (the spec
  * half is MutationServeSpec). The round-14 ConcurrentServeProbe measured
  * reads-only against WARMED, STATIC artifacts; a 24/7 deployment serves
  * while the cadence appends batches, the dispatcher refreshes the
  * overlay, compaction folds file debt and gc sweeps — windows the old
  * delete-then-rename swap could not serve through at all (documented
  * quiesced-window contract). With generation-pinned reads there is no
  * quiesce: this probe drives the measured FAIR n-thread mixed request
  * load (fuzzy/radius/ann/bm25 + an overlay-reading family — the one
  * whose artifact the cadence actually swaps) in a STATIC phase and then
  * CONCURRENTLY with a full cadence cycle, and reports rps/p50/p95 per
  * phase, the mutator's own walls, and the read-failure count (must be
  * 0 — a missing-file error or torn generation is a correctness event,
  * not a latency event).
  *
  *   runMain graft.MutationServeProbe <replicaDir> [n]      (default n=32)
  *
  * Scratch corpus: documents split 6/8 standing + 2/8 arriving in a temp
  * dir (the cadence appends there); the other tables copy through so the
  * request catalog and its artifact ensures see one consistent dir.
  */
object MutationServeProbe {

  private def quantile(sorted: Seq[Double], q: Double): Double =
    if (sorted.isEmpty) 0.0
    else sorted(math.min(sorted.size - 1, math.max(0, math.ceil(q * sorted.size).toInt - 1)))

  /** Run `reqs` on `n` threads until `until` reports done (at least one
    * full pass); returns (wall, latencies, failures). */
  private def drive(spark: SparkSession, reqs: Seq[(String, SparkSession => DataFrame)],
                    n: Int, minPasses: Int, until: () => Boolean): (Double, Seq[(String, Double)], Int) = {
    val pool = Executors.newFixedThreadPool(n)
    val failures = new AtomicInteger(0)
    val t0 = System.nanoTime()
    val out = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    var pass = 0
    while (pass < minPasses || !until()) {
      val lat = pool.invokeAll(reqs.map { case (f, run) =>
        new Callable[(String, Double)] {
          def call(): (String, Double) = {
            graft.plans.ServingPools.claim(spark)
            val t = System.nanoTime()
            try { run(spark).collect(); () }
            catch { case e: Exception =>
              failures.incrementAndGet()
              System.err.println(s"[mutserve] $f FAILED: ${e.getClass.getSimpleName} ${e.getMessage}")
            }
            (f, (System.nanoTime() - t) / 1e9)
          }
        }
      }.asJava).asScala.map(_.get())
      out ++= lat
      pass += 1
    }
    val wall = (System.nanoTime() - t0) / 1e9
    pool.shutdown(); pool.awaitTermination(120, TimeUnit.SECONDS)
    (wall, out.toSeq, failures.get())
  }

  private def report(phase: String, n: Int, wall: Double,
                     lat: Seq[(String, Double)], failures: Int,
                     extra: String = ""): Unit = {
    val all = lat.map(_._2).sorted
    val fams = lat.groupBy(_._1).toSeq.sortBy(_._1).map { case (f, xs) =>
      val s = xs.map(_._2).sorted
      f""""$f":{"p50":${quantile(s, 0.5)}%.2f,"p95":${quantile(s, 0.95)}%.2f}"""
    }.mkString(",")
    println(f"""{"metric":"mutation_serve","phase":"$phase","n":$n,"requests":${lat.size},"wall":$wall%.2f,"rps":${lat.size / wall}%.2f,"p50":${quantile(all, 0.5)}%.2f,"p95":${quantile(all, 0.95)}%.2f,"read_failures":$failures$extra}""")
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MutationServeProbe <replicaDir> [n]")
    val src = args.head
    val n = args.lift(1).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scratch = java.nio.file.Files.createTempDirectory("graft-mutserve").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.warehouse.dir", scratch + "/wh")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import operators.CorpusPrep

    // scratch corpus: non-document tables copy through; documents split
    // 6/8 standing, 2/8 arriving (the IngestCadenceSpec convention)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$scratch/$t.parquet")
    }
    val docs = spark.read.parquet(s"$src/documents.parquet")
    docs.filter(pmod(col("doc_id"), lit(8L)) < 6L)
      .write.mode("overwrite").parquet(s"$scratch/documents.parquet")
    val arriving = (0 until 2).map(i =>
      docs.filter(pmod(col("doc_id"), lit(8L)) === (6L + i))
        .withColumn("doc_id", col("doc_id") + 900000000L))

    // cadence bootstrap (standing corpus) + overlay
    CorpusPrep.ensureDocBase(spark, scratch)
    CorpusPrep.ensureDocGlobal(spark, scratch)

    // request catalog: the measured mixed families + the overlay reader
    // (the artifact the cadence swaps — resolved at plan time, the
    // generation-pinned serving pattern)
    val base = ConcurrentServeProbe.catalog(spark, scratch)
      .map(r => (r.family, r.run))
    val overlay = (0 until 16).map { i =>
      ("overlay", (s: SparkSession) => {
        val p = Materialize.servingPath(s, "graft_docglobal", scratch,
          CorpusPrep.DocGlobalVersion)
        s.read.parquet(p)
          .filter(pmod(col("doc_id"), lit(2L + (i % 5).toLong)) === 0L)
          .groupBy(col("is_canonical"), col("contaminated")).count()
      })
    }
    val reqs = base ++ overlay

    // warmup — pays artifact ensures + codegen once per family
    reqs.groupBy(_._1).values.foreach(_.head._2(spark).collect())

    // STATIC phase: the round-14 baseline shape, plus the overlay family
    val (w0, l0, f0) = drive(spark, reqs, n, minPasses = 1, () => true)
    report("static", n, w0, l0, f0)

    // MUTATING phase: the full cadence cycle runs while the same load drives
    @volatile var mutatorDone = false
    val walls = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    var ingested = 0L
    val mutator = new Thread(() => {
      try {
        arriving.zipWithIndex.foreach { case (b, i) =>
          val t0 = System.nanoTime()
          b.write.mode("overwrite").parquet(s"$scratch/documents_mb$i.parquet")
          val arrived = Tables.documents(spark, scratch)
            .filter(col("doc_id") >= 900000000L + i * 0L)
            .filter(pmod(col("doc_id") - 900000000L, lit(8L)) === (6L + i))
          ingested += CorpusPrep.ingestIncrement(spark, scratch, arrived,
            batchTag = Some(s"mb$i")).count()
          walls += s"ingest_mb$i" -> (System.nanoTime() - t0) / 1e9
        }
        val t1 = System.nanoTime()
        val (_, dec) = CorpusPrep.compactionRefreshAuto(spark, scratch, floorDocs = 1L)
        walls += s"refresh_$dec" -> (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        CorpusPrep.compactCadenceIfDue(spark, scratch, maxPending = 1L)
        walls += "compact_gc" -> (System.nanoTime() - t2) / 1e9
      } catch {
        case e: Exception =>
          System.err.println(s"[mutserve] MUTATOR FAILED: $e")
          walls += "MUTATOR_FAILED" -> -1.0
      } finally mutatorDone = true
    })
    mutator.start()
    val (w1, l1, f1) = drive(spark, reqs, n, minPasses = 1, () => mutatorDone)
    mutator.join()
    val wallsJson = walls.map { case (k, v) => f""""$k":$v%.2f""" }.mkString(",")
    report("mutating", n, w1, l1, f1,
      extra = f""","ingested_docs":$ingested,"mutator":{$wallsJson}""")

    spark.stop()
  }
}
