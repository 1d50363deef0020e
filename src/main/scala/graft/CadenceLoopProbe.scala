package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The OPERATIONAL LOOP rehearsal — round 12's lifecycle machinery run
  * COMPOSED, end to end, at replica scale, the way a production corpus
  * would live through a day: bootstrap the standing artifacts, land
  * several arrival batches through the cadence (raw corpus commit +
  * row-local labels + screens + band/window appends), let the compaction
  * CLOCK decide the folds, let the refresh DISPATCHER decide the overlay
  * refresh, then check that the SERVED label relation in this
  * incrementally-lived-in world is row-identical to a from-scratch world
  * built over the same final corpus in a clean warehouse.
  *
  * Every piece is individually spec-pinned (IngestCadenceSpec /
  * IncrementalIndexSpec / StreamingSpec); what only this probe exercises
  * is the WHOLE SEQUENCE — appends, then clock-driven folds of all three
  * artifacts, then the dispatched delta refresh OVER the folded layout —
  * plus the walls of each phase at the 10×/100× replicas, which is the
  * number an operator planning a production cadence actually needs.
  *
  *   runMain graft.CadenceLoopProbe <srcDir> ...
  *
  * One JSON line per dir: per-phase walls, each clock/dispatcher decision
  * string, and the served-equality verdict (count + order-independent
  * multiset hash of the full docbase⋈overlay relation, the
  * cadenceTagAndCount fold — sums in decimal(38,0) because two xxhash64
  * values can already overflow a Long under ANSI).
  */
object CadenceLoopProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CadenceLoopProbe <srcDir> ...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The composed loop runs hundreds of jobs in one JVM; shuffle files
      // of completed jobs are reclaimed only when ContextCleaner sees
      // their references GC'd, and a 16 GiB heap can go an hour without
      // a full GC while /tmp accumulates the whole run's shuffle bytes
      // (measured: 47 GiB at the diverse 1000x replica — more than the
      // warehouses themselves). Spark's own knob for exactly this:
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators._

    def t(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    /** (row count, multiset hash) of a relation — column order fixed by
      * name sort, row order irrelevant. Two independently-seeded per-row
      * hashes are summed separately and concatenated: a compensating
      * difference that cancels in one additive fold would also have to
      * cancel under the second seed (and preserve count), shrinking the
      * collision surface from one 64-bit sum to count × two sums. */
    def relSig(df: DataFrame): (Long, String) = {
      val cols = df.columns.sorted.map(col).toSeq
      def hsum(seed: org.apache.spark.sql.Column*) =
        coalesce(sum(xxhash64(seed ++ cols: _*).cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)"))
      val r = df.agg(count(lit(1)).as("n"),
        hsum().as("h1"), hsum(lit("graft-salt-2")).as("h2")).head()
      def hex(d: java.math.BigDecimal) = d.toBigInteger
        .mod(java.math.BigInteger.ONE.shiftLeft(64)).toString(16)
      (r.getLong(0), hex(r.getDecimal(1)) + ":" + hex(r.getDecimal(2)))
    }

    args.foreach { src =>
      val work = java.nio.file.Files.createTempDirectory("graft-cadence-loop").toString
      val whA = java.nio.file.Files.createTempDirectory("graft-loop-whA").toString
      val whB = java.nio.file.Files.createTempDirectory("graft-loop-whB").toString
      spark.conf.set("spark.graft.materialize.dir", whA)

      val srcDocs = Tables.documents(spark, src)
      // standing corpus: 70% of the source; three 10% arrival batches
      srcDocs.filter(pmod(col("doc_id"), lit(10L)) < 7L)
        .write.mode("overwrite").parquet(s"$work/documents.parquet")

      val tBootstrap = t {
        val docs = Tables.documents(spark, work)
          .select(col("doc_id"), col("text"))
        CorpusPrep.ensureDocBase(spark, work)
        Dedup.ensureBandsIndex(spark, work, docs)
        CorpusPrep.ensureDocWins(spark, work, docs)
        CorpusPrep.ensureDocGlobal(spark, work)
      }

      // three arrival batches through the cadence step (the streaming
      // face's per-batch body: raw corpus commit under the content tag,
      // then ingestIncrement with the same tag — StreamingSpec pins the
      // stream wrapper's idempotence; this probe times the work)
      val batchWalls = (7L to 9L).map { b =>
        val batch = srcDocs.filter(pmod(col("doc_id"), lit(10L)) === b)
        t {
          batch.write.mode("overwrite").parquet(s"$work/documents_b$b.parquet")
          CorpusPrep.ingestIncrement(spark, work,
            Tables.documents(spark, work)
              .filter(pmod(col("doc_id"), lit(10L)) === b),
            batchTag = Some(s"loop$b")).count()
        }
      }

      // the compaction clock at the real budget (3 < 16 → all defer),
      // then forced (maxPending = 1 → every artifact folds)
      val clockDefer = CorpusPrep.compactCadenceIfDue(spark, work)
      var clockFold = Map.empty[String, String]
      val tFold = t { clockFold = CorpusPrep.compactCadenceIfDue(spark, work, maxPending = 1L) }

      // the dispatched overlay refresh OVER the folded layout
      var refreshDec = ""
      val tRefresh = t {
        refreshDec = CorpusPrep.compactionRefreshAuto(spark, work)._2
      }

      // served equality: the label relation in the lived-in world
      // (appends + folds + delta refresh, warehouse A) vs a from-scratch
      // world over the same final corpus (clean warehouse B). The
      // comparison SPLITS on the one deliberately-frozen input: docbase
      // appends score lm_score against the FROZEN standing-corpus model
      // (a retrain is a version bump, the documented lifecycle — new
      // corpus children alone do not invalidate the model artifact),
      // while the from-scratch world trains on the final corpus. So
      // every column except lm_score must be row-identical — overlay
      // labels included, THROUGH the folds and the dispatched delta —
      // and the lm_score divergence is reported as the retrain debt a
      // version bump would clear, not an equality failure.
      val metaA = CorpusPrep.docMetaIndexed(spark, work)
      val sigA = relSig(metaA.drop("lm_score"))
      spark.conf.set("spark.graft.materialize.dir", whB)
      val tScratch = t { CorpusPrep.ensureDocGlobal(spark, work) }
      val metaB = CorpusPrep.docMetaIndexed(spark, work)
      val sigB = relSig(metaB.drop("lm_score"))
      val lmDiverged = metaA.select(col("doc_id"), col("lm_score").as("lm_a"))
        .join(metaB.select(col("doc_id"), col("lm_score").as("lm_b")), "doc_id")
        .filter(!(col("lm_a") <=> col("lm_b"))).count()
      spark.conf.set("spark.graft.materialize.dir", whA)

      val batches = batchWalls.map(w => f"$w%.1f").mkString("[", ",", "]")
      println(f"""{"metric":"cadence_loop","dir":"$src",""" +
        f""""bootstrap":$tBootstrap%.1f,"batch_walls":$batches,""" +
        f""""clock_at_3":"${clockDefer.values.mkString("/")}",""" +
        f""""fold":{"wall":$tFold%.1f,"decisions":"${clockFold.values.mkString("/")}"},""" +
        f""""refresh":{"wall":$tRefresh%.1f,"decision":"$refreshDec"},""" +
        f""""scratch_rebuild":$tScratch%.1f,""" +
        f""""served_equal":${sigA == sigB},""" +
        f""""rows":${sigA._1},"sig_a":"${sigA._2}","sig_b":"${sigB._2}",""" +
        f""""lm_retrain_divergence":$lmDiverged}""")

      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(whA))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(whB))
    }
    spark.stop()
  }
}
