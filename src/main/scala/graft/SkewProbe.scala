package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew rehearsal for the fuzzy candidate and minhash band exchanges
  * (SCALE.md §skew, round-9 measurement): crafts a Zipf-hot replica of a
  * data dir — HotPermille of documents share ONE text, the same share of
  * part names collapse to ONE name — so one minhash band bucket holds
  * ~HotPermille·N docs (the quadratic hot key) and a handful of trigrams
  * carry ~HotPermille·N postings. Then runs the real operators under AQE
  * with a task-duration listener and reports, per run, wall seconds,
  * output rows, and the top stages by max-task time with their
  * max/median task-duration ratio — the straggler measurement that
  * decides whether the q12_salted_agg machinery is needed on these
  * exchanges.
  *
  *   runMain graft.SkewProbe <srcDir> <workDir>
  */
object SkewProbe {

  val HotPermille = 200L

  private class TaskLis extends SparkListener {
    val durs = scala.collection.mutable.Map
      .empty[Int, scala.collection.mutable.ArrayBuffer[Long]]
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = durs.synchronized {
      durs.getOrElseUpdate(t.stageId,
        scala.collection.mutable.ArrayBuffer.empty[Long]) += t.taskInfo.duration
    }
    def reset(): Unit = durs.synchronized(durs.clear())
    /** Listener events arrive on an async bus AFTER the action returns —
      * and the last-delivered events are exactly the last-FINISHING tasks,
      * i.e. the stragglers this probe exists to see. Wait until the event
      * count is stable across two 150 ms windows before reading (or
      * resetting — a late event crossing a reset would misattribute a
      * straggler to the NEXT run's stats). No private listener-bus API. */
    def quiesce(): Unit = {
      var prev = -1L
      var stable = 0
      while (stable < 2) {
        val cur = durs.synchronized(durs.valuesIterator.map(_.size.toLong).sum)
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        Thread.sleep(150)
      }
    }
    /** Top `n` stages by max task duration: (stage, tasks, medianMs, maxMs). */
    def top(n: Int): Seq[(Int, Int, Long, Long)] = durs.synchronized {
      durs.toSeq.map { case (sid, ds) =>
        val s = ds.sorted
        (sid, s.length, s((s.length - 1) / 2), s.last)
      }.sortBy(-_._4).take(n)
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(src, work) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Zipf-hot replica: clone the dir's tables, collapsing HotPermille of
    // documents/part names onto one value (hash-deterministic selection).
    val hotDoc = "the quick brown fox jumps over the lazy dog again and again"
    val hotName = "universal standard anodized widget"
    Tables.documents(spark, src)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(1000L)) < HotPermille, lit(hotDoc))
          .otherwise(col("text")))
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    Tables.part(spark, src)
      .withColumn("p_name",
        when(pmod(col("p_partkey"), lit(1000L)) < HotPermille, lit(hotName))
          .otherwise(col("p_name")))
      .write.mode("overwrite").parquet(s"$work/part.parquet")

    val lis = new TaskLis
    spark.sparkContext.addSparkListener(lis)
    def run(name: String)(f: => Long): Unit = {
      lis.quiesce()
      lis.reset()
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      lis.quiesce()
      val stages = lis.top(3).map { case (sid, n, med, mx) =>
        s"""{"stage":$sid,"tasks":$n,"median_ms":$med,"max_ms":$mx}"""
      }.mkString("[", ",", "]")
      println(f"""{"metric":"skew_probe","run":"$name","rows":$rows,"value":$sec%.2f,"unit":"sec","top_stages":$stages}""")
    }

    run("minhash_pairs_hot") {
      graft.operators.Dedup.minhashPairs(spark, work).count()
    }
    run("dedup_pipeline_hot") {
      graft.operators.Dedup.dedupPipeline(spark, work).count()
    }
    run("near_canon_pairs_hot") {
      graft.operators.Dedup.nearCanonByPairs(spark, work).count()
    }
    run("near_canon_sig_hot") {
      graft.operators.Dedup.nearCanonBySig(
        graft.operators.Dedup.minhashSignatures(spark, work)).count()
    }
    run("fuzzy_batch_indexed_hot") {
      graft.operators.FuzzySearch.batchFuzzySearchIndexed(spark, work, 20).count()
    }
    run("fuzzy_batch_auto_hot") {
      graft.operators.FuzzySearch.batchFuzzySearchAuto(spark, work, 20, 10L).count()
    }
    spark.stop()
  }
}
