package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement behind SCALE.md §compact-cadence and the
  * `Materialize.CompactPendingMax` default: what a pending batch
  * actually COSTS the gate read that runs every micro-batch. The dedup
  * screen's standing side is the band artifact; each cadence batch
  * lands one 4-file batch set there, so the screen's probe join pays
  * per-file listing/footer overhead plus the diluted band clustering on
  * the appended fraction. This probe appends 64 one-slice batches to a
  * standing build and times the screen-shaped read at pending 0 / 16 /
  * 64, then the fold itself (`compactBandsIfDue` at the due budget) and
  * the read again after — the two shallow curves the budget sits
  * between.
  *
  *   runMain graft.CompactCadenceProbe <dir> ...
  */
object CompactCadenceProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CompactCadenceProbe <dir> ...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact-probe").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.graft.materialize.dir", tmp)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    def t(f: => Any): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    // median of 3: the read is sub-second, the box is shared
    def t3(f: => Any): Double = Seq(t(f), t(f), t(f)).sorted.apply(1)

    args.foreach { dir =>
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      val standing = docs.filter(pmod(col("doc_id"), lit(10L)) =!= 7L)
      // a fixed screen-shaped probe batch: the read under test is the
      // standing ARTIFACT side; the probe's own minhash cost is constant
      // across checkpoints
      val probe = docs.filter(pmod(col("doc_id"), lit(10L)) === 7L)
        .limit(500).cache()
      probe.count()
      val path = Dedup.ensureBandsIndex(spark, dir, standing)
      def readWall(): Double = t3 {
        Dedup.bandRows(probe)
          .select(col("doc_id"), col("band_hash"), col("band_idx"))
          .join(spark.read.parquet(path)
            .select(col("band_hash"), col("band_idx"),
              col("doc_id").as("other_id")),
            Seq("band_hash", "band_idx"))
          .count()
      }
      def fileCount(): Int = {
        val p = new org.apache.hadoop.fs.Path(path)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
      }
      val r0 = readWall()
      // 64 one-slice batches: the arriving 10% sliced by (doc_id/10) % 64
      val sliceCol = pmod(floor(col("doc_id") / 10L), lit(64L))
      var r16 = -1.0
      (0 until 64).foreach { i =>
        Dedup.appendToBandsIndex(spark, dir,
          docs.filter(pmod(col("doc_id"), lit(10L)) === 7L)
            .filter(sliceCol === i.toLong),
          batchTag = Some(s"cc$i"))
        if (i == 15) r16 = readWall()
      }
      val r64 = readWall()
      val f64 = fileCount()
      val pending = graft.Materialize.pendingBatches(spark, "graft_bands", dir, 1)
      var decision = ""
      val foldWall = t {
        decision = Dedup.compactBandsIfDue(spark, dir)._2
      }
      val rAfter = readWall()
      println(f"""{"metric":"compact_cadence","dir":"$dir",""" +
        f""""read_p0":$r0%.2f,"read_p16":$r16%.2f,"read_p64":$r64%.2f,""" +
        f""""files_p64":$f64,"pending_p64":$pending,""" +
        f""""fold":{"wall":$foldWall%.1f,"dispatch":"$decision"},""" +
        f""""read_after":$rAfter%.2f,"files_after":${fileCount()}}""")
      probe.unpersist()
    }
    spark.stop()
    deleteRecursively(new java.io.File(tmp))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
