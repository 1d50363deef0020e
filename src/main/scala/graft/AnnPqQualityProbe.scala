package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement behind SCALE.md §ann-refine-sizing (round 14): WHERE the
  * compressed ladder's recall actually goes. The knob sweep
  * (AnnKnobProbe) proved nprobe/refine are not the bottleneck — recall
  * saturates at 0.2-0.3 with ALL cells probed and a 26·k shortlist —
  * so the loss is the ADC ranking itself. This probe sweeps the PQ
  * geometry (M subspaces × K codewords, stride-sampled codebooks, the
  * shipped construction) and measures the SHORTLIST recall ceiling:
  * the fraction of the exact float top-k present in the ADC top-(26·k),
  * averaged over a deterministic probe set.
  *
  *   runMain graft.AnnPqQualityProbe <dir> ...
  */
object AnnPqQualityProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AnnPqQualityProbe <dir> ...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorFunctions
    val k = SparkEntry.P.IvfK
    val shortDepth = 26 * k
    val probeIds = Seq(7L, 97L, 194L, 291L, 388L)
    args.foreach { dir =>
      val e = Tables.embeddings(spark, dir).cache()
      val n = e.count()
      for ((mSub, kCode) <- Seq((8, 16), (8, 64), (8, 256), (16, 16), (16, 64))) {
        val dim = 64 / mSub
        val books = e.filter(col("vec_id") % 25 === 0 && col("vec_id") < 25L * kCode)
          .withColumn("m", explode(sequence(lit(0), lit(mSub - 1))))
          .select(col("m"), col("vec_id").as("cid"),
            slice(col("embedding"), col("m") * dim + 1, lit(dim))
              .cast("array<double>").as("cemb"))
        val bArr = books.agg(array_sort(collect_list(
          struct(col("m"), col("cid"), col("cemb")))).as("bk"))
        val codes = e.crossJoin(broadcast(bArr))
          .select(col("vec_id"),
            VectorFunctions.pqEncodeF(col("embedding"), col("bk"), mSub, dim).as("codes"))
          .select(col("vec_id"), posexplode(col("codes")).as(Seq("m", "code")))
          .cache()
        codes.count()
        var hits = 0L; var total = 0L
        val t0 = System.nanoTime()
        probeIds.foreach { pid =>
          val probe = e.filter(col("vec_id") === pid).select(col("embedding").as("pemb"))
          if (probe.count() > 0) {
            val lut = books.crossJoin(broadcast(probe))
              .select(col("m"), col("cid").as("code"),
                graft.operators.Similarity.l2sq(
                  slice(col("pemb"), col("m") * dim + 1, lit(dim)).cast("array<double>"),
                  col("cemb")).as("d"))
            val short = codes.filter(col("vec_id") =!= pid)
              .join(broadcast(lut), Seq("m", "code"))
              .groupBy(col("vec_id"))
              .agg(array_sort(collect_list(struct(col("m"), col("d")))).as("ds"))
              .select(col("vec_id"),
                aggregate(col("ds"), lit(0.0), (acc, x) => acc + x("d")).as("pq_dist"))
              .orderBy(col("pq_dist"), col("vec_id")).limit(shortDepth)
              .select(col("vec_id"))
            val exact = graft.operators.Similarity.cosineTopK(spark, dir, pid, k)
              .select(col("vec_id"))
            val h = exact.join(short.withColumnRenamed("vec_id", "s_id"),
              col("vec_id") === col("s_id")).count()
            hits += h; total += exact.count()
          }
        }
        val w = (System.nanoTime() - t0) / 1e9
        codes.unpersist()
        println(f"""{"metric":"pq_quality","dir":"$dir","n":$n,"m":$mSub,"k_codes":$kCode,""" +
          f""""shortlist_recall":${hits.toDouble / math.max(1, total)}%.4f,""" +
          f""""hits":$hits,"total":$total,"wall":$w%.1f}""")
      }
      e.unpersist()
    }
    spark.stop()
  }
}
