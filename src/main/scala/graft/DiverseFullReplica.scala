package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FK-consistent k-fold replica with DIVERSE entity synthesis — the
  * composition of [[FullReplica]] (every table scaled, foreign keys
  * shifted per-replica so every join sees a closed world) and
  * [[DiversityReplica]] (new entities from the source vocabulary, the
  * axis clone replicas cannot exercise). Round-13's rehearsals proved
  * each axis catches bugs the other is structurally blind to
  * (ann_ivf_auto's scale coincidence on volume; tier-dispatch flips on
  * diversity); the round-13 verdict's item 3 asks for the COMPOSED gate:
  * the full 199-query suite, type-exact-compared, on data that is both
  * FK-consistent at sf1 volume AND entity-diverse.
  *
  * Build = FullReplica, then the three value-bearing tables are
  * re-synthesized IN PLACE with DiversityReplica's exact keyed-hash
  * transforms (seed = original id × the same constants + rep, recovered
  * from the shifted key as rep = key / stride, orig = key % stride), so
  * the values are bit-identical to what DiversityReplica would emit
  * while every FK stays closed. Replica 0 remains the source verbatim.
  *
  * Usage: runMain graft.DiverseFullReplica <src>*<k>=<dest>
  */
object DiverseFullReplica {

  import DiversityReplica.{h, pick}

  private def writeSingle(df: DataFrame, path: String): Unit = {
    val tmp = path + "__tmp"
    df.repartition(1).write.mode("overwrite").parquet(tmp)
    val dir = new java.io.File(tmp)
    val part = dir.listFiles().filter(_.getName.endsWith(".parquet")) match {
      case Array(one) => one
      case other => sys.error(s"expected one part file in $tmp, got ${other.length}")
    }
    val target = new java.io.File(path)
    if (target.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(target)
    }
    java.nio.file.Files.move(part.toPath, target.toPath)
    dir.listFiles().foreach(_.delete())
    dir.delete()
    ()
  }

  def build(spark: SparkSession, src: String, k: Int, dest: String): Unit = {
    FullReplica.build(spark, src, k, dest)

    // ---- part: new entity names (DiversityReplica's transform keyed by
    // (orig, rep) recovered from the shifted key) ----
    val srcPart = spark.read.parquet(s"$src/part.parquet")
    val nameToks = srcPart.select(explode(split(col("p_name"), " ")).as("tok"))
      .distinct().orderBy(col("tok")).collect().map(_.getString(0)).toSeq
    val maxPart = srcPart.agg(max(col("p_partkey"))).head().getLong(0) + 1L
    val part = spark.read.parquet(s"$dest/part.parquet")
      .withColumn("rep", (col("p_partkey").cast("long") / maxPart).cast("long"))
      .withColumn("orig", pmod(col("p_partkey").cast("long"), lit(maxPart)))
    val pSeed = col("orig") * lit(1000003L) + col("rep")
    val rawName = concat_ws(" ",
      (0 to 2).map { i =>
        if (i < 2) pick(nameToks, h(pSeed, lit(i)))
        else when(pmod(h(pSeed, lit(99)), lit(2L)) === 0L,
          pick(nameToks, h(pSeed, lit(i))))
      }: _*)
    val dropAt = (pmod(h(pSeed, lit(7)), length(rawName) - 2L) + 2L).cast("int")
    val synthName = when(pmod(h(pSeed, lit(13)), lit(4L)) === 0L,
        concat(substring(rawName, lit(1), dropAt - 1),
          expr("substring(rawName, dropAt + 1)")))
      .otherwise(rawName)
    writeSingle(part
      .withColumn("rawName", rawName).withColumn("dropAt", dropAt)
      .withColumn("p_name",
        when(col("rep") === 0L, col("p_name")).otherwise(synthName))
      .drop("rep", "orig", "rawName", "dropAt"),
      s"$dest/part.parquet")

    // ---- documents: re-drawn token sequences at the source length ----
    val srcDocs = spark.read.parquet(s"$src/documents.parquet")
    val docToks = srcDocs.select(explode(split(col("text"), " ")).as("tok"))
      .distinct().orderBy(col("tok")).collect().map(_.getString(0)).toSeq
    val maxDoc = srcDocs.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val docs = spark.read.parquet(s"$dest/documents.parquet")
      .withColumn("rep", (col("doc_id") / maxDoc).cast("long"))
      .withColumn("orig", pmod(col("doc_id"), lit(maxDoc)))
    val dSeed = col("orig") * lit(1000033L) + col("rep")
    val synthText = array_join(transform(
      sequence(lit(1), size(split(col("text"), " "))),
      i => pick(docToks, h(dSeed, i))), " ")
    writeSingle(docs
      .withColumn("text",
        when(col("rep") === 0L, col("text")).otherwise(synthText))
      .withColumn("n_chars", length(col("text")))
      .drop("rep", "orig"),
      s"$dest/documents.parquet")

    // ---- embeddings: hash-noise around the real cluster structure ----
    val srcEmb = spark.read.parquet(s"$src/embeddings.parquet")
    val maxVec = srcEmb.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val emb = spark.read.parquet(s"$dest/embeddings.parquet")
      .withColumn("rep", (col("vec_id") / maxVec).cast("long"))
      .withColumn("orig", pmod(col("vec_id"), lit(maxVec)))
    val vSeed = col("orig") * lit(1000211L) + col("rep")
    val noisy = transform(col("embedding"), (x, i) =>
      (x + lit(0.25f) *
        ((pmod(h(vSeed, i), lit(1000L)).cast("float") / lit(499.5f)) - lit(1.0f)))
        .cast("float"))
    writeSingle(emb
      .withColumn("embedding",
        when(col("rep") === 0L, col("embedding")).otherwise(noisy))
      .drop("rep", "orig"),
      s"$dest/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val spec = "(.+)\\*(\\d+)=(.+)".r
    val (src, k, dest) = args.headOption match {
      case Some(spec(s, kk, d)) => (s, kk.toInt, d)
      case _ => sys.error("usage: DiverseFullReplica <src>*<k>=<dest>")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    build(spark, src, k, dest)
    val names = spark.read.parquet(s"$dest/part.parquet")
      .agg(countDistinct(col("p_name"))).head().getLong(0)
    println(s"""{"metric":"diverse_full_replica","src":"$src","k":$k,"dest":"$dest","distinct_names":$names}""")
  }
}
