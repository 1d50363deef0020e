package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (Array[Float] vectors).
  *
  * Brute-force cosine top-k is the correctness baseline: probe broadcast ×
  * corpus scan → dot/norm as codegen'd array expressions →
  * TakeOrderedAndProject. At 100 TB the same plan shape survives — the scan
  * parallelizes and top-k is partial-per-partition — but the scale path is
  * the LSH-bucketed variant (random-hyperplane signs → candidates share a
  * bucket), which turns the cross product into an equi-join.
  */
object Similarity {

  /** Sequential-fold dot product of two double-cast float arrays.
    * `aggregate` folds left-to-right — the same order the DuckDB oracle
    * uses — so the result is bit-deterministic across both engines. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Top-k nearest to the probe vector (vec_id = probeId) by cosine. */
  def cosineTopK(spark: SparkSession, dir: String, probeId: Long, k: Int): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val probe = e.filter(col("vec_id") === probeId)
      .select(col("embedding").as("probe_emb"))
    e.filter(col("vec_id") =!= probeId)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), col("label"),
        round(cosine(col("embedding"), col("probe_emb")), 4).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col("vec_id"))
      .limit(k)
  }

  def cosineTopKOracle(probeId: Long, k: Int): String = {
    def dotSql(a: String, b: String) =
      s"""list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1),
         | i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), (acc, x) -> acc + x)""".stripMargin.replaceAll("\n", " ")
    val cos = s"(${dotSql("e.embedding", "p.probe_emb")} / " +
      s"(sqrt(${dotSql("e.embedding", "e.embedding")}) * sqrt(${dotSql("p.probe_emb", "p.probe_emb")})))"
    s"""WITH p AS (SELECT embedding AS probe_emb FROM embeddings WHERE vec_id = $probeId)
       |SELECT e.vec_id, e.label, round($cos, 4) AS cosine_sim
       |FROM embeddings e CROSS JOIN p
       |WHERE e.vec_id <> $probeId
       |ORDER BY cosine_sim DESC, e.vec_id
       |LIMIT $k""".stripMargin
  }

  /** Scale path: random-hyperplane LSH bucketing. Signature = sign bits of
    * the dot product against `planes` deterministic pseudo-random
    * hyperplanes (components derived from a hash of (plane, dim) — no RNG,
    * reproducible across runs/engines). Vectors sharing a bucket are
    * candidates; exact cosine re-ranks. This replaces the O(N) probe scan
    * with an equi-join on the bucket key.
    */
  def lshBuckets(spark: SparkSession, dir: String, planes: Int): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    // Pseudo-random plane component for (p, i): centered hash in [-0.5, 0.5).
    def comp(p: Int): Column => Column = i =>
      (pmod(i * 2654435761L + lit(p.toLong) * 40503L + 12345L, lit(1000L)).cast("double") / 1000.0) - 0.5
    val sig: Column = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(col("embedding"), sequence(lit(0L), lit(63L)),
          (x, i) => x.cast("double") * comp(p)(i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    e.select(col("vec_id"), col("label"), sig.as("bucket"))
      .orderBy(col("vec_id"))
  }

  def lshBucketsOracle(planes: Int): String = {
    def comp(p: Int, i: String) =
      s"((($i * 2654435761 + ${p.toLong * 40503L + 12345L}) % 1000)::DOUBLE / 1000.0 - 0.5)"
    val terms = (0 until planes).map { p =>
      val proj = s"""list_reduce(list_prepend(0.0, list_transform(range(1, len(embedding) + 1),
        | i -> embedding[i]::DOUBLE * ${comp(p, "(i - 1)")})), (acc, x) -> acc + x)""".stripMargin.replaceAll("\n", " ")
      s"(CASE WHEN $proj >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("\n       + ")
    s"""SELECT vec_id, label,
       |       ($terms)::BIGINT AS bucket
       |FROM embeddings ORDER BY vec_id""".stripMargin
  }
}
