package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture snapshot maintenance — the MERGE INTO of a
  * warehouse-less pipeline: a base snapshot plus a change feed (upserts +
  * delete markers) collapse to the latest-wins snapshot.
  *
  * Spelling: union the base (version 1) with the change feed, rank each
  * key's rows by version descending, keep rank 1, drop rows whose winning
  * op is a delete. ONE shuffle on the merge key for the whole operation
  * (the union is narrow, the window and the implicit dedup share the same
  * hash partitioning). At 100 TB the base side is bucketed by key at write
  * time, so only the (much smaller) change feed shuffles — the same plan
  * Delta/Iceberg MERGE compiles to when the target is clustered.
  *
  * The change feed here is derived deterministically from the base table
  * (keys ≡ 3 mod 7 get a price update, keys ≡ 5 mod 7 a delete marker) so
  * both engines construct the identical feed without a side channel.
  */
object Cdc {

  val UpdateMod = 7L
  val UpdateRem = 3L
  val DeleteRem = 5L
  val PriceBump = 1000.0

  /** Latest-wins snapshot after applying the derived change feed. */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val base = o.select(col("o_orderkey"), col("o_totalprice"),
      col("o_orderstatus"), lit(1L).as("version"), lit("U").as("op"))
    val updates = o.filter(pmod(col("o_orderkey"), lit(UpdateMod)) === UpdateRem)
      .select(col("o_orderkey"), (col("o_totalprice") + PriceBump).as("o_totalprice"),
        lit("P").as("o_orderstatus"), lit(2L).as("version"), lit("U").as("op"))
    val deletes = o.filter(pmod(col("o_orderkey"), lit(UpdateMod)) === DeleteRem)
      .select(col("o_orderkey"), lit(null).cast("double").as("o_totalprice"),
        lit(null).cast("string").as("o_orderstatus"), lit(2L).as("version"),
        lit("D").as("op"))
    val w = Window.partitionBy(col("o_orderkey")).orderBy(col("version").desc)
    base.unionAll(updates).unionAll(deletes)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderstatus"), col("version").as("src_version"))
      .orderBy(col("o_orderkey"))
  }

  def mergeUpsertOracle: String =
    s"""WITH feed AS (
       |  SELECT o_orderkey, o_totalprice, o_orderstatus,
       |         1::BIGINT AS version, 'U' AS op
       |  FROM orders
       |  UNION ALL
       |  SELECT o_orderkey, o_totalprice + $PriceBump, 'P',
       |         2::BIGINT, 'U'
       |  FROM orders WHERE o_orderkey % $UpdateMod = $UpdateRem
       |  UNION ALL
       |  SELECT o_orderkey, NULL, NULL, 2::BIGINT, 'D'
       |  FROM orders WHERE o_orderkey % $UpdateMod = $DeleteRem),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
       |                               ORDER BY version DESC) AS rn
       |  FROM feed)
       |SELECT o_orderkey, o_totalprice, o_orderstatus,
       |       version AS src_version
       |FROM ranked WHERE rn = 1 AND op <> 'D'
       |ORDER BY o_orderkey""".stripMargin
}
