package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement behind SCALE.md §winnowing's df-cap escalation: on a
  * MILDLY clone-heavy corpus the capped join's extra count/filter stages
  * cost more than they save (measured at the 10× replica: 4.0 s capped
  * vs 2.6 s uncapped — the cap is an ESCALATION, not a default), so this
  * probe crafts the corpus the cap exists for — `HotPermille` of
  * documents share ONE 16-token boilerplate header (its fingerprints'
  * df ≈ HotPermille·N, so the uncapped pair join owes
  * ~(HotPermille·N)²/2 rows per header fingerprint) — and measures both
  * forms' wall time and output rows. The crossover this prints is the
  * number the escalation note cites.
  *
  *   runMain graft.WinnowCapProbe <srcDir>
  */
object WinnowCapProbe {

  val HotPermille = 200L
  /** Cut fingerprints covering > 1/200 of all selections. Docs average
    * ~20 selections each, so t ≈ 20·N and the threshold sits at ~N/10 —
    * the crafted header fps (df = HotPermille·N ≈ N/5) are cut while
    * organic near-dup fps (df ≤ ~10) stay far below. (A first run at
    * 1/50 left the threshold ABOVE the header df and the cap never bit —
    * the cap knob is relative to selections, not documents; recorded so
    * the escalation note states the calibration rule.) */
  val CapInv = 200L

  def main(args: Array[String]): Unit = {
    val src = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val boiler = "terms of service apply to this document please read " +
      "carefully before proceeding further legal notice follows"
    val d = Tables.documents(spark, src).select(col("doc_id"),
      when(pmod(col("doc_id"), lit(1000L)) < HotPermille,
        concat(lit(boiler + " "), col("text"))).otherwise(col("text")).as("text"))
      .cache()
    val n = d.count() // materialize once; both forms read the same input

    def run(df: => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = df.count()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    // warm BOTH forms before measuring (first-run codegen/JIT must not
    // land on either side of the comparison); the uncapped warm-up runs
    // over a 1% sample so a pathological corpus doesn't pay the full
    // quadratic join twice
    graft.operators.Dedup.winnowPairsCappedOver(d, CapInv).count()
    graft.operators.Dedup
      .winnowPairsOver(d.filter(pmod(col("doc_id"), lit(100L)) === 0L)).count()
    val (cw, cr) = run(graft.operators.Dedup.winnowPairsCappedOver(d, CapInv))
    val (uw, ur) = run(graft.operators.Dedup.winnowPairsOver(d))
    // the dispatcher's own predictions over this corpus (the exact
    // spellings winnowPairsAuto folds from the stats artifact) — BOTH
    // tiers', so the reported branch mirrors the real three-way dispatch:
    // the crafted header pushes the uncut Σ df² past the 8M budget, and
    // the tier-2 prediction decides capped vs champ
    val fc = graft.operators.Dedup.winnowFpDf(d).cache()
    val predicted = graft.operators.Dedup
      .winnowCandidateCostOver(fc).head().getLong(0)
    val total = fc.agg(org.apache.spark.sql.functions.sum(col("c")).as("t"))
    val cappedPredicted = graft.operators.Dedup.winnowCandidateCostOver(
      fc.crossJoin(org.apache.spark.sql.functions.broadcast(total))
        .filter(col("c") >= 2 && col("c") * CapInv <= col("t"))
        .select(col("fp"), col("c"))).head().getLong(0)
    fc.unpersist()
    val budget = graft.operators.Dedup.WinnowCandidateBudget
    val branch =
      if (predicted <= budget) "uncapped"
      else if (cappedPredicted <= budget) "capped"
      else "champ"
    println(f"""{"metric":"winnow_cap_probe","dir":"$src","n_docs":$n,""" +
      f""""hot_permille":$HotPermille,"cap_inv":$CapInv,""" +
      f""""predicted_pairs":$predicted,"predicted_capped":$cappedPredicted,""" +
      f""""auto_branch":"$branch",""" +
      f""""uncapped":{"wall":$uw%.2f,"pairs":$ur},""" +
      f""""capped":{"wall":$cw%.2f,"pairs":$cr}}""")
    spark.stop()
  }
}
