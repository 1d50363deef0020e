package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement behind the containment admission-control budget
  * (SCALE.md §containment): the uncut prefix join owes Σ_a prefix_a·df
  * candidate rows, which explodes exactly when records are built from a
  * LOW-ENTROPY gram alphabet — every gram is corpus-hot, so even the
  * rarest-gram prefix probes huge postings (the same degeneracy as the
  * fuzzy sf1 candidate cliff). This probe crafts that corpus — N
  * distinct records over a two-letter alphabet, so the whole corpus
  * shares ≤ 8 distinct trigrams — predicts the volume with the shipped
  * cost model, and measures the uncut vs df-capped walls the
  * `dedup_containment_auto` dispatch chooses between.
  *
  *   runMain graft.ContainCapProbe [n]
  */
object ContainCapProbe {

  val Threshold = 0.8
  val CapInv = 8L // every gram's df ≈ N/2 ≫ N/8: all hot grams cut

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    // the record spelling uses the id's low 16 bits — beyond 2^16 ids
    // wrap to duplicate strings and the "N distinct records" premise
    // (and therefore the printed numbers) silently breaks
    require(n <= 65536, s"n=$n exceeds the 16-bit distinct-record space")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.TextFunctions.charNgramSet
    // distinct 16-char {a,b} strings: id's bits spell the record, so all
    // N are distinct while every trigram comes from the 8-element {a,b}^3
    val bits = (0 until 16).map(i =>
      when(shiftright(col("id"), i).bitwiseAND(1L) === 1L, "b").otherwise("a"))
    val c = spark.range(n)
      .select(col("id"), concat(bits: _*).as("clean_value"))
      .select(col("id"), charNgramSet(col("clean_value"), 3).as("grams"))
      .filter(size(col("grams")) > 0)
      .cache()
    c.count()

    // the SHIPPED cost model, via the same core the dispatcher runs —
    // the probe cannot drift from the prediction it claims to validate
    val dfRel = c.select(explode(col("grams")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("df"))
    val predicted = graft.operators.Dedup
      .containmentCandidateCostOver(c, dfRel, Threshold)
      .head().getLong(0)

    def run(df: => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = df.count()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    val (cw, cr) = run(graft.operators.Dedup.containmentCappedOver(c, Threshold, CapInv))
    val (uw, ur) = run(graft.operators.Dedup.containmentPairsOver(c, Threshold))
    println(f"""{"metric":"contain_cap_probe","n":$n,"predicted":$predicted,""" +
      f""""uncapped":{"wall":$uw%.2f,"pairs":$ur},""" +
      f""""capped":{"wall":$cw%.2f,"pairs":$cr}}""")
    spark.stop()
  }
}
