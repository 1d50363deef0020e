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

    // the shipped cost model's sum, spelled over the crafted relation
    val e = c.select(col("id"), explode(col("grams")).as("g"))
    val dfRel = e.groupBy("g").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
    val ranked = e.join(broadcast(dfRel), "g")
      .withColumn("rank", row_number().over(
        w.partitionBy(col("id")).orderBy(col("df"), col("g"))))
      .withColumn("setsize", count(lit(1)).over(w.partitionBy(col("id"))))
      .withColumn("prefix_len",
        col("setsize") - ceil(lit(Threshold) * col("setsize") - 1e-9) + 1)
    val predicted = ranked.filter(col("rank") <= col("prefix_len"))
      .agg(coalesce(sum(col("df")), lit(0L))).head().getLong(0)

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
