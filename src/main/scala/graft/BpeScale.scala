package graft

import org.apache.spark.sql.SparkSession

/** BPE vocabulary-scale demonstration (NOT a driver surface): trains
  * `target` merges (default 512) with the delta chain at the scale knobs
  * over the PHRASE corpus (see BpeTrainer.phraseCountsN — the synthetic
  * documents' 31-word vocabulary exhausts single-word BPE at ~89 merges;
  * the n-gram phrase unit scales the word relation: sf0.1 n=2 → 931,
  * n=3 → 27k, n=4 → 211k distinct words) and prints ONE JSON line with
  * rounds, merges, wall seconds, artifact count, and PER-ROUND stats
  * (wall, merges, symbol/pair relation rows — the data-bound-vs-
  * overhead-bound measurement; round 1 includes the t=0 root builds).
  * Pre-deletes the scale-demo artifact family so the number is a BUILD
  * time, not a cache read. Recorded in SCALE.md.
  *
  * Shuffle partitions are 8, not the bench's 32: every per-round relation
  * at n=2 is vocabulary-sized (≤ ~10k rows), where 32-task stages are
  * pure scheduling overhead — at a real corpus's vocabulary (millions of
  * words) the partition count scales back up with the data.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.BpeScale [target] [n]"
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val target = args.headOption.map(_.toInt).getOrElse(512)
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val maxRounds = 64
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_BPE_PARTS", "8"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .appName("graft-bpe-scale")
      .getOrCreate()
    try {
      // purge the demo family so ensure() rebuilds (honest build timing)
      val fam = if (n == 2) "scale" else s"scale$n"
      val kinds = Seq(s"graft_bpe${fam}_s0", s"graft_bpe${fam}_pc0") ++
        (1 to maxRounds).flatMap(t => Seq(s"graft_bpe${fam}_b$t",
          s"graft_bpe${fam}_s$t", s"graft_bpe${fam}_pc$t"))
      kinds.foreach(k => Materialize.purge(spark, k, dir, 3))
      val t0 = System.nanoTime()
      val (rounds, merges, stats) =
        graft.operators.BpeTrainer.bpeTrainAtScale(spark, dir, target, maxRounds, n)
      val sec = (System.nanoTime() - t0) / 1e9
      val perRound = stats.map(s =>
        f"""{"round":${s.round},"merges":${s.merges},"sec":${s.sec}%.1f,"symbol_rows":${s.symbolRows},"pair_rows":${s.pairRows}}""")
        .mkString("[", ",", "]")
      println(f"""{"metric":"bpe_scale","target":$target,"ngram":$n,"merges":$merges,"rounds":$rounds,"artifacts":${2 + 3 * rounds},"value":$sec%.1f,"unit":"sec","sf":"$dir","per_round":$perRound}""")
    } finally spark.stop()
  }
}
