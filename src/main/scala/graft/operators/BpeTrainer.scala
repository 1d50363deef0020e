package graft.operators

import graft.Tables
import graft.functions.TextFunctions.tokens
import graft.oracle.OracleSql
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. 2016,
  * arXiv:1508.07909) — the subword-vocabulary job a training-data
  * pipeline runs before token counting means anything. The exact
  * production shape: the CORPUS is scanned once (word → occurrence
  * count); every merge iteration then runs over the VOCABULARY-sized
  * symbol relation (word, idx, sym) — millions of distinct words at
  * 100 TB, never the corpus — with
  *  - pair counts as a lead-window + map-side-combinable weighted sum,
  *  - the merge pick as a deterministic argmax (count desc, pair asc —
  *    reference implementations break ties arbitrarily; a total order is
  *    what makes the training replicable at all),
  *  - greedy left-to-right non-overlapping application spelled
  *    relationally: match positions → runs of consecutive matches
  *    (gaps-and-islands) → keep the EVEN offsets within each run (the
  *    run-parity rule is exactly "merge the 1st, 3rd, … occurrence of an
  *    overlapping chain", i.e. what the sequential reference loop does
  *    to "aaaa": [aa, aa]) → drop consumed positions, re-index.
  * Each iteration's symbol relation and chosen pair are MATERIALIZED
  * (write-once artifacts): the per-round persist that keeps the plan
  * linear — the in-plan fold re-derives s_{t-1} for every consumer and
  * Catalyst would re-analyze a 4^K-node tree (the dedup_transitive
  * lesson). All arithmetic is integer; both gate rows are bit-exact
  * against DuckDB's unrolled MATERIALIZED-CTE replica of the same fold.
  */
object BpeTrainer {

  val BpeMerges = 6

  /** (word, cnt) — the ONLY corpus-sized stage. */
  private def wordCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(tokens(lower(col("text")))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Initial symbol relation: one row per (word, char position). */
  private def symbols0(wc: DataFrame): DataFrame = {
    val chars = transform(sequence(lit(1), length(col("word"))),
      i => col("word").substr(i, lit(1)))
    wc.select(col("word"), col("cnt"), posexplode(chars).as(Seq("idx", "sym")))
      .select(col("word"), col("cnt"), col("idx").cast("long").as("idx"), col("sym"))
  }

  private def withNext(s: DataFrame): DataFrame =
    s.withColumn("nxt", lead(col("sym"), 1).over(
      Window.partitionBy(col("word")).orderBy(col("idx"))))

  /** The iteration's merge: argmax of corpus-weighted adjacent-pair
    * counts, total-ordered tiebreak. One row (a, b, c). */
  private def bestPair(s: DataFrame): DataFrame =
    withNext(s).filter(col("nxt").isNotNull)
      .groupBy(col("sym"), col("nxt")).agg(sum(col("cnt")).as("c"))
      .select(col("sym").as("a"), col("nxt").as("b"), col("c"))
      .orderBy(col("c").desc, col("a"), col("b")).limit(1)

  /** Greedy non-overlapping application of the (a, b) merge:
    * run-parity selection over match positions, consumed rows dropped,
    * survivors re-indexed densely. */
  private def applyMerge(s: DataFrame, b: DataFrame): DataFrame = {
    val n = withNext(s)
    val m = n.join(broadcast(b), n("sym") === b("a") && n("nxt") === b("b"))
      .select(col("word").as("m_word"), col("idx").as("m_idx"))
    val sel = m
      .withColumn("run", col("m_idx") - row_number().over(
        Window.partitionBy(col("m_word")).orderBy(col("m_idx"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("m_word"), col("run")).orderBy(col("m_idx"))))
      .filter(col("rn") % 2 === 1).select(col("m_word"), col("m_idx"))
    val selI = sel.select(col("m_word").as("i_word"), col("m_idx").as("i_idx"))
    val selP = sel.select(col("m_word").as("p_word"), col("m_idx").as("p_idx"))
    s.crossJoin(broadcast(b))
      .join(broadcast(selI),
        col("word") === col("i_word") && col("idx") === col("i_idx"), "left")
      .join(broadcast(selP),
        col("word") === col("p_word") && col("idx") === col("p_idx") + 1, "left")
      .filter(col("p_idx").isNull)
      .select(col("word"), col("cnt"), col("idx"),
        when(col("i_idx").isNotNull, concat(col("sym"), col("b")))
          .otherwise(col("sym")).as("sym"))
      .withColumn("new_idx", row_number().over(
        Window.partitionBy(col("word")).orderBy(col("idx"))).cast("long") - 1)
      .select(col("word"), col("cnt"), col("new_idx").as("idx"), col("sym"))
  }

  /** Materialized training chain; returns (bPath, sPath) of iteration t. */
  private def ensureIter(spark: SparkSession, dir: String, t: Int): (String, String) = {
    val sPrev =
      if (t == 1)
        graft.Materialize.ensure(spark, "graft_bpe_s0", dir, version = 1) { p =>
          symbols0(wordCounts(spark, dir)).write.mode("overwrite").parquet(p)
        }
      else ensureIter(spark, dir, t - 1)._2
    val bPath = graft.Materialize.ensure(spark, s"graft_bpe_b$t", dir, version = 1) { p =>
      bestPair(spark.read.parquet(sPrev)).write.mode("overwrite").parquet(p)
    }
    val sPath = graft.Materialize.ensure(spark, s"graft_bpe_s$t", dir, version = 1) { p =>
      applyMerge(spark.read.parquet(sPrev), spark.read.parquet(bPath))
        .write.mode("overwrite").parquet(p)
    }
    (bPath, sPath)
  }

  /** Gate query: the learned merge table — iteration, pair, merged
    * symbol, corpus-weighted pair count. */
  def bpeMerges(spark: SparkSession, dir: String, k: Int = BpeMerges): DataFrame =
    (1 to k).map { t =>
      spark.read.parquet(ensureIter(spark, dir, t)._1)
        .select(lit(t.toLong).as("iter"), col("a").as("pair_a"), col("b").as("pair_b"),
          concat(col("a"), col("b")).as("merged"), col("c").as("pair_count"))
    }.reduce(_ union _).orderBy(col("iter"))

  /** Gate query: per-doc BPE piece count under the learned merges — the
    * real "LLM token cost" number text_tokens approximates with a regex.
    * One narrow corpus pass joined to the vocabulary-sized piece table. */
  def bpeEncode(spark: SparkSession, dir: String, k: Int = BpeMerges): DataFrame = {
    val sK = spark.read.parquet(ensureIter(spark, dir, k)._2)
    val pieces = sK.groupBy(col("word")).agg(count(lit(1)).as("n_sym"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(lower(col("text")))).as("word"))
      .join(pieces, "word")
      .groupBy(col("doc_id")).agg(sum(col("n_sym")).as("n_pieces"))
      .orderBy(col("doc_id"))
  }

  /** Un-materialized in-plan fold over an explicit corpus — spec-only
    * (crafted tiny inputs; the 4^k plan growth is why the gate path
    * materializes per iteration). Returns (merges, finalSymbols). */
  private[graft] def trainOver(docs: DataFrame, k: Int): (DataFrame, DataFrame) = {
    val s0 = symbols0(docs.select(explode(tokens(lower(col("text")))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt")))
    val (merges, sK) = (1 to k).foldLeft((Seq.empty[DataFrame], s0)) {
      case ((ms, s), t) =>
        val b = bestPair(s)
        val tagged = b.select(lit(t.toLong).as("iter"), col("a").as("pair_a"),
          col("b").as("pair_b"), concat(col("a"), col("b")).as("merged"),
          col("c").as("pair_count"))
        (ms :+ tagged, applyMerge(s, b))
    }
    (merges.reduce(_ union _).orderBy(col("iter")), sK)
  }

  // ------------------------------------------------------------- oracle

  /** MATERIALIZED CTE chain `t, wc, s0, n1, pc1, b1, m1, r1, sel1, s1, …`
    * reproducing the fold — MATERIALIZED is required: s_t is referenced
    * by four consumers and DuckDB's default inlining makes the chain
    * exponential (measured: >120 s inlined, 0.6 s materialized). */
  def trainCtes(k: Int): String = {
    val toks = OracleSql.tokens("lower(text)")
    val head =
      s"""t AS MATERIALIZED (SELECT unnest($toks) AS word FROM documents),
         |wc AS MATERIALIZED (SELECT word, count(*)::BIGINT AS cnt FROM t GROUP BY word),
         |s0 AS MATERIALIZED (SELECT word, cnt,
         |        unnest(range(0, length(word))) AS idx,
         |        unnest(list_transform(range(1, length(word) + 1), i -> substring(word, i::INT, 1))) AS sym
         |       FROM wc)""".stripMargin
    val steps = (1 to k).map { t =>
      val p = t - 1
      s"""n$t AS MATERIALIZED (SELECT word, cnt, idx, sym,
         |         lead(sym) OVER (PARTITION BY word ORDER BY idx) AS nxt
         |       FROM s$p),
         |pc$t AS (SELECT sym AS a, nxt AS b, sum(cnt)::BIGINT AS c
         |        FROM n$t WHERE nxt IS NOT NULL GROUP BY sym, nxt),
         |b$t AS MATERIALIZED (SELECT a, b, c FROM pc$t ORDER BY c DESC, a, b LIMIT 1),
         |m$t AS (SELECT n.word, n.idx FROM n$t n JOIN b$t b ON n.sym = b.a AND n.nxt = b.b),
         |r$t AS (SELECT word, idx,
         |          idx - row_number() OVER (PARTITION BY word ORDER BY idx) AS run
         |        FROM m$t),
         |sel$t AS MATERIALIZED (SELECT word, idx FROM (
         |          SELECT word, idx, row_number() OVER (PARTITION BY word, run ORDER BY idx) AS rn
         |          FROM r$t) WHERE rn % 2 = 1),
         |s$t AS MATERIALIZED (SELECT s.word, s.cnt,
         |          row_number() OVER (PARTITION BY s.word ORDER BY s.idx) - 1 AS idx,
         |          CASE WHEN si.idx IS NOT NULL THEN s.sym || b.b ELSE s.sym END AS sym
         |        FROM s$p s
         |        CROSS JOIN b$t b
         |        LEFT JOIN sel$t si ON si.word = s.word AND si.idx = s.idx
         |        LEFT JOIN sel$t sp ON sp.word = s.word AND sp.idx = s.idx - 1
         |        WHERE sp.idx IS NULL)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  def bpeMergesOracle(k: Int = BpeMerges): String = {
    val rows = (1 to k).map { t =>
      s"SELECT $t::BIGINT AS iter, a AS pair_a, b AS pair_b, a || b AS merged, c AS pair_count FROM b$t"
    }.mkString("\n UNION ALL ")
    s"""WITH ${trainCtes(k)}
       |$rows
       |ORDER BY iter""".stripMargin
  }

  def bpeEncodeOracle(k: Int = BpeMerges): String = {
    val toks = OracleSql.tokens("lower(text)")
    s"""WITH ${trainCtes(k)},
       |pieces AS (SELECT word, count(*)::BIGINT AS n_sym FROM s$k GROUP BY word),
       |d AS (SELECT doc_id, unnest($toks) AS word FROM documents)
       |SELECT d.doc_id, sum(p.n_sym)::BIGINT AS n_pieces
       |FROM d JOIN pieces p USING (word)
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
  }
}
