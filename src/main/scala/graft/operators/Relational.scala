package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core — scans, filters+pushdown, joins (broadcast/shuffle/
  * semi/anti), aggregations (partial+final hash agg), windows, top-k
  * (TakeOrderedAndProject), set ops, rollup. These are the Spark-native
  * operators the reference lacks entirely (SURVEY.md §2.3-2.7 map its
  * dict-hops onto exactly these), exercised on the driver's TPC-H-ish data.
  */
object Relational {

  /** TPC-H Q1 shape: filtered scan → hash agg. Filter + column pruning
    * reach the parquet scan (PushedFilters). */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1999-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // Quantities are integral doubles — their sums are exact at any
        // order. Prices and price products are NOT: a million-row double
        // sum is order-dependent, and at sf1 magnitudes (6e10) the ulp
        // straddles the half-cent round boundary (q13 caught it in the
        // round-13 dress rehearsal). Sum those in DECIMAL — per-row cast
        // is deterministic on both engines, the decimal sum is exact, and
        // the final double cast is one correctly-rounded conversion.
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double"), 2).as("sum_base_price"),
        round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(30,12)")).cast("double"), 2).as("sum_disc_price"),
        // Unrounded averages: quantities are integral (exact double sums)
        // and discounts sum exactly as DECIMAL — both divisions are then
        // bit-identical across engines, while round() itself diverges on
        // decimal half-boundaries (see EventOps.sliding).
        (sum(col("l_quantity")).cast("double") /
          count(lit(1)).cast("double")).as("avg_qty"),
        (sum(col("l_discount").cast("decimal(18,2)")).cast("double") /
          count(lit(1)).cast("double")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       round(sum(l_extendedprice::DECIMAL(18,2))::DOUBLE, 2) AS sum_base_price,
      |       round(sum((l_extendedprice * (1.0 - l_discount))::DECIMAL(30,12))::DOUBLE, 2) AS sum_disc_price,
      |       sum(l_quantity)::DOUBLE / count(*)::DOUBLE AS avg_qty,
      |       sum(l_discount::DECIMAL(18,2))::DOUBLE / count(*)::DOUBLE AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Global top-k — plans as TakeOrderedAndProject (no full sort). */
  def q2TopOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)

  val q2Oracle: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 25""".stripMargin

  /** 3-way join → agg → top-k: revenue per customer. Customer side is
    * broadcast at test scale; at 100 TB AQE picks SMJ/SHJ on the shuffled
    * keys — the plan is declarative either way. */
  def q3RevenueByCustomer(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(c("c_custkey"), c("c_name"))
      .agg(round(sum((l("l_extendedprice") * (lit(1.0) - l("l_discount")))
        .cast("decimal(30,12)")).cast("double"), 2).as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q3Oracle: String =
    """SELECT c_custkey, c_name,
      |       round(sum((l_extendedprice * (1.0 - l_discount))::DECIMAL(30,12))::DOUBLE, 2) AS revenue,
      |       count(*) AS n_lineitems
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** Broadcast dim joins: customer stats per region. */
  def q4RegionStats(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(r("r_name"))
      .agg(count(lit(1)).as("n_customers"),
        round((sum(c("c_acctbal").cast("decimal(18,2)")).cast("double") /
          count(lit(1)).cast("double")), 4).as("avg_acctbal"),
        round(sum(c("c_acctbal").cast("decimal(18,2)"))
          .cast("double"), 2).as("sum_acctbal"))
      .orderBy(r("r_name"))
  }

  val q4Oracle: String =
    """SELECT r_name, count(*) AS n_customers,
      |       round(sum(c_acctbal::DECIMAL(18,2))::DOUBLE / count(*)::DOUBLE, 4) AS avg_acctbal,
      |       round(sum(c_acctbal::DECIMAL(18,2))::DOUBLE, 2) AS sum_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin

  /** Window: top-3 customers per market segment by balance. */
  def q5TopPerSegment(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(spark, dir)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("c_mktsegment"), col("rnk"), col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_mktsegment"), col("rnk"))
  }

  val q5Oracle: String =
    """SELECT c_mktsegment, rnk, c_custkey, c_acctbal
      |FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
      |             row_number() OVER (PARTITION BY c_mktsegment
      |                                ORDER BY c_acctbal DESC, c_custkey) AS rnk
      |      FROM customer)
      |WHERE rnk <= 3
      |ORDER BY c_mktsegment, rnk""".stripMargin

  /** Set op: customers with a high-value order EXCEPT high-balance ones. */
  def q6SetOp(spark: SparkSession, dir: String): DataFrame = {
    val bigSpenders = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 100000.0)
      .select(col("o_custkey").as("c_custkey")).distinct()
    val highBal = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 2000.0).select(col("c_custkey"))
    bigSpenders.except(highBal).orderBy(col("c_custkey"))
  }

  val q6Oracle: String =
    """SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000.0
      |EXCEPT
      |SELECT c_custkey FROM customer WHERE c_acctbal > 2000.0
      |ORDER BY c_custkey""".stripMargin

  /** Anti join: orders with no lineitems (NOT EXISTS). */
  def q7NoOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))
  }

  val q7Oracle: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders o
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  /** Distinct aggregation: per-supplier distinct parts + ship-days. */
  def q8DistinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(date_trunc("day", col("l_shipdate"))).as("n_ship_days"),
        count(lit(1)).as("n_items"))
      .orderBy(col("l_suppkey"))

  val q8Oracle: String =
    """SELECT l_suppkey,
      |       count(DISTINCT l_partkey) AS n_parts,
      |       count(DISTINCT date_trunc('day', l_shipdate)) AS n_ship_days,
      |       count(*) AS n_items
      |FROM lineitem
      |GROUP BY l_suppkey
      |ORDER BY l_suppkey""".stripMargin

  /** Rollup over region → nation (grouping-set aggregation). Null grouping
    * keys from the rollup are coalesced to a sentinel on both sides so the
    * ORDER BY is engine-independent. */
  def q9Rollup(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(r("r_name").as("rn"), n("n_name").as("nn"), c("c_acctbal").as("bal"))
      .rollup(col("rn"), col("nn"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("bal").cast("decimal(18,2)"))
          .cast("double"), 2).as("sum_acctbal"))
      .select(coalesce(col("rn"), lit("<all>")).as("region"),
        coalesce(col("nn"), lit("<all>")).as("nation"),
        col("n_customers"), col("sum_acctbal"))
      .orderBy(col("region"), col("nation"))
  }

  val q9Oracle: String =
    """SELECT coalesce(r_name, '<all>') AS region,
      |       coalesce(n_name, '<all>') AS nation,
      |       count(*) AS n_customers,
      |       round(sum(c_acctbal::DECIMAL(18,2))::DOUBLE, 2) AS sum_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY region, nation""".stripMargin

  /** Exact percentiles (sort-based — no summation-order hazard): median
    * and p95 of order totals per priority. percentile_cont interpolates at
    * p*(n-1) identically to DuckDB's quantile_cont. */
  def q11Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)").as("p50_price"),
        expr("percentile_cont(0.95) WITHIN GROUP (ORDER BY o_totalprice)").as("p95_price"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  val q11Oracle: String =
    """SELECT o_orderpriority,
      |       quantile_cont(o_totalprice, 0.5) AS p50_price,
      |       quantile_cont(o_totalprice, 0.95) AS p95_price,
      |       count(*) AS n_orders
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** CUBE over (orderpriority, orderstatus) — the full grouping-sets
    * lattice (Spark Expand: one pass over the scan produces all 4
    * grouping combinations, then one hash agg; no per-set rescans). */
  def q10Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double"), 2).as("sum_price"))
      .select(coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
        coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
        col("n_orders"), col("sum_price"))
      .orderBy(col("priority"), col("status"))

  val q10Oracle: String =
    """SELECT coalesce(o_orderpriority, '<all>') AS priority,
      |       coalesce(o_orderstatus, '<all>') AS status,
      |       count(*) AS n_orders,
      |       round(sum(o_totalprice::DECIMAL(18,2))::DOUBLE, 2) AS sum_price
      |FROM orders
      |GROUP BY CUBE (o_orderpriority, o_orderstatus)
      |ORDER BY priority, status""".stripMargin

  val SaltBuckets = 16

  /** Skew-safe SALTED aggregation — the explicit two-phase spelling for
    * pathologically heavy keys (here l_returnflag: 3 keys over the whole
    * fact table, the worst-case skew shape). Phase 1 groups by
    * (key, salt) — `SaltBuckets` partial rows per key, so no single
    * reducer sees a whole key's data; phase 2 merges the partials by key.
    * Decimal partial sums keep the merge exact (double re-association
    * across phases would drift), so the result is bit-identical to the
    * direct GROUP BY the oracle runs. Spark's own partial agg does this
    * implicitly for hash aggs; the salted form is the pattern for the
    * cases that DON'T combine map-side (collect_list/distinct-style aggs,
    * or exchange-level skew on a downstream join key) — SCALE.md "Skew". */
  def q12SaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val partial = Tables.lineitem(spark, dir)
      .withColumn("salt", pmod(col("l_orderkey"), lit(SaltBuckets.toLong)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(col("l_quantity")).as("p_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("p_price"),
        count(lit(1)).as("p_n"))
    partial.groupBy(col("l_returnflag"))
      .agg(round(sum(col("p_qty")), 2).as("sum_qty"),
        sum(col("p_price")).cast("double").as("sum_price"),
        sum(col("p_n")).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  val q12Oracle: String =
    """SELECT l_returnflag,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_price,
      |       count(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val JoinBuckets = 8

  /** CO-LOCATED bucketed join — the SCALE.md claim made executable: both
    * fact tables written `bucketBy(JoinBuckets, join key)` + sorted, so
    * the join reads bucket i against bucket i directly and the physical
    * plan has NO Exchange on either join side (verify with PlanAudit:
    * SortMergeJoin over two bucketed scans). At 100 TB this is the
    * difference between shuffling the fact table per query and shuffling
    * it once at ingest; the one-time bucketed write here IS that ingest.
    * Results are oracle-identical to the plain join, which is the point —
    * bucketing is a layout decision, not a semantic one. */
  def q13BucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val ordersTbl = graft.Materialize.ensureBucketedTable(
      spark, "graft_orders_b", dir, version = 1, JoinBuckets, "o_orderkey") {
      Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderpriority"))
    }
    val lineitemTbl = graft.Materialize.ensureBucketedTable(
      spark, "graft_lineitem_b", dir, version = 1, JoinBuckets, "l_orderkey") {
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    }
    val o = spark.table(ordersTbl)
    val l = spark.table(lineitemTbl)
    // merge hint: at gate scale Spark would broadcast the small side and
    // never touch the bucket layout; the hint pins the SortMergeJoin that
    // a 100 TB fact-fact join gets anyway, showing zero join-side Exchange.
    l.join(o.hint("merge"), l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(30,12)")).cast("double"), 2).as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("o_orderpriority"))
  }

  val q13Oracle: String =
    """SELECT o_orderpriority,
      |       round(sum((l_extendedprice * (1.0 - l_discount))::DECIMAL(30,12))::DOUBLE, 2) AS revenue,
      |       count(*) AS n_lineitems
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  val BloomCutoff = 300000.0
  val BloomEstItems = 20000L
  val BloomNumBits = 320000L

  /** Bloom-pruned semi join — the pre-shuffle reduction pattern for
    * selective fact⋈dim filters: the filtered orders keys are folded into
    * a bloom filter (ONE binary blob, evaluated as a scalar subquery, so
    * the probe is a codegen'd filter INSIDE the lineitem scan stage), and
    * only might-contain survivors reach the exchange; the exact semi join
    * then removes the bloom's false positives, so results are identical to
    * the plain semi join the oracle runs. At 100 TB this is what Spark's
    * own InjectRuntimeFilter does when its 10 GB thresholds fire — spelled
    * explicitly here because the engine KNOWS the build side is selective
    * (the optimizer's size heuristics never fire at test scale). Decimal
    * sum: parallel double summation over ~29k rows is order-
    * nondeterministic; the DECIMAL(18,2) sum is exact, cast once. */
  def q14BloomSemi(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.SketchFunctions._
    val keys = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > BloomCutoff)
      .select(col("o_orderkey"))
    val bloom = keys.agg(
      bloomFilterAgg(col("o_orderkey"), BloomEstItems, BloomNumBits).as("bf"))
    val l = Tables.lineitem(spark, dir)
      .filter(mightContain(bloom.scalar(), col("l_orderkey")))
    l.join(keys, l("l_orderkey") === keys("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
        count(lit(1)).as("n_items"))
      .orderBy(col("l_returnflag"))
  }

  val q14Oracle: String =
    s"""SELECT l_returnflag,
       |       sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_price,
       |       count(*) AS n_items
       |FROM lineitem
       |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
       |                     WHERE o_totalprice > $BloomCutoff)
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin

  val SkewSalts = 8L

  /** Salt-replicated skew JOIN (completes q12's salted AGG): a hot join key
    * concentrates its fact rows in one shuffle partition; salting splits
    * each key across `SkewSalts` partitions by replicating the dim side
    * once per salt (|dim|×S rows — cheap, dims are small) and giving every
    * fact row a deterministic salt from non-key columns. The join condition
    * becomes (key, salt) so each hot key's rows spread across S reducers.
    * `shuffle_hash` hint forces the shuffled join the technique targets —
    * at gate scale Spark would otherwise broadcast the dim and hide the
    * skew entirely (which IS the first-choice fix; salting is for when
    * both sides are too big to broadcast). Results are salt-invariant:
    * the oracle is the plain unsalted join. */
  def q15SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_name"))
      .withColumn("salt", explode(sequence(lit(0L), lit(SkewSalts - 1))))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_quantity"),
        pmod(col("l_orderkey") * 31L + col("l_linenumber").cast("long"),
          lit(SkewSalts)).as("lsalt"))
    l.join(s.hint("shuffle_hash"),
        l("l_suppkey") === s("s_suppkey") && l("lsalt") === s("salt"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy(col("s_name"))
  }

  val q15Oracle: String =
    """SELECT s_name, count(*) AS n_items,
      |       sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name
      |ORDER BY s_name""".stripMargin

  /** INTERSECT (completing the set-op class beside q6's EXCEPT): customers
    * active in BOTH halves of the order date range. Spark plans set
    * intersection as a left-semi hash join over distincts — same shuffle
    * cost as the equivalent semi join, but the declarative form keeps both
    * branches visible to Catalyst for pushdown. */
  def q16SetopIntersect(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val mid = "1998-01-01"
    val early = o.filter(col("o_orderdate") < lit(mid).cast("timestamp"))
      .select(col("o_custkey"))
    val late = o.filter(col("o_orderdate") >= lit(mid).cast("timestamp"))
      .select(col("o_custkey"))
    early.intersect(late)
      .orderBy(col("o_custkey"))
  }

  val q16Oracle: String =
    """SELECT o_custkey FROM orders WHERE o_orderdate < '1998-01-01'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderdate >= '1998-01-01'
      |ORDER BY o_custkey""".stripMargin

  /** NTILE quartile banding WITHIN each order priority (a global ntile is
    * a single-partition sort — the per-group form parallelizes across
    * priorities, which is how percentile banding should run at scale).
    * The (price, key) order is total, so tile assignment is deterministic
    * and identical on both engines; per-band extrema are plain min/max. */
  def q17Ntile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .groupBy(col("o_orderpriority"), col("quartile"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy(col("o_orderpriority"), col("quartile"))
  }

  val q17Oracle: String =
    """WITH t AS (SELECT o_orderpriority, o_totalprice,
      |             ntile(4) OVER (PARTITION BY o_orderpriority
      |                            ORDER BY o_totalprice, o_orderkey)::BIGINT AS quartile
      |           FROM orders)
      |SELECT o_orderpriority, quartile, count(*) AS n_orders,
      |       min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
      |FROM t GROUP BY o_orderpriority, quartile
      |ORDER BY o_orderpriority, quartile""".stripMargin
}
