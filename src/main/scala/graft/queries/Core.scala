package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Core relational analytics (SURVEY.md §2.1) — the lakehouse query
  * surface the reference's zones are meant to serve (analytics over
  * gold-zone tables, cf. /root/reference/README.md:15-36).
  *
  * Determinism contract with the DuckDB oracle: money/value aggregates
  * are summed as exact integer cents (`sum(round(x*100) as long)`).
  * Double *reductions* are order-dependent across engines; integer sums
  * are not, and per-row double arithmetic is bit-identical IEEE-754 in
  * both engines. Ratios/averages are derived from the exact integer
  * parts with scalar ops. Top-k/window orderings always carry a total
  * tie-break on a key column.
  */
object Core {

  /** Exact money-as-cents: per-row double math is deterministic; the
    * reduction happens on longs. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** TPC-H Q1 shape: one wide scan → partial-agg (map-side combine) →
    * final agg on 6 tiny groups. At 100 TB this is scan-bound; no join,
    * no wide shuffle (6 groups). */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_cents"),
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))).as("sum_charge_cents"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty").cast("double") / col("count_order"))

  /** Filter + projection — both must reach the parquet scan
    * (PushedFilters / ReadSchema in explain). */
  def q02FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1997-06-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-09-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_quantity") < 24)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        cents(col("l_extendedprice")).as("price_cents"),
        col("l_returnflag"))

  /** Fact ⋈ broadcast dim: customer is tiny relative to orders at any
    * SF — explicitly broadcast so no shuffle of the fact side. */
  def q03JoinAgg(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
    val customer = Tables(s, dir, "customer")
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("revenue_cents"))
  }

  /** 5-way star join: lineitem⋈orders shuffles on orderkey; all dims
    * broadcast. Group keys are low-cardinality (region × nation). */
  def q04MultiJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val o = Tables(s, dir, "orders")
    val c = Tables(s, dir, "customer")
    val n = Tables(s, dir, "nation")
    val r = Tables(s, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_lineitems"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_cents"))
  }

  /** Global top-k: partial agg per customer, then a k-row ordered take.
    * Spark's takeOrdered on the agg output avoids a full sort. */
  def q05TopK(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
    val customer = Tables(s, dir, "customer")
    orders
      .groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("total_cents"),
        count(lit(1)).as("n_orders"))
      .join(broadcast(customer), col("o_custkey") === customer("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("total_cents"), col("n_orders"))
      .orderBy(col("total_cents").desc, col("c_custkey").asc)
      .limit(10)
  }

  /** Windowed top-n per group: row_number over (custkey | price desc,
    * orderkey) — single shuffle on the partition key. */
  def q06WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables(s, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        cents(col("o_totalprice")).as("price_cents"), col("rn"))
  }

  /** EXISTS as left-semi join (no row multiplication, keys only). */
  def q07SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val customer = Tables(s, dir, "customer")
    val fOrders = Tables(s, dir, "orders").filter(col("o_orderstatus") === "F")
    customer
      .join(fOrders, customer("c_custkey") === fOrders("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** NOT EXISTS as left-anti join: customers with no in-progress ('P')
    * orders. */
  def q08AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val customer = Tables(s, dir, "customer")
    val pOrders = Tables(s, dir, "orders").filter(col("o_orderstatus") === "P")
    customer
      .join(pOrders, customer("c_custkey") === pOrders("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), cents(col("c_acctbal")).as("acctbal_cents"))
  }

  /** Exact distinct counts per group (two-phase distinct aggregation). */
  def q09DistinctAgg(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))

  /** ROLLUP region→nation subtotals; null grouping keys coalesced to a
    * sentinel so both engines sort/hash them identically. */
  def q10Rollup(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer")
    val n = Tables(s, dir, "nation")
    val r = Tables(s, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(cents(col("c_acctbal"))).as("acctbal_cents"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_customers"), col("acctbal_cents"))
  }

  /** Tumbling 1-hour windows over the event stream (batch form of the
    * streaming agg, SURVEY #42). Bucketing on exact integer nanos. */
  def q11EventWindows(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        expr("ts_ns div 3600000000000").as("hour_id"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("value_cents"))

  /** Gap-based sessionization (30 min idle → new session): lag + running
    * sum over a per-user window, then per-session rollup. One shuffle on
    * user_id; at 100 TB this is the canonical shuffle-once sessionize. */
  def q12Sessionize(s: SparkSession, dir: String): DataFrame = {
    // Work in microseconds: DuckDB reads the ns timestamps at µs
    // precision, so µs is the shared exact grid.
    val gapUs = 1800L * 1000000L // 30 min in micros
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    Tables.events(s, dir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess_seq",
        sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        sum(cents(col("value"))).as("value_cents"))
  }

  /** Orders above their customer's average order value (decorrelated
    * subquery shape: agg once, join back). */
  def q13AboveAvg(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
    val avgp = orders.groupBy(col("o_custkey").as("k"))
      .agg((sum(cents(col("o_totalprice"))).cast("double") / count(lit(1))).as("avg_cents"))
    orders.join(avgp, orders("o_custkey") === avgp("k"))
      .filter(cents(col("o_totalprice")).cast("double") > col("avg_cents"))
      .select(col("o_orderkey"), col("o_custkey"),
        cents(col("o_totalprice")).as("price_cents"))
  }

  /** Conditional aggregation: share of revenue from small-size parts
    * (TPC-H Q14 shape). Single join + single-row output. */
  def q14ConditionalAgg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val p = Tables(s, dir, "part")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .agg(
        coalesce(sum(when(col("p_size") < 10,
          cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))), lit(0L))
          .as("small_cents"),
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("total_cents"))
      .withColumn("small_share",
        col("small_cents").cast("double") / col("total_cents").cast("double"))
  }

  /** q17 — per-user moving window over the event stream: sum/avg of the
    * last 3 events (ROWS frame). One shuffle on user_id; frame stays
    * integer-exact (cents) for the oracle. */
  def q17MovingAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
      .rowsBetween(-2, 0)
    Tables.events(s, dir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("value_cents", cents(col("value")))
      .select(col("user_id"), col("event_id"), col("value_cents"),
        sum(col("value_cents")).over(w).as("mov_sum_cents"),
        count(lit(1)).over(w).as("mov_n"))
      .withColumn("mov_avg",
        col("mov_sum_cents").cast("double") / col("mov_n"))
  }

  /** q18 — discrete percentiles (median, p95) of order value per
    * priority, via explicit rank selection: position arithmetic on exact
    * integers, no interpolation, so both engines pick the same row.
    *
    * Value-distribution form (round-11, [[graft.operators.Banding]]):
    * the value at rank ceil(n·f) depends only on
    * `groupBy(priority, value).count()`, so the cumulative window runs
    * over the value-cardinality relation — never a row-relation sort
    * inside the 5 `o_orderpriority` partitions (5 reducers sorting the
    * whole table at 100×). */
  def q18PercentileDisc(s: SparkSession, dir: String): DataFrame = {
    val below = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("price_cents").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.partitionBy(col("o_orderpriority"))
    val vc = Tables(s, dir, "orders")
      .select(col("o_orderpriority"),
        cents(col("o_totalprice")).as("price_cents"))
      .groupBy(col("o_orderpriority"), col("price_cents"))
      .agg(count(lit(1)).as("_vc"))
      .withColumn("_below", coalesce(sum(col("_vc")).over(below), lit(0L)))
      .withColumn("_n", sum(col("_vc")).over(whole))
    // the value whose cumulative span [_below+1, _below+_vc] covers the
    // target rank IS the discrete percentile — one group matches each
    def at(f: Double) = {
      val target = ceil(col("_n") * f)
      max(when(target > col("_below") &&
        target <= col("_below") + col("_vc"), col("price_cents")))
    }
    vc.groupBy(col("o_orderpriority"))
      .agg(max(col("_n")).as("n_orders"),
        at(0.5).as("median_cents"),
        at(0.95).as("p95_cents"))
  }

  /** q19 (rows-only) — sketch-based distinct counts: HLL++ per group
    * plus a mergeable HLL sketch union across groups. At 100 TB this
    * replaces q09's exact expand-based distinct (whose shuffle carries
    * every distinct value); sketches shrink the shuffle to KBs per
    * group. Accuracy vs the exact counts is asserted in ScalaTest. */
  def q19ApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    val perGroup = Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        hll_sketch_agg(col("l_suppkey")).as("supp_sketch"),
        count(lit(1)).as("n_rows"))
    perGroup.agg(
      sum(col("approx_parts")).as("sum_group_approx_parts"),
      hll_sketch_estimate(hll_union_agg(col("supp_sketch")))
        .as("approx_supps_merged"),
      sum(col("n_rows")).as("n_rows"))
  }

  /** q22 (rows-only) — KMV set-overlap sketches: distinct-count,
    * Jaccard, and intersection-size estimates between the order
    * customers and the telemetry users, via the custom
    * [[graft.functions.KmvSketchAgg]] aggregate. Intersection is what
    * HLL cannot estimate; the shuffled state is ≤ k longs per side
    * regardless of table size. Accuracy vs exact is asserted in
    * ScalaTest. */
  def q22KmvOverlap(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val a = Tables(s, dir, "orders")
      .agg(expr("kmv_sketch(xxhash64(o_custkey), 256)").as("sk_a"))
    val b = Tables.events(s, dir)
      .agg(expr("kmv_sketch(xxhash64(user_id), 256)").as("sk_b"))
    a.crossJoin(b).select(
      expr("kmv_estimate(sk_a, 256)").as("est_order_customers"),
      expr("kmv_estimate(sk_b, 256)").as("est_event_users"),
      expr("kmv_jaccard(sk_a, sk_b, 256)").as("jaccard_est"),
      expr("kmv_intersect(sk_a, sk_b, 256)").as("intersect_est"))
  }

  /** q22b_kmv_md5 — [[q22KmvOverlap]]'s sketch path with the ENGINE-
    * PORTABLE hash instead of xxhash64: the same `kmv_sketch` /
    * `kmv_estimate` / `kmv_jaccard` / `kmv_intersect` aggregate and
    * scalars, fed [[graft.operators.Sampling.hashBucket]]'s 60-bit
    * md5 values, which DuckDB reproduces bit-for-bit — so the driver
    * gate hash-checks the WHOLE KMV machinery (k-min maintenance,
    * (k−1)/fraction estimation, k-min-union Jaccard, intersection)
    * end to end. Every float step is IEEE-exact (+,−,×,÷ on
    * exactly-converted longs), the [[graft.operators.Dsir]]-style
    * libm exception does not arise. xxhash64 stays the production
    * hash (one codegen'd instruction vs md5's digest). */
  def q22KmvMd5(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val a = Tables(s, dir, "orders")
      .select(graft.operators.Sampling.hashBucket(col("o_custkey")).as("h"))
      .agg(expr("kmv_sketch(h, 256)").as("sk_a"))
    val b = Tables.events(s, dir)
      .select(graft.operators.Sampling.hashBucket(col("user_id")).as("h"))
      .agg(expr("kmv_sketch(h, 256)").as("sk_b"))
    a.crossJoin(b).select(
      expr("kmv_estimate(sk_a, 256)").as("est_order_customers"),
      expr("kmv_estimate(sk_b, 256)").as("est_event_users"),
      expr("kmv_jaccard(sk_a, sk_b, 256)").as("jaccard_est"),
      expr("kmv_intersect(sk_a, sk_b, 256)").as("intersect_est"))
  }

  /** q20 — the SQL-string surface: tables registered as temp views, the
    * query is ANSI SQL through `spark.sql` (same text shape as the
    * oracle). Correlated EXISTS decorrelates to a semi-join; Catalyst
    * plans it identically to the DataFrame form. */
  def q20SqlSurface(s: SparkSession, dir: String): DataFrame = {
    Seq("orders", "customer", "nation").foreach { t =>
      Tables(s, dir, t).createOrReplaceTempView(t)
    }
    s.sql("""
      SELECT n.n_name AS nation,
        COUNT(*) AS n_customers,
        CAST(SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
          AS acctbal_cents
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 100000)
      GROUP BY n.n_name""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q17_moving_avg" -> q17MovingAvg,
    "q20_sql_surface" -> q20SqlSurface,
    "q18_percentile_disc" -> q18PercentileDisc,
    "q19_approx_distinct" -> q19ApproxDistinct,
    "q22_kmv_overlap" -> q22KmvOverlap,
    "q22b_kmv_md5" -> q22KmvMd5,
    "q01_pricing_summary" -> q01PricingSummary,
    "q02_filter_project" -> q02FilterProject,
    "q03_join_agg" -> q03JoinAgg,
    "q04_multi_join" -> q04MultiJoin,
    "q05_topk" -> q05TopK,
    "q06_window_rank" -> q06WindowRank,
    "q07_semi_join" -> q07SemiJoin,
    "q08_anti_join" -> q08AntiJoin,
    "q09_distinct_agg" -> q09DistinctAgg,
    "q10_rollup" -> q10Rollup,
    "q11_event_windows" -> q11EventWindows,
    "q12_sessionize" -> q12Sessionize,
    "q13_above_avg" -> q13AboveAvg,
    "q14_conditional_agg" -> q14ConditionalAgg)

  /** q22b_kmv_md5 oracle: the KMV machinery replayed value-for-value —
    * the k-min sketch is a DISTINCT + ORDER BY + LIMIT k, the
    * estimator mirrors Kmv.estimate's exact expression tree
    * ((k−1) / (((uns(h) − MIN_LONG) + 1) / 2^64), uns = XOR with the
    * sign bit, every conversion IEEE round-to-nearest on both
    * engines), Jaccard the k-min-union membership ratio, intersection
    * jaccard × union-estimate. power(2.0, 64) is exactly 2^64 in any
    * libm (a power of two), matching Scala's math.pow. */
  private val q22KmvMd5Oracle: String = {
    val k = 256
    def hb(c: String) =
      s"CAST(('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 15)) AS BIGINT)"
    val minL = "(-9223372036854775807 - 1)"
    def frac(h: String) =
      s"""((CAST(xor($h, $minL) AS DOUBLE) -
           CAST($minL AS DOUBLE) + 1.0) / power(2.0, 64))"""
    def est(n: String, mx: String) =
      s"""CASE WHEN $n < $k THEN CAST($n AS DOUBLE)
          ELSE ${(k - 1).toDouble} / ${frac(mx)} END"""
    s"""
      WITH ska AS MATERIALIZED (
        SELECT h FROM (SELECT DISTINCT ${hb("o_custkey")} AS h
                       FROM orders) ORDER BY h LIMIT $k),
      skb AS MATERIALIZED (
        SELECT h FROM (SELECT DISTINCT ${hb("user_id")} AS h
                       FROM events) ORDER BY h LIMIT $k),
      u AS MATERIALIZED (
        SELECT h FROM (SELECT h FROM ska UNION SELECT h FROM skb)
        ORDER BY h LIMIT $k),
      sa AS (SELECT COUNT(*) AS n, MAX(h) AS mx FROM ska),
      sb AS (SELECT COUNT(*) AS n, MAX(h) AS mx FROM skb),
      su AS (SELECT COUNT(*) AS n, MAX(h) AS mx FROM u),
      ji AS (
        SELECT CAST(SUM(CASE WHEN u.h IN (SELECT h FROM ska)
            AND u.h IN (SELECT h FROM skb) THEN 1 ELSE 0 END) AS DOUBLE)
            AS hits,
          COUNT(*) AS ul
        FROM u)
      SELECT
        ${est("sa.n", "sa.mx")} AS est_order_customers,
        ${est("sb.n", "sb.mx")} AS est_event_users,
        ji.hits / ji.ul AS jaccard_est,
        (ji.hits / ji.ul) * ${est("su.n", "su.mx")} AS intersect_est
      FROM sa, sb, su, ji"""
  }

  val oracleSql: Map[String, String] = Map(
    "q22b_kmv_md5" -> q22KmvMd5Oracle,
    "q20_sql_surface" -> """
      SELECT n.n_name AS nation,
        COUNT(*) AS n_customers,
        CAST(SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
          AS acctbal_cents
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 100000)
      GROUP BY n.n_name""",
    "q17_moving_avg" -> """
      SELECT user_id, event_id,
        CAST(round(value*100) AS BIGINT) AS value_cents,
        CAST(SUM(CAST(round(value*100) AS BIGINT)) OVER w AS BIGINT)
          AS mov_sum_cents,
        COUNT(*) OVER w AS mov_n,
        CAST(SUM(CAST(round(value*100) AS BIGINT)) OVER w AS DOUBLE)
          / COUNT(*) OVER w AS mov_avg
      FROM events
      WINDOW w AS (PARTITION BY user_id
        ORDER BY epoch_us(ts) ASC, event_id ASC
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""",
    "q18_percentile_disc" -> """
      WITH priced AS (
        SELECT o_orderpriority, o_orderkey,
          CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
        FROM orders),
      ranked AS (
        SELECT *,
          CAST(row_number() OVER (PARTITION BY o_orderpriority
            ORDER BY price_cents ASC, o_orderkey ASC) AS BIGINT) AS rn,
          COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM priced)
      SELECT o_orderpriority, MAX(n) AS n_orders,
        MAX(CASE WHEN rn = CEIL(n * 0.5) THEN price_cents END)
          AS median_cents,
        MAX(CASE WHEN rn = CEIL(n * 0.95) THEN price_cents END)
          AS p95_cents
      FROM ranked GROUP BY o_orderpriority""",
    "q01_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
        CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*(1.0+l_tax)*100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
        COUNT(*) AS count_order,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      GROUP BY l_returnflag, l_linestatus""",
    "q02_filter_project" -> """
      SELECT l_orderkey, l_linenumber,
        CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents, l_returnflag
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-06-01' AND l_shipdate < TIMESTAMP '1997-09-01'
        AND l_discount >= 0.05 AND l_quantity < 24""",
    "q03_join_agg" -> """
      SELECT c_mktsegment, COUNT(*) AS n_orders,
        CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment""",
    "q04_multi_join" -> """
      SELECT r_name, n_name, COUNT(*) AS n_lineitems,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name""",
    "q05_topk" -> """
      SELECT c_custkey, c_name, total_cents, n_orders FROM (
        SELECT o_custkey,
          CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents,
          COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey) t
      JOIN customer ON o_custkey = c_custkey
      ORDER BY total_cents DESC, c_custkey ASC LIMIT 10""",
    "q06_window_rank" -> """
      SELECT o_custkey, o_orderkey,
        CAST(round(o_totalprice*100) AS BIGINT) AS price_cents, rn
      FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
        FROM orders) t
      WHERE rn <= 3""",
    "q07_semi_join" -> """
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""",
    "q08_anti_join" -> """
      SELECT c_custkey, c_name,
        CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""",
    "q09_distinct_agg" -> """
      SELECT l_returnflag,
        COUNT(DISTINCT l_partkey) AS n_parts,
        COUNT(DISTINCT l_suppkey) AS n_supps,
        COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag""",
    "q10_rollup" -> """
      SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        COUNT(*) AS n_customers,
        CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS acctbal_cents
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)""",
    "q11_event_windows" -> """
      SELECT epoch_ns(ts) // 3600000000000 AS hour_id, event_type,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
      FROM events GROUP BY 1, 2""",
    "q12_sessionize" -> """
      WITH flagged AS (
        SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
          CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
               THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)
      ), sess AS (
        SELECT user_id, event_id, value, ts_us,
          CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_seq
        FROM flagged
      )
      SELECT user_id, sess_seq, COUNT(*) AS n_events,
        MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
        CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
      FROM sess GROUP BY user_id, sess_seq""",
    "q13_above_avg" -> """
      SELECT o_orderkey, o_custkey,
        CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
      FROM orders
      JOIN (
        SELECT o_custkey AS k,
          CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_cents
        FROM orders GROUP BY o_custkey) t ON o_custkey = k
      WHERE CAST(CAST(round(o_totalprice*100) AS BIGINT) AS DOUBLE) > avg_cents""",
    "q14_conditional_agg" -> """
      SELECT
        coalesce(CAST(SUM(CASE WHEN p_size < 10
          THEN CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT) END) AS BIGINT), 0) AS small_cents,
        CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS total_cents,
        CAST(coalesce(CAST(SUM(CASE WHEN p_size < 10
          THEN CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT) END) AS BIGINT), 0) AS DOUBLE)
          / CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS DOUBLE) AS small_share
      FROM lineitem JOIN part ON l_partkey = p_partkey""")
}
