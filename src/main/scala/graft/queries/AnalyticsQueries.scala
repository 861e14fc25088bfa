package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 analytics surface (SURVEY §2d): the remaining relational
  * shapes a lakehouse query layer owes its users beyond §2.1 —
  * PIVOT, set operations, funnel/cohort event analytics, histograms.
  * All hash-checked against DuckDB.
  *
  * Scale notes (100 TB):
  *  - q24 declares its pivot values, so Spark skips the
  *    collect-distinct driver pass and plans ONE partial+final agg —
  *    a pivot without declared values is a hidden two-job plan.
  *  - q25 set ops are distinct hash-aggregates on the key — one
  *    shuffle each, no join explosion.
  *  - q26/q28 shuffle events once on user_id; the per-user firsts are
  *    tiny (|users| ≪ |events|) and AQE broadcasts them back, so the
  *    event log is never shuffled twice.
  *  - q27 is a single narrow agg on a computed integer bucket.
  */
object AnalyticsQueries {

  private val Priorities = Seq(
    "1-URGENT" -> "n_urgent", "2-HIGH" -> "n_high",
    "3-MEDIUM" -> "n_medium", "4-NOT SPECIFIED" -> "n_notspec",
    "5-LOW" -> "n_low")

  /** q24_pivot — orders-per-priority pivoted wide, one row per market
    * segment. Pivot values DECLARED (no driver distinct pass). */
  def q24Pivot(s: SparkSession, dir: String): DataFrame = {
    val joined = Tables(s, dir, "orders").as("o")
      .join(broadcast(Tables(s, dir, "customer").as("c")),
        col("o.o_custkey") === col("c.c_custkey"))
    val pivoted = joined.groupBy(col("c.c_mktsegment").as("segment"))
      .pivot("o_orderpriority", Priorities.map(_._1))
      .agg(count(lit(1)))
    val renamed = Priorities.map { case (v, alias) =>
      coalesce(col(s"`$v`"), lit(0L)).as(alias)
    }
    pivoted.select(col("segment") +: renamed: _*)
  }

  /** q25_setops — INTERSECT / EXCEPT surface: customers who placed
    * both urgent and low-priority orders vs urgent-only. Both are
    * DISTINCT set semantics (one hash-aggregate shuffle each). */
  def q25SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val low = o.filter(col("o_orderpriority") === "5-LOW")
      .select(col("o_custkey"))
    urgent.intersect(low).withColumn("tag", lit("both"))
      .unionByName(
        urgent.except(low).withColumn("tag", lit("urgent_only")))
  }

  /** q26_funnel — strictly-ordered event funnel view → click →
    * purchase: a user advances a step only with an event AFTER their
    * first qualifying previous-step event. Each step is a per-user
    * min-aggregate joined forward; all three stages co-partition on
    * user_id and the step outputs are broadcast-small. */
  def q26Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .select(col("user_id"), col("event_type"), col("ts_us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_view"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts_us") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_click"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts_us") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_buy"))
    def step(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(name).as("step"), col("n_users"))
    step(v, "1_view")
      .unionByName(step(c, "2_click"))
      .unionByName(step(p, "3_purchase"))
  }

  /** q27_histogram — fixed-width order-value histogram: $25k buckets
    * over exact cents, top bucket open-ended. ONE narrow aggregate on
    * a computed integer key — the profile-a-column-at-100-TB shape. */
  def q27Histogram(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .withColumn("price_cents", Core.cents(col("o_totalprice")))
      .groupBy(least(expr("price_cents div 2500000"), lit(19L))
        .as("bucket"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("price_cents")).as("sum_cents"),
        min(col("price_cents")).as("min_cents"),
        max(col("price_cents")).as("max_cents"))

  /** q28_retention — weekly cohort retention over the event stream:
    * cohort = the user's first-seen week, one row per (cohort_week,
    * week_offset) with distinct active users. First-touch is one
    * per-user min; the join back is broadcast (|users| ≪ |events|). */
  def q28Retention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("day", expr("ts_ns div 86400000000000"))
      .select(col("user_id"), col("day"))
    val first = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    ev.join(first, "user_id")
      .select(
        col("user_id"),
        expr("cohort_day div 7").as("cohort_week"),
        (expr("day div 7") - expr("cohort_day div 7")).as("week_offset"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** q29_gapfill — [[graft.operators.Timeseries.gapFillLocf]] over the
    * hourly event aggregate: dense per-type hour grid, gap hours
    * flagged, value carried forward. Counts and value sums stay exact
    * integers through the fill; the only double is the final
    * avg-per-event division, identical arithmetic on both engines. */
  def q29Gapfill(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("ts_ns div 3600000000000").as("hour_id"))
      .agg(count(lit(1)).as("n_obs"),
        sum(Core.cents(col("value"))).as("value_cents"))
    graft.operators.Timeseries
      .gapFillLocf(hourly, "event_type", "hour_id",
        Seq("n_obs", "value_cents"))
      .select(col("event_type"), col("hour_id"), col("is_gap"),
        coalesce(col("n_obs"), lit(0L)).as("n_events"),
        (col("value_cents_filled").cast("double") /
          (lit(100.0) * col("n_obs_filled"))).as("value_filled"))
  }

  /** q30_interpolate — [[graft.operators.Timeseries.gapFillLinear]]
    * over the hourly per-type average: gap hours get the linear
    * interpolation between neighboring observations (the fill for
    * continuous signals where LOCF's step function biases features).
    * The interpolation is ONE deterministic scalar expression per row
    * over exactly-derived endpoints, so no rounding is needed. */
  def q30Interpolate(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("ts_ns div 3600000000000").as("hour_id"))
      .agg((sum(Core.cents(col("value"))).cast("double") /
        (lit(100.0) * count(lit(1)))).as("avg_value"))
    graft.operators.Timeseries
      .gapFillLinear(hourly, "event_type", "hour_id", "avg_value")
      .select(col("event_type"), col("hour_id"), col("is_gap"),
        col("avg_value_interp").as("value_interp"))
  }

  /** q31_twa — time-weighted average of `value` per event type over
    * the irregular event stream: Σ vᵢ·Δtᵢ / Σ Δtᵢ with Δtᵢ the gap to
    * the next observation (last observation carries no weight) — the
    * correct average for irregularly-sampled telemetry, where the
    * plain mean over-weights bursts. Weights are exact integer
    * cents×micros products in decimal(38), the only double is the
    * final division.
    *
    * Scale note: event_type has ~5 values, so a lead window partitioned
    * by type alone sorts the whole raw stream inside 5 tasks at any
    * scale. Instead the lead runs inside (event_type, calendar-hour)
    * partitions — hour buckets tile time disjointly, so the
    * within-bucket lead equals the global lead everywhere except each
    * bucket's LAST row, whose successor is the first observation of the
    * next non-empty bucket. Those successors come from a
    * bucket-count-sized firsts relation (|types|×|hours|, broadcast
    * back), so parallelism grows with the time span while Δt stays
    * bit-identical to the single-window formulation. */
  def q31Twa(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("v_cents", Core.cents(col("value")))
      .withColumn("bucket", expr("ts_us div 3600000000"))
      .select(col("event_type"), col("event_id"), col("ts_us"),
        col("v_cents"), col("bucket"))
    // ts_us in bucket b lies in [b·3600e6, (b+1)·3600e6): strictly below
    // every ts in any later bucket, so global (ts_us, event_id) order is
    // bucket order refined by within-bucket order.
    val inBucket = ev.withColumn("dt_in",
      lead(col("ts_us"), 1).over(
        Window.partitionBy(col("event_type"), col("bucket"))
          .orderBy(col("ts_us").asc, col("event_id").asc)) - col("ts_us"))
    val nexts = ev.groupBy(col("event_type"), col("bucket"))
      .agg(min(col("ts_us")).as("first_ts"))
      .withColumn("next_first", lead(col("first_ts"), 1).over(
        Window.partitionBy(col("event_type")).orderBy(col("bucket").asc)))
      .select(col("event_type"), col("bucket"), col("next_first"))
    inBucket.join(broadcast(nexts), Seq("event_type", "bucket"))
      .withColumn("dt",
        coalesce(col("dt_in"), col("next_first") - col("ts_us")))
      .filter(col("dt").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        sum(expr("CAST(v_cents AS DECIMAL(38,0)) * CAST(dt AS DECIMAL(38,0))"))
          .as("_wsum"),
        sum(col("dt")).as("span_us"),
        count(lit(1)).as("n_obs"))
      .select(col("event_type"), col("n_obs"), col("span_us"),
        (col("_wsum").cast("double") /
          (lit(100.0) * col("span_us").cast("double"))).as("twa_value"))
  }

  /** q32_corr — Pearson correlation of quantity vs line price per
    * return flag, computed from EXACT integer moments: n, Σx, Σy,
    * Σx², Σy², Σxy accumulate as decimal(38) products (Σy² overflows
    * long at sf0.1), and corr = (nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²) ·
    * √(nΣy²−(Σy)²)) is then a deterministic scalar over exact
    * integers — `corr()` built-ins stream float co-moments in data
    * order and cannot hash-match across engines; this formulation
    * can. One map-side-combined aggregation. */
  def q32Corr(s: SparkSession, dir: String): DataFrame = {
    def d(c: String) = s"CAST($c AS DECIMAL(38,0))"
    Tables(s, dir, "lineitem")
      .withColumn("x", col("l_quantity").cast("long"))
      .withColumn("y", Core.cents(col("l_extendedprice")))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr(s"${d("x")} * ${d("x")}")).as("sxx"),
        sum(expr(s"${d("y")} * ${d("y")}")).as("syy"),
        sum(expr(s"${d("x")} * ${d("y")}")).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        // every product in decimal(38): sy·sy overflows long already
        // at sf0.001 (ANSI would throw, non-ANSI would silently wrap)
        (expr(s"CAST(${d("n")} * sxy - ${d("sx")} * ${d("sy")} AS DOUBLE)") /
          (sqrt(expr(
            s"CAST(${d("n")} * sxx - ${d("sx")} * ${d("sx")} AS DOUBLE)")) *
            sqrt(expr(
              s"CAST(${d("n")} * syy - ${d("sy")} * ${d("sy")} AS DOUBLE)"))))
          .as("corr_qty_price"))
  }

  /** q33_attribution — last-touch channel attribution (round-8): each
    * purchase is credited to the user's most recent PRIOR non-purchase
    * event type ('direct' when none) — the marketing-analytics shape
    * the funnel (q26) does not cover. One window pass partitioned by
    * user_id (high-cardinality — parallelism scales with users, unlike
    * q31's old type-partitioned window) with a row-bounded IGNORE
    * NULLS last_value; the final channel aggregate runs over purchases
    * only and map-side combines into ~|event_type| rows. Row-based
    * frame over the total (ts, event_id) order makes the credited
    * touch engine-deterministic. */
  def q33Attribution(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .select(col("user_id"), col("event_type"), col("ts_us"),
        col("event_id"))
      .withColumn("last_touch",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("last_touch"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        count_distinct(col("user_id")).as("n_buyers"))
  }

  /** q34_transitions — first-order event-type transition counts over
    * each user's time-ordered stream (the Markov-chain view of the
    * event log: what follows what). Same single user_id-partitioned
    * window pass as q33 (lead instead of last_value); the transition
    * aggregate map-side combines to at most |event_type|² rows. */
  def q34Transitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    Tables.events(s, dir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .select(col("user_id"), col("event_type"), col("ts_us"),
        col("event_id"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** q35_rolling — 24-hour ROLLING (sliding, time-RANGE) volumes per
    * event type, computed over the hourly pre-aggregate: the
    * continuous-monitoring shape q11's tumbling windows don't cover
    * (every hour gets the trailing day's totals, not just its own
    * bucket). The RANGE window runs over the tiny (type, hour) grid —
    * the same pre-shrink trick as q29/q30, so the 5-value type key is
    * never a parallelism ceiling — and all sums are exact integers. */
  def q35Rolling(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("ts_ns div 3600000000000").as("hour_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(Core.cents(col("value"))).as("value_cents"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("hour_id").asc)
      .rangeBetween(-23, 0)
    hourly.select(col("event_type"), col("hour_id"), col("n_events"),
      sum(col("n_events")).over(w).as("n_24h"),
      sum(col("value_cents")).over(w).as("cents_24h"))
  }

  /** q36_grouping_sets (round-9) — arbitrary aggregation levels in one
    * pass: (status, priority), (status), () over orders, the GROUPING
    * SETS surface rollup (#10) and cube (#64) don't cover (rollup is
    * prefix-only, cube is all 2ⁿ). The level marker derives from which
    * keys are NULL (both engines agree; the grouped columns are
    * non-null in the data), so no engine-specific grouping_id is in
    * the contract. One Expand + one aggregation, like rollup/cube. */
  def q36GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql("""
      SELECT o_orderstatus, o_orderpriority,
        CAST(CASE WHEN o_orderstatus IS NULL THEN 2
                  WHEN o_orderpriority IS NULL THEN 1
                  ELSE 0 END AS BIGINT) AS lvl,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          AS total_cents
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        (o_orderstatus), ())""")
  }

  /** q37_unpivot (round-9) — wide-to-long reshaping (the melt half of
    * the pivot surface, #67's inverse): each lineitem's three charge
    * stages (extended, discounted, charged) become rows via `stack`,
    * exact cents. Generator-based: rows×3 out of one scan, no shuffle. */
  def q37Unpivot(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber").cast("long")
          .as("l_linenumber"),
        Core.cents(col("l_extendedprice")).as("_ext"),
        Core.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("_disc"),
        Core.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("_chrg"))
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("stack(3, 'extended', _ext, 'discounted', _disc, " +
          "'charged', _chrg)").as(Seq("component", "cents")))

  /** q38_ntile (round-9) — equal-frequency quartiles of customers by
    * account balance within market segment (the banding primitive of
    * cohort/LTV reporting); deterministic total order (exact cents,
    * custkey tie-break) so both engines assign identical tiles. */
  def q38Ntile(s: SparkSession, dir: String): DataFrame = {
    // scale-safe form (round-11): c_mktsegment has 5 values, so an
    // ntile window keyed by it alone is a 5-reducer table sort at
    // 100×; Banding derives the identical tile from (row_number, n)
    // computed via the value-distribution relation
    val ranked = graft.operators.Banding.withRowNumber(
      Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          Core.cents(col("c_acctbal")).as("bal_cents")),
      Seq("c_mktsegment"), "bal_cents", "c_custkey")
    ranked
      .withColumn("quartile",
        graft.operators.Banding.ntileOf(col("_rn"), col("_n"), 4))
      .select(col("c_custkey"), col("c_mktsegment"), col("bal_cents"),
        col("quartile"))
  }

  /** q39_dist_rank (round-10) — the relative-standing pair that
    * completes the window-distribution surface beside rank (#6),
    * percentile (#18) and ntile (#142): per market segment, each
    * customer's percent_rank (position among peers, 0..1) and
    * cume_dist (fraction of peers at-or-below) of account balance —
    * the "what percentile is this account in" primitive of cohort
    * reporting. The ORDER BY is the same deterministic (cents,
    * custkey) total order as q38, so ranks have no tie groups and
    * both engines emit identical 6-dp fractions. One keyed window,
    * no global order. */
  def q39DistRank(s: SparkSession, dir: String): DataFrame = {
    // scale-safe form (round-11): under the total (bal_cents,
    // c_custkey) order percent_rank = (rn−1)/(n−1) and cume_dist =
    // rn/n, so both reduce to Banding's shuffle-lean (rn, n) pair —
    // no row sort inside the 5 c_mktsegment window partitions
    val ranked = graft.operators.Banding.withRowNumber(
      Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          Core.cents(col("c_acctbal")).as("bal_cents")),
      Seq("c_mktsegment"), "bal_cents", "c_custkey")
    ranked
      .withColumn("pct_rank",
        round(when(col("_n") === 1L, lit(0.0))
          .otherwise((col("_rn") - 1L).cast("double") /
            (col("_n") - 1L).cast("double")), 6))
      .withColumn("cum_dist",
        round(col("_rn").cast("double") / col("_n").cast("double"), 6))
      .select(col("c_custkey"), col("c_mktsegment"), col("bal_cents"),
        col("pct_rank"), col("cum_dist"))
  }

  /** q40_percentile_global (round-11) — EXACT global discrete
    * percentiles (p50/p90/p99) of lineitem extended price: q18's
    * per-key form completed for the no-key case, which is where the
    * naive plan is at its worst (a single-partition sort of the whole
    * table). The Banding identity makes the global form CHEAPER, not
    * harder: the percentile value depends only on the value
    * distribution, so the only cumulated relation is
    * `groupBy(price_cents).count()` — bounded by the price DOMAIN
    * (~10⁷ cents values at any SF), never the row count. The global
    * window rides that tiny relation; the table itself sees one
    * map-side-combined aggregation and no sort at all. */
  def q40PercentileGlobal(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val below = Window.orderBy(col("price_cents").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.orderBy(col("price_cents").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val vc = Tables(s, dir, "lineitem")
      .select(Core.cents(col("l_extendedprice")).as("price_cents"))
      .groupBy(col("price_cents")).agg(count(lit(1)).as("_vc"))
      .withColumn("_below", coalesce(sum(col("_vc")).over(below), lit(0L)))
      .withColumn("_n", sum(col("_vc")).over(whole))
    def at(f: Double) = {
      val target = ceil(col("_n") * f)
      max(when(target > col("_below") &&
        target <= col("_below") + col("_vc"), col("price_cents")))
    }
    vc.agg(max(col("_n")).as("n_rows"), at(0.5).as("p50_cents"),
      at(0.9).as("p90_cents"), at(0.99).as("p99_cents"))
  }

  /** q41_approx_percentile (round-11, rows-only) — the MERGEABLE
    * percentile sketch beside q40's exact form: per return flag,
    * Greenwald-Khanna approximate p50/p90/p99 (`percentile_approx`,
    * accuracy 10⁴ → rank error ≤ n/10⁴ per partial). At 100 TB this is
    * the one-pass profiling shape — KB-sized partials merge up the
    * tree, no value relation, no second pass — the quantile sibling of
    * q19's HLL distinct. No DuckDB oracle (approx_quantile runs
    * t-digest, a different sketch); ApproxSpec pins the rank-error
    * bound against the exact distribution instead. */
  def q41ApproxPercentile(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .select(col("l_returnflag"),
        Core.cents(col("l_extendedprice")).as("price_cents"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        percentile_approx(col("price_cents"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("_p"))
      .select(col("l_returnflag"), col("n_rows"),
        element_at(col("_p"), 1).as("p50_approx"),
        element_at(col("_p"), 2).as("p90_approx"),
        element_at(col("_p"), 3).as("p99_approx"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_percentile_global" -> q40PercentileGlobal,
    "q41_approx_percentile" -> q41ApproxPercentile,
    "q39_dist_rank" -> q39DistRank,
    "q36_grouping_sets" -> q36GroupingSets,
    "q37_unpivot" -> q37Unpivot,
    "q38_ntile" -> q38Ntile,
    "q35_rolling" -> q35Rolling,
    "q34_transitions" -> q34Transitions,
    "q33_attribution" -> q33Attribution,
    "q32_corr" -> q32Corr,
    "q31_twa" -> q31Twa,
    "q30_interpolate" -> q30Interpolate,
    "q29_gapfill" -> q29Gapfill,
    "q24_pivot" -> q24Pivot,
    "q25_setops" -> q25SetOps,
    "q26_funnel" -> q26Funnel,
    "q27_histogram" -> q27Histogram,
    "q28_retention" -> q28Retention)

  val oracleSql: Map[String, String] = Map(
    "q40_percentile_global" -> """
      WITH vc AS (
        SELECT CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents,
          COUNT(*) AS c
        FROM lineitem GROUP BY 1),
      b AS (
        SELECT price_cents, c,
          COALESCE(SUM(c) OVER (ORDER BY price_cents ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS below,
          SUM(c) OVER () AS n
        FROM vc)
      SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
        MAX(CASE WHEN CEIL(n*0.5) > below AND CEIL(n*0.5) <= below + c
          THEN price_cents END) AS p50_cents,
        MAX(CASE WHEN CEIL(n*0.9) > below AND CEIL(n*0.9) <= below + c
          THEN price_cents END) AS p90_cents,
        MAX(CASE WHEN CEIL(n*0.99) > below AND CEIL(n*0.99) <= below + c
          THEN price_cents END) AS p99_cents
      FROM b""",
    "q36_grouping_sets" -> """
      SELECT o_orderstatus, o_orderpriority,
        CAST(CASE WHEN o_orderstatus IS NULL THEN 2
                  WHEN o_orderpriority IS NULL THEN 1
                  ELSE 0 END AS BIGINT) AS lvl,
        CAST(COUNT(*) AS BIGINT) AS n_orders,
        CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          AS total_cents
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        (o_orderstatus), ())""",
    "q37_unpivot" -> """
      WITH base AS (
        SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
          CAST(round(l_extendedprice * 100) AS BIGINT) AS ext,
          CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
            AS disc,
          CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
            * 100) AS BIGINT) AS chrg
        FROM lineitem)
      SELECT l_orderkey, l_linenumber, 'extended' AS component,
        ext AS cents FROM base
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discounted', disc FROM base
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'charged', chrg FROM base""",
    "q38_ntile" -> """
      SELECT c_custkey, c_mktsegment,
        CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
        CAST(ntile(4) OVER (PARTITION BY c_mktsegment
          ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) ASC,
            c_custkey ASC) AS BIGINT) AS quartile
      FROM customer""",
    "q39_dist_rank" -> """
      SELECT c_custkey, c_mktsegment,
        CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
        round(percent_rank() OVER (PARTITION BY c_mktsegment
          ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) ASC,
            c_custkey ASC), 6) AS pct_rank,
        round(cume_dist() OVER (PARTITION BY c_mktsegment
          ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) ASC,
            c_custkey ASC), 6) AS cum_dist
      FROM customer""",
    "q35_rolling" -> """
      WITH hourly AS (
        SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour_id,
          CAST(COUNT(*) AS BIGINT) AS n_events,
          CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
            AS value_cents
        FROM events GROUP BY 1, 2)
      SELECT event_type, hour_id, n_events,
        CAST(SUM(n_events) OVER w AS BIGINT) AS n_24h,
        CAST(SUM(value_cents) OVER w AS BIGINT) AS cents_24h
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_id ASC
        RANGE BETWEEN 23 PRECEDING AND CURRENT ROW)""",
    "q34_transitions" -> """
      WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
        FROM events),
      t AS (
        SELECT event_type AS from_type,
          lead(event_type) OVER (PARTITION BY user_id
            ORDER BY ts_us ASC, event_id ASC) AS to_type
        FROM e)
      SELECT from_type, to_type,
        CAST(COUNT(*) AS BIGINT) AS n_transitions
      FROM t WHERE to_type IS NOT NULL
      GROUP BY 1, 2""",
    "q33_attribution" -> """
      WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
        FROM events),
      t AS (
        SELECT user_id, event_type,
          last_value(CASE WHEN event_type <> 'purchase'
                          THEN event_type END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            AS last_touch
        FROM e)
      SELECT COALESCE(last_touch, 'direct') AS channel,
        CAST(COUNT(*) AS BIGINT) AS n_purchases,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_buyers
      FROM t WHERE event_type = 'purchase'
      GROUP BY 1""",
    "q32_corr" -> """
      WITH b AS (
        SELECT l_returnflag,
          CAST(l_quantity AS BIGINT) AS x,
          CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem),
      m AS (
        SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
          SUM(x::HUGEINT * x::HUGEINT) AS sxx,
          SUM(y::HUGEINT * y::HUGEINT) AS syy,
          SUM(x::HUGEINT * y::HUGEINT) AS sxy
        FROM b GROUP BY 1)
      SELECT l_returnflag, n,
        CAST(n * sxy - sx::HUGEINT * sy AS DOUBLE)
          / (sqrt(CAST(n * sxx - sx::HUGEINT * sx AS DOUBLE))
             * sqrt(CAST(n * syy - sy::HUGEINT * sy AS DOUBLE)))
          AS corr_qty_price
      FROM m""",
    "q31_twa" -> """
      WITH e AS (
        SELECT event_type, event_id, epoch_us(ts) AS ts_us,
          CAST(round(value * 100) AS BIGINT) AS v_cents
        FROM events),
      d AS (
        SELECT event_type, v_cents,
          lead(ts_us) OVER (PARTITION BY event_type
            ORDER BY ts_us ASC, event_id ASC) - ts_us AS dt
        FROM e),
      g AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_obs,
          CAST(SUM(dt) AS BIGINT) AS span_us,
          SUM(CAST(v_cents AS HUGEINT) * CAST(dt AS HUGEINT)) AS wsum
        FROM d WHERE dt IS NOT NULL GROUP BY 1)
      SELECT event_type, n_obs, span_us,
        CAST(wsum AS DOUBLE) / (100.0 * CAST(span_us AS DOUBLE))
          AS twa_value
      FROM g""",
    "q30_interpolate" -> """
      WITH hourly AS (
        SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour_id,
          CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
            / (100.0 * COUNT(*)) AS avg_value
        FROM events GROUP BY 1, 2),
      span AS (
        SELECT event_type, MIN(hour_id) AS b0, MAX(hour_id) AS b1
        FROM hourly GROUP BY 1),
      grid AS (
        SELECT event_type, unnest(generate_series(b0, b1)) AS hour_id
        FROM span),
      j AS (
        SELECT g.event_type, g.hour_id,
          CASE WHEN h.avg_value IS NULL THEN 1 ELSE 0 END AS is_gap,
          h.avg_value AS v,
          CASE WHEN h.avg_value IS NOT NULL THEN g.hour_id END AS ob
        FROM grid g LEFT JOIN hourly h USING (event_type, hour_id)),
      f AS (
        SELECT event_type, hour_id, is_gap, v,
          last_value(v IGNORE NULLS) OVER wb AS pv,
          first_value(v IGNORE NULLS) OVER wf AS nv,
          last_value(ob IGNORE NULLS) OVER wb AS pb,
          first_value(ob IGNORE NULLS) OVER wf AS nb
        FROM j
        WINDOW wb AS (PARTITION BY event_type ORDER BY hour_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wf AS (PARTITION BY event_type ORDER BY hour_id ASC
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT event_type, hour_id, is_gap,
        CASE WHEN is_gap = 0 THEN v
             ELSE pv + (nv - pv)
               * (CAST(hour_id - pb AS DOUBLE)
                  / CAST(nb - pb AS DOUBLE)) END AS value_interp
      FROM f""",
    "q29_gapfill" -> """
      WITH hourly AS (
        SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour_id,
          CAST(COUNT(*) AS BIGINT) AS n_obs,
          CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
            AS value_cents
        FROM events GROUP BY 1, 2),
      span AS (
        SELECT event_type, MIN(hour_id) AS b0, MAX(hour_id) AS b1
        FROM hourly GROUP BY 1),
      grid AS (
        SELECT event_type, unnest(generate_series(b0, b1)) AS hour_id
        FROM span),
      filled AS (
        SELECT g.event_type, g.hour_id,
          CASE WHEN h.n_obs IS NULL THEN 1 ELSE 0 END AS is_gap,
          COALESCE(h.n_obs, 0) AS n_events,
          last_value(h.value_cents IGNORE NULLS) OVER w AS fc,
          last_value(h.n_obs IGNORE NULLS) OVER w AS fn
        FROM grid g LEFT JOIN hourly h USING (event_type, hour_id)
        WINDOW w AS (PARTITION BY g.event_type ORDER BY g.hour_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT event_type, hour_id, is_gap,
        CAST(n_events AS BIGINT) AS n_events,
        CAST(fc AS DOUBLE) / (100.0 * fn) AS value_filled
      FROM filled""",
    "q24_pivot" -> """
      SELECT c.c_mktsegment AS segment,
        CAST(COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
          AS BIGINT) AS n_urgent,
        CAST(COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END)
          AS BIGINT) AS n_high,
        CAST(COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END)
          AS BIGINT) AS n_medium,
        CAST(COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END)
          AS BIGINT) AS n_notspec,
        CAST(COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END)
          AS BIGINT) AS n_low
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1""",
    "q25_setops" -> """
      SELECT o_custkey, 'both' AS tag FROM (
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
      UNION ALL
      SELECT o_custkey, 'urgent_only' AS tag FROM (
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')""",
    "q26_funnel" -> """
      WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      v AS (SELECT user_id, MIN(ts_us) AS t_view FROM e
            WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, MIN(ts_us) AS t_click
            FROM e JOIN v USING (user_id)
            WHERE event_type = 'click' AND ts_us > t_view GROUP BY 1),
      p AS (SELECT e.user_id, MIN(ts_us) AS t_buy
            FROM e JOIN c USING (user_id)
            WHERE event_type = 'purchase' AND ts_us > t_click GROUP BY 1)
      SELECT '1_view' AS step, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
      UNION ALL
      SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM c
      UNION ALL
      SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM p""",
    "q27_histogram" -> """
      WITH o AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders)
      SELECT LEAST(price_cents // 2500000, 19) AS bucket,
        CAST(COUNT(*) AS BIGINT) AS n_orders,
        CAST(SUM(price_cents) AS BIGINT) AS sum_cents,
        MIN(price_cents) AS min_cents,
        MAX(price_cents) AS max_cents
      FROM o GROUP BY 1""",
    "q28_retention" -> """
      WITH e AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      f AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY 1),
      uw AS (
        SELECT DISTINCT e.user_id, f.cohort_day // 7 AS cohort_week,
          (e.day // 7) - (f.cohort_day // 7) AS week_offset
        FROM e JOIN f USING (user_id))
      SELECT cohort_week, week_offset,
        CAST(COUNT(*) AS BIGINT) AS n_users
      FROM uw GROUP BY 1, 2""")
}
