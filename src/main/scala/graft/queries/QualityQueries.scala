package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-quality queries (SURVEY.md §2.2) — distributed re-expression of
  * the reference rule engine (/root/reference/src/quality/data_quality.py
  * DQ001–DQ008). Every rule is a Column predicate folded into ONE
  * aggregate pass per table (`sum(when(...))`) — never a per-rule scan,
  * never a driver loop. Scores are exact-integer divisions so the DuckDB
  * oracle reproduces them bit-for-bit.
  */
object QualityQueries {

  /** #15 DQ001 shape — per-column completeness on `orders` in one scan:
    * a single agg computes count + per-column non-null counts, then
    * `stack` pivots the one-row result to a row per column. */
  def dqCompleteness(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.map(c => count(col(c)).as(s"nn_$c"))
    val stackArgs = cols
      .map(c => s"'$c', nn_$c").mkString(s"stack(${cols.size}, ", ", ", ")")
    Tables(s, dir, "orders")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"), expr(s"$stackArgs as (column_name, n_notnull)"))
      .select(
        col("column_name"),
        col("n_rows"),
        (col("n_rows") - col("n_notnull")).as("n_null"),
        (col("n_notnull").cast("double") / col("n_rows")).as("completeness"))
  }

  /** #16 DQ002/DQ003 shape — anchored-regex format validity, one agg per
    * table (3 tiny union branches, each a single scan of its table). */
  def dqValidityFormat(s: SparkSession, dir: String): DataFrame = {
    def check(df: DataFrame, rule: String, c: Column, pattern: String) =
      df.agg(
        count(c).as("n_checked"),
        sum(when(c.isNotNull && !c.rlike(pattern), 1L).otherwise(0L))
          .as("n_failed"))
        .select(
          lit(rule).as("rule"),
          col("n_checked"),
          col("n_failed"),
          ((col("n_checked") - col("n_failed")).cast("double") /
            col("n_checked")).as("score"))
    check(Tables(s, dir, "customer"), "customer_name_format",
        col("c_name"), "^Customer#[0-9]{9}$")
      .unionAll(check(Tables(s, dir, "documents"), "doc_lang_format",
        col("lang"), "^[a-z]{2}$"))
      .unionAll(check(Tables.events(s, dir), "event_props_json",
        col("props"), "^\\{\"k\": [0-9]+\\}$"))
  }

  /** Per-type upper bound for event values (DQ006's clinical-ranges map
    * re-targeted, data_quality.py:744-757). */
  private def eventHi: Column =
    when(col("event_type") === "click", 400.0)
      .when(col("event_type") === "purchase", 300.0)
      .when(col("event_type") === "signup", 300.0)
      .when(col("event_type") === "error", 300.0)
      .when(col("event_type") === "view", 300.0)
      .otherwise(1000.0)

  /** #17 DQ006 shape — value-range checks per event type; groupBy on a
    * 5-value key ⇒ map-side partial agg, trivial shuffle. */
  def dqValueRanges(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        count(col("value")).as("n_checked"),
        sum(when(col("value").isNotNull &&
            (col("value") < 0.0 || col("value") > eventHi), 1L)
          .otherwise(0L)).as("n_out_of_range"))
      .select(
        col("event_type"), col("n_checked"), col("n_out_of_range"),
        ((col("n_checked") - col("n_out_of_range")).cast("double") /
          col("n_checked")).as("score"))

  /** #18 DQ005 shape — duplicate-by-key summary per table. Exact
    * count-distinct per table = one hash-partitioned pass each; the five
    * one-row results union. */
  def dqUniqueness(s: SparkSession, dir: String): DataFrame = {
    def one(df: DataFrame, table: String, key: Column*) =
      df.agg(
        count(lit(1)).as("n_rows"),
        countDistinct(key.head, key.tail: _*).as("n_keys"))
        .select(
          lit(table).as("table_name"), col("n_rows"), col("n_keys"),
          (col("n_rows") - col("n_keys")).as("n_dup_rows"),
          (col("n_keys").cast("double") / col("n_rows")).as("uniqueness"))
    one(Tables(s, dir, "orders"), "orders", col("o_orderkey"))
      .unionAll(one(Tables(s, dir, "customer"), "customer", col("c_custkey")))
      .unionAll(one(Tables(s, dir, "lineitem"), "lineitem",
        col("l_orderkey"), col("l_linenumber")))
      .unionAll(one(Tables.events(s, dir), "events", col("event_id")))
      .unionAll(one(Tables(s, dir, "documents"), "documents", col("doc_id")))
  }

  /** #19 DQ007 — referential integrity: orphan counts per FK edge via
    * left join + null-count (one pass per edge; small dims broadcast,
    * the lineitem⋈orders edge shuffles on the join key as it must). */
  def dqReferentialIntegrity(s: SparkSession, dir: String): DataFrame = {
    def edge(child: DataFrame, childKey: Column, parent: DataFrame,
        parentKey: Column, name: String, bcast: Boolean) = {
      val p = parent.select(parentKey.as("_pk"))
      val pj = if (bcast) broadcast(p) else p
      child.select(childKey.as("_ck"))
        .join(pj, col("_ck") === col("_pk"), "left")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col("_pk").isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(name).as("relation"), col("n_child"), col("n_orphans"),
          ((col("n_child") - col("n_orphans")).cast("double") /
            col("n_child")).as("score"))
    }
    // The three lineitem edges share ONE fact scan: chained left joins
    // against unique-keyed parents preserve row count, so the three
    // orphan counts fall out of a single agg (1 scan instead of 3 — the
    // difference that matters when the fact table is the 100 TB side).
    val li = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val liEdges = li
      .join(Tables(s, dir, "orders").select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left")
      .join(broadcast(Tables(s, dir, "part").select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left")
      .join(broadcast(Tables(s, dir, "supplier").select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"), "left")
      .agg(
        count(lit(1)).as("n_child"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("orph_o"),
        sum(when(col("p_partkey").isNull, 1L).otherwise(0L)).as("orph_p"),
        sum(when(col("s_suppkey").isNull, 1L).otherwise(0L)).as("orph_s"))
      .select(col("n_child"), expr("""stack(3,
          'lineitem_orders',   orph_o,
          'lineitem_part',     orph_p,
          'lineitem_supplier', orph_s) as (relation, n_orphans)"""))
      .select(col("relation"), col("n_child"), col("n_orphans"),
        ((col("n_child") - col("n_orphans")).cast("double") /
          col("n_child")).as("score"))
    liEdges
      .unionAll(edge(Tables(s, dir, "orders"), col("o_custkey"),
        Tables(s, dir, "customer"), col("c_custkey"), "orders_customer",
        bcast = true))
      .unionAll(edge(Tables(s, dir, "customer"), col("c_nationkey"),
        Tables(s, dir, "nation"), col("n_nationkey"), "customer_nation",
        bcast = true))
      .unionAll(edge(Tables(s, dir, "nation"), col("n_regionkey"),
        Tables(s, dir, "region"), col("r_regionkey"), "nation_region",
        bcast = true))
  }

  /** #20 — the full QualityReport on `orders` (zone=SILVER) in ONE scan:
    * every rule counter in a single agg (incl. the DQ005 count-distinct),
    * then scores/statuses/weighted-overall/promotion as scalar arithmetic
    * on the one-row result, pivoted to a row per rule. Weighted-score and
    * gate semantics follow data_quality.py:418-526; weights 1.0/0.9/1.0/
    * 1.2 per dimension, Silver thresholds (0.95/0.98/—/1.0, overall 0.95).
    */
  def dqQualityReport(s: SparkSession, dir: String): DataFrame = {
    val agg = Tables(s, dir, "orders").agg(
      count(lit(1)).as("n"),
      sum(when(col("o_orderkey").isNull || col("o_custkey").isNull ||
          col("o_orderstatus").isNull || col("o_totalprice").isNull ||
          col("o_orderdate").isNull, 1L).otherwise(0L)).as("f1"),
      count(col("o_orderdate")).as("c2"),
      sum(when(col("o_orderdate").isNotNull &&
          !(col("o_orderdate") >= lit("1992-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1999-01-01").cast("timestamp")), 1L)
        .otherwise(0L)).as("f2"),
      sum(when(col("o_orderkey") < 0 || col("o_custkey") < 0, 1L)
        .otherwise(0L)).as("f3"),
      countDistinct(col("o_orderkey")).as("nd5"),
      count(col("o_totalprice")).as("c6"),
      sum(when(col("o_totalprice").isNotNull &&
          (col("o_totalprice") < 0.0 || col("o_totalprice") > 1000000.0), 1L)
        .otherwise(0L)).as("f6"))

    val scored = agg
      .withColumn("s1", (col("n") - col("f1")).cast("double") / col("n"))
      .withColumn("s2", (col("c2") - col("f2")).cast("double") / col("c2"))
      .withColumn("s3", (col("n") - col("f3")).cast("double") / col("n"))
      .withColumn("s5", col("nd5").cast("double") / col("n"))
      .withColumn("s6", (col("c6") - col("f6")).cast("double") / col("c6"))
      .withColumn("st1", when(col("s1") < 0.95, "failed")
        .when(col("s1") < 0.99, "warning").otherwise("passed"))
      .withColumn("st2", when(col("s2") < 0.95, "failed")
        .when(col("s2") < 0.99, "warning").otherwise("passed"))
      .withColumn("st3", when(col("s3") < 0.99, "failed")
        .when(col("s3") < 1.0, "warning").otherwise("passed"))
      .withColumn("st5", when(col("n") - col("nd5") > 0, "failed")
        .otherwise("passed"))
      .withColumn("st6", when(col("s6") < 0.95, "failed")
        .when(col("s6") < 0.99, "warning").otherwise("passed"))
      .withColumn("overall_score",
        (col("s1") * 1.0 + col("s2") * 0.9 + col("s3") * 0.9 +
          col("s5") * 1.0 + col("s6") * 1.2) / 5.0)
      .withColumn("n_failed_rules",
        when(col("st1") === "failed", 1).otherwise(0) +
        when(col("st2") === "failed", 1).otherwise(0) +
        when(col("st3") === "failed", 1).otherwise(0) +
        when(col("st5") === "failed", 1).otherwise(0) +
        when(col("st6") === "failed", 1).otherwise(0))
      .withColumn("promotion_eligible",
        col("overall_score") >= 0.95 && col("s1") >= 0.95 &&
          col("s6") >= 0.98 && col("s5") >= 1.0 &&
          col("n_failed_rules") === 0)

    scored.select(
      expr("""stack(5,
        'DQ001', 'completeness', 'critical', n,  n - f1,   f1,       s1, st1,
        'DQ002', 'validity',     'major',    c2, c2 - f2,  f2,       s2, st2,
        'DQ003', 'validity',     'critical', n,  n - f3,   f3,       s3, st3,
        'DQ005', 'uniqueness',   'critical', n,  nd5,      n - nd5,  s5, st5,
        'DQ006', 'accuracy',     'major',    c6, c6 - f6,  f6,       s6, st6)
        as (rule_id, dimension, severity, records_checked, records_passed,
            records_failed, score, status)"""),
      col("overall_score"), col("promotion_eligible"))
  }

  /** Profiled columns for dq_profile (the orders table). */
  val profileCols: Seq[String] = Seq("o_orderkey", "o_custkey",
    "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

  /** dq_profile — [[graft.operators.Profile.profile]] on `orders`:
    * per-column null counts, exact cardinality, min/max bounds, all in
    * one scan. */
  def dqProfile(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.profile(Tables(s, dir, "orders"), profileCols)

  /** dq_drift — [[graft.operators.Drift.psiReport]] on `orders` split
    * at the midpoint order instant: PSI per monitored feature between
    * the older half (reference) and the newer half (current) — the
    * population-level check the per-row rules above can't express.
    * Price buckets are exact integer arithmetic on cents; the split
    * instant is an exact integer midpoint — both engines agree on
    * every bucket assignment. */
  def dqDrift(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
      // o_orderdate reads as TIMESTAMP_NTZ; the cast is wall-clock
      // identity under the UTC session, matching DuckDB's epoch_us
      .withColumn("order_us",
        unix_micros(col("o_orderdate").cast("timestamp")))
      .withColumn("price_cents", Core.cents(col("o_totalprice")))
    val mid = o.agg(expr("(min(order_us) + max(order_us)) div 2")
      .as("_mid"))
    graft.operators.Drift.psiReport(
      o.crossJoin(broadcast(mid)),
      isRef = col("order_us") <= col("_mid"),
      numeric = Seq(("price_cents", 10)),
      categorical = Seq("o_orderpriority", "o_orderstatus"))
  }

  /** er_fuzzy_match — [[graft.operators.Fuzzy.selfMatch]] on customer
    * names: record pairs within edit distance 1 (the mistyped-digit
    * identity collisions DQ005's exact duplicate rule can't see),
    * via exact deletion-neighborhood blocking. */
  def erFuzzyMatch(s: SparkSession, dir: String): DataFrame =
    graft.operators.Fuzzy.selfMatch(
      Tables(s, dir, "customer"), "c_custkey", "c_name")

  /** dq_anomaly — [[graft.operators.Anomaly.flagOutliers]] over hourly
    * per-type event volumes: hours whose count sits more than 3σ from
    * their type's mean, decided in exact integer moments (no float σ
    * anywhere) — the volume-anomaly monitor beside dq_drift's
    * distribution monitor. */
  def dqAnomaly(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("ts_ns div 3600000000000").as("hour_id"))
      .agg(count(lit(1)).as("n_events"))
    graft.operators.Anomaly
      .flagOutliers(hourly, "event_type", "n_events", k = 3)
      .select(col("event_type"), col("hour_id"), col("n_events"),
        col("n_obs"), col("is_anomaly"))
  }

  /** dq_hotkeys — [[graft.operators.Profile.hotKeys]] (round-8) over
    * the lineitem⋈orders join key: the top-20 heaviest order keys with
    * their share of the table — the skew diagnostic a 100 TB join
    * strategy decision starts from. */
  def dqHotkeys(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile
      .hotKeys(Tables(s, dir, "lineitem"), "l_orderkey", topN = 20)

  /** dq_freshness — per-source staleness (the TIMELINESS dimension as
    * a standing query, complementing the per-row DQ004-style rule):
    * last event seen per type and its lag behind the stream's newest
    * event. Anchoring on the data's own max — not wall-clock — keeps
    * the result deterministic and engine-comparable; production
    * monitors compare `staleness_us` against an SLA constant. One
    * map-side-combined aggregate per type + a broadcast one-row global
    * anchor; exact integer microseconds end-to-end. */
  def dqFreshness(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
    val perType = ev.groupBy(col("event_type"))
      .agg(max(col("ts_us")).as("last_seen_us"),
        count(lit(1)).as("n_events"))
    val anchor = ev.agg(max(col("ts_us")).as("_anchor_us"))
    perType.crossJoin(broadcast(anchor))
      .select(col("event_type"), col("n_events"), col("last_seen_us"),
        (col("_anchor_us") - col("last_seen_us")).as("staleness_us"))
  }

  /** dq_anomaly_robust — [[graft.operators.Anomaly.flagOutliersRobust]]
    * over the same hourly per-type volumes as dq_anomaly: the
    * median/MAD flag that stays calibrated when the spikes themselves
    * inflate σ (k=5 ≈ 3.4σ on clean data under normality). */
  def dqAnomalyRobust(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("ts_ns div 3600000000000").as("hour_id"))
      .agg(count(lit(1)).as("n_events"))
    graft.operators.Anomaly
      .flagOutliersRobust(hourly, "event_type", "n_events", k = 5L)
      .select(col("event_type"), col("hour_id"), col("n_events"),
        col("med"), col("mad"), col("is_anomaly"))
  }

  /** dq_reconciliation — the ACCURACY dimension as a cross-table
    * audit: does each order's header total equal the sum of its line
    * amounts (extendedprice·(1−discount)·(1+tax))? One summary row:
    * order count, headers with no lines at all, exact matches,
    * within-1% matches (integer comparison — \|diff\|·100 ≤ total),
    * and the worst/total absolute discrepancy in cents. On this
    * synthetic corpus NOTHING reconciles exactly — which is the
    * point: the audit quantifies the mismatch instead of assuming
    * consistency. One map-side-combined per-order aggregation joined
    * to headers, then a single global fold; exact cents throughout. */
  def dqReconciliation(s: SparkSession, dir: String): DataFrame = {
    val lines = Tables(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(Core.cents(col("l_extendedprice") *
        (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))))
        .as("line_cents"))
    val diff = col("total_cents") - col("line_cents")
    Tables(s, dir, "orders")
      .select(col("o_orderkey"),
        Core.cents(col("o_totalprice")).as("total_cents"))
      .join(lines, col("o_orderkey") === col("l_orderkey"), "left")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("line_cents").isNull, 1L).otherwise(0L))
          .as("n_no_lines"),
        sum(when(diff === 0, 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("line_cents").isNotNull &&
          abs(diff) * 100 <= col("total_cents"), 1L).otherwise(0L))
          .as("n_within_1pct"),
        max(abs(col("total_cents") - coalesce(col("line_cents"), lit(0L))))
          .as("max_abs_diff_cents"),
        sum(abs(col("total_cents") - coalesce(col("line_cents"), lit(0L))))
          .as("sum_abs_diff_cents"))
  }

  /** k for the customer quasi-identifier audit. */
  val KAnon = 10L

  /** dq_k_anonymity (round-9) — [[Profile.kAnonymity]] over customer's
    * (nation, market-segment) quasi-identifiers: equivalence classes
    * smaller than k are the re-identification risk a de-identified
    * release must suppress or generalize first. */
  def dqKAnonymity(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.kAnonymity(
      Tables(s, dir, "customer"), Seq("c_nationkey", "c_mktsegment"),
      KAnon)

  /** Top-N for the join-cardinality audit. */
  val JoinEstTopN = 10

  /** dq_join_estimate (round-9) — [[Profile.joinCardinality]] for
    * customer ⋈ orders on custkey: the exact pre-flight answer to
    * "how big is this join, and which keys dominate it". */
  def dqJoinEstimate(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.joinCardinality(
      Tables(s, dir, "customer"), col("c_custkey"),
      Tables(s, dir, "orders"), col("o_custkey"), JoinEstTopN)

  /** dq_benford (round-9) — [[Profile.benford]] over order totals:
    * the first-digit fabricated-amounts screen. */
  def dqBenford(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.benford(
      Tables(s, dir, "orders"), col("o_totalprice"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_join_estimate" -> dqJoinEstimate,
    "dq_benford" -> dqBenford,
    "dq_k_anonymity" -> dqKAnonymity,
    "dq_reconciliation" -> dqReconciliation,
    "dq_anomaly_robust" -> dqAnomalyRobust,
    "dq_freshness" -> dqFreshness,
    "dq_hotkeys" -> dqHotkeys,
    "dq_anomaly" -> dqAnomaly,
    "er_fuzzy_match" -> erFuzzyMatch,
    "dq_drift" -> dqDrift,
    "dq_profile" -> dqProfile,
    "dq_completeness" -> dqCompleteness,
    "dq_validity_format" -> dqValidityFormat,
    "dq_value_ranges" -> dqValueRanges,
    "dq_uniqueness" -> dqUniqueness,
    "dq_referential_integrity" -> dqReferentialIntegrity,
    "dq_quality_report" -> dqQualityReport)

  val oracleSql: Map[String, String] = Map(
    "dq_join_estimate" -> s"""
      WITH l AS (
        SELECT c_custkey AS join_key, CAST(COUNT(*) AS BIGINT) AS n_left
        FROM customer GROUP BY 1),
      r AS (
        SELECT o_custkey AS join_key, CAST(COUNT(*) AS BIGINT) AS n_right
        FROM orders GROUP BY 1)
      SELECT l.join_key, l.n_left, r.n_right,
        CAST(l.n_left * r.n_right AS BIGINT) AS n_out
      FROM l JOIN r USING (join_key)
      ORDER BY n_out DESC, join_key ASC LIMIT $JoinEstTopN""",
    "dq_benford" -> """
      WITH c AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      d AS (
        SELECT substr(CAST(cents AS VARCHAR), 1, 1) AS digit
        FROM c WHERE cents > 0),
      t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM d)
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs,
        CAST(COUNT(*) AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS share
      FROM d, t GROUP BY digit, t.n_total""",
    "dq_k_anonymity" -> s"""
      SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(CASE WHEN COUNT(*) < $KAnon THEN 1 ELSE 0 END AS BIGINT)
          AS at_risk
      FROM customer GROUP BY 1, 2""",
    "dq_reconciliation" -> """
      WITH l AS (
        SELECT l_orderkey,
          CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount)
            * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS line_cents
        FROM lineitem GROUP BY 1),
      o AS (
        SELECT o_orderkey,
          CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
        FROM orders),
      j AS (
        SELECT o.total_cents, l.line_cents
        FROM o LEFT JOIN l ON o.o_orderkey = l.l_orderkey)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
        CAST(SUM(CASE WHEN line_cents IS NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_no_lines,
        CAST(SUM(CASE WHEN total_cents - line_cents = 0 THEN 1 ELSE 0
          END) AS BIGINT) AS n_exact,
        CAST(SUM(CASE WHEN line_cents IS NOT NULL
          AND abs(total_cents - line_cents) * 100 <= total_cents
          THEN 1 ELSE 0 END) AS BIGINT) AS n_within_1pct,
        MAX(abs(total_cents - COALESCE(line_cents, 0)))
          AS max_abs_diff_cents,
        CAST(SUM(abs(total_cents - COALESCE(line_cents, 0))) AS BIGINT)
          AS sum_abs_diff_cents
      FROM j""",
    "dq_anomaly_robust" -> """
      WITH hourly AS (
        SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour_id,
          CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2),
      med AS (
        SELECT event_type, n_events AS med FROM (
          SELECT event_type, n_events,
            row_number() OVER (PARTITION BY event_type
              ORDER BY n_events ASC) AS rn,
            COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM hourly) WHERE rn = (n + 1) // 2),
      dev AS (
        SELECT h.event_type, h.hour_id, h.n_events, m.med,
          abs(h.n_events - m.med) AS d
        FROM hourly h JOIN med m USING (event_type)),
      mad AS (
        SELECT event_type, d AS mad FROM (
          SELECT event_type, d,
            row_number() OVER (PARTITION BY event_type
              ORDER BY d ASC) AS rn,
            COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM dev) WHERE rn = (n + 1) // 2)
      SELECT dev.event_type, dev.hour_id, dev.n_events, dev.med,
        mad.mad,
        CAST(CASE WHEN dev.d > 5 * mad.mad THEN 1 ELSE 0 END AS INTEGER)
          AS is_anomaly
      FROM dev JOIN mad USING (event_type)""",
    "dq_freshness" -> """
      WITH e AS (
        SELECT event_type, epoch_us(ts) AS ts_us FROM events),
      p AS (
        SELECT event_type, MAX(ts_us) AS last_seen_us,
          CAST(COUNT(*) AS BIGINT) AS n_events
        FROM e GROUP BY 1),
      a AS (SELECT MAX(ts_us) AS anchor_us FROM e)
      SELECT event_type, n_events, last_seen_us,
        a.anchor_us - last_seen_us AS staleness_us
      FROM p, a""",
    "dq_hotkeys" -> """
      WITH c AS (
        SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem GROUP BY 1),
      t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM lineitem),
      top AS (
        SELECT l_orderkey, n_rows FROM c
        ORDER BY n_rows DESC, l_orderkey ASC LIMIT 20)
      SELECT l_orderkey, n_rows,
        CAST(n_rows AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
        CAST(row_number() OVER (ORDER BY n_rows DESC, l_orderkey ASC)
          AS BIGINT) AS rank
      FROM top, t""",
    "dq_anomaly" -> """
      WITH hourly AS (
        SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour_id,
          CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2),
      st AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_obs,
          CAST(SUM(n_events) AS BIGINT) AS s,
          CAST(SUM(n_events * n_events) AS BIGINT) AS q
        FROM hourly GROUP BY 1)
      SELECT h.event_type, h.hour_id, h.n_events, st.n_obs,
        CAST(CASE WHEN (st.n_obs * h.n_events - st.s)
            * (st.n_obs * h.n_events - st.s)
            > 9 * (st.n_obs * st.q - st.s * st.s)
          THEN 1 ELSE 0 END AS INTEGER) AS is_anomaly
      FROM hourly h JOIN st USING (event_type)""",
    "er_fuzzy_match" -> s"""
      WITH base AS (
        SELECT c_custkey AS id, c_name AS name FROM customer
        WHERE c_name IS NOT NULL AND length(c_name) >= 1),
      vars AS (
        SELECT DISTINCT id, name, v
        FROM base, LATERAL (SELECT unnest(list_append(
          list_transform(range(1, length(name) + 1),
            i -> substr(name, 1, i - 1) || substr(name, i + 1)),
          name)) AS v)),
      capped AS (
        SELECT * FROM vars
        QUALIFY COUNT(*) OVER (PARTITION BY v)
          <= ${graft.operators.Dedup.DefaultMaxBucket}),
      cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b,
          a.name AS name_a, b.name AS name_b
        FROM capped a JOIN capped b ON a.v = b.v AND a.id < b.id)
      SELECT id_a, id_b, name_a, name_b,
        CAST(levenshtein(name_a, name_b) AS INTEGER) AS distance
      FROM cand WHERE levenshtein(name_a, name_b) <= 1""",
    "dq_drift" -> """
      WITH o AS (
        SELECT epoch_us(o_orderdate) AS order_us,
          CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
          o_orderpriority, o_orderstatus
        FROM orders),
      mid AS (
        SELECT (MIN(order_us) + MAX(order_us)) // 2 AS m FROM o),
      flagged AS (
        SELECT o.*, (order_us <= m) AS is_ref FROM o CROSS JOIN mid),
      edges AS (
        SELECT MIN(price_cents) AS mn, MAX(price_cents) AS mx
        FROM flagged WHERE is_ref),
      buck AS (
        SELECT 'price_cents' AS feature,
          CAST(GREATEST(LEAST(
            ((price_cents - mn) * 10) // (mx - mn + 1), 9), 0)
            AS VARCHAR) AS bucket,
          is_ref
        FROM flagged CROSS JOIN edges
        UNION ALL
        SELECT 'o_orderpriority', COALESCE(o_orderpriority, '__null__'),
          is_ref FROM flagged
        UNION ALL
        SELECT 'o_orderstatus', COALESCE(o_orderstatus, '__null__'),
          is_ref FROM flagged),
      counts AS (
        SELECT feature, bucket,
          CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
            AS ref_cnt,
          CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT)
            AS cur_cnt
        FROM buck GROUP BY 1, 2),
      tot AS (
        SELECT feature, ref_cnt, cur_cnt,
          CAST(SUM(ref_cnt) OVER (PARTITION BY feature) AS BIGINT)
            AS n_ref,
          CAST(SUM(cur_cnt) OVER (PARTITION BY feature) AS BIGINT)
            AS n_cur
        FROM counts),
      contrib AS (
        SELECT feature, n_ref, n_cur,
          (GREATEST(CAST(ref_cnt AS DOUBLE) / CAST(n_ref AS DOUBLE), 1e-6)
           - GREATEST(CAST(cur_cnt AS DOUBLE) / CAST(n_cur AS DOUBLE), 1e-6))
          * ln(
            GREATEST(CAST(ref_cnt AS DOUBLE) / CAST(n_ref AS DOUBLE), 1e-6)
            / GREATEST(CAST(cur_cnt AS DOUBLE) / CAST(n_cur AS DOUBLE), 1e-6))
            AS c
        FROM tot),
      psi AS (
        SELECT feature, MAX(n_ref) AS n_ref, MAX(n_cur) AS n_cur,
          CAST(COUNT(*) AS BIGINT) AS n_buckets,
          round(SUM(c), 6) AS psi
        FROM contrib GROUP BY 1)
      SELECT feature, n_ref, n_cur, n_buckets, psi,
        CASE WHEN psi < 0.1 THEN 'stable'
             WHEN psi < 0.25 THEN 'moderate'
             ELSE 'shifted' END AS drift_band
      FROM psi""",
    "dq_profile" -> profileCols.map(c => s"""
        SELECT '$c' AS column_name,
          COUNT(*) AS n_rows,
          COUNT(*) - COUNT($c) AS n_null,
          CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
          CAST(MIN($c) AS VARCHAR) AS min_value,
          CAST(MAX($c) AS VARCHAR) AS max_value
        FROM orders""").mkString("\n        UNION ALL\n"),
    "dq_completeness" -> Seq(
      "o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
      .map(c => s"""
        SELECT '$c' AS column_name, COUNT(*) AS n_rows,
          COUNT(*) - COUNT($c) AS n_null,
          CAST(COUNT($c) AS DOUBLE) / COUNT(*) AS completeness
        FROM orders""")
      .mkString(" UNION ALL "),
    "dq_validity_format" -> """
      SELECT 'customer_name_format' AS rule, COUNT(c_name) AS n_checked,
        CAST(SUM(CASE WHEN c_name IS NOT NULL
          AND NOT regexp_matches(c_name, '^Customer#[0-9]{9}$')
          THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
        CAST(COUNT(c_name) - SUM(CASE WHEN c_name IS NOT NULL
          AND NOT regexp_matches(c_name, '^Customer#[0-9]{9}$')
          THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(c_name) AS score
      FROM customer
      UNION ALL
      SELECT 'doc_lang_format', COUNT(lang),
        CAST(SUM(CASE WHEN lang IS NOT NULL
          AND NOT regexp_matches(lang, '^[a-z]{2}$') THEN 1 ELSE 0 END) AS BIGINT),
        CAST(COUNT(lang) - SUM(CASE WHEN lang IS NOT NULL
          AND NOT regexp_matches(lang, '^[a-z]{2}$') THEN 1 ELSE 0 END)
          AS DOUBLE) / COUNT(lang)
      FROM documents
      UNION ALL
      SELECT 'event_props_json', COUNT(props),
        CAST(SUM(CASE WHEN props IS NOT NULL
          AND NOT regexp_matches(props, '^\{"k": [0-9]+\}$')
          THEN 1 ELSE 0 END) AS BIGINT),
        CAST(COUNT(props) - SUM(CASE WHEN props IS NOT NULL
          AND NOT regexp_matches(props, '^\{"k": [0-9]+\}$')
          THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(props)
      FROM events""",
    "dq_value_ranges" -> """
      SELECT event_type, COUNT(value) AS n_checked,
        CAST(SUM(CASE WHEN value IS NOT NULL AND (value < 0.0 OR value >
          CASE event_type WHEN 'click' THEN 400.0 WHEN 'purchase' THEN 300.0
            WHEN 'signup' THEN 300.0 WHEN 'error' THEN 300.0
            WHEN 'view' THEN 300.0 ELSE 1000.0 END)
          THEN 1 ELSE 0 END) AS BIGINT) AS n_out_of_range,
        CAST(COUNT(value) - SUM(CASE WHEN value IS NOT NULL
          AND (value < 0.0 OR value >
          CASE event_type WHEN 'click' THEN 400.0 WHEN 'purchase' THEN 300.0
            WHEN 'signup' THEN 300.0 WHEN 'error' THEN 300.0
            WHEN 'view' THEN 300.0 ELSE 1000.0 END)
          THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(value) AS score
      FROM events GROUP BY event_type""",
    "dq_uniqueness" -> """
      SELECT 'orders' AS table_name, COUNT(*) AS n_rows,
        COUNT(DISTINCT o_orderkey) AS n_keys,
        COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_dup_rows,
        CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) / COUNT(*) AS uniqueness
      FROM orders
      UNION ALL
      SELECT 'customer', COUNT(*), COUNT(DISTINCT c_custkey),
        COUNT(*) - COUNT(DISTINCT c_custkey),
        CAST(COUNT(DISTINCT c_custkey) AS DOUBLE) / COUNT(*)
      FROM customer
      UNION ALL
      SELECT 'lineitem', COUNT(*), COUNT(DISTINCT (l_orderkey, l_linenumber)),
        COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)),
        CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS DOUBLE) / COUNT(*)
      FROM lineitem
      UNION ALL
      SELECT 'events', COUNT(*), COUNT(DISTINCT event_id),
        COUNT(*) - COUNT(DISTINCT event_id),
        CAST(COUNT(DISTINCT event_id) AS DOUBLE) / COUNT(*)
      FROM events
      UNION ALL
      SELECT 'documents', COUNT(*), COUNT(DISTINCT doc_id),
        COUNT(*) - COUNT(DISTINCT doc_id),
        CAST(COUNT(DISTINCT doc_id) AS DOUBLE) / COUNT(*)
      FROM documents""",
    "dq_referential_integrity" -> """
      SELECT 'lineitem_orders' AS relation, COUNT(*) AS n_child,
        COUNT(*) - COUNT(o.o_orderkey) AS n_orphans,
        CAST(COUNT(o.o_orderkey) AS DOUBLE) / COUNT(*) AS score
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT 'lineitem_part', COUNT(*), COUNT(*) - COUNT(p.p_partkey),
        CAST(COUNT(p.p_partkey) AS DOUBLE) / COUNT(*)
      FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
      UNION ALL
      SELECT 'lineitem_supplier', COUNT(*), COUNT(*) - COUNT(s.s_suppkey),
        CAST(COUNT(s.s_suppkey) AS DOUBLE) / COUNT(*)
      FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
      UNION ALL
      SELECT 'orders_customer', COUNT(*), COUNT(*) - COUNT(c.c_custkey),
        CAST(COUNT(c.c_custkey) AS DOUBLE) / COUNT(*)
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      UNION ALL
      SELECT 'customer_nation', COUNT(*), COUNT(*) - COUNT(n.n_nationkey),
        CAST(COUNT(n.n_nationkey) AS DOUBLE) / COUNT(*)
      FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      UNION ALL
      SELECT 'nation_region', COUNT(*), COUNT(*) - COUNT(r.r_regionkey),
        CAST(COUNT(r.r_regionkey) AS DOUBLE) / COUNT(*)
      FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey""",
    "dq_quality_report" -> """
      WITH agg AS (
        SELECT COUNT(*) AS n,
          CAST(SUM(CASE WHEN o_orderkey IS NULL OR o_custkey IS NULL
            OR o_orderstatus IS NULL OR o_totalprice IS NULL
            OR o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS f1,
          COUNT(o_orderdate) AS c2,
          CAST(SUM(CASE WHEN o_orderdate IS NOT NULL AND NOT
            (o_orderdate >= TIMESTAMP '1992-01-01'
             AND o_orderdate < TIMESTAMP '1999-01-01')
            THEN 1 ELSE 0 END) AS BIGINT) AS f2,
          CAST(SUM(CASE WHEN o_orderkey < 0 OR o_custkey < 0
            THEN 1 ELSE 0 END) AS BIGINT) AS f3,
          COUNT(DISTINCT o_orderkey) AS nd5,
          COUNT(o_totalprice) AS c6,
          CAST(SUM(CASE WHEN o_totalprice IS NOT NULL
            AND (o_totalprice < 0.0 OR o_totalprice > 1000000.0)
            THEN 1 ELSE 0 END) AS BIGINT) AS f6
        FROM orders),
      scored AS (
        SELECT *,
          CAST(n - f1 AS DOUBLE) / n AS s1,
          CAST(c2 - f2 AS DOUBLE) / c2 AS s2,
          CAST(n - f3 AS DOUBLE) / n AS s3,
          CAST(nd5 AS DOUBLE) / n AS s5,
          CAST(c6 - f6 AS DOUBLE) / c6 AS s6
        FROM agg),
      st AS (
        SELECT *,
          CASE WHEN s1 < 0.95 THEN 'failed' WHEN s1 < 0.99 THEN 'warning'
            ELSE 'passed' END AS st1,
          CASE WHEN s2 < 0.95 THEN 'failed' WHEN s2 < 0.99 THEN 'warning'
            ELSE 'passed' END AS st2,
          CASE WHEN s3 < 0.99 THEN 'failed' WHEN s3 < 1.0 THEN 'warning'
            ELSE 'passed' END AS st3,
          CASE WHEN n - nd5 > 0 THEN 'failed' ELSE 'passed' END AS st5,
          CASE WHEN s6 < 0.95 THEN 'failed' WHEN s6 < 0.99 THEN 'warning'
            ELSE 'passed' END AS st6,
          (s1 * 1.0 + s2 * 0.9 + s3 * 0.9 + s5 * 1.0 + s6 * 1.2) / 5.0
            AS overall_score
        FROM scored),
      fin AS (
        SELECT *,
          (CASE WHEN st1 = 'failed' THEN 1 ELSE 0 END
           + CASE WHEN st2 = 'failed' THEN 1 ELSE 0 END
           + CASE WHEN st3 = 'failed' THEN 1 ELSE 0 END
           + CASE WHEN st5 = 'failed' THEN 1 ELSE 0 END
           + CASE WHEN st6 = 'failed' THEN 1 ELSE 0 END) AS n_failed_rules
        FROM st)
      SELECT rule_id, dimension, severity, records_checked, records_passed,
        records_failed, score, status, overall_score,
        (overall_score >= 0.95 AND s1 >= 0.95 AND s6 >= 0.98 AND s5 >= 1.0
         AND n_failed_rules = 0) AS promotion_eligible
      FROM fin, LATERAL (VALUES
        ('DQ001', 'completeness', 'critical', n,  n - f1,  f1,      s1, st1),
        ('DQ002', 'validity',     'major',    c2, c2 - f2, f2,      s2, st2),
        ('DQ003', 'validity',     'critical', n,  n - f3,  f3,      s3, st3),
        ('DQ005', 'uniqueness',   'critical', n,  nd5,     n - nd5, s5, st5),
        ('DQ006', 'accuracy',     'major',    c6, c6 - f6, f6,      s6, st6))
        AS r(rule_id, dimension, severity, records_checked, records_passed,
             records_failed, score, status)""")
}
