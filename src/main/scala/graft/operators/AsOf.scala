package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join (guide preference (a): composed from
  * built-ins). For each left ("probe") row, attach the latest right
  * ("reference") row with the same key and time ≤ the probe time.
  *
  * Implementation is the canonical scalable union-sort-carry-forward:
  * tag both sides, union, one window per key ordered by (time, side)
  * with reference rows sorting first on ties (≤ semantics), carry the
  * reference columns forward with `last(_, ignoreNulls)`, keep probe
  * rows. ONE shuffle on the key — no range-explosion join, no
  * per-probe scan — and AQE's skew handling applies to the single
  * exchange.
  *
  * Caller contract: `rightValues` column names must not collide with
  * left's columns; right times must be unique per key for fully
  * deterministic results (add a unique low-order component otherwise).
  */
object AsOf {

  def joinAsOf(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      rightValues: Seq[String]): DataFrame = {
    val probe = left
      .withColumn("_ak", leftKey)
      .withColumn("_at", leftTime)
      .withColumn("_probe", lit(1))
    val ref = right
      .select(rightValues.map(col) :+ rightKey.as("_ak") :+
        rightTime.as("_at"): _*)
      .withColumn("_probe", lit(0))
    val unioned = probe.unionByName(ref, allowMissingColumns = true)
    val w = Window.partitionBy(col("_ak"))
      .orderBy(col("_at").asc, col("_probe").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // Carry ONE struct of all right-value columns (null for probe rows so
    // ignoreNulls skips them): every output row's values come from the
    // SAME reference row, even when that row has NULLs in some value
    // columns — per-column carries would silently mix rows there.
    val carried = unioned.withColumn("_rv",
      last(when(col("_probe") === 0, struct(rightValues.map(col): _*)),
        ignoreNulls = true).over(w))
    val unpacked = rightValues.foldLeft(carried)((d, c) =>
      d.withColumn(c, col("_rv").getField(c)))
    unpacked.filter(col("_probe") === 1).drop("_ak", "_at", "_probe", "_rv")
  }

  /** q16_asof_join — each event joined to its user's most recent order
    * as of the event time (claims⇄encounter matching shape). Order
    * times get a unique low-order component (the order key in µs) so
    * the as-of pick is total-ordered in both engines. */
  def q16AsofJoin(s: org.apache.spark.sql.SparkSession, dir: String)
      : DataFrame = {
    val ev = graft.Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        expr("ts_ns div 1000").as("ts_us"))
    val ord = graft.Tables(s, dir, "orders")
      .select(col("o_custkey"),
        // parquet NTZ timestamp → µs on the session-UTC grid (matches
        // DuckDB's epoch_us over the same naive timestamp)
        (unix_micros(col("o_orderdate").cast("timestamp")) +
          col("o_orderkey")).as("ord_us"),
        col("o_orderkey"),
        graft.queries.Core.cents(col("o_totalprice")).as("price_cents"))
    joinAsOf(ev, ord,
      leftKey = col("user_id"), rightKey = col("o_custkey"),
      leftTime = col("ts_us"), rightTime = col("ord_us"),
      rightValues = Seq("o_orderkey", "price_cents"))
      .select(col("event_id"), col("user_id"), col("o_orderkey"),
        col("price_cents"))
  }

  val queries: Map[String,
      (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("q16_asof_join" -> q16AsofJoin)

  val oracleSql: Map[String, String] = Map(
    "q16_asof_join" -> """
      WITH ev AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
      ord AS (
        SELECT o_custkey, epoch_us(o_orderdate) + o_orderkey AS ord_us,
          o_orderkey,
          CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
        FROM orders)
      SELECT e.event_id, e.user_id, o.o_orderkey, o.price_cents
      FROM ev e ASOF LEFT JOIN ord o
        ON e.user_id = o.o_custkey AND e.ts_us >= o.ord_us""")
}
