package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization (round-7): turn an irregular observation
  * table into the DENSE per-series bucket grid that feature stores,
  * forecasting inputs, and fixed-step windowed aggregations expect —
  * one row per (series, bucket) from the series' first to last
  * observed bucket, gap rows flagged and
  * last-observation-carried-forward (LOCF) filled.
  *
  * Re-expresses the gap-handling the reference does with per-record
  * driver loops (etl_manager.py's standardize/null-handling transforms
  * walk `list[dict]`) as three distributed stages:
  *
  *  1. per-series span — ONE series-sized aggregate (map-side
  *     combined);
  *  2. grid generation — `sequence(first, last)` + `explode`, a narrow
  *     projection off the tiny span table (never a driver loop, never
  *     a cross join against a calendar table);
  *  3. LOCF — `last(ignoreNulls)` over a per-series ordered window:
  *     one shuffle on the series key, linear state.
  *
  * Scale: output size is Σ_series span_s — the operator's inherent
  * result size, reached without any data-sized intermediate beyond
  * it. The left join grid⋈observations co-partitions on (series,
  * bucket); the LOCF window re-shuffles on series only. Grid size is
  * governed by bucket granularity: a series spanning years at
  * millisecond buckets is a caller bug (the `require` below cannot see
  * it, but the span table makes it a one-aggregate audit). Skew: one
  * very long series makes one window partition large — LOCF state is
  * still O(1) per row; if the fill were heavier, split the series key
  * by epoch range first.
  */
object Timeseries {

  /** Dense grid + LOCF fill. `obs` must be unique per (series, bucket)
    * — pre-aggregate first (the binding aggregates events to hourly
    * buckets). `bucketCol` must be integral (an epoch-bucket id).
    * Output: (series, bucket, every obs column — null on gap rows —
    * `is_gap` 0/1, and for each fill column `c` a `c_filled` LOCF
    * column). Leading rows are never gaps (each series' grid starts at
    * its first observation), so `*_filled` is never null. */
  def gapFillLocf(obs: DataFrame, seriesCol: String, bucketCol: String,
      fillCols: Seq[String]): DataFrame = {
    require(fillCols.nonEmpty, "fillCols must be non-empty")
    require(!obs.columns.contains("_graft_obs"),
      "input column _graft_obs collides with gapFillLocf internals; rename it first")
    fillCols.foreach(c => require(!obs.columns.contains(s"${c}_filled"),
      s"input column ${c}_filled collides with gapFillLocf output; rename it first"))
    val span = obs.groupBy(col(seriesCol))
      .agg(min(col(bucketCol)).as("_b0"), max(col(bucketCol)).as("_b1"))
    val grid = span.select(col(seriesCol),
      explode(sequence(col("_b0"), col("_b1"))).as(bucketCol))
    val w = Window.partitionBy(col(seriesCol)).orderBy(col(bucketCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = grid
      .join(obs.withColumn("_graft_obs", lit(1)),
        Seq(seriesCol, bucketCol), "left")
      .withColumn("is_gap",
        when(col("_graft_obs").isNull, lit(1)).otherwise(lit(0)))
      .drop("_graft_obs")
    fillCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"${c}_filled",
        last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Dense grid + LINEAR interpolation fill: gap buckets get
    * prev + (next − prev) · (t − t_prev)/(t_next − t_prev) between
    * their neighboring observations — the fill for continuously-valued
    * signals where LOCF's step function biases downstream features.
    * Same grid/flag contract as [[gapFillLocf]]; `valueCol` must be
    * numeric (interpolation runs in double: one deterministic scalar
    * expression per row, no data-order float reduction). Grids start
    * and end at observations, so both neighbors always exist. Output:
    * (series, bucket, every obs column, `is_gap`,
    * `<valueCol>_interp`).
    *
    * Scale: identical to [[gapFillLocf]] plus one extra per-series
    * ordered window pass (the forward scan for the next observation) —
    * still one shuffle on the series key, O(1) state per row. */
  def gapFillLinear(obs: DataFrame, seriesCol: String, bucketCol: String,
      valueCol: String): DataFrame = {
    require(!obs.columns.contains("_graft_obs"),
      "input column _graft_obs collides with gapFillLinear internals; rename it first")
    require(!obs.columns.contains(s"${valueCol}_interp"),
      s"input column ${valueCol}_interp collides with gapFillLinear output; rename it first")
    val span = obs.groupBy(col(seriesCol))
      .agg(min(col(bucketCol)).as("_b0"), max(col(bucketCol)).as("_b1"))
    val grid = span.select(col(seriesCol),
      explode(sequence(col("_b0"), col("_b1"))).as(bucketCol))
    val ord = Window.partitionBy(col(seriesCol)).orderBy(col(bucketCol).asc)
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val joined = grid
      .join(obs.withColumn("_graft_obs", lit(1)),
        Seq(seriesCol, bucketCol), "left")
      .withColumn("is_gap",
        when(col("_graft_obs").isNull, lit(1)).otherwise(lit(0)))
    val v = col(valueCol)
    val obsBucket = when(col("_graft_obs").isNotNull, col(bucketCol))
    val interp =
      col("_pv").cast("double") +
        (col("_nv") - col("_pv")).cast("double") *
          ((col(bucketCol) - col("_pb")).cast("double") /
            (col("_nb") - col("_pb")).cast("double"))
    joined
      .withColumn("_pv", last(v, ignoreNulls = true).over(back))
      .withColumn("_nv", first(v, ignoreNulls = true).over(fwd))
      .withColumn("_pb", last(obsBucket, ignoreNulls = true).over(back))
      .withColumn("_nb", first(obsBucket, ignoreNulls = true).over(fwd))
      .withColumn(s"${valueCol}_interp",
        when(col("is_gap") === 0, v.cast("double")).otherwise(interp))
      .drop("_graft_obs", "_pv", "_nv", "_pb", "_nb")
  }
}
