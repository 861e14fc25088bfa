package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiler — the data-profiling half of a quality workflow
  * (per-column null counts, cardinality, value bounds) for ANY table.
  *
  * Two plans for two regimes:
  *  - `exact = false` (the 100 TB default question "roughly how many
  *    distincts"): ONE scan, every counter in a single `agg()` with
  *    HLL cardinality — map-side partial aggregation, sketch-sized
  *    state, no row expansion.
  *  - `exact = true` (verification scale + the DuckDB oracle): one
  *    NARROW aggregation per column, union'd. Parquet is columnar, so
  *    N single-column scans read the same bytes as one N-column scan —
  *    but exact multi-column countDistinct in one agg would expand
  *    every row N-fold through the aggregate, which dominates at any
  *    scale. Narrow scans sidestep the expansion entirely.
  *    CAVEAT: the input plan executes once per column, so exact mode
  *    over a COMPUTED input (joins, transforms, non-columnar sources)
  *    re-runs that pipeline N times — cache/materialize such inputs
  *    first, or use `exact = false` (one pass).
  *
  * Output: one row per profiled column —
  * (column_name, n_rows, n_null, n_distinct, min_value, max_value),
  * bounds cast to string AFTER aggregating so mixed column types share
  * one schema.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    if (exact) {
      cols.map { c =>
        df.select(col(c)).agg(
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_value"),
          max(col(c)).cast("string").as("max_value"))
          .select(lit(c).as("column_name"), col("n_rows"), col("n_null"),
            col("n_distinct"), col("min_value"), col("max_value"))
      }.reduce(_.unionByName(_))
    } else {
      val counters: Seq[Column] = count(lit(1)).as("_n") +:
        cols.flatMap { c =>
          Seq(
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_null_$c"),
            approx_count_distinct(col(c)).as(s"_nd_$c"),
            min(col(c)).cast("string").as(s"_min_$c"),
            max(col(c)).cast("string").as(s"_max_$c"))
        }
      val agg = df.agg(counters.head, counters.tail: _*)
      val stackArgs = cols.map(c =>
        s"'$c', _n, `_null_$c`, `_nd_$c`, `_min_$c`, `_max_$c`")
        .mkString(", ")
      agg.select(expr(
        s"""stack(${cols.size}, $stackArgs)
           as (column_name, n_rows, n_null, n_distinct, min_value, max_value)"""))
    }
  }
}
