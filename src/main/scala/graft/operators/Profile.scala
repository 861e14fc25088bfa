package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiler — the data-profiling half of a quality
  * workflow (per-column null counts, cardinality, value bounds) for ANY
  * table, computed like [[graft.quality.QualityValidator.validate]]:
  * every counter in ONE `agg()` so a 100 TB profile is a single scan
  * with map-side partial aggregation, not one scan per column. The
  * count-distincts share the scan via Spark's aggregate expansion.
  *
  * Output: one row per profiled column —
  * (column_name, n_rows, n_null, n_distinct, min_value, max_value),
  * bounds cast to string AFTER aggregating so mixed column types share
  * one schema.
  */
object Profile {

  /** @param exact true = exact cardinality (one expand per column —
    *              right for verification scale and the DuckDB oracle);
    *              false = HLL approx_count_distinct, the 100 TB path
    *              (no expand, sketch-sized partial state). */
  def profile(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val counters: Seq[Column] = count(lit(1)).as("_n") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_null_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"_nd_$c"),
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
