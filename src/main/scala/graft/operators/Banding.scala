package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe distribution banding — exact `row_number`/`ntile`/
  * `percent_rank`/`cume_dist`/`percentile_disc` semantics under a
  * `Window.partitionBy(key).orderBy(value, tiebreak)` contract WITHOUT
  * ever sorting the row relation inside the key's window partitions.
  *
  * The naive window is correct at any SF but partitions the sort by
  * `key`: with a low-cardinality key (a market segment, a language, an
  * order priority — ≤5 values) every row of the table funnels through
  * a handful of reducers, a straggler by construction at 100×. The
  * identity that removes the data-sized sort: under a total order
  * `(value, tiebreak)`,
  *
  *   row_number(row) = rowsBelow(key, value) + tieRank(row)
  *
  * where `rowsBelow` depends only on the VALUE DISTRIBUTION —
  * `groupBy(key, value).count()` (map-side combined, value-cardinality
  * sized, bounded by the value domain rather than the row count) with
  * a cumulative sum windowed over that tiny relation — and `tieRank`
  * is a row_number windowed by `(key, value)`, a HIGH-cardinality
  * partition key whose partitions are tie-group-sized. Every
  * rank-derived statistic (tile, percent_rank, cume_dist) is then
  * arithmetic on `(row_number, n)`, assigned in a scan-speed
  * projection after an equi-join on `(key, value)` that reuses the tie
  * window's partitioning. Used by q18_percentile_disc, q38_ntile,
  * q39_dist_rank and curation_ppl_buckets (reference analog: the
  * banding/percentile reporting the reference runs driver-side over
  * its query results, e.g. data_quality.py's score distributions).
  */
object Banding {

  /** Adds exact `rnCol` = row_number() and `nCol` = count(*) over
    * `Window.partitionBy(keyCols).orderBy(value, tiebreak)` without a
    * row-relation sort inside the key partitions. `valueCol` ordering
    * is ASC unless `descValue`; `tieCol` always breaks ties ASC and
    * must make the order total (unique within (key, value)). */
  def withRowNumber(df: DataFrame, keyCols: Seq[String], valueCol: String,
      tieCol: String, descValue: Boolean = false,
      rnCol: String = "_rn", nCol: String = "_n"): DataFrame = {
    val grp = (keyCols :+ valueCol).map(col)
    // tie-group rank: (key, value) partitions are tie-sized, so the
    // per-partition sort is O(ties), independent of table size
    val tieW = Window.partitionBy(grp: _*).orderBy(col(tieCol).asc)
    val rows = df.withColumn("_tie_rn",
      row_number().over(tieW).cast("long"))
    // value relation: the only full-data pass is a partial-aggregated
    // count; everything cumulative runs over THIS relation
    val vOrd = if (descValue) col(valueCol).desc else col(valueCol).asc
    val below = Window.partitionBy(keyCols.map(col): _*).orderBy(vOrd)
      .rowsBetween(Window.unboundedPreceding, -1)
    val total = Window.partitionBy(keyCols.map(col): _*)
    val bounds = df.groupBy(grp: _*).agg(count(lit(1)).as("_vc"))
      .withColumn("_below", coalesce(sum(col("_vc")).over(below), lit(0L)))
      .withColumn(nCol, sum(col("_vc")).over(total))
      .drop("_vc")
    rows.join(bounds, keyCols :+ valueCol)
      .withColumn(rnCol, col("_below") + col("_tie_rn"))
      .drop("_below", "_tie_rn")
  }

  /** `ntile(k)` from an exact (row_number, n) pair — Spark/ANSI bucket
    * arithmetic: the first n % k buckets hold one extra row. Lazy
    * CaseWhen branches keep the `div q` safe when q = 0 (n < k). */
  def ntileOf(rn: Column, n: Column, k: Int): Column = {
    val bucketSize = floor(n / k).cast("long")
    val r = n % k
    val thr = r * (bucketSize + lit(1L))
    when(rn <= thr,
      floor((rn - 1) / (bucketSize + lit(1L))).cast("long") + 1L)
      .otherwise(
        r + floor((rn - thr - 1) / bucketSize).cast("long") + 1L)
  }
}
