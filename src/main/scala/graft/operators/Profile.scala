package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

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
  * one schema. With `quantiles = true`, adds (p50, p95, p99): approx
  * percentiles of numeric columns (Greenwald-Khanna sketch —
  * mergeable partial state, so both modes keep their scan shape; the
  * default accuracy bounds rank error at ~1/10000), NULL for
  * non-numeric columns.
  *
  * Column names are never interpolated into SQL strings — internal
  * aggregate slots are index-named and the output is assembled with
  * the Column API, so names with quotes/backticks/dots profile fine.
  */
object Profile {

  /** Hot-key profile (round-8): the top-N heaviest values of a key
    * column with their share of the table — the skew diagnostic run
    * BEFORE choosing a join/aggregation strategy at 100 TB (a key
    * holding >1% of a 100 TB table means salting
    * ([[Skew.saltedJoin]]), AQE skew splitting, or a broadcast
    * rethink; this query is how you find out). One map-side-combined
    * count aggregation (key-cardinality-sized), a bounded top-N
    * (TakeOrderedAndProject — per-partition heaps, N rows to the
    * driver merge), and a broadcast one-row total for the share.
    * Deterministic (n desc, key asc) tie-break. Output:
    * (key, n_rows, share, rank) — `key` keeps the input column name.
    */
  def hotKeys(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    require(topN > 0, "topN must be positive")
    Seq("n_rows", "share", "rank", "_graft_total").foreach(c =>
      require(!df.columns.contains(c),
        s"input column $c collides with hotKeys internals; rename it first"))
    val counts = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_rows"))
    val top = counts
      .orderBy(col("n_rows").desc, col(keyCol).asc)
      .limit(topN)
    val total = df.agg(count(lit(1)).as("_graft_total"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_rows").desc, col(keyCol).asc)
    top.crossJoin(broadcast(total))
      .withColumn("share",
        col("n_rows").cast("double") / col("_graft_total").cast("double"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .drop("_graft_total")
  }

  /** (output column name, percentile) for the quantile columns. */
  val Percentiles: Seq[(String, Double)] =
    Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99)

  def profile(df: DataFrame, cols: Seq[String],
      exact: Boolean = true, quantiles: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val numeric: Set[String] = df.schema.fields
      .filter(_.dataType.isInstanceOf[NumericType]).map(_.name).toSet

    // approx-percentile aggregates for a column (NULL for non-numeric:
    // min over a null literal keeps it a valid aggregate slot)
    def quantileAggs(c: String, names: Seq[String]): Seq[Column] =
      if (!quantiles) Seq.empty
      else if (numeric.contains(c))
        Percentiles.zip(names).map { case ((_, p), n) =>
          percentile_approx(col(c).cast("double"), lit(p), lit(10000)).as(n)
        }
      else names.map(n => min(lit(null).cast("double")).as(n))

    val quantileNames = Percentiles.map(_._1)

    if (exact) {
      cols.map { c =>
        val base = Seq(
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_value"),
          max(col(c)).cast("string").as("max_value")) ++
          quantileAggs(c, quantileNames)
        val outCols = lit(c).as("column_name") +:
          (Seq("n_rows", "n_null", "n_distinct", "min_value", "max_value")
            ++ (if (quantiles) quantileNames else Seq.empty)).map(col)
        df.select(col(c)).agg(base.head, base.tail: _*)
          .select(outCols: _*)
      }.reduce(_.unionByName(_))
    } else {
      val counters: Seq[Column] = count(lit(1)).as("_n") +:
        cols.zipWithIndex.flatMap { case (c, i) =>
          Seq(
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_null_$i"),
            approx_count_distinct(col(c)).as(s"_nd_$i"),
            min(col(c)).cast("string").as(s"_min_$i"),
            max(col(c)).cast("string").as(s"_max_$i")) ++
            quantileAggs(c, quantileNames.map(n => s"_${n}_$i"))
        }
      val agg = df.agg(counters.head, counters.tail: _*)
      val entries = cols.zipWithIndex.map { case (c, i) =>
        val fields = Seq(
          lit(c).as("column_name"),
          col("_n").as("n_rows"),
          col(s"_null_$i").as("n_null"),
          col(s"_nd_$i").as("n_distinct"),
          col(s"_min_$i").as("min_value"),
          col(s"_max_$i").as("max_value")) ++
          (if (quantiles) quantileNames.map(n => col(s"_${n}_$i").as(n))
           else Seq.empty)
        struct(fields: _*)
      }
      agg.select(explode(array(entries: _*)).as("_e")).select(col("_e.*"))
    }
  }

  /** k-anonymity audit (round-9): group the table by its
    * quasi-identifier columns and flag equivalence classes smaller
    * than k — the re-identification risk surface a privacy review of
    * a de-identified dataset starts from (Sweeney 2002; the check a
    * healthcare lakehouse runs before any data release). Output: one
    * row per QI combination — (qi..., n, at_risk 0/1) — so the caller
    * can both count the risk classes and locate them; suppression
    * rate = Σ n[at_risk] / Σ n, derivable exactly.
    *
    * Scale: ONE map-side-combined count aggregation on the QI key —
    * the output is equivalence-class-sized, never row-sized; the QI
    * combination count is the diagnostic (millions of size-1 classes
    * IS the finding, not a skew problem — each reduces to one row in
    * the partial aggregate). */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Long)
      : DataFrame = {
    require(qiCols.nonEmpty, "quasi-identifier columns must be non-empty")
    require(k >= 2, "k must be at least 2")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", when(col("n") < k, 1L).otherwise(0L))
  }

  /** Pre-flight join-cardinality audit (round-9): EXACT output size of
    * an equi-join computed WITHOUT running it — per-key row counts on
    * each side, joined key-to-key (two vocabulary-sized count tables,
    * never the data), n_out = n_left · n_right per key; the top
    * contributors are the keys that decide whether the real join is
    * broadcastable, needs salting, or should not run at all. The
    * 100 TB pre-flight: two map-side-combined counts + one tiny join,
    * bounded TakeOrderedAndProject top-N — cost is two scans, output
    * is N rows, and the answer is exact, not a sketch. */
  def joinCardinality(left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column, topN: Int): DataFrame = {
    val l = left.groupBy(leftKey.as("join_key"))
      .agg(count(lit(1)).as("n_left"))
    val r = right.groupBy(rightKey.as("join_key"))
      .agg(count(lit(1)).as("n_right"))
    l.join(r, Seq("join_key"))
      .withColumn("n_out", col("n_left") * col("n_right"))
      .orderBy(col("n_out").desc, col("join_key").asc)
      .limit(topN)
  }

  /** Benford first-digit audit (round-9): the leading-digit
    * distribution of a money column against the 30.1%/17.6%/… law —
    * the classic fabricated-amounts screen (Nigrini 1999; billing
    * fraud, expense anomalies). The digit comes from the CENTS LONG
    * rendered as a string (a ×100 shift never changes the leading
    * significant digit), so the extraction is pure integer/string —
    * no log10 near power-of-ten boundaries, bit-identical on every
    * engine. One map-side-combined 9-row aggregation; `share` is one
    * division from exact counts. */
  def benford(df: DataFrame, amount: Column): DataFrame = {
    val cents = round(amount * 100).cast("long")
    val digits = df.select(cents.as("_cents"))
      .filter(col("_cents") > 0L)
      .select(substring(col("_cents").cast("string"), 1, 1).as("digit"))
    val total = digits.agg(count(lit(1)).as("_n_total"))
    digits.groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n_obs"),
        (col("n_obs").cast("double") / col("_n_total").cast("double"))
          .as("share"))
  }
}
