package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift detection (round-7): Population Stability Index
  * between a reference and a current snapshot of the same table — the
  * data-quality check that catches what row-level rules can't (every
  * row individually valid, the DISTRIBUTION silently shifted: an
  * upstream format change, a source mix change, a unit change). The
  * reference's quality engine (data_quality.py) has per-row rules
  * only; this is the natural distributed extension of its
  * dimension-score design to population-level monitoring.
  *
  * PSI(feature) = Σ_buckets (p_b − q_b) · ln(p_b / q_b), with p/q the
  * reference/current bucket proportions floored at `Eps` (the
  * standard guard for empty buckets). Conventional bands: < 0.1
  * stable, < 0.25 moderate shift, ≥ 0.25 shifted.
  *
  * Scale: ONE pass over the reference slice for numeric bucket edges
  * (min/max, broadcast back), then ONE pass over the table emitting a
  * (feature, bucket, is_ref) contribution per monitored feature via a
  * narrow explode — bucket counts are map-side-combined into a
  * feature×bucket-sized table, and everything after (totals window,
  * PSI fold) runs on that tiny relation. Numeric bucketing is pure
  * integer arithmetic on exact long values (no float bucket edges),
  * so bucket assignment is reproducible on any engine.
  */
object Drift {

  /** Proportion floor for empty buckets. */
  val Eps = 1e-6

  /** PSI drift report. `numeric` names (longColumn, nBuckets) pairs —
    * the column must be integral (scale money to cents first); bucket
    * edges are equal-width over the REFERENCE min/max, current values
    * outside clamp to the edge buckets. `categorical` columns bucket
    * by value (nulls as "__null__"). `isRef` splits the table into
    * reference (true) vs current (false) rows. Output: one row per
    * feature — (feature, n_ref, n_cur, n_buckets, psi, drift_band). */
  private def validate(numeric: Seq[(String, Int)],
      categorical: Seq[String]): Unit = {
    require(numeric.nonEmpty || categorical.nonEmpty,
      "at least one feature column is required")
    numeric.foreach { case (_, b) =>
      require(b >= 2, "numeric features need at least 2 buckets") }
  }

  /** One-row numeric bucket edges (`_mn_c`/`_mx_c` per column) over a
    * reference frame — broadcast this back into whatever frame gets
    * bucketed so edges are fixed by the REFERENCE, not the data under
    * test. */
  def numericEdges(ref: DataFrame,
      numeric: Seq[(String, Int)]): DataFrame = {
    val edgeAggs = numeric.flatMap { case (c, _) =>
      Seq(min(col(c)).as(s"_mn_$c"), max(col(c)).as(s"_mx_$c")) }
    ref.agg(edgeAggs.head, edgeAggs.tail: _*)
  }

  /** Per-feature (feature, bucket) struct columns. Numeric bucketing is
    * exact integer equal-width over [mn, mx] (edge columns must be in
    * scope — see [[numericEdges]]); out-of-range values clamp to the
    * edge buckets; categorical buckets by value with nulls as
    * "__null__". */
  def featureStructs(numeric: Seq[(String, Int)],
      categorical: Seq[String]): Seq[Column] =
    numeric.map { case (c, b) =>
      val idx = greatest(least(
        expr(s"((`$c` - `_mn_$c`) * ${b}L) div (`_mx_$c` - `_mn_$c` + 1L)"),
        lit(b.toLong - 1L)), lit(0L))
      struct(lit(c).as("feature"), idx.cast("string").as("bucket"))
    } ++ categorical.map { c =>
      struct(lit(c).as("feature"),
        coalesce(col(c).cast("string"), lit("__null__")).as("bucket"))
    }

  /** Reference bucket counts (feature, bucket, ref_cnt) — the static
    * side a monitor compares against (computed once; in production the
    * persisted baseline table). Numeric edges come from `ref` itself. */
  def referenceCounts(ref: DataFrame, numeric: Seq[(String, Int)],
      categorical: Seq[String]): DataFrame = {
    validate(numeric, categorical)
    val withEdges =
      if (numeric.isEmpty) ref
      else ref.crossJoin(broadcast(numericEdges(ref, numeric)))
    withEdges
      .select(explode(array(featureStructs(numeric, categorical): _*))
        .as("_f"))
      .groupBy(col("_f.feature").as("feature"),
        col("_f.bucket").as("bucket"))
      .agg(count(lit(1)).as("ref_cnt"))
  }

  /** Fold a (groupCols…, feature, bucket, ref_cnt, cur_cnt) count
    * relation into one PSI row per (groupCols…, feature). Null counts
    * (buckets one side never saw) are zero; empty buckets floor at
    * [[Eps]]. */
  def psiFold(counts: DataFrame, groupCols: Seq[String]): DataFrame = {
    val byFeature = Window.partitionBy(
      (groupCols :+ "feature").map(col): _*)
    val p = greatest(
      col("ref_cnt").cast("double") / col("n_ref").cast("double"), lit(Eps))
    val q = greatest(
      col("cur_cnt").cast("double") / col("n_cur").cast("double"), lit(Eps))
    val psi = counts
      .withColumn("ref_cnt", coalesce(col("ref_cnt"), lit(0L)))
      .withColumn("cur_cnt", coalesce(col("cur_cnt"), lit(0L)))
      .withColumn("n_ref", sum(col("ref_cnt")).over(byFeature))
      .withColumn("n_cur", sum(col("cur_cnt")).over(byFeature))
      .withColumn("_c", (p - q) * log(p / q))
      .groupBy((groupCols :+ "feature").map(col): _*)
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
        count(lit(1)).as("n_buckets"), round(sum(col("_c")), 6).as("psi"))
    psi.withColumn("drift_band",
      when(col("psi") < 0.1, "stable")
        .when(col("psi") < 0.25, "moderate")
        .otherwise("shifted"))
  }

  def psiReport(df: DataFrame, isRef: Column,
      numeric: Seq[(String, Int)], categorical: Seq[String]): DataFrame = {
    validate(numeric, categorical)
    // reference bucket edges: one tiny row, broadcast back to the scan
    val flagged =
      if (numeric.isEmpty) df.withColumn("_is_ref", isRef)
      else df.withColumn("_is_ref", isRef).crossJoin(broadcast(
        numericEdges(df.filter(isRef), numeric)))
    // per-feature (feature, bucket) contribution — narrow explode
    val counts = flagged
      .select(col("_is_ref"),
        explode(array(featureStructs(numeric, categorical): _*)).as("_f"))
      .groupBy(col("_f.feature").as("feature"), col("_f.bucket").as("bucket"))
      .agg(sum(when(col("_is_ref"), 1L).otherwise(0L)).as("ref_cnt"),
        sum(when(col("_is_ref"), 0L).otherwise(1L)).as("cur_cnt"))
    psiFold(counts, Nil)
      .select(col("feature"), col("n_ref"), col("n_cur"),
        col("n_buckets"), col("psi"), col("drift_band"))
  }
}
