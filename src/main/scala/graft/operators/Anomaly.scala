package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Population outlier detection (round-7): flag per-group values more
  * than k standard deviations from their group mean — the
  * volume-anomaly check (an hour with 10× the usual events, a source
  * that went silent) that complements [[Drift]]'s
  * distribution-shift PSI on the monitoring side of the quality
  * framework.
  *
  * The z-test is EXACT INTEGER arithmetic: |x − μ| > kσ with
  * μ = S/n and σ² = (nQ − S²)/n² rearranges to
  * (n·x − S)² > k²·(nQ − S²) over the integer moments S = Σx,
  * Q = Σx² — no float mean, no float variance, no sqrt, so the
  * decision is bit-identical on any engine and DuckDB-replayable.
  * Moments and products accumulate as decimal(38,0) (the q32_corr
  * pattern): long moments would overflow once per-group Σx² reaches
  * ~10¹⁸ (value magnitude ~3·10⁹ at a billion rows); decimal(38)
  * pushes the loud ANSI abort out to ~10³⁸ — beyond any row count
  * this engine will meet.
  *
  * Scale: one map-side-combined aggregation for the per-group moments
  * (group-count-sized, broadcast back) + one narrow flag projection —
  * the observation table is scanned twice and never shuffled beyond
  * the moment aggregation. A group with zero variance flags any
  * deviation (rhs = 0) and nothing when all values are equal
  * (lhs = 0) — the natural degenerate-group behavior.
  */
object Anomaly {

  /** Flag each row of (group, integral value): adds `n_obs` (group
    * size) and `is_anomaly` (0/1, strict k-sigma exceedance). */
  def flagOutliers(obs: DataFrame, groupCol: String, valueCol: String,
      k: Int = 3): DataFrame = {
    require(k > 0, "k must be positive")
    Seq("_graft_n", "_graft_s", "_graft_q", "n_obs", "is_anomaly")
      .foreach { c =>
        require(!obs.columns.contains(c),
          s"obs already has a '$c' column — rename it before flagOutliers")
      }
    def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val stats = obs.groupBy(col(groupCol)).agg(
      count(lit(1)).as("_graft_n"),
      sum(d(col(valueCol))).as("_graft_s"),
      sum(d(col(valueCol)) * d(col(valueCol))).as("_graft_q"))
    val dev = d(col("_graft_n")) * d(col(valueCol)) - col("_graft_s")
    val rhs = d(lit(k.toLong * k)) *
      (d(col("_graft_n")) * col("_graft_q") -
        col("_graft_s") * col("_graft_s"))
    obs.join(broadcast(stats), groupCol)
      .withColumn("is_anomaly", (dev * dev > rhs).cast("int"))
      .withColumnRenamed("_graft_n", "n_obs")
      .drop("_graft_s", "_graft_q")
  }
}
