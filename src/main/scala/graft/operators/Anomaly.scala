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

  import org.apache.spark.sql.types._

  /** The exact-arithmetic contract holds only for integral inputs: a
    * double cast to decimal(38,0) would silently round before the
    * moments accumulate. Fail fast instead. */
  private[graft] def requireIntegral(obs: DataFrame, valueCol: String,
      op: String): Unit = {
    val dt = obs.schema(valueCol).dataType
    val ok = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case d: DecimalType => d.scale == 0
      case _ => false
    }
    require(ok, s"$op: value column '$valueCol' is $dt — the exact " +
      "integer z-test needs an integral type (byte/short/int/long or " +
      "scale-0 decimal); pre-scale doubles to integer units " +
      "(e.g. round(x*1e6) micro-units) before calling")
  }

  /** Flag each row of (group, integral value): adds `n_obs` (group
    * size) and `is_anomaly` (0/1, strict k-sigma exceedance). */
  def flagOutliers(obs: DataFrame, groupCol: String, valueCol: String,
      k: Int = 3): DataFrame = {
    require(k > 0, "k must be positive")
    requireIntegral(obs, valueCol, "flagOutliers")
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

  /** Robust per-group outliers: |x − median| > k·MAD — the
    * median/median-absolute-deviation test that stays calibrated when
    * the anomalies themselves inflate the moments (one 100× spike
    * widens σ enough to hide the next one; it barely moves the
    * median). Both medians are LOWER medians selected by exact rank
    * ((n+1) div 2 over the sorted integers) — pure integer selection
    * and comparison, no float anywhere, so the decision is
    * bit-identical on any engine and DuckDB-replayable. A zero-MAD
    * group (> half the values identical) flags ANY deviation, the
    * robust analogue of the zero-variance degenerate case.
    *
    * Scale: two rank-selection window passes + two broadcast joins of
    * the group-count-sized medians. The windows sort WITHIN groups —
    * size this operator like the other per-group rankers: fine on
    * pre-aggregated observation tables (the dq_anomaly_robust binding
    * runs on the (type, hour) grid), and on raw billion-row groups
    * prefer [[flagOutliers]]' one-pass moments. The contract is
    * self-enforcing: the first rank window already counts each group,
    * and any group over `maxGroupRows` (default 10M — past the point
    * where a single-task sort is sane) aborts the job with a
    * raise_error naming the group, instead of silently grinding
    * through a corpus-sized per-group sort. The check rides the
    * existing window — no extra pass, plan stays lazy. */
  def flagOutliersRobust(obs: DataFrame, groupCol: String,
      valueCol: String, k: Long = 5L,
      maxGroupRows: Long = 10000000L): DataFrame = {
    require(k > 0, "k must be positive")
    require(maxGroupRows > 0, "maxGroupRows must be positive")
    requireIntegral(obs, valueCol, "flagOutliersRobust")
    Seq("_graft_rn", "_graft_n", "_graft_med", "_graft_d", "_graft_mad",
      "is_anomaly").foreach(c =>
      require(!obs.columns.contains(c),
        s"obs already has a '$c' column — rename it before flagOutliersRobust"))
    def lowerMedian(df: DataFrame, c: String, out: String,
        guard: Boolean = false): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(groupCol)).orderBy(col(c).asc)
      val wn = org.apache.spark.sql.expressions.Window
        .partitionBy(col(groupCol))
      val counted = df.withColumn("_graft_rn", row_number().over(w))
        .withColumn("_graft_n", count(lit(1)).over(wn))
      val checked =
        if (!guard) counted
        else counted.withColumn("_graft_n",
          when(col("_graft_n") <= lit(maxGroupRows), col("_graft_n"))
            .otherwise(raise_error(concat(
              lit("flagOutliersRobust: group "),
              col(groupCol).cast("string"), lit(" has "),
              col("_graft_n").cast("string"),
              lit(s" rows > maxGroupRows=$maxGroupRows — this " +
                "operator sorts within groups; feed it pre-aggregated " +
                "grids, use flagOutliers (one-pass moments) for raw " +
                "tables, or raise maxGroupRows explicitly")))))
      checked
        // `div`, not `/`: Spark's / on integers returns double
        .filter(col("_graft_rn") === expr("(_graft_n + 1) div 2"))
        .select(col(groupCol), col(c).as(out))
    }
    val med = lowerMedian(obs.select(col(groupCol), col(valueCol)),
      valueCol, "_graft_med", guard = true)
    val withDev = obs.join(broadcast(med), groupCol)
      .withColumn("_graft_d",
        abs(col(valueCol) - col("_graft_med")))
    val mad = lowerMedian(
      withDev.select(col(groupCol), col("_graft_d")),
      "_graft_d", "_graft_mad")
    withDev.join(broadcast(mad), groupCol)
      .withColumn("is_anomaly",
        (col("_graft_d") > lit(k) * col("_graft_mad")).cast("int"))
      .withColumnRenamed("_graft_med", "med")
      .withColumnRenamed("_graft_mad", "mad")
      .drop("_graft_d")
  }
}
