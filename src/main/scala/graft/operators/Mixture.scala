package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-mixture curation (round-4, §2d) — hit a target per-source
  * mixture: given integer target weights (e.g. web 40 : code 40 :
  * books 20), find the largest corpus that matches those proportions
  * exactly-proportionally within available mass, and sample it
  * deterministically.
  *
  * The feasible scale is set by the binding source: λ = min over
  * groups of avail_g / target_g; group g then keeps λ·target_g of its
  * mass, i.e. a keep-rate of λ·target_g / avail_g (=1 for the binding
  * group). All rate arithmetic is INTEGER (decimal(38) products,
  * integral division onto a 10^6 threshold grid) and the row-level
  * inclusion test is the same content-addressed (hash mod grid) <
  * threshold rule as [[Sampling]] — deterministic, engine- and
  * cluster-size-reproducible, DuckDB-hash-matchable.
  *
  * Scale: one aggregation over the corpus (map-side combined) to get
  * per-group mass — group count is tiny, so the λ reduction and the
  * rate table are broadcast; the sample itself is then a narrow
  * codegen'd filter at scan speed. No data-sized shuffle anywhere.
  * Mass is per-ROW sampling weight mass (rows are kept/dropped whole);
  * expected kept mass per group is λ·target_g under the uniform hash.
  */
object Mixture {

  /** Threshold grid: keep-rates are floor'd onto 1/10^6 steps. */
  val Scale = 1000000L

  /** Per-group rate table: (grp, avail, target, keep_thr) with
    * keep_thr ∈ [0, Scale]. Groups absent from `targets` get no row
    * (and are dropped by [[sample]]); a target with no available mass
    * makes λ = 0 (empty sample) rather than an error. */
  def rates(df: DataFrame, groupCol: Column, massCol: Column,
      targets: Seq[(String, Long)]): DataFrame = {
    require(targets.nonEmpty && targets.forall(_._2 > 0),
      "targets must be non-empty with positive weights")
    val s = df.sparkSession
    import s.implicits._
    val t = targets.toDF("grp", "target")
    val avail = df.groupBy(groupCol.as("grp"))
      .agg(sum(massCol.cast("long")).as("avail"))
    // λ and thresholds in decimal(38) so avail·Scale never overflows
    // long at corpus scale; integral `div` (not `/` — double division
    // rounds) keeps every engine on the same grid point
    val lamG = avail.join(broadcast(t), "grp")
      .withColumn("_lam_g", expr(
        s"CAST(avail AS DECIMAL(38,0)) * ${Scale}L div " +
          "CAST(target AS DECIMAL(38,0))"))
    val lam = lamG.agg(min(col("_lam_g")).as("_lam"))
    lamG.crossJoin(broadcast(lam))
      .withColumn("keep_thr", least(lit(Scale), expr(
        "CAST(_lam AS DECIMAL(38,0)) * CAST(target AS DECIMAL(38,0)) " +
          "div CAST(avail AS DECIMAL(38,0))")))
      .select(col("grp"), col("avail"), col("target"), col("keep_thr"))
  }

  /** The mixture sample: rows of `df` (plus `keep_thr` for audit)
    * surviving the per-group deterministic keep-rate. The rate table
    * joins under `_graft_`-prefixed internal names so a caller column
    * named `grp` never collides; `keep_thr` is this operator's audit
    * OUTPUT column, so an input already carrying one is rejected
    * loudly rather than silently shadowed. */
  def sample(df: DataFrame, groupCol: Column, keyCol: Column,
      massCol: Column, targets: Seq[(String, Long)]): DataFrame = {
    require(!df.columns.contains("keep_thr"),
      "input already has a keep_thr column — keep_thr is Mixture.sample's audit output; rename it first")
    Seq("_graft_grp", "_graft_thr").foreach { c =>
      require(!df.columns.contains(c),
        s"input column $c collides with Mixture.sample's internal join names; rename it first")
    }
    val r = rates(df, groupCol, massCol, targets)
      .select(col("grp").as("_graft_grp"), col("keep_thr").as("_graft_thr"))
    df.join(broadcast(r), groupCol === col("_graft_grp"))
      .filter(pmod(Sampling.hashBucket(keyCol), lit(Scale)) <
        col("_graft_thr"))
      .drop("_graft_grp")
      .withColumnRenamed("_graft_thr", "keep_thr")
  }

  /** α = 0.5 temperature-mixing rate table (round-9): targets derive
    * from the data itself as floor(√avail_g) — the standard
    * upsample-the-small-sources knob of multilingual/multi-domain LLM
    * mixes (w_g ∝ n_g^α with α < 1 flattens the source distribution;
    * XLM-R/mT5-style sampling). α is pinned to 0.5 because IEEE-754
    * specifies sqrt EXACTLY-rounded — the derived integer targets are
    * bit-identical on every engine, which a pow(n, α) (libm-dependent)
    * could not promise; other α come from passing explicit targets to
    * [[rates]]. Downstream is the identical integer λ/threshold grid:
    * (grp, avail, target, keep_thr), feedable to [[sample]]'s rule.
    * Same plan shape as [[rates]]: one map-side-combined mass
    * aggregation, broadcast-sized reductions, no data shuffle. */
  def temperatureRates(df: DataFrame, groupCol: Column, massCol: Column)
      : DataFrame = {
    val avail = df.groupBy(groupCol.as("grp"))
      .agg(sum(massCol.cast("long")).as("avail"))
    val lamG = avail
      .filter(col("avail") > 0L)
      .withColumn("target",
        expr("CAST(floor(sqrt(CAST(avail AS DOUBLE))) AS BIGINT)"))
      .withColumn("_lam_g", expr(
        s"CAST(avail AS DECIMAL(38,0)) * ${Scale}L div " +
          "CAST(target AS DECIMAL(38,0))"))
    val lam = lamG.agg(min(col("_lam_g")).as("_lam"))
    lamG.crossJoin(broadcast(lam))
      .withColumn("keep_thr", least(lit(Scale), expr(
        "CAST(_lam AS DECIMAL(38,0)) * CAST(target AS DECIMAL(38,0)) " +
          "div CAST(avail AS DECIMAL(38,0))")))
      .select(col("grp"), col("avail"), col("target"), col("keep_thr"))
  }
}
