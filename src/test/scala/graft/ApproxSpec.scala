package graft

import org.apache.spark.sql.functions._

/** q19 sketch accuracy vs exact distinct (the sketch is the 100 TB
  * path; exact distinct is the oracle-checked q09). */
class ApproxSpec extends SparkSpec {
  private val s = SparkSpec.spark
  import s.implicits._

  test("HLL estimates stay within 5% of exact distinct counts") {
    val row = graft.queries.Core.q19ApproxDistinct(spark, sf).head()
    val exact = Tables(spark, sf, "lineitem").agg(
      countDistinct(col("l_suppkey")).as("supps")).head().getLong(0)
    val approxSupps = row.getAs[Long]("approx_supps_merged")
    assert(math.abs(approxSupps - exact).toDouble / exact < 0.05,
      s"merged HLL $approxSupps vs exact $exact")

    // per-group approx summed ≥ distinct-per-group sum sanity: each
    // group estimate within 5% of its exact counterpart
    val perGroup = Tables(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey")).as("approx"))
      .collect()
    perGroup.foreach { r =>
      val (e, a) = (r.getAs[Long]("exact"), r.getAs[Long]("approx"))
      assert(math.abs(a - e).toDouble / e < 0.05, s"group $r")
    }
  }

  test("KMV sketch estimates distinct counts, Jaccard, and intersections") {
    val row = graft.queries.Core.q22KmvOverlap(spark, sf).head()
    val orders = Tables(spark, sf, "orders")
    val events = Tables.events(spark, sf)
    val exactA = orders.select("o_custkey").distinct().count().toDouble
    val exactB = events.select("user_id").distinct().count().toDouble
    val exactI = orders.select(col("o_custkey").as("k")).distinct()
      .join(events.select(col("user_id").as("k")).distinct(), "k")
      .count().toDouble
    val exactJ = exactI / (exactA + exactB - exactI)
    // k=256 ⇒ relative stderr ≈ 1/sqrt(254) ≈ 6%; allow 3σ
    assert(math.abs(row.getAs[Double]("est_order_customers") - exactA)
      / exactA < 0.2, s"$row vs $exactA")
    assert(math.abs(row.getAs[Double]("est_event_users") - exactB)
      / exactB < 0.2, s"$row vs $exactB")
    assert(math.abs(row.getAs[Double]("jaccard_est") - exactJ) < 0.2,
      s"$row vs j=$exactJ")
    if (exactI > 0)
      assert(math.abs(row.getAs[Double]("intersect_est") - exactI)
        / exactI < 0.35, s"$row vs i=$exactI")
  }

  test("q40 exact and q41 approx percentiles agree within the GK rank bound") {
    import graft.queries.AnalyticsQueries
    // q40's exact global percentiles equal a brute-force sorted pick
    val g = AnalyticsQueries.q40PercentileGlobal(spark, sf).head()
    val vals = Tables(spark, sf, "lineitem")
      .select(graft.queries.Core.cents(col("l_extendedprice")).as("c"))
      .as[Long].collect().sorted
    def exactAt(f: Double): Long = vals(math.ceil(vals.length * f).toInt - 1)
    assert(g.getAs[Long]("n_rows") == vals.length)
    assert(g.getAs[Long]("p50_cents") == exactAt(0.5), g.toString)
    assert(g.getAs[Long]("p90_cents") == exactAt(0.9), g.toString)
    assert(g.getAs[Long]("p99_cents") == exactAt(0.99), g.toString)
    // q41's sketch values land within the Greenwald-Khanna rank bound
    // (accuracy 10⁴ → ε = 1e-4; allow 10ε for partial-merge slack)
    AnalyticsQueries.q41ApproxPercentile(spark, sf).collect().foreach { r =>
      val flag = r.getString(0)
      val group = Tables(spark, sf, "lineitem")
        .filter(col("l_returnflag") === flag)
        .select(graft.queries.Core.cents(col("l_extendedprice")).as("c"))
        .as[Long].collect().sorted
      for ((c, f) <- Seq("p50_approx" -> 0.5, "p90_approx" -> 0.9,
          "p99_approx" -> 0.99)) {
        val v = r.getAs[Long](c)
        val rank = group.count(_ <= v).toDouble / group.length
        assert(math.abs(rank - f) <= 1e-3 + 1.0 / group.length,
          s"$flag $c: value $v at rank $rank vs target $f")
      }
    }
  }

  test("KMV estimate is exact below k and merge-order independent") {
    graft.functions.GraftFunctions.register(spark)
    // 100 distinct values < k=256 ⇒ sketch holds them all, estimate exact
    val small = (1 to 100).map(_.toLong).toDF("v")
      .agg(expr("kmv_estimate(kmv_sketch(xxhash64(v), 256), 256)"))
      .head().getDouble(0)
    assert(small == 100.0)
    // repartitioned input (different merge order) gives the same sketch
    val big = (1 to 50000).map(_.toLong).toDF("v")
    val s1 = big.repartition(3)
      .agg(expr("kmv_sketch(xxhash64(v), 128)")).head().getSeq[Long](0)
    val s2 = big.repartition(17)
      .agg(expr("kmv_sketch(xxhash64(v), 128)")).head().getSeq[Long](0)
    assert(s1 == s2)
    val est = graft.functions.Kmv.estimate(s1.toArray, 128)
    assert(math.abs(est - 50000.0) / 50000.0 < 0.3, s"est $est")
  }
}
