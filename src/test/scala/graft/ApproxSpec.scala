package graft

import org.apache.spark.sql.functions._

/** q19 sketch accuracy vs exact distinct (the sketch is the 100 TB
  * path; exact distinct is the oracle-checked q09). */
class ApproxSpec extends SparkSpec {

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
}
