package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** SURVEY.md §4 — skew helpers: salted agg/join equivalence, bucket
  * caps, per-key top-k. */
class SkewSpec extends SparkSpec {
  private val s = SparkSpec.spark
  import s.implicits._

  test("saltedSumCount equals plain groupBy aggregation") {
    val orders = Tables(spark, sf, "orders")
    val plain = orders.groupBy(col("o_custkey").as("k"))
      .agg(sum(col("o_totalprice")).as("sum_value"),
        count(lit(1)).as("n_rows"))
    val salted = Skew.saltedSumCount(orders, col("o_custkey"),
      col("o_totalprice"), salts = 8)
    assert(salted.count() == plain.count())
    val joined = salted.as("s").join(plain.as("p"), Seq("k"))
      .filter(abs(col("s.sum_value") - col("p.sum_value")) > 1e-6 ||
        col("s.n_rows") =!= col("p.n_rows"))
    assert(joined.count() == 0)
  }

  test("saltedJoin equals plain join") {
    val orders = Tables(spark, sf, "orders")
    val customer = Tables(spark, sf, "customer")
    val plain = orders.join(customer,
      orders("o_custkey") === customer("c_custkey")).count()
    val salted = Skew.saltedJoin(orders, customer,
      orders("o_custkey"), customer("c_custkey"),
      saltSource = orders("o_orderkey"), salts = 4).count()
    assert(salted == plain)
  }

  test("capBuckets drops only oversized groups") {
    val df = Seq.tabulate(20)(i => (if (i < 15) "hot" else s"k$i", i))
      .toDF("bucket", "v")
    val capped = Skew.capBuckets(df, Seq(col("bucket")), maxSize = 10)
    assert(capped.filter(col("bucket") === "hot").count() == 0)
    assert(capped.count() == 5)
  }

  test("topKPerKey bounds each group with a deterministic tie-break") {
    val out = Skew.topKPerKey(Tables(spark, sf, "orders"),
      Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 2)
    val sizes = out.groupBy("o_custkey").count().agg(max("count")).head()
    assert(sizes.getLong(0) <= 2)
    // matches q06's windowed semantics at k=3
    val viaQ6 = graft.queries.Core.q06WindowRank(spark, sf).count()
    val viaOp = Skew.topKPerKey(Tables(spark, sf, "orders"),
      Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 3).count()
    assert(viaOp == viaQ6)
  }
}
