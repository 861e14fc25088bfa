package graft

import graft.queries.Core

class CoreQueriesSpec extends SparkSpec {

  test("every query key has a distinct name and runs at sf0.001") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      // q08 can legitimately be small but every core query should
      // produce rows on this data.
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("oracle keys are a subset of query keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracleSql keys without queries: $extra")
  }

  test("q01 aggregates are exact on known grouping") {
    val rows = Core.q01PricingSummary(spark, sf).collect()
    assert(rows.length === 6) // 3 returnflags x 2 linestatus (minus absent combos) — at least deterministic count
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val rawCount = Tables(spark, sf, "lineitem")
      .filter("l_shipdate <= timestamp'1998-09-01'").count()
    assert(total === rawCount)
  }

  test("q05 top-k is ordered and bounded") {
    val rows = Core.q05TopK(spark, sf).collect()
    assert(rows.length <= 10)
    val cents = rows.map(_.getAs[Long]("total_cents"))
    assert(cents.sameElements(cents.sortBy(-_)))
  }

  test("q06 per-customer ranks never exceed 3") {
    val bad = Core.q06WindowRank(spark, sf)
      .filter("rn > 3 or rn < 1").count()
    assert(bad === 0)
  }

  test("q12 sessions respect the 30-minute gap") {
    val sess = Core.q12Sessionize(spark, sf)
    // session bounds are sane: end >= start, all events accounted for
    assert(sess.filter("end_us < start_us").count() === 0)
    val nEvents = sess.agg(org.apache.spark.sql.functions.sum("n_events")).head.getLong(0)
    assert(nEvents === Tables.events(spark, sf).count())
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
