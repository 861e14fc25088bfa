package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** As-of join operator semantics (union-sort-carry-forward). */
class AsOfSpec extends SparkSpec {
  private val s = SparkSpec.spark
  import s.implicits._

  test("picks the latest reference at or before the probe time") {
    val probes = Seq((1L, 100L, "p1"), (1L, 250L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "probe_name")
    val refs = Seq((1L, 100L, "r@100"), (1L, 200L, "r@200"),
      (2L, 60L, "r@60"))
      .toDF("rk", "rt", "ref_name")
    val out = AsOf.joinAsOf(probes, refs,
      leftKey = col("k"), rightKey = col("rk"),
      leftTime = col("t"), rightTime = col("rt"),
      rightValues = Seq("ref_name"))
      .select("probe_name", "ref_name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("p1") == "r@100") // equal time counts (≤ semantics)
    assert(out("p2") == "r@200") // latest ≤ 250
    assert(out("p3") == null) // no ref at or before 50
  }

  test("all carried values come from the SAME latest reference row") {
    val probes = Seq((1L, 300L, "p")).toDF("k", "t", "pn")
    val refs = Seq(
      (1L, 100L, Some("old_a"), Some("old_b")),
      (1L, 200L, None: Option[String], Some("new_b")))
      .toDF("rk", "rt", "va", "vb")
    val out = AsOf.joinAsOf(probes, refs,
      leftKey = col("k"), rightKey = col("rk"),
      leftTime = col("t"), rightTime = col("rt"),
      rightValues = Seq("va", "vb")).collect()(0)
    // the latest ref row (t=200) has va=NULL — it must stay NULL, not be
    // silently backfilled from the older t=100 row
    assert(out.getAs[String]("va") == null)
    assert(out.getAs[String]("vb") == "new_b")
  }

  test("every probe row survives exactly once (left-join cardinality)") {
    val n = Tables.events(spark, sf).count()
    val out = AsOf.q16AsofJoin(spark, sf)
    assert(out.count() == n)
    assert(out.select("event_id").distinct().count() == n)
  }

  test("range join matches the naive non-equi join and avoids nested loops") {
    val out = graft.queries.RangeQueries.q21RangeJoin(spark, sf)
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        expr("ts_ns div 1000").as("ts_us"))
    val iv = ev.groupBy(col("user_id").as("w_user"))
      .agg(min(col("ts_us")).as("s"))
      .withColumn("e", col("s") + graft.queries.RangeQueries.WindowUs)
    val naive = ev.join(iv,
      col("user_id") === col("w_user") &&
        col("ts_us") >= col("s") && col("ts_us") <= col("e"))
      .select("event_id", "user_id")
    assert(out.count() > 0)
    assert(out.count() == naive.count())
    assert(out.exceptAll(naive).count() == 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan) // the point of the bucketing
  }

  test("plan shuffles once on the key (single Exchange below the window)") {
    val plan = AsOf.q16AsofJoin(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 key shuffle, plan:\n$plan")
  }
}
