package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Profile, Sampling, Similarity, TextOps}

/** The generic operator API works on ANY table with caller-named
  * columns — the "switch your tables in" library contract. */
class GenericOpsSpec extends SparkSpec {
  private val s = SparkSpec.spark
  import s.implicits._

  private val notes = Seq(
    (101L, "patient stable vitals good recovery on track today"),
    (102L, "patient stable vitals good recovery on track today"), // dup
    (103L, "patient stable vitals good recovery off track today"), // near
    (104L, "completely different clinical note about lab results"))
    .toDF("note_id", "note_text")

  test("Dedup.exact on custom column names") {
    val out = Dedup.exact(notes, "note_id", "note_text")
    assert(out.count() == 3) // two identical notes collapse
    val dupGroup = out.filter(col("n_docs") === 2).head()
    assert(dupGroup.getAs[Long]("keeper_id") == 101L)
  }

  test("Dedup.ngramJaccard finds the near-duplicate pair") {
    // one changed word in 8 kills 3 of 6 shingles: j = 3/9 ≈ 0.33
    val pairs = Dedup.ngramJaccard(notes, "note_id", "note_text", 0.3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((101L, 102L))) // identical
    assert(pairs.contains((101L, 103L)) || pairs.contains((102L, 103L)))
  }

  test("Dedup.minhashLsh catches the exact duplicate") {
    val pairs = Dedup.minhashLsh(notes, "note_id", "note_text", 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((101L, 102L)))
  }

  test("TextOps.stats/qualityScore/topTerms on custom column names") {
    val stats = TextOps.stats(notes, "note_id", "note_text")
    assert(stats.columns.head == "doc_id")
    assert(stats.count() == 4)
    assert(TextOps.qualityScore(notes, "note_id", "note_text")
      .filter(col("quality_band").isNull).count() == 0)
    val top = TextOps.topTerms(notes, "note_id", "note_text", k = 2)
    assert(top.groupBy("doc_id").count()
      .agg(max("count")).head().getLong(0) <= 2)
  }

  test("Similarity operators on a custom embedding table") {
    val vecsDf = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)))
      .toDF("emb_id", "vector")
    val pairs = Similarity.embeddingPairs(vecsDf, "emb_id", "vector", 0.9)
      .collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L)
    val topk = Similarity.bruteforceTopK(vecsDf, "emb_id", "vector",
      isQuery = col("vec_id") === 1L, k = 1).collect()
    assert(topk.length == 1)
    assert(topk(0).getAs[Long]("cand_id") == 2L)
  }

  test("Dedup.dropNearDuplicates keeps one doc per near-dup cluster") {
    val out5 = Dedup.dropNearDuplicates(notes, "note_id", "note_text", 0.5)
    // only the exact dup (102) falls; near-dup 103 is below τ=0.5
    assert(out5.select("note_id").collect().map(_.getLong(0)).toSet ==
      Set(101L, 103L, 104L))
    // a 3-way identical cluster collapses to its min id
    val tri = notes.unionByName(
      Seq((105L, "patient stable vitals good recovery on track today"))
        .toDF("note_id", "note_text"))
    val out = Dedup.dropNearDuplicates(tri, "note_id", "note_text", 0.5)
    assert(out.select("note_id").collect().map(_.getLong(0)).toSet ==
      Set(101L, 103L, 104L)) // 102 and 105 fold into 101
  }

  test("Profile.profile computes per-column stats in one pass") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None),
      (Some(2L), Some("b")), (None, Some("a")))
      .toDF("k", "v")
    val out = Profile.profile(df, Seq("k", "v")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("k").getAs[Long]("n_rows") == 4)
    assert(out("k").getAs[Long]("n_null") == 1)
    assert(out("k").getAs[Long]("n_distinct") == 2)
    assert(out("k").getAs[String]("min_value") == "1")
    assert(out("k").getAs[String]("max_value") == "2")
    assert(out("v").getAs[Long]("n_null") == 1)
    assert(out("v").getAs[Long]("n_distinct") == 2)
    // exact mode = union of narrow per-column aggs (no joins, no expand)
    val plan = Profile.profile(df, Seq("k", "v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Expand"), plan)
    // approx mode = ONE scan, one agg, no expand
    val approxPlan = Profile.profile(df, Seq("k", "v"), exact = false)
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"), approxPlan)
  }

  test("Profile quantiles are within sketch accuracy; names never hit SQL") {
    // 1..10000 uniform: true p50=5000(.5), p95=9500(.05), p99=9900(.01);
    // accuracy 10000 bounds rank error at n/10000 = 1 rank
    val df = (1 to 10000).map(i => (i.toLong, s"s$i"))
      .toDF("x", "label'; --")
    for (exact <- Seq(true, false)) {
      val rows = Profile.profile(df, Seq("x", "label'; --"),
        exact = exact, quantiles = true)
        .collect().map(r => r.getString(0) -> r).toMap
      val x = rows("x")
      assert(math.abs(x.getAs[Double]("p50") - 5000) <= 5, x)
      assert(math.abs(x.getAs[Double]("p95") - 9500) <= 5, x)
      assert(math.abs(x.getAs[Double]("p99") - 9900) <= 5, x)
      // the hostile column name profiles fine; non-numeric → null p50
      val weird = rows("label'; --")
      val nd = weird.getAs[Long]("n_distinct")
      if (exact) assert(nd == 10000L, nd)
      else assert(math.abs(nd - 10000L) <= 500, nd) // HLL ±5%
      assert(weird.isNullAt(weird.fieldIndex("p50")))
    }
    // default (quantiles = false) keeps the 6-column oracle schema
    assert(Profile.profile(df, Seq("x")).columns.toSeq ==
      Seq("column_name", "n_rows", "n_null", "n_distinct",
        "min_value", "max_value"))
  }

  test("Sampling is deterministic and respects fraction/quota") {
    val docs = Tables(spark, sf, "documents")
    val a = Sampling.bernoulli(docs, col("doc_id"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.bernoulli(docs, col("doc_id"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b) // content-addressed, not RNG
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.25) < 0.08, s"${a.size} of $n")
    // growing the fraction only ADDS rows (nested samples)
    val wider = Sampling.bernoulli(docs, col("doc_id"), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(wider))

    val strat = Sampling.stratifiedTake(
      docs.select(col("doc_id"), col("lang")), col("lang"), col("doc_id"), 7)
    val perLang = strat.groupBy("lang").count().collect()
    assert(perLang.forall(_.getLong(1) <= 7))
    assert(strat.filter(col("sample_rank") < 1).count() == 0)
  }
}
