package graft

import org.apache.spark.sql.functions._

import graft.operators.{Decontaminate, Pii, Sampling, TextOps}

/** Round-3 curation operators (SURVEY.md §2c): decontamination, PII,
  * repetition/Gopher filtering, weighted sampling — behavior tests on
  * planted inputs (the oracle checks cover the testdata bindings). */
class CurationSpec extends SparkSpec {
  private val s = SparkSpec.spark
  import s.implicits._

  test("exact decontamination drops only benchmark-identical docs") {
    val train = Seq(
      (1L, "the quick brown fox"),
      (2L, "THE  quick   Brown fox"), // normalizes to doc 1 == benchmark
      (3L, "something else entirely")).toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox")).toDF("doc_id", "text")
    val out = Decontaminate.exactClean(train, bench, "doc_id", "text")
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("ngram decontamination flags partial benchmark leakage") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon unique tail here"), // leaks 5-gram
      (2L, "totally unrelated words with no overlap at all")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "prefix alpha beta gamma delta epsilon suffix"))
      .toDF("doc_id", "text")
    val report = Decontaminate.ngramReport(train, bench, "doc_id", "text",
      n = 5)
    val byId = report.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(byId(1L)._1 == 1L && byId(1L)._2 == 1) // the shared 5-gram
    assert(byId(2L) == ((0L, 0)))
    val clean = Decontaminate.ngramClean(train, bench, "doc_id", "text",
      n = 5)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(2L))
  }

  test("pii scan counts and redact replaces each pattern kind") {
    val docs = Seq(
      (1L, "contact a@b.co or 555-123-4567 ssn 123-45-6789 " +
        "ip 10.0.0.1 card 4111 1111 1111 1111"),
      (2L, "no pii in this text at all")).toDF("doc_id", "text")
    val scanned = Pii.scan(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    val hit = scanned(1L)
    for (kind <- Pii.patterns.map(_._1))
      assert(hit.getAs[Long](s"n_$kind") == 1L, kind)
    assert(hit.getAs[Long]("n_pii_total") == 5L)
    assert(scanned(2L).getAs[Long]("n_pii_total") == 0L)

    val red = Pii.redacted(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    val redText = red(1L).getAs[String]("redacted")
    for (kind <- Pii.patterns.map(_._1))
      assert(redText.contains(s"[${kind.toUpperCase}]"), redText)
    assert(!redText.contains("a@b.co") && !redText.contains("123-45-6789"))
    assert(red(2L).getAs[String]("redacted") == "no pii in this text at all")
  }

  test("repetition signals are exact on a constructed doc") {
    // 6 tokens: "x x x y z w" -> n=6, distinct=4, top token x:3,
    // bigrams: "x x","x x","x y","y z","z w" -> 5 bigrams, top "x x":2
    val docs = Seq((1L, "x x x y z w")).toDF("doc_id", "text")
    val r = TextOps.repetition(docs, "doc_id", "text").head()
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(r.getAs[Long]("n_distinct") == 4L)
    assert(r.getAs[Long]("top_token_tf") == 3L)
    assert(r.getAs[Long]("n_bigrams") == 5L)
    assert(r.getAs[Long]("top_bigram_tf") == 2L)
    assert(math.abs(r.getAs[Double]("top_bigram_frac") - 0.4) < 1e-12)
  }

  test("gopher filter keeps clean docs and names every failed rule") {
    val repeaty = ("spam " * 40).trim                 // one token repeated
    val clean = (1 to 50).map(i => s"tok$i").mkString(" ") // 50 distinct
    val docs = Seq((1L, clean), (2L, repeaty), (3L, "too short"))
      .toDF("doc_id", "text")
    val out = TextOps.gopherFilter(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("keep") == 1)
    assert(out(1L).getAs[String]("drop_reasons") == "")
    assert(out(2L).getAs[Int]("keep") == 0)
    val reasons2 = out(2L).getAs[String]("drop_reasons")
    assert(reasons2.contains("distinct_ratio;") &&
      reasons2.contains("top_token_frac;") &&
      reasons2.contains("top_bigram_frac;"), reasons2)
    assert(out(3L).getAs[String]("drop_reasons").contains("n_tokens;"))
  }

  test("weighted bernoulli is deterministic and monotone in weight") {
    val df = (1 to 2000).map(i => (i.toLong, (i % 100).toLong))
      .toDF("id", "w")
    val a = Sampling.weightedBernoulli(df, col("id"), col("w"), 700L,
      1000000L)
    val b = Sampling.weightedBernoulli(df, col("id"), col("w"), 700L,
      1000000L)
    val idsA = a.collect().map(_.getLong(0)).toSet
    assert(idsA == b.collect().map(_.getLong(0)).toSet) // reproducible
    // zero weight is never kept; weight >= den/num is always kept
    assert(Sampling.weightedBernoulli(df.withColumn("w", lit(0L)),
      col("id"), col("w"), 700L, 1000000L).count() == 0L)
    assert(Sampling.weightedBernoulli(df.withColumn("w", lit(2000L)),
      col("id"), col("w"), 700L, 1000000L).count() == 2000L)
    // doubling every weight can only grow the kept set
    val doubled = Sampling.weightedBernoulli(df.withColumn("w",
      col("w") * 2), col("id"), col("w"), 700L, 1000000L)
      .collect().map(_.getLong(0)).toSet
    assert(idsA.subsetOf(doubled))
  }

  test("decon and curation plans stay narrow on the training side") {
    val sfDir = sf
    // decon_exact: training side never shuffles — the benchmark hash
    // set broadcasts (AQE or static), so the plan has no Exchange on
    // the train scan path before the join
    val plan = graft.queries.CurationQueries.deconExact(s, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan)
    // pii_scan / sample_weighted: pure narrow projections, no Exchange
    for (q <- Seq(
        graft.queries.CurationQueries.piiScan(s, sfDir),
        graft.queries.CurationQueries.sampleWeighted(s, sfDir))) {
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), p)
    }
  }
}
