package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Drift, LmScore, Search, Similarity, Timeseries}

/** Round-7 operators: gap fill (LOCF + linear), TF-IDF retrieval,
  * bigram-LM scoring, PSI drift, SemDeDup, PQ ANN, fuzzy identity
  * matching, vocabulary/OOV, incremental batch-vs-corpus dedup. */
class Round7Spec extends SparkSpec {

  private val s = spark
  import s.implicits._

  // ------------------------------------------------------- Timeseries

  test("gapFillLocf: dense grid, gap flags, LOCF values") {
    val obs = Seq(("a", 10L, 5L), ("a", 13L, 8L), ("b", 100L, 1L))
      .toDF("series", "bucket", "v")
    val out = Timeseries.gapFillLocf(obs, "series", "bucket", Seq("v"))
      .orderBy("series", "bucket")
      .select("series", "bucket", "is_gap", "v", "v_filled")
      .as[(String, Long, Int, Option[Long], Long)].collect.toSeq
    assert(out === Seq(
      ("a", 10L, 0, Some(5L), 5L),
      ("a", 11L, 1, None, 5L),
      ("a", 12L, 1, None, 5L),
      ("a", 13L, 0, Some(8L), 8L),
      ("b", 100L, 0, Some(1L), 1L)))
  }

  test("gapFillLocf rejects colliding internal/output names") {
    val obs = Seq(("a", 1L, 2L)).toDF("series", "bucket", "v")
    val e1 = intercept[IllegalArgumentException] {
      Timeseries.gapFillLocf(obs.withColumn("_graft_obs", lit(1)),
        "series", "bucket", Seq("v"))
    }
    assert(e1.getMessage.contains("_graft_obs"))
    val e2 = intercept[IllegalArgumentException] {
      Timeseries.gapFillLocf(obs.withColumn("v_filled", lit(1)),
        "series", "bucket", Seq("v"))
    }
    assert(e2.getMessage.contains("v_filled"))
  }

  test("gapFillLinear: gaps interpolate between neighbors; obs exact") {
    val obs = Seq(("a", 10L, 10.0), ("a", 13L, 16.0), ("b", 5L, 7.0))
      .toDF("series", "bucket", "v")
    val out = Timeseries.gapFillLinear(obs, "series", "bucket", "v")
      .orderBy("series", "bucket")
      .select("series", "bucket", "is_gap", "v_interp")
      .as[(String, Long, Int, Double)].collect.toSeq
    assert(out === Seq(
      ("a", 10L, 0, 10.0),
      ("a", 11L, 1, 12.0),
      ("a", 12L, 1, 14.0),
      ("a", 13L, 0, 16.0),
      ("b", 5L, 0, 7.0)))
  }

  // ----------------------------------------------------------- TF-IDF

  test("tfidfTopK: rare-term match outranks common-only match") {
    val docs = Seq(
      (1L, "rare common common"),
      (2L, "common common common"),
      (3L, "other words here")).toDF("doc_id", "text")
    val out = Search.tfidfTopK(docs, "doc_id", "text",
      Seq("rare", "common"), k = 5)
      .orderBy("rank").as[(Long, Double, Long)].collect.toSeq
    assert(out.map(_._1) === Seq(1L, 2L)) // doc 3 matches nothing
    // reference smooth-idf cosines (N=3; query tf = 1 per term)
    val idfR = math.log(4.0 / 2.0) + 1.0 // df(rare) = 1
    val idfC = math.log(4.0 / 3.0) + 1.0 // df(common) = 2
    val qn = math.sqrt(idfR * idfR + idfC * idfC)
    val exp1 = (idfR * idfR + 2.0 * idfC * idfC) /
      (math.sqrt(idfR * idfR + (2.0 * idfC) * (2.0 * idfC)) * qn)
    val exp2 = (3.0 * idfC * idfC) / ((3.0 * idfC) * qn)
    assert(math.abs(out(0)._2 - exp1) < 1e-6)
    assert(math.abs(out(1)._2 - exp2) < 1e-6)
  }

  test("tfidfTopK binds terms as literals (quotes are just tokens)") {
    val docs = Seq((1L, "o'brien wrote this"), (2L, "nothing relevant"))
      .toDF("doc_id", "text")
    val out = Search.tfidfTopK(docs, "doc_id", "text",
      Seq("o'brien"), k = 5).as[(Long, Double, Long)].collect.toSeq
    assert(out.map(_._1) === Seq(1L))
  }

  // -------------------------------------------------------- bigram LM

  test("bigramScore: exact add-one-smoothed values; short docs null") {
    val docs = Seq((1L, "a b a b"), (2L, "c"), (3L, "a b"))
      .toDF("doc_id", "text")
    val out = LmScore.bigramScore(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Int, Long, Option[Double])].collect.toSeq
    // corpus: C(a)=3, C(b)=3, C(c)=1, V=3; C(a,b)=3, C(b,a)=1
    // doc 1: [ln(4/6), ln(2/6), ln(4/6)] -> avg = -0.636514
    assert(out(0) === ((1L, 4, 3L, Some(-0.636514))))
    assert(out(1) === ((2L, 1, 0L, None)))
    assert(out(2) === ((3L, 2, 1L, Some(-0.405465))))
  }

  test("bigramScore: corpus-typical text outscores shuffled text") {
    val docs = Tables(spark, sf, "documents")
    val out = LmScore.bigramScore(docs, "doc_id", "text")
    // every multi-token doc scored, scores strictly negative
    val n = out.filter(col("n_bigrams") > 0 &&
      col("avg_logp").isNotNull && col("avg_logp") < 0.0).count()
    assert(n === out.filter(col("n_bigrams") > 0).count())
  }

  // ------------------------------------------------------------- PSI

  test("psiReport: identical distributions -> psi 0, stable") {
    val df = (1L to 1000L)
      .map(i => (i, i % 2 == 0, (i / 2) % 10, if (i % 3 == 0) "x" else "y"))
      .toDF("id", "flag", "v", "c")
    val out = Drift.psiReport(df, col("flag"),
      numeric = Seq(("v", 5)), categorical = Seq("c"))
      .orderBy("feature")
      .as[(String, Long, Long, Long, Double, String)].collect.toSeq
    // (i/2)%10 pairs even/odd ids onto the same value -> identical
    // numeric distributions; c differs slightly between halves
    val vRow = out.find(_._1 == "v").get
    assert(vRow._2 === 500L && vRow._3 === 500L)
    assert(vRow._5 === 0.0 && vRow._6 === "stable")
  }

  test("psiReport: gross shift clamps to edge bucket and flags") {
    val ref = (1L to 500L).map(i => (i, true, i % 10))
    val cur = (501L to 1000L).map(i => (i, false, 1000L + i % 10))
    val df = (ref ++ cur).toDF("id", "flag", "v")
    val out = Drift.psiReport(df, col("flag"),
      numeric = Seq(("v", 10)), categorical = Nil)
      .as[(String, Long, Long, Long, Double, String)].head()
    // all current mass lands clamped in the top bucket
    assert(out._5 > 0.25 && out._6 === "shifted")
  }

  test("psiReport: categorical nulls bucket as __null__") {
    val df = Seq((1L, true, Some("x")), (2L, true, None),
      (3L, false, Some("x")), (4L, false, None))
      .toDF("id", "flag", "c")
    val out = Drift.psiReport(df, col("flag"),
      numeric = Nil, categorical = Seq("c"))
      .as[(String, Long, Long, Long, Double, String)].head()
    assert(out._4 === 2L) // x and __null__
    assert(out._5 === 0.0) // same mix on both sides
  }

  test("Anomaly.flagOutliers: exact integer 3-sigma decisions") {
    // group a: 10 values of 100 plus one of 1000 — the spike is far
    // beyond 3σ; the 100s sit well inside
    val a = (1L to 10L).map(i => ("a", i, 100L)) :+ (("a", 11L, 1000L))
    // group b: all equal — zero variance, zero deviation, no flags
    val b = (1L to 5L).map(i => ("b", i, 7L))
    val df = (a ++ b).toDF("grp", "id", "v")
    val out = graft.operators.Anomaly.flagOutliers(df, "grp", "v")
      .select("grp", "id", "is_anomaly")
      .as[(String, Long, Int)].collect
    assert(out.filter(_._3 == 1).map(r => (r._1, r._2)).toSet ===
      Set(("a", 11L)))
    // near-constant group: ten 7s + one 8 — exact moments give
    // dev² = 100 > k²·(nQ−S²) = 90, a boundary float variance would
    // get wrong at the ulp level
    val c = ((1L to 10L).map(i => ("c", i, 7L)) :+ (("c", 11L, 8L)))
      .toDF("grp", "id", "v")
    val flagged = graft.operators.Anomaly.flagOutliers(c, "grp", "v")
      .filter(col("is_anomaly") === 1)
      .select("id").as[Long].collect.toSet
    assert(flagged === Set(11L))
  }

  test("Anomaly.flagOutliers survives magnitudes that overflow long Σx²") {
    // values ~3·10¹²: a single x² ≈ 9·10²⁴ overflows long (~9.2·10¹⁸)
    // — with long moments ANSI mode aborts the job loudly; decimal(38)
    // moments must both survive and still decide exactly
    val base = 3_000_000_000_000L
    val df = ((1L to 10L).map(i => ("g", i, base + i)) :+
      (("g", 11L, 10L * base))).toDF("grp", "id", "v")
    val flagged = graft.operators.Anomaly.flagOutliers(df, "grp", "v")
      .filter(col("is_anomaly") === 1)
      .select("id").as[Long].collect.toSet
    assert(flagged === Set(11L))
  }

  test("Anomaly.flagOutliers rejects colliding internal/output columns") {
    val df = Seq(("a", 1L, 2L)).toDF("grp", "n_obs", "v")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Anomaly.flagOutliers(df, "grp", "v")
    }
    assert(e.getMessage.contains("n_obs"))
  }

  // ------------------------------------------- fuzzy match / vocabulary

  test("Fuzzy.selfMatch finds exactly the distance-≤1 pairs") {
    val df = Seq(
      (1L, "MRN-1234"), (2L, "MRN-1235"), // substitution: distance 1
      (3L, "MRN-123"),                    // deletion of 1's last char
      (4L, "XRN-1234"),                   // substitution vs 1
      (5L, "totally-else")).toDF("id", "name")
    val out = graft.operators.Fuzzy.selfMatch(df, "id", "name")
      .select("id_a", "id_b", "distance")
      .as[(Long, Long, Int)].collect.toSet
    assert(out === Set((1L, 2L, 1), (1L, 3L, 1), (1L, 4L, 1),
      (2L, 3L, 1)))
    // 2-vs-4 (two substitutions) and 3-vs-4 (substitution + insertion)
    // are distance 2 -> correctly absent
  }

  test("Vocab.oovReport: exact counts against the induced top-V") {
    val df = Seq(
      (1L, "a a b rare1"), (2L, "a b b"), (3L, "rare2 rare3"))
      .toDF("doc_id", "text")
    // corpus counts: a=3, b=3, rare*=1 each; V=2 -> vocab {a, b}
    val out = graft.operators.Vocab.oovReport(df, "doc_id", "text", 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect.toSeq
    assert(out === Seq(
      (1L, 4L, 1L, 0.25), (2L, 3L, 0L, 0.0), (3L, 2L, 2L, 1.0)))
  }

  // ------------------------------------------------ incremental dedup

  test("incrementalClean: all four stages drop; originals survive") {
    def doc(tokens: Seq[String]) = tokens.mkString(" ")
    val base = (0 until 20).map(i => s"tok$i")
    val other = (0 until 20).map(i => s"alt$i")
    val corpus = Seq(
      (10L, doc(base)),
      (11L, "totally unrelated corpus text lives here")).toDF("doc_id", "text")
    val batch = Seq(
      (20L, doc(base)),                          // exact dup of corpus 10
      (21L, doc(base.init :+ "changed")),        // near-dup of corpus 10
      (22L, doc(other)),                         // fresh; the keeper
      (23L, doc(other)),                         // exact dup within batch
      (24L, doc(other.init :+ "edited")),        // near-dup within batch
      (25L, "completely different and unique text")).toDF("doc_id", "text")
    val out = Dedup.incrementalClean(corpus, batch, "doc_id", "text",
      tau = 0.5).select("doc_id").as[Long].collect.toSet
    assert(out === Set(22L, 25L))
    // idempotence: re-running over an already-clean batch is identity
    val clean = batch.filter(col("doc_id").isin(22L, 25L))
    val again = Dedup.incrementalClean(corpus, clean, "doc_id", "text",
      tau = 0.5).select("doc_id").as[Long].collect.toSet
    assert(again === Set(22L, 25L))
    // the persisted-index form computes the identical survivor set
    val indexed = Dedup.incrementalCleanIndexed(
      Dedup.buildIndex(corpus, "doc_id", "text"), batch,
      "doc_id", "text", tau = 0.5)
      .select("doc_id").as[Long].collect.toSet
    assert(indexed === Set(22L, 25L))
  }

  // ------------------------------------------------------------- PQ

  test("pqTopK: deterministic, self-excluded, useful recall vs exact L2") {
    val embs = Tables(spark, sf, "embeddings")
    val isQ = col("vec_id") < 10
    val k = 5
    val pq = Similarity.pqTopK(embs, "vec_id", "embedding", isQ, k)
    val got = pq.select("query_id", "cand_id")
      .as[(Long, Long)].collect.toSet
    assert(got.size === 50 && got.forall(p => p._1 != p._2))
    // determinism: seeded codebooks -> identical result
    val again = Similarity.pqTopK(embs, "vec_id", "embedding", isQ, k)
      .select("query_id", "cand_id").as[(Long, Long)].collect.toSet
    assert(again === got)
    // exact L2 top-k baseline (d2 = qnn - 2·dot + cnn)
    val v = Similarity.vecs(embs, "vec_id", "embedding")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("d2").asc, col("cand_id").asc)
    val exact = v.filter(isQ).as("a")
      .join(v.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("cand_id"),
        (col("a.nn") - lit(2.0) * expr("vec_dot(a.e, b.e)") + col("b.nn"))
          .as("d2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id").as[(Long, Long)].collect.toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    info(s"PQ recall@$k vs exact L2 = $recall")
    assert(recall >= 0.2, s"PQ recall@$k = $recall")
    // exact re-rank of the top-4k approximate candidates recovers most
    // of what coarse codebooks lose
    val reranked = Similarity.pqTopK(embs, "vec_id", "embedding", isQ, k,
      rerank = 10 * k)
      .select("query_id", "cand_id").as[(Long, Long)].collect.toSet
    val recallR = reranked.intersect(exact).size.toDouble / exact.size
    info(s"PQ+rerank(10k) recall@$k vs exact L2 = $recallR")
    assert(recallR > recall && recallR >= 0.5,
      s"PQ rerank recall@$k = $recallR (approx-only $recall)")
  }

  // -------------------------------------------------------- SemDeDup

  test("semDedup: identical vectors dedup to the min id") {
    val e = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val o = Seq(0.0f, 1.0f, 0.0f, 0.0f)
    val df = Seq((1L, e), (2L, e), (3L, o))
      .toDF("vec_id", "embedding")
    val out = Similarity.semDedup(df, "vec_id", "embedding",
      tau = 0.9, cells = 2)
      .orderBy("vec_id").as[(Long, Int, Int)].collect.toSeq
    assert(out.map(r => r._1 -> r._3) ===
      Seq(1L -> 1, 2L -> 0, 3L -> 1))
  }

  test("semDedup agrees with within-cell brute force on testdata") {
    val embs = Tables(spark, sf, "embeddings")
    val out = Similarity.semDedup(embs, "vec_id", "embedding",
      tau = 0.4, cells = 8)
    val cellsDf = out.select(col("vec_id"), col("cell"))
    // brute-force: all ≥τ pairs, restricted to same-cell, components,
    // losers = non-min members
    val pairs = Similarity.embeddingPairs(embs, "vec_id", "embedding", 0.4)
      .join(cellsDf.withColumnRenamed("vec_id", "id_a")
        .withColumnRenamed("cell", "cell_a"), "id_a")
      .join(cellsDf.withColumnRenamed("vec_id", "id_b")
        .withColumnRenamed("cell", "cell_b"), "id_b")
      .filter(col("cell_a") === col("cell_b"))
      .select("id_a", "id_b")
    val comp = Dedup.components(pairs, "id_a", "id_b")
    val expectedDropped = comp.filter(col("node") =!= col("component"))
      .select(col("node")).as[Long].collect.toSet
    Dedup.release(comp)
    val dropped = out.filter(col("keep") === 0)
      .select("vec_id").as[Long].collect.toSet
    assert(dropped === expectedDropped)
    assert(out.count() === embs.count())
  }
}
