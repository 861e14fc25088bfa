package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, ProjectExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Round-8 operator tests: persisted dedup index, paragraph dedup. */
class Round8Spec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def doc(tokens: Seq[String]) = tokens.mkString(" ")

  test("DedupIndex round-trips through bucketed parquet with its parameters") {
    val dir = java.nio.file.Files.createTempDirectory("graftidx").toString
    val base = (0 until 20).map(i => s"tok$i")
    val other = (0 until 20).map(i => s"alt$i")
    val corpus = Seq(
      (10L, doc(base)),
      (11L, "totally unrelated corpus text lives here")).toDF("doc_id", "text")
    val batch = Seq(
      (20L, doc(base)),                   // exact dup of corpus 10
      (21L, doc(base.init :+ "changed")), // near-dup of corpus 10
      (22L, doc(other)),                  // fresh; the keeper
      (23L, doc(other)),                  // exact dup within batch
      (24L, doc(other.init :+ "edited")), // near-dup within batch
      (25L, "completely different and unique text")).toDF("doc_id", "text")

    Dedup.saveIndex(Dedup.buildIndex(corpus, "doc_id", "text"),
      "graft_t8_idx", dir, nBuckets = 4)
    // drop the catalog entries to prove loadIndex re-registers the
    // bucketed tables from (prefix, path) alone — the fresh-session path
    Seq("hashes", "shingles", "buckets").foreach(n =>
      spark.sql(s"DROP TABLE IF EXISTS graft_t8_idx_$n"))
    val loaded = Dedup.loadIndex(spark, "graft_t8_idx", dir)
    assert(loaded.minhashK === 16 && loaded.bands === 4)

    val out = Dedup.incrementalCleanIndexed(loaded, batch,
      "doc_id", "text", tau = 0.5)
      .select("doc_id").as[Long].collect.toSet
    assert(out === Set(22L, 25L)) // identical to the in-session index
  }

  test("hotKeys ranks planted skew with exact shares and stable ties") {
    val rows = (1 to 50).map(i => ("cold", i.toLong)) ++
      (1 to 30).map(i => ("warm", i.toLong)) ++
      (1 to 30).map(i => ("tied", i.toLong)) ++
      (1 to 890).map(i => ("hot", i.toLong))
    val df = rows.toDF("k", "v")
    val out = graft.operators.Profile.hotKeys(df, "k", topN = 3)
      .select("k", "n_rows", "share", "rank")
      .as[(String, Long, Double, Long)].collect().toList
    assert(out === List(
      ("hot", 890L, 0.89, 1L),
      ("cold", 50L, 0.05, 2L),
      ("tied", 30L, 0.03, 3L))) // tie vs "warm" broken by key asc
    val e = intercept[IllegalArgumentException] {
      graft.operators.Profile.hotKeys(df.withColumnRenamed("v", "rank"),
        "k", 3)
    }
    assert(e.getMessage.contains("rank"))
  }

  test("last-touch attribution credits the latest prior non-purchase event") {
    // ts is epoch-NANOS as long — the testdata events convention
    // (TIMESTAMP(NANOS) parquet read under nanosAsLong)
    def ev(id: Long, u: Long, t: Int, tpe: String) =
      (id, t * 1000000000L, u, tpe, 1.0)
    val rows = Seq(
      ev(1, 1, 10, "view"), ev(2, 1, 20, "click"),
      ev(3, 1, 30, "purchase"),                     // u1: click
      ev(4, 2, 10, "purchase"),                     // u2: direct (no prior)
      ev(5, 3, 10, "view"), ev(6, 3, 20, "purchase"),
      ev(7, 3, 30, "purchase"),                     // u3: view, view
      ev(8, 4, 10, "click"), ev(9, 4, 20, "purchase"),
      ev(10, 4, 30, "view"))                        // u4: click; trailing view ignored
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("attr").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.AnalyticsQueries.q33Attribution(spark, dir)
      .select("channel", "n_purchases", "n_buyers")
      .as[(String, Long, Long)].collect().toSet
    assert(out === Set(
      ("click", 2L, 2L),   // u1, u4
      ("view", 2L, 1L),    // u3 twice
      ("direct", 1L, 1L))) // u2
  }

  test("ann_recall evaluates K candidates per query with recall in [0,1]") {
    val out = graft.queries.SimilarityQueries.annRecall(spark, sf)
      .select("query_id", "n_overlap", "k_eval", "recall")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length === 10) // NumQueries
    out.foreach { case (_, overlap, kEval, recall) =>
      assert(kEval === 5L && overlap >= 0L && overlap <= kEval)
      assert(recall === overlap.toDouble / kEval.toDouble)
    }
    // LSH recall at this tiny SF is modest (≈0.2 on random-ish
    // synthetic vectors) but far above chance (k/|corpus| ≈ 0.01) —
    // the query's job is to MEASURE it, not to win it
    val mean = out.map(_._4).sum / out.length
    assert(mean >= 0.1, s"mean recall@5 = $mean")
  }

  test("transition counts and freshness lag on a constructed stream") {
    def ev(id: Long, u: Long, t: Int, tpe: String) =
      (id, t * 1000000000L, u, tpe, 1.0)
    val rows = Seq(
      ev(1, 1, 10, "view"), ev(2, 1, 20, "click"),
      ev(3, 1, 30, "purchase"),
      ev(4, 2, 10, "view"), ev(5, 2, 20, "view"))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("trans").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val trans = graft.queries.AnalyticsQueries.q34Transitions(spark, dir)
      .as[(String, String, Long)].collect().toSet
    assert(trans === Set(
      ("view", "click", 1L), ("click", "purchase", 1L),
      ("view", "view", 1L)))
    val fresh = graft.queries.QualityQueries.dqFreshness(spark, dir)
      .select("event_type", "last_seen_us", "staleness_us")
      .as[(String, Long, Long)].collect().toSet
    assert(fresh === Set(
      ("view", 20000000L, 10000000L),
      ("click", 20000000L, 10000000L),
      ("purchase", 30000000L, 0L)))
  }

  test("24h rolling volumes slide over hour gaps (RANGE frame, not ROWS)") {
    // hours 0, 1, and 30 for one type: hour 30 must NOT see hours 0-1
    // (a ROWS frame would) — RANGE over hour_id respects the gap
    def ev(id: Long, hour: Int, v: Double) =
      (id, hour * 3600L * 1000000000L, 1L, "view", v)
    val rows = Seq(ev(1, 0, 1.0), ev(2, 0, 2.0), ev(3, 1, 4.0),
      ev(4, 30, 8.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("roll").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.AnalyticsQueries.q35Rolling(spark, dir)
      .select("hour_id", "n_events", "n_24h", "cents_24h")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (0L, 2L, 2L, 300L),   // hours 0: itself
      (1L, 1L, 3L, 700L),   // hour 1: hours 0+1
      (30L, 1L, 1L, 800L))) // hour 30: alone — the gap is respected
  }

  test("source report: exact counts, unique hashes, micro-exact quality mean") {
    val docs = Seq(
      (1L, "a", "alpha beta gamma"),
      (2L, "a", "alpha  beta   gamma"),  // normalizes to doc 1 → dup
      (3L, "a", "something else here"),
      (4L, "b", "only doc of source b"))
      .toDF("doc_id", "source", "text")
    val out = graft.queries.CurationQueries.sourceReport(docs)
      .select("source", "n_docs", "n_unique", "sum_tokens")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 2's doubled spaces keep raw split tokens (6) but hash-dedupe
    // against doc 1 after normalization
    assert(out("a") === ((3L, 2L, 12L)))
    assert(out("b") === ((1L, 1L, 5L)))
  }

  test("flagOutliersRobust: median/MAD catches what spike-inflated sigma hides") {
    // group a: nine quiet hours of ~100 plus TWO spikes of 5000.
    // moments: sigma is so inflated by the spikes that 5000 sits inside
    // 3 sigma (k-sigma test misses BOTH); median/MAD flags exactly them.
    val a = Seq(98L, 99L, 100L, 100L, 100L, 101L, 101L, 102L, 103L,
      5000L, 5000L).zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }
    val df = a.toDF("grp", "id", "v")
    val robust = graft.operators.Anomaly
      .flagOutliersRobust(df, "grp", "v", k = 5L)
      .filter(col("is_anomaly") === 1).select("id").as[Long].collect().toSet
    assert(robust === Set(9L, 10L))
    val moments = graft.operators.Anomaly.flagOutliers(df, "grp", "v")
      .filter(col("is_anomaly") === 1).select("id").as[Long].collect().toSet
    assert(moments === Set.empty[Long]) // the motivating failure mode
    // zero-MAD group: >half identical — any deviation flags
    val b = ((1L to 6L).map(i => ("b", i, 7L)) :+ (("b", 7L, 9L)))
      .toDF("grp", "id", "v")
    val zb = graft.operators.Anomaly
      .flagOutliersRobust(b, "grp", "v", k = 5L)
      .filter(col("is_anomaly") === 1).select("id").as[Long].collect().toSet
    assert(zb === Set(7L))
  }

  test("reconciliation audit classifies exact / near / missing / divergent orders") {
    val dir = java.nio.file.Files.createTempDirectory("recon").toString
    Seq(
      (1L, 100.00), // exact: one line of 100.00
      (2L, 100.00), // within 1%: lines sum to 100.50
      (3L, 100.00), // divergent: lines sum to 150.00
      (4L, 100.00)) // no lines at all
      .toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(
      (1L, 100.00, 0.0, 0.0),
      (2L, 100.50, 0.0, 0.0),
      (3L, 100.00, 0.0, 0.5))
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = graft.queries.QualityQueries.dqReconciliation(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    //          n,  none, exact, within1pct,  maxdiff,  sumdiff
    assert(out === ((4L, 1L, 1L, 2L, 10000L, 15050L)))
  }

  test("bpe_count: greedy longest-match against a fixed vocab") {
    graft.functions.GraftFunctions.register(spark)
    def count(text: String, vocab: Seq[String]): Long =
      Seq(text).toDF("t")
        .select(graft.operators.TextOps.vocabTokens(col("t"), vocab))
        .as[Long].head()
    // longest match wins: "the" consumed whole, not "th"+"e"-fallback
    assert(count("the", Seq("th", "the", "he")) === 1L)
    // greedy is NOT optimal: "thes" → "the" + fallback "s" (2), even
    // though "th"+"es" would also be 2 — but "xthes" → "x","the","s"
    assert(count("thes", Seq("th", "the", "es")) === 2L)
    assert(count("xthes", Seq("th", "the", "es")) === 3L)
    // unknown chars are one fallback token each; spaces separate
    assert(count("zzz", Seq("ab")) === 3L)
    assert(count("ab ab  ab", Seq("ab")) === 3L)
    assert(count("", Seq("ab")) === 0L)
    // case-normalized by vocabTokens (lower + trim)
    assert(count("  THE  ", Seq("the")) === 1L)
    // whitespace misestimate story: vocab count exceeds word count
    assert(count("scanner", Seq("sc", "an", "ner")) === 3L)
  }

  test("TextOps.stats default output is unchanged; vocab adds one column") {
    val docs = Seq((1L, "the scanner runs")).toDF("doc_id", "text")
    val base = graft.operators.TextOps.stats(docs, "doc_id", "text")
    assert(base.columns.toSeq === Seq("doc_id", "char_len", "n_tokens_ws",
      "n_tokens_bpe", "avg_word_len", "punct_ratio"))
    val withVocab = graft.operators.TextOps.stats(docs, "doc_id", "text",
      bpeVocab = Some(Seq("the", "sc", "an", "ner", "ru", "ns")))
    assert(withVocab.columns.toSeq === base.columns.toSeq :+ "n_tokens_vocab")
    assert(withVocab.select("n_tokens_vocab").as[Long].head() === 6L)
  }

  test("buildPqIndex: deterministic hash-sampled training; pqQuery serves a prebuilt index") {
    val embs = Tables(spark, sf, "embeddings")
    // trainTarget far below the corpus → codebooks fit on the
    // hash-sample; build twice → identical codes (sample + seeds are
    // deterministic, encode is a pure argmin over the centroids)
    val idx = graft.operators.Similarity
      .buildPqIndex(embs, "vec_id", "embedding", trainTarget = 100)
    val idx2 = graft.operators.Similarity
      .buildPqIndex(embs, "vec_id", "embedding", trainTarget = 100)
    assert(idx.codes.collect().toSet === idx2.codes.collect().toSet)
    assert(idx.subDim * idx.subspaces ===
      embs.select(size(col("embedding"))).head().getInt(0))
    // a prebuilt index serves query batches: k rows per query, no self
    val got = graft.operators.Similarity
      .pqQuery(idx, embs, "vec_id", "embedding", col("vec_id") < 10, k = 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    assert(got.size === 50 && got.forall(p => p._1 != p._2))
  }

  test("PqIndex round-trips through bucketed parquet; served queries identical") {
    val dir = java.nio.file.Files.createTempDirectory("graftpq").toString
    val embs = Tables(spark, sf, "embeddings")
    val built = graft.operators.Similarity
      .buildPqIndex(embs, "vec_id", "embedding")
    graft.operators.Similarity
      .savePqIndex(built, "graft_t8_pq", dir, nBuckets = 4)
    spark.sql("DROP TABLE IF EXISTS graft_t8_pq_codes") // fresh-session path
    val loaded = graft.operators.Similarity
      .loadPqIndex(spark, "graft_t8_pq", dir)
    assert(loaded.subspaces === built.subspaces &&
      loaded.codebook === built.codebook && loaded.subDim === built.subDim)
    def serve(ix: graft.operators.Similarity.PqIndex) =
      graft.operators.Similarity
        .pqQuery(ix, embs, "vec_id", "embedding", col("vec_id") < 10, k = 5)
        .select("query_id", "cand_id", "rank")
        .as[(Long, Long, Long)].collect().toSet
    assert(serve(loaded) === serve(built))
  }

  test("dedupParagraphs drops planted boilerplate, keeps unique spans in order") {
    val boiler = "subscribe to our newsletter for updates"
    val docs = Seq(
      (1L, s"alpha body one\n\n$boiler\n\nalpha body two"),
      (2L, s"$boiler\n\nbeta body"),
      (3L, s"gamma body\n\n$boiler"),
      (4L, s"$boiler"),                       // all-boilerplate doc
      (5L, "delta body\n\n\n\ndelta tail"),   // doubled delimiter: no empty para
      (6L, "")).toDF("doc_id", "text")        // empty doc
    val out = graft.operators.Paragraph
      .dedupParagraphs(docs, "doc_id", "text", maxDf = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((3L, 1L, "alpha body one\n\nalpha body two")))
    assert(out(2L) === ((2L, 1L, "beta body")))
    assert(out(3L) === ((2L, 1L, "gamma body")))
    assert(out(4L) === ((1L, 1L, "")))
    assert(out(5L) === ((2L, 0L, "delta body\n\ndelta tail")))
    assert(out(6L) === ((0L, 0L, "")))
    // a paragraph at exactly df = maxDf survives
    val under = Seq((1L, "shared para\n\nown a"), (2L, "shared para\n\nown b"))
      .toDF("doc_id", "text")
    val kept = graft.operators.Paragraph
      .dedupParagraphs(under, "doc_id", "text", maxDf = 2)
      .filter(col("n_dropped") > 0).count()
    assert(kept === 0L)
  }

  test("paragraph ingest drops corpus boilerplate; index round-trips with its regex") {
    val boiler = "subscribe to our newsletter"
    val corpus = Seq(
      (1L, s"one body\n\n$boiler"), (2L, s"$boiler\n\ntwo body"),
      (3L, s"three body\n\n$boiler")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, s"fresh content\n\n$boiler"),     // corpus boilerplate drops
      (11L, "batch dup\n\nown text"),
      (12L, "batch dup\n\nother text"))       // batch-internal dup NOT counted
      .toDF("doc_id", "text")
    val built = graft.operators.Paragraph
      .buildParagraphIndex(corpus, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("paraidx").toString
    graft.operators.Paragraph
      .saveParagraphIndex(built, "graft_t8_para", dir, nBuckets = 4)
    spark.sql("DROP TABLE IF EXISTS graft_t8_para_paradf")
    val loaded = graft.operators.Paragraph
      .loadParagraphIndex(spark, "graft_t8_para", dir)
    assert(loaded.splitRegex === built.splitRegex)
    val out = graft.operators.Paragraph
      .cleanAgainstIndex(loaded, batch, "doc_id", "text", maxDf = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(10L) === ((2L, 1L, "fresh content")))
    assert(out(11L) === ((2L, 0L, "batch dup\n\nown text")))
    assert(out(12L) === ((2L, 0L, "batch dup\n\nother text")))
  }

  test("loaded index probe: corpus relations read bucketed, never reshuffled") {
    val dir = java.nio.file.Files.createTempDirectory("graftidx2").toString
    val corpus = (0L until 40L).map(i =>
      (i, doc((0 until 12).map(t => s"c${i}w$t")))).toDF("doc_id", "text")
    val batch = (100L until 110L).map(i =>
      (i, doc((0 until 12).map(t => s"b${i}w$t")))).toDF("doc_id", "text")
    Dedup.saveIndex(Dedup.buildIndex(corpus, "doc_id", "text"),
      "graft_t8_plan", dir, nBuckets = 4)
    val loaded = Dedup.loadIndex(spark, "graft_t8_plan", dir)

    val conf = spark.conf
    val oldBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      // force shuffle joins and a static plan so the exchange structure
      // is inspectable — at scale the corpus side is never broadcastable
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "false")
      // the exact stage materializes behind a checkpoint inside the
      // operator (its result feeds four consumers), which hides its
      // plan from the result — audit the stage plan directly (the
      // SAME code path the operator runs), then the probe plan
      val exactPlan = Dedup.exactSurvivors(loaded, batch,
        "doc_id", "text").queryExecution.executedPlan
      val plan = Dedup.incrementalCleanIndexed(loaded, batch,
        "doc_id", "text", tau = 0.5).queryExecution.executedPlan
      def bucketed(p: SparkPlan) = p.collect {
        case f: FileSourceScanExec if f.bucketedScan => f
      }
      // hashes (exact stage); shingles + buckets (near-vs-corpus stage)
      assert(bucketed(exactPlan).nonEmpty, exactPlan.toString)
      assert(bucketed(plan).size >= 2, plan.toString)
      // the probe must shuffle ONLY batch-sized relations: no exchange
      // sits (through narrow ops) directly above a bucketed corpus scan
      @annotation.tailrec
      def throughNarrow(n: SparkPlan): SparkPlan = n match {
        case p: ProjectExec => throughNarrow(p.child)
        case f: FilterExec => throughNarrow(f.child)
        case s: SortExec => throughNarrow(s.child)
        case o => o.children match {
          case Seq(only) if o.getClass.getSimpleName.startsWith("WholeStageCodegen") ||
            o.getClass.getSimpleName == "InputAdapter" ||
            o.getClass.getSimpleName == "ColumnarToRowExec" =>
            throughNarrow(only)
          case _ => o
        }
      }
      Seq(exactPlan, plan).foreach { p =>
        val reshuffled = p.collect {
          case ex: ShuffleExchangeExec => throughNarrow(ex.child)
        }.collect { case f: FileSourceScanExec if f.bucketedScan => f }
        assert(reshuffled.isEmpty,
          s"bucketed corpus scan under an Exchange:\n$p")
      }
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldBroadcast)
      conf.set("spark.sql.adaptive.enabled", oldAqe)
    }
  }
}
