package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, NaiveBayes, Paragraph, Similarity}

/** Round-10: the standing-structure story COMPOSES. Every persisted
  * index (dedup, paragraph, NB model, IVFADC) has its own round-trip
  * test; this suite builds ALL FOUR from one corpus snapshot, runs a
  * single ingest micro-batch through the full chain
  * (dedup → paragraph clean → NB score → ANN probe), and asserts each
  * stage's output matches the inline (build-in-session) form — the
  * daily-ingest pipeline a 100 TB corpus store would actually run,
  * where nothing corpus-sized is recomputed per batch.
  */
class Round10Spec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._

  test("one ingest batch flows through all four persisted indexes; " +
      "every stage matches its inline form") {
    val boiler = "subscribe to our newsletter for updates"
    val realDocs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    // five corpus docs share a boilerplate paragraph (df = 5)
    val syn = (1 to 5).map(i =>
      (10000L + i, s"genuinely unique corpus passage number $i\n\n$boiler"))
      .toDF("doc_id", "text")
    val corpus = realDocs.unionByName(syn)
    val dupText = syn.filter(col("doc_id") === 10001L)
      .select("text").head().getString(0)

    val batch = Seq(
      (20001L, dupText),                                   // exact dup → dropped
      (20002L, s"fresh ingest narrative paragraph\n\n$boiler"), // boiler stripped
      (20003L, "another entirely unique ingest document"))     // untouched
      .toDF("doc_id", "text")

    val root = java.nio.file.Files.createTempDirectory("graftint").toString

    // ---- build + persist all four standing structures ----
    Dedup.saveIndex(Dedup.buildIndex(corpus, "doc_id", "text"),
      "graft_int_dedup", s"$root/dedup", nBuckets = 4)
    Paragraph.saveParagraphIndex(
      Paragraph.buildParagraphIndex(corpus, "doc_id", "text"),
      "graft_int_para", s"$root/para", nBuckets = 4)
    val weakLabeled = corpus.select(col("doc_id"), col("text"),
      (length(col("text")) >= 200).as("label"))
    NaiveBayes.saveModel(
      NaiveBayes.train(weakLabeled, "doc_id", "text", "label"),
      "graft_int_nb", s"$root/nb", nBuckets = 4)
    val corpusEmbs = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    Similarity.saveIvfPqIndex(
      Similarity.buildIvfPqIndex(corpusEmbs, "vec_id", "embedding",
        cells = 16, subspaces = 8, codebook = 16),
      "graft_int_ivfpq", s"$root/ivfpq", nBuckets = 4)

    // ---- stage 1: dedup the batch against the persisted index ----
    val dedupIdx = Dedup.loadIndex(spark, "graft_int_dedup", s"$root/dedup")
    val survivors = Dedup.incrementalCleanIndexed(dedupIdx, batch,
      "doc_id", "text", tau = 0.5)
    val survivorIds = survivors.select("doc_id").as[Long].collect().toSet
    assert(survivorIds == Set(20002L, 20003L),
      "exact corpus dup must drop, fresh docs must survive")
    val inlineSurvivors = Dedup.incrementalClean(corpus, batch,
      "doc_id", "text", tau = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(survivorIds == inlineSurvivors)

    // ---- stage 2: strip corpus boilerplate paragraphs ----
    val paraIdx = Paragraph.loadParagraphIndex(spark, "graft_int_para",
      s"$root/para")
    val cleaned = Paragraph.cleanAgainstIndex(paraIdx, survivors,
      "doc_id", "text", maxDf = 3)
      .select(col("doc_id"), col("text_clean").as("text"))
    val cleanedMap = cleaned.as[(Long, String)].collect().toMap
    assert(cleanedMap(20002L) == "fresh ingest narrative paragraph",
      "corpus-known boilerplate (df=5 > maxDf=3) must strip")
    assert(cleanedMap(20003L) == "another entirely unique ingest document")
    val inlineCleaned = Paragraph.cleanAgainstIndex(
      Paragraph.buildParagraphIndex(corpus, "doc_id", "text"),
      survivors, "doc_id", "text", maxDf = 3)
      .select(col("doc_id"), col("text_clean"))
      .as[(Long, String)].collect().toMap
    assert(cleanedMap == inlineCleaned)

    // ---- stage 3: NB quality score from the persisted model ----
    val nbModel = NaiveBayes.loadModel(spark, "graft_int_nb", s"$root/nb")
    def scoreSet(m: NaiveBayes.NbModel, docs: DataFrame) =
      NaiveBayes.score(m, docs, "doc_id", "text")
        .select("doc_id", "lp_pos", "lp_neg", "pred")
        .as[(Long, Double, Double, Long)].collect().toSet
    val scored = scoreSet(nbModel, cleaned)
    assert(scored.map(_._1) == Set(20002L, 20003L))
    assert(scored == scoreSet(
      NaiveBayes.train(weakLabeled, "doc_id", "text", "label"), cleaned),
      "persisted model must score exactly like the in-session model")

    // ---- stage 4: ANN probe of the cleaned docs' embeddings ----
    // the batch docs arrive with embeddings (reuse two real vectors
    // under fresh ids — the plumbing under test is the probe, not the
    // embedding model)
    val probeEmbs = corpusEmbs.filter(col("vec_id").isin(2L, 3L))
      .select((col("vec_id") + 20000L).as("vec_id"), col("embedding"))
    val queryRel = corpusEmbs.unionByName(probeEmbs)
    val isQ = col("vec_id") >= 20000L
    val ivfpq = Similarity.loadIvfPqIndex(spark, "graft_int_ivfpq",
      s"$root/ivfpq")
    def topk(ix: Similarity.IvfPqIndex) =
      Similarity.ivfPqQuery(ix, queryRel, "vec_id", "embedding",
        isQ, k = 5, nProbes = 4, rerank = 10)
        .select("query_id", "cand_id", "rank")
        .as[(Long, Long, Long)].collect().toSet
    val neighbors = topk(ivfpq)
    assert(neighbors.map(_._1) == Set(20002L, 20003L))
    assert(neighbors.count(_._1 == 20002L) == 5)
    // a probe that IS a corpus vector must find its twin first
    // (exact-rerank d2 = 0, and cand != query so the twin wins)
    assert(neighbors.contains((20002L, 2L, 1L)))
    assert(neighbors.contains((20003L, 3L, 1L)))
    assert(neighbors == topk(
      Similarity.buildIvfPqIndex(corpusEmbs, "vec_id", "embedding",
        cells = 16, subspaces = 8, codebook = 16)))
  }
}
