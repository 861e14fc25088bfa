package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{LmScore, NaiveBayes, Search, TextOps}

/** Text analysis (SURVEY.md §2.7) — per-document feature extraction for
  * training-data curation. Every operator is a narrow projection (no
  * shuffle at all): at 100 TB these run at scan speed, fully inside
  * whole-stage codegen. Counts are exact integers; ratios derive from
  * them, so the DuckDB oracle matches bit-for-bit.
  */
object TextQueries {

  val stopwords: Seq[String] = TextOps.stopwords

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** #36 text_stats — [[TextOps.stats]] on `documents`. */
  def textStats(s: SparkSession, dir: String): DataFrame =
    TextOps.stats(docs(s, dir), "doc_id", "text")

  /** #37 text_quality_score — [[TextOps.qualityScore]]. */
  def textQualityScore(s: SparkSession, dir: String): DataFrame =
    TextOps.qualityScore(docs(s, dir), "doc_id", "text")

  /** Per-language marker-word lists for the heuristic language ID. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "is", "and", "of", "to"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("de", "shi", "zai", "le", "wo"))

  /** #38 text_lang_id (rows-only) — [[TextOps.langId]] carrying the
    * actual label for accuracy inspection. */
  def textLangId(s: SparkSession, dir: String): DataFrame =
    TextOps.langId(docs(s, dir), "doc_id", "text", langMarkers,
      passthrough = Seq("lang" -> "actual_lang"))

  /** #39 text_fingerprint — [[TextOps.fingerprintSummary]] (winnowing
    * k=8, window 4, plus SimHash), scalar columns only so the driver can
    * sort/hash the result and DuckDB can replay the FNV-1a arithmetic. */
  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    TextOps.fingerprintSummary(docs(s, dir), "doc_id", "text")

  /** text_top_terms — [[TextOps.topTerms]] (top-3, tf/df). */
  def textTopTerms(s: SparkSession, dir: String): DataFrame =
    TextOps.topTerms(docs(s, dir), "doc_id", "text", k = 3)

  /** BM25 query terms: deliberately spread across the df spectrum
    * (rare / medium / common in the corpus). */
  val Bm25Terms = Seq("dup", "vector", "join")
  val Bm25K = 15
  val PostingsCap = 64

  /** search_bm25 — [[Search.bm25TopK]]: top-15 docs for a 3-term query
    * under BM25 (round-4, §2d). */
  def searchBm25(s: SparkSession, dir: String): DataFrame =
    Search.bm25TopK(docs(s, dir), "doc_id", "text", Bm25Terms, Bm25K)

  /** search_index — [[Search.invertedIndex]]: term → df/cf + bounded
    * sorted postings head (round-4, §2d). */
  def searchIndex(s: SparkSession, dir: String): DataFrame =
    Search.invertedIndex(docs(s, dir), "doc_id", "text",
      postingsCap = PostingsCap)

  /** search_tfidf — [[Search.tfidfTopK]]: vector-space cosine ranking
    * for the same query terms as BM25 (round-7). */
  def searchTfidf(s: SparkSession, dir: String): DataFrame =
    Search.tfidfTopK(docs(s, dir), "doc_id", "text", Bm25Terms, Bm25K)

  /** lm_score — [[LmScore.bigramScore]]: corpus-trained bigram-LM
    * mean log-probability per doc (round-7). */
  def lmScore(s: SparkSession, dir: String): DataFrame =
    LmScore.bigramScore(docs(s, dir), "doc_id", "text")

  /** text_fertility (round-10) — per-language tokenizer fertility:
    * characters per subword token under the fixed vocabulary — the
    * multilingual tokenizer-health metric (a language whose fertility
    * collapses toward 1 is being segmented to near-characters: it is
    * underserved by the vocabulary and will eat the token budget;
    * XLM-R/mT5 report exactly this number when sizing multilingual
    * vocabularies). Exact integer sums per language (chars, subword
    * tokens from the codegen'd trie walk); fertility is one division
    * from the exact parts. One narrow scan + one language-sized
    * aggregation. */
  def textFertility(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // chars + trie-walk token count in ONE scan projection — no join,
    // no second documents scan; the aggregation is language-sized
    docs(s, dir).select(col("lang"),
        length(col("text")).cast("long").as("_chars"),
        TextOps.vocabTokens(col("text"), BpeVocab).as("_toks"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_chars")).as("total_chars"),
        sum(col("_toks")).as("total_tokens_vocab"))
      .withColumn("fertility",
        round(col("total_chars").cast("double") /
          col("total_tokens_vocab").cast("double"), 6))
  }

  /** curation_ppl_buckets (round-10) — the CCNet recipe (Wenzek et
    * al. 2020, arXiv:1911.00359): per-LANGUAGE perplexity terciles of
    * the corpus under the cheap LM, head/middle kept, tail flagged —
    * the classic "keep the fluent two-thirds" web-corpus curation
    * step. Higher avg_logp = lower perplexity = more fluent, so head
    * is the top tercile of [[lmScore]]'s per-doc average. The ntile
    * window is KEYED by language (the same q38 contract: per-key
    * sort, no global order) with a (avg_logp DESC, doc_id) total
    * order on the 6-dp-rounded score, so both engines assign
    * identical tiles. Sub-2-token docs (no bigrams) are excluded —
    * they have no perplexity to rank. */
  def curationPplBuckets(s: SparkSession, dir: String): DataFrame = {
    // scale-safe form (round-11): lang has a handful of values, so the
    // tercile window keyed by it alone is a few-reducer corpus sort at
    // 100×; Banding computes the identical tile from (row_number, n)
    // via the score-distribution relation
    // Banding consumes its input twice (tie window + value relation);
    // the LM-replay relation is the expensive part, so materialize it
    // ONCE (the NB-instance precedent, NaiveBayes.scala) — both passes
    // then read the checkpointed rows, not the whole LM pipeline
    val scored = lmScore(s, dir).filter(col("n_bigrams") > 0)
      .join(docs(s, dir).select(col("doc_id").cast("long").as("doc_id"),
        col("lang")), "doc_id")
      .localCheckpoint(true)
    graft.operators.Banding.withRowNumber(scored, Seq("lang"),
        "avg_logp", "doc_id", descValue = true)
      .withColumn("tile",
        graft.operators.Banding.ntileOf(col("_rn"), col("_n"), 3))
      .select(col("doc_id"), col("lang"), col("avg_logp"),
        when(col("tile") === 1, "head")
          .when(col("tile") === 2, "middle")
          .otherwise("tail").as("bucket"),
        when(col("tile") <= 2, 1L).otherwise(0L).as("keep"))
  }

  /** Vocabulary size for the OOV report. */
  val VocabV = 500

  /** vocab_oov — [[graft.operators.Vocab.oovReport]]: per-doc
    * out-of-vocabulary token share against the corpus' own top-V
    * vocabulary (round-7). */
  def vocabOov(s: SparkSession, dir: String): DataFrame =
    graft.operators.Vocab.oovReport(docs(s, dir), "doc_id", "text", VocabV)

  /** Fixed tokenizer vocabulary for text_bpe_tokens: the most frequent
    * English bigrams/trigrams (public frequency tables) — a stand-in
    * merge vocabulary with the same greedy longest-match inference
    * semantics as a trained BPE (the real thing is a drop-in larger
    * list). Fixed and literal, so both engines segment identically. */
  val BpeVocab: Seq[String] = Seq(
    "the", "and", "ing", "ion", "tio", "ent", "ati", "for", "her",
    "ter", "hat", "tha", "ere", "ate", "his", "con", "res", "ver",
    "all", "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar", "st",
    "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le", "ve", "co",
    "me", "de", "hi", "ri", "ro", "ic", "ne", "ea", "ra", "ce", "li",
    "ch", "ll", "be", "ma", "si", "om", "ur")

  /** text_bpe_tokens (round-8) — [[TextOps.stats]] with the optional
    * vocabulary tokenizer: whitespace count beside the greedy
    * longest-match subword count ([[graft.functions.BpeCount]]) that a
    * token-budgeted pipeline (chunking, packing) should be using. */
  def textBpeTokens(s: SparkSession, dir: String): DataFrame =
    TextOps.stats(docs(s, dir), "doc_id", "text",
      bpeVocab = Some(BpeVocab))
      .select(col("doc_id"),
        col("n_tokens_ws").cast("long").as("n_tokens_ws"),
        col("n_tokens_vocab"))

  /** text_quality_nb (round-9) — [[NaiveBayes.trainScore]] on weak
    * quality labels: the four [[TextOps.qualityScore]] indicators with
    * INTEGER weights (3·len + 2·punct + 3·stop + 2·wordlen ≥ 8 ⇔ the
    * float score's "high" band, but integer-exact end-to-end), then an
    * add-one NB trained on those labels scores every doc — the
    * fastText-style "learn what high-quality looks like from a cheap
    * heuristic, generalize to the corpus" curation signal. */
  def textQualityNb(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    val toks = split(lower(trim(t)), " ")
    val nStop = size(filter(toks, x => x.isInCollection(stopwords)))
    val score =
      when(length(t).between(100, 5000), 3).otherwise(0) +
      when(length(regexp_replace(t, "[A-Za-z0-9\\s]", "")).cast("double") /
        length(t) <= 0.1, 2).otherwise(0) +
      when((nStop.cast("double") / size(toks)).between(0.02, 0.6), 3)
        .otherwise(0) +
      when((length(regexp_replace(t, "[^A-Za-z]", "")).cast("double") /
        size(toks)).between(3.0, 8.0), 2).otherwise(0)
    val labeled = docs(s, dir)
      .select(col("doc_id"), t, (score >= 8).as("label"))
    // materialize: tokenize + label ONCE (localCheckpoint), instead of
    // the 7 re-scans the round-9 plan audit measured; hash unchanged
    NaiveBayes.trainScore(labeled, "doc_id", "text", "label",
      materialize = true)
  }

  /** nb_calibration (round-9) — the classifier EVALUATION surface
    * (what ann_recall is to ANN): confusion cells of the NB prediction
    * against its own weak labels plus the mean decision margin per
    * cell — the number a quality-classifier rollout watches (large
    * disagreement cells with strong margins = the model actively
    * overrules the heuristic, which is either generalization or rot).
    * Margins aggregate as round(margin·10⁶) micro-unit longs (each
    * per-doc margin is a difference of two hash-checked 6-dp values,
    * so the micro value is engine-identical); the mean is one
    * division at the end. Cost beyond text_quality_nb: one ≤4-row
    * aggregation. */
  def nbCalibration(s: SparkSession, dir: String): DataFrame =
    textQualityNb(s, dir)
      .withColumn("_mmicro",
        expr("CAST(round((lp_pos - lp_neg) * 1000000) AS BIGINT)"))
      .groupBy(col("label"), col("pred"))
      .agg(count(lit(1)).as("n"), sum(col("_mmicro")).as("margin_micro"))
      .select(col("label"), col("pred"), col("n"), col("margin_micro"),
        (col("margin_micro").cast("double") /
          (lit(1000000.0) * col("n").cast("double"))).as("mean_margin"))

  /** text_script_profile (round-9) — [[TextOps.scriptProfile]]: per-doc
    * writing-system composition + dominant script; the multilingual
    * curation signal marker-word language ID (#38) cannot give. */
  def textScriptProfile(s: SparkSession, dir: String): DataFrame =
    TextOps.scriptProfile(docs(s, dir), "doc_id", "text")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_script_profile" -> textScriptProfile,
    "nb_calibration" -> nbCalibration,
    "text_quality_nb" -> textQualityNb,
    "text_bpe_tokens" -> textBpeTokens,
    "search_bm25" -> searchBm25,
    "search_index" -> searchIndex,
    "search_tfidf" -> searchTfidf,
    "lm_score" -> lmScore,
    "curation_ppl_buckets" -> curationPplBuckets,
    "text_fertility" -> textFertility,
    "vocab_oov" -> vocabOov,
    "text_top_terms" -> textTopTerms,
    "text_stats" -> textStats,
    "text_quality_score" -> textQualityScore,
    "text_lang_id" -> textLangId,
    "text_fingerprint" -> textFingerprint)

  /** Shared DuckDB CTEs replaying TextHash.fnv1a + TextHash.simhash over
    * whitespace tokens: FNV-1a as HUGEINT arithmetic mod 2^64; `sim`
    * carries the 64-bit SimHash both unsigned (`s`, for bit slicing) and
    * as the two's-complement BIGINT Spark emits (`sig`). Used by the
    * text_fingerprint and dedup_simhash oracles.
    *
    * Scope: the replay hashes per-character code points (`ord`), which
    * equals the engine's UTF-8-byte hashing only for ASCII text — true
    * of the testdata corpus (verified: max code point 121). The ENGINE
    * side is byte-based and correct for any input; a non-ASCII corpus
    * would only demote these two entries to rows-only checks. */
  private[queries] val fnvSimhashCtes: String = """
      prep AS (
        SELECT doc_id, lower(trim(text)) AS t FROM documents),
      toks AS (
        SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM prep),
      tokh AS (
        SELECT doc_id,
          list_reduce(
            list_prepend(14695981039346656037::HUGEINT,
              list_transform(range(1, length(tok) + 1),
                j -> CAST(ord(substr(tok, j, 1)) AS HUGEINT))),
            (acc, b) -> (xor(acc, b) * 1099511628211::HUGEINT)
              % 18446744073709551616::HUGEINT) AS h
        FROM toks),
      bits AS (
        SELECT doc_id, b,
          SUM(CASE WHEN (h // (2::HUGEINT ^ b)::HUGEINT) % 2 = 1
            THEN 1 ELSE -1 END) AS vote
        FROM tokh, LATERAL (SELECT unnest(range(0, 64)) AS b)
        GROUP BY doc_id, b),
      sim AS (
        SELECT doc_id, s,
          CAST(s - CASE WHEN s >= 9223372036854775808::HUGEINT
            THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS BIGINT)
            AS sig
        FROM (
          SELECT doc_id,
            COALESCE(SUM(CASE WHEN vote > 0
              THEN (2::HUGEINT ^ b)::HUGEINT END), 0::HUGEINT) AS s
          FROM bits GROUP BY doc_id))"""

  /** DuckDB replay of the FNV-1a winnowing fingerprint + SimHash
    * (TextHash.winnow/simhash): hashes are HUGEINT arithmetic mod 2^64
    * converted to two's-complement BIGINT, so DuckDB's signed compare
    * picks the same rightmost window minimum as Scala's Long compare.
    * Window argmins are non-decreasing in the start position, so the
    * consecutive-pick dedupe equals DISTINCT over picked positions. */
  private val fingerprintOracle: String = s"""
      WITH $fnvSimhashCtes,
      grams AS (
        SELECT doc_id, i,
          CAST(x - CASE WHEN x >= 9223372036854775808::HUGEINT
            THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS BIGINT)
            AS h
        FROM (
          SELECT doc_id, i,
            list_reduce(
              list_prepend(14695981039346656037::HUGEINT,
                list_transform(range(0, 8),
                  j -> CAST(ord(substr(t, i + j, 1)) AS HUGEINT))),
              (acc, b) -> (xor(acc, b) * 1099511628211::HUGEINT)
                % 18446744073709551616::HUGEINT) AS x
          FROM prep, LATERAL (SELECT unnest(range(1, length(t) - 8 + 2)) AS i)
          WHERE length(t) >= 8)),
      counts AS (SELECT doc_id, COUNT(*) AS m FROM grams GROUP BY doc_id),
      picks AS (
        SELECT DISTINCT g.doc_id, p.pi, p.ph
        FROM counts c
        JOIN (SELECT doc_id, unnest(range(1, greatest(1, m - 4 + 1) + 1)) AS s
              FROM counts) g
          ON g.doc_id = c.doc_id,
        LATERAL (
          SELECT i AS pi, h AS ph FROM grams
          WHERE grams.doc_id = g.doc_id
            AND i BETWEEN g.s AND least(g.s + 3, c.m)
          ORDER BY h ASC, i DESC LIMIT 1) p)
      SELECT d.doc_id,
        CAST(COALESCE(p.n, 0) AS INTEGER) AS n_fingerprints,
        COALESCE(p.x, 0) AS fp_xor,
        sim.sig AS simhash
      FROM prep d
      LEFT JOIN (SELECT doc_id, COUNT(*) AS n, bit_xor(ph) AS x
                 FROM picks GROUP BY doc_id) p USING (doc_id)
      JOIN sim USING (doc_id)"""

  /** DuckDB replay of [[TextOps.langId]] on the testdata markers. */
  private[queries] val langIdOracle: String = {
    val langs = langMarkers.keys.toSeq.sorted
    val hitExprs = langs.map { l =>
      val arr = langMarkers(l).map(w => s"'$w'").mkString("(", ", ", ")")
      s"CAST(len(list_filter(string_split(lower(trim(text)), ' '), t -> t IN $arr)) AS INTEGER) AS hits_$l"
    }.mkString(",\n          ")
    val best = langs.map(l => s"hits_$l").mkString("greatest(", ", ", ")")
    val cases = langs.map(l =>
      s"WHEN hits_$l = $best AND $best > 0 THEN '$l'").mkString("\n          ")
    s"""
      WITH hits AS (
        SELECT doc_id, lang AS actual_lang,
          $hitExprs
        FROM documents)
      SELECT *,
        CASE $cases ELSE 'unknown' END AS predicted_lang
      FROM hits"""
  }

  /** Per-query-term tf/df columns of the BM25 oracle, index-aligned
    * with [[Search.bm25TopK]]'s tf_i/df_i. */
  private val bm25TfCols = Bm25Terms.zipWithIndex.map { case (t, i) =>
    s"CAST(len(list_filter(w, x -> x = '$t')) AS DOUBLE) AS tf_$i"
  }.mkString(",\n          ")
  private val bm25DfCols = Bm25Terms.indices.map { i =>
    s"CAST(SUM(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_$i"
  }.mkString(",\n          ")
  /** The fixed-order score sum, term 0 + term 1 + … — the same
    * expression tree the engine builds, so the doubles agree bitwise
    * (ln / * / / are the only operations, in identical order). */
  private val bm25Score = Bm25Terms.indices.map { i =>
    s"""(ln(1.0 + (n_docs - df_$i + 0.5) / (df_$i + 0.5))
          * (tf_$i * (${Search.K1} + 1.0))
          / (tf_$i + ${Search.K1}
             * (1.0 - ${Search.B} + ${Search.B} * dl / avgdl)))"""
  }.mkString(" + ")

  /** Index-aligned idf expressions of the TF-IDF oracle (smooth idf,
    * same operation order as [[Search.tfidfTopK]]'s Column tree). */
  private def tfidfIdf(i: Int): String =
    s"(ln((n_docs + 1.0) / (df_$i + 1.0)) + 1.0)"
  private val tfidfDot = Bm25Terms.indices.map { i =>
    s"(tf_$i * ${tfidfIdf(i)} * ${tfidfIdf(i)})"
  }.mkString(" + ")
  private val tfidfQn2 = Bm25Terms.indices.map { i =>
    s"(${tfidfIdf(i)} * ${tfidfIdf(i)})"
  }.mkString(" + ")

  /** Shared NB-replay CTEs: the weak-label rule + count model +
    * smoothed ln scoring, ending in `fin` (doc_id, label, n_tokens,
    * lp_pos, lp_neg) — composed by both the per-doc entry and the
    * calibration report, exactly like the ann_recall composition. */
  private val nbCtes: String = s"""lab AS (
        SELECT doc_id, string_split(lower(trim(text)), ' ') AS w,
          (CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 3 ELSE 0 END)
          + (CASE WHEN CAST(length(regexp_replace(text,
              '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)
              <= 0.1 THEN 2 ELSE 0 END)
          + (CASE WHEN CAST(len(list_filter(
              string_split(lower(trim(text)), ' '),
              t -> t IN (${stopwords.map(w => s"'$w'").mkString(", ")})))
              AS DOUBLE) / len(string_split(lower(trim(text)), ' '))
              BETWEEN 0.02 AND 0.6 THEN 3 ELSE 0 END)
          + (CASE WHEN CAST(length(regexp_replace(text,
              '[^A-Za-z]', '', 'g')) AS DOUBLE)
              / len(string_split(lower(trim(text)), ' '))
              BETWEEN 3.0 AND 8.0 THEN 2 ELSE 0 END)
          >= 8 AS label
        FROM documents),
      inst AS (SELECT doc_id, label, unnest(w) AS t FROM lab),
      counts AS (
        SELECT t,
          CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
          CAST(SUM(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS c_neg
        FROM inst GROUP BY 1),
      model AS (
        SELECT CAST(SUM(c_pos) AS BIGINT) AS t_pos,
          CAST(SUM(c_neg) AS BIGINT) AS t_neg,
          CAST(COUNT(*) AS BIGINT) AS v
        FROM counts),
      dmodel AS (
        SELECT CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
            AS d_pos,
          CAST(COUNT(*) AS BIGINT) AS d
        FROM lab),
      scored AS (
        SELECT i.doc_id,
          SUM(ln(CAST(c.c_pos + 1 AS DOUBLE)
            / CAST(m.t_pos + m.v AS DOUBLE))) AS lp_pos_t,
          SUM(ln(CAST(c.c_neg + 1 AS DOUBLE)
            / CAST(m.t_neg + m.v AS DOUBLE))) AS lp_neg_t
        FROM inst i JOIN counts c USING (t) CROSS JOIN model m
        GROUP BY 1),
      fin AS (
        SELECT l.doc_id,
          CAST(CASE WHEN l.label THEN 1 ELSE 0 END AS BIGINT) AS label,
          CAST(len(l.w) AS INTEGER) AS n_tokens,
          round(ln(CAST(dm.d_pos + 1 AS DOUBLE)
            / CAST(dm.d + 2 AS DOUBLE)) + s.lp_pos_t, 6) AS lp_pos,
          round(ln(CAST(dm.d - dm.d_pos + 1 AS DOUBLE)
            / CAST(dm.d + 2 AS DOUBLE)) + s.lp_neg_t, 6) AS lp_neg
        FROM lab l LEFT JOIN scored s USING (doc_id) CROSS JOIN dmodel dm)"""

  private val nbSelect: String = """
      SELECT doc_id, label, n_tokens, lp_pos, lp_neg,
        CAST(CASE WHEN lp_pos >= lp_neg THEN 1 ELSE 0 END AS BIGINT)
          AS pred
      FROM fin"""

  /** Shared DuckDB recursive-CTE chain replaying the greedy
    * longest-match subword segmentation up to the per-doc `cnt`
    * relation (doc_id, n_tokens_vocab) — composed by text_bpe_tokens
    * and text_fertility. */
  private lazy val BpeReplayCtes: String = s"""words AS (
        SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS w
        FROM documents),
      vocab AS (SELECT unnest([${BpeVocab.map(v => s"'$v'").mkString(", ")}]) AS v),
      seg AS (
        SELECT doc_id, w, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS n
        FROM words
        UNION ALL
        SELECT doc_id, w,
          pos + COALESCE((SELECT MAX(len(v)) FROM vocab
            WHERE substr(w, CAST(pos + 1 AS INT), len(v)) = v), 1),
          n + 1
        FROM seg WHERE pos < len(w)),
      cnt AS (
        SELECT doc_id,
          CAST(SUM(CASE WHEN pos >= len(w) THEN n ELSE 0 END) AS BIGINT)
            AS n_tokens_vocab
        FROM seg GROUP BY 1)"""

  /** Shared DuckDB CTE chain replaying the bigram LM up to the per-doc
    * (doc_id, n_tokens, n_bigrams, avg_logp) relation `lm` — composed
    * by lm_score and curation_ppl_buckets exactly like the NB replay
    * CTEs are by text_quality_nb / nb_calibration. */
  private[queries] val LmReplayCtes: String = """
      d AS (
        SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        FROM documents),
      uni AS (
        SELECT t, CAST(COUNT(*) AS BIGINT) AS c1
        FROM (SELECT unnest(w) AS t FROM d) GROUP BY 1),
      voc AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni),
      bg AS (
        SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        FROM d, LATERAL (SELECT unnest(range(1, len(w))) AS i)),
      cb AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb
        FROM bg GROUP BY 1, 2),
      scored AS (
        SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
          SUM(ln(CAST(cb.cb + 1 AS DOUBLE)
            / CAST(uni.c1 + voc.v AS DOUBLE))) AS logp
        FROM bg JOIN cb USING (w1, w2)
        JOIN uni ON uni.t = bg.w1 CROSS JOIN voc
        GROUP BY 1),
      lm AS (
        SELECT d.doc_id, CAST(len(d.w) AS INTEGER) AS n_tokens,
          CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
          round(s.logp / s.n_bigrams, 6) AS avg_logp
        FROM d LEFT JOIN scored s USING (doc_id))"""

  val oracleSql: Map[String, String] = Map(
    "text_script_profile" -> """
      WITH counted AS (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS char_len,
          CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
            AS BIGINT) AS n_latin,
          CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
            AS BIGINT) AS n_digit,
          CAST(length(regexp_replace(text,
            '[^\x{0400}-\x{04FF}]', '', 'g')) AS BIGINT) AS n_cyrillic,
          CAST(length(regexp_replace(text,
            '[^\x{0370}-\x{03FF}]', '', 'g')) AS BIGINT) AS n_greek,
          CAST(length(regexp_replace(text,
            '[^\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}]', '', 'g'))
            AS BIGINT) AS n_cjk,
          CAST(length(regexp_replace(text,
            '[^\x{0600}-\x{06FF}]', '', 'g')) AS BIGINT) AS n_arabic
        FROM documents)
      SELECT doc_id, char_len, n_latin, n_digit, n_cyrillic, n_greek,
        n_cjk, n_arabic,
        CASE
          WHEN n_latin >= n_digit AND n_latin >= n_cyrillic
            AND n_latin >= n_greek AND n_latin >= n_cjk
            AND n_latin >= n_arabic THEN 'latin'
          WHEN n_digit >= n_latin AND n_digit >= n_cyrillic
            AND n_digit >= n_greek AND n_digit >= n_cjk
            AND n_digit >= n_arabic THEN 'digit'
          WHEN n_cyrillic >= n_latin AND n_cyrillic >= n_digit
            AND n_cyrillic >= n_greek AND n_cyrillic >= n_cjk
            AND n_cyrillic >= n_arabic THEN 'cyrillic'
          WHEN n_greek >= n_latin AND n_greek >= n_digit
            AND n_greek >= n_cyrillic AND n_greek >= n_cjk
            AND n_greek >= n_arabic THEN 'greek'
          WHEN n_cjk >= n_latin AND n_cjk >= n_digit
            AND n_cjk >= n_cyrillic AND n_cjk >= n_greek
            AND n_cjk >= n_arabic THEN 'cjk'
          ELSE 'arabic'
        END AS dominant_script
      FROM counted""",
    "text_quality_nb" -> s"WITH $nbCtes $nbSelect",
    "nb_calibration" -> s"""
      WITH $nbCtes,
      nb AS ($nbSelect),
      cells AS (
        SELECT label, pred, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(round((lp_pos - lp_neg) * 1000000) AS BIGINT))
            AS BIGINT) AS margin_micro
        FROM nb GROUP BY 1, 2)
      SELECT label, pred, n, margin_micro,
        CAST(margin_micro AS DOUBLE) / (1000000.0 * CAST(n AS DOUBLE))
          AS mean_margin
      FROM cells""",
    // greedy longest-match replay: each word instance advances by the
    // LONGEST vocab entry matching at its position (else 1 char — the
    // unknown-token fallback), one recursion step per emitted token
    "text_bpe_tokens" -> s"""
      WITH RECURSIVE $BpeReplayCtes
      SELECT d.doc_id,
        CAST(len(string_split(lower(trim(d.text)), ' ')) AS BIGINT)
          AS n_tokens_ws,
        cnt.n_tokens_vocab
      FROM documents d JOIN cnt USING (doc_id)""",
    "text_fertility" -> s"""
      WITH RECURSIVE $BpeReplayCtes
      SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(len(d.text)) AS BIGINT) AS total_chars,
        CAST(SUM(cnt.n_tokens_vocab) AS BIGINT) AS total_tokens_vocab,
        round(CAST(SUM(len(d.text)) AS DOUBLE)
          / CAST(SUM(cnt.n_tokens_vocab) AS DOUBLE), 6) AS fertility
      FROM documents d JOIN cnt USING (doc_id)
      GROUP BY 1""",
    "vocab_oov" -> s"""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(trim(text)), ' '))
          AS term
        FROM documents),
      counts AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY 1),
      vocab AS (
        SELECT term FROM counts
        QUALIFY row_number() OVER (ORDER BY n DESC, term ASC)
          <= $VocabV),
      g AS (
        SELECT t.doc_id, COUNT(*) AS n_tokens,
          SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS n_oov
        FROM toks t LEFT JOIN vocab v ON t.term = v.term
        GROUP BY 1)
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        CAST(n_oov AS BIGINT) AS n_oov,
        CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_rate
      FROM g""",
    "search_tfidf" -> s"""
      WITH d AS (
        SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        FROM documents),
      f AS (
        SELECT doc_id,
          $bm25TfCols
        FROM d),
      stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
          $bm25DfCols
        FROM f),
      toks AS (
        SELECT doc_id, unnest(w) AS term FROM d),
      tf AS (
        SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks GROUP BY 1, 2),
      dfx AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      weights AS (
        SELECT tf.doc_id, CAST(tf.tf AS DOUBLE)
          * (ln((stats.n_docs + 1.0) / (CAST(dfx.df AS DOUBLE) + 1.0))
             + 1.0) AS wt
        FROM tf JOIN dfx USING (term) CROSS JOIN stats),
      norms AS (
        SELECT doc_id, SUM(wt * wt) AS norm2 FROM weights GROUP BY 1),
      scored AS (
        SELECT doc_id, $tfidfDot AS dot, $tfidfQn2 AS qn2
        FROM f CROSS JOIN stats),
      final AS (
        SELECT s.doc_id,
          round(s.dot / (sqrt(n.norm2) * sqrt(s.qn2)), 6) AS score
        FROM scored s JOIN norms n USING (doc_id)
        WHERE s.dot > 0.0),
      ranked AS (
        SELECT doc_id, score,
          CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
            AS BIGINT) AS rank
        FROM final)
      SELECT doc_id, score, rank FROM ranked WHERE rank <= $Bm25K""",
    "lm_score" -> s"""
      WITH $LmReplayCtes
      SELECT doc_id, n_tokens, n_bigrams, avg_logp FROM lm""",
    "curation_ppl_buckets" -> s"""
      WITH $LmReplayCtes,
      ranked AS (
        SELECT lm.doc_id, docs.lang, lm.avg_logp,
          CAST(ntile(3) OVER (PARTITION BY docs.lang
            ORDER BY lm.avg_logp DESC, lm.doc_id ASC) AS BIGINT) AS tile
        FROM lm JOIN documents docs USING (doc_id)
        WHERE lm.n_bigrams > 0)
      SELECT doc_id, lang, avg_logp,
        CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
          ELSE 'tail' END AS bucket,
        CAST(CASE WHEN tile <= 2 THEN 1 ELSE 0 END AS BIGINT) AS keep
      FROM ranked""",
    "search_bm25" -> s"""
      WITH d AS (
        SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        FROM documents),
      f AS (
        SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl,
          $bm25TfCols
        FROM d),
      stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl,
          $bm25DfCols
        FROM f),
      scored AS (
        SELECT doc_id, round($bm25Score, 6) AS score
        FROM f, stats),
      ranked AS (
        SELECT doc_id, score,
          CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
            AS BIGINT) AS rank
        FROM scored WHERE score > 0.0)
      SELECT doc_id, score, rank FROM ranked WHERE rank <= $Bm25K""",
    "search_index" -> s"""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(trim(text)), ' '))
          AS term
        FROM documents),
      tf AS (
        SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks GROUP BY 1, 2)
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
        CAST(SUM(tf) AS BIGINT) AS cf,
        array_to_string(
          list_slice(list_sort(list(doc_id)), 1, $PostingsCap), ',')
          AS postings_head
      FROM tf GROUP BY term""",
    "text_fingerprint" -> fingerprintOracle,
    "text_lang_id" -> langIdOracle,
    "text_top_terms" -> s"""
      WITH terms AS (
        SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS term
        FROM documents),
      filtered AS (SELECT * FROM terms WHERE term <> ''),
      tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM filtered GROUP BY doc_id, term),
      df AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df
        FROM filtered GROUP BY term),
      ranked AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
          CAST(row_number() OVER (PARTITION BY tf.doc_id
            ORDER BY tf.tf DESC, tf.term ASC) AS BIGINT) AS rank
        FROM tf JOIN df USING (term))
      SELECT doc_id, rank, term, tf, df
      FROM ranked WHERE rank <= 3""",
    "text_stats" -> s"""
      SELECT doc_id,
        CAST(length(text) AS INTEGER) AS char_len,
        CAST(len(string_split(lower(trim(text)), ' ')) AS INTEGER)
          AS n_tokens_ws,
        CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
          AS INTEGER) AS n_tokens_bpe,
        CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
          / len(string_split(lower(trim(text)), ' ')) AS avg_word_len,
        CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
          / length(text) AS punct_ratio
      FROM documents""",
    "text_quality_score" -> s"""
      WITH feat AS (
        SELECT doc_id,
          CAST(length(text) AS INTEGER) AS char_len,
          CAST(len(string_split(lower(trim(text)), ' ')) AS INTEGER)
            AS n_tokens,
          len(list_filter(string_split(lower(trim(text)), ' '),
            t -> t IN (${stopwords.map(w => s"'$w'").mkString(", ")})))
            AS n_stop,
          length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
            AS punct_chars,
          length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars
        FROM documents),
      ratios AS (
        SELECT doc_id, char_len, n_tokens,
          CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
          CAST(punct_chars AS DOUBLE) / char_len AS punct_ratio,
          CAST(alpha_chars AS DOUBLE) / n_tokens AS avg_word_len
        FROM feat),
      ind AS (
        SELECT *,
          CASE WHEN char_len BETWEEN 100 AND 5000 THEN 1 ELSE 0 END AS len_ok,
          CASE WHEN punct_ratio <= 0.1 THEN 1 ELSE 0 END AS punct_ok,
          CASE WHEN stop_ratio BETWEEN 0.02 AND 0.6 THEN 1 ELSE 0 END
            AS stop_ok,
          CASE WHEN avg_word_len BETWEEN 3.0 AND 8.0 THEN 1 ELSE 0 END
            AS wordlen_ok
        FROM ratios),
      scored AS (
        SELECT *, len_ok * 0.3 + punct_ok * 0.2 + stop_ok * 0.3
          + wordlen_ok * 0.2 AS quality_score
        FROM ind)
      SELECT doc_id, char_len, n_tokens, stop_ratio, punct_ratio,
        avg_word_len, CAST(quality_score AS DOUBLE) AS quality_score,
        CASE WHEN quality_score >= 0.8 THEN 'high'
             WHEN quality_score >= 0.5 THEN 'medium'
             ELSE 'low' END AS quality_band
      FROM scored""")
}
