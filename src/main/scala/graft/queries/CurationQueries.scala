package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Corpus, Decontaminate, Pack, Pii, Sampling, TextOps}

/** Round-3 additions (SURVEY.md §2c) — corpus-curation operators bound
  * to the testdata, each DuckDB-oracle-checked: cross-corpus
  * decontamination (exact + n-gram), repetition signals + Gopher-style
  * filtering, PII scanning, weighted sampling, and the CUBE grouping
  * surface. The benchmark corpus for decontamination is the `src0`
  * slice of `documents`; everything else is the training corpus.
  */
object CurationQueries {

  val BenchmarkSource = "src0"
  /** 3-gram overlap for the synthetic corpus (its ~40-word vocabulary
    * makes 3-gram collisions informative; the API default of 8 suits
    * natural text). */
  val NgramN = 3
  /** Weighted-sampling odds: P(keep) = min(1, n_chars·700/1e6). */
  val WeightNum = 700L
  val WeightDen = 1000000L

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
  private def train(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).filter(col("source") =!= BenchmarkSource)
  private def benchmark(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).filter(col("source") === BenchmarkSource)

  /** decon_exact — training docs surviving exact-hash decontamination
    * against the benchmark slice. */
  def deconExact(s: SparkSession, dir: String): DataFrame =
    Decontaminate.exactClean(train(s, dir), benchmark(s, dir),
      "doc_id", "text")

  /** decon_bloom — same result as decon_exact via the broadcast Bloom
    * prefilter scale path (round-4, §2d). */
  def deconBloom(s: SparkSession, dir: String): DataFrame =
    // filter sized to the testdata benchmark slice (result is
    // fpp-independent; the default 8 MiB filter is the 4M-doc setting)
    Decontaminate.bloomClean(train(s, dir), benchmark(s, dir),
      "doc_id", "text", estItems = 100L * 1000, numBits = 1L << 20)

  /** decon_ngram — per-training-doc benchmark n-gram overlap report. */
  def deconNgram(s: SparkSession, dir: String): DataFrame =
    Decontaminate.ngramReport(train(s, dir), benchmark(s, dir),
      "doc_id", "text", n = NgramN)

  /** text_repetition — within-document repetition signals. */
  def textRepetition(s: SparkSession, dir: String): DataFrame =
    TextOps.repetition(docs(s, dir), "doc_id", "text")

  /** text_gopher_filter — keep/drop with auditable reasons. */
  def textGopherFilter(s: SparkSession, dir: String): DataFrame =
    TextOps.gopherFilter(docs(s, dir), "doc_id", "text")

  /** #166 curation_pipeline — the END-TO-END corpus-curation funnel
    * (the CCNet/FineWeb recipe shape) as ONE composed relation,
    * hash-checked: language-ID gate → Gopher quality gate → exact
    * dedup (first doc per normalized-content hash AMONG survivors) →
    * per-language perplexity tercile tail-drop (LM trained on the
    * FULL corpus — CCNet's reference-LM semantics — terciles computed
    * over the surviving set via the scale-safe [[graft.operators
    * .Banding]] identity, never a per-language corpus sort). Output:
    * the per-language funnel (n_lang, n_quality, n_dedup, n_final) —
    * the report a curation run ships.
    *
    * Composition discipline: every stage reuses the EXACT operator
    * its standalone entry hash-checks (langId #38, gopherFilter,
    * Dedup.normalized #29, lmScore, Banding #147), and the oracle
    * composes those entries' replay CTEs — so a pipeline mismatch
    * isolates to the composition, not the pieces. All per-doc
    * signals land in ONE localCheckpointed relation (docs scanned
    * once per signal family); the funnel stages are then filters
    * over it and the aggregations are language-cardinality-sized. */
  def curationPipeline(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Banding, Dedup}
    val d = docs(s, dir)
    val lang = TextOps.langId(d, "doc_id", "text", TextQueries.langMarkers)
      .select(col("doc_id"), col("predicted_lang"))
    val gopher = TextOps.gopherFilter(d, "doc_id", "text")
      .select(col("doc_id"), col("keep").as("q_keep"))
    val hash = d.select(col("doc_id"), col("source"),
      md5(Dedup.normalized(col("text"))).as("h"))
    val lm = TextQueries.lmScore(s, dir)
      .select(col("doc_id"), col("n_bigrams"), col("avg_logp"))
    val perDoc = lang.join(gopher, "doc_id").join(hash, "doc_id")
      .join(lm, "doc_id")
      .filter(col("predicted_lang") =!= "unknown") // stage 1 gate
      .localCheckpoint(true)
    val s2 = perDoc.filter(col("q_keep") === 1)
    val keepers = s2.groupBy("h").agg(min("doc_id").as("keeper"))
    val s3 = s2.join(keepers, "h").filter(col("doc_id") === col("keeper"))
      .select(perDoc.columns.map(col).toSeq: _*)
      .localCheckpoint(true) // Banding consumes its input twice
    val ranked = Banding.withRowNumber(
      s3.filter(col("n_bigrams") > 0), Seq("predicted_lang"),
      "avg_logp", "doc_id", descValue = true)
      .withColumn("tile", Banding.ntileOf(col("_rn"), col("_n"), 3))
    // the funnel reports per (language, SOURCE) — the per-crawl
    // accounting a curation run ships — while the tercile stays
    // per-language (CCNet's semantics: one reference-LM band per
    // language, sources compete within it)
    val keys = Seq("predicted_lang", "source")
    def funnel(df: DataFrame, n: String): DataFrame =
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as(n))
    funnel(perDoc, "n_lang")
      .join(funnel(s2, "n_quality"), keys, "left")
      .join(funnel(s3, "n_dedup"), keys, "left")
      .join(funnel(ranked.filter(col("tile") <= 2), "n_final"),
        keys, "left")
      .select(col("predicted_lang").as("lang"), col("source"),
        col("n_lang"),
        coalesce(col("n_quality"), lit(0L)).as("n_quality"),
        coalesce(col("n_dedup"), lit(0L)).as("n_dedup"),
        coalesce(col("n_final"), lit(0L)).as("n_final"))
  }

  /** pii_scan — per-doc PII match counts. */
  def piiScan(s: SparkSession, dir: String): DataFrame =
    Pii.scan(docs(s, dir), "doc_id", "text")

  /** pii_redact — the redaction transform itself ([[Pii.redacted]]):
    * every match replaced by its `[KIND]` tag, with the original-text
    * match total for audit. Same narrow scan-speed projection as
    * pii_scan; the redacted corpus is what actually ships to a model. */
  def piiRedact(s: SparkSession, dir: String): DataFrame =
    Pii.redacted(docs(s, dir), "doc_id", "text")

  /** sample_weighted — length-weighted deterministic Bernoulli. */
  def sampleWeighted(s: SparkSession, dir: String): DataFrame =
    Sampling.weightedBernoulli(
      docs(s, dir).select(col("doc_id"), col("n_chars"), col("source")),
      col("doc_id"), col("n_chars"), WeightNum, WeightDen)

  /** Cross-corpus near-dup τ (same as the dedup family's 0.5). */
  val NearTau = 0.5
  /** MG capacity — far above the corpus vocabulary (31), so counts are
    * exact and the oracle checks the sketch hash-exactly; on an open
    * vocabulary the same query degrades gracefully to ±N/(k+1). */
  val MgK = 64
  /** Tokens per training shard for pack_sequences. */
  val ShardTokens = 2000L
  /** Shard budget for pack_bestfit — small enough that each source's
    * docs (≤ ~100 tokens) pack into several shards with real
    * tightest-fit choices. */
  val BestFitTokens = 256L

  /** decon_near — cross-corpus MinHash near-dup report: benchmark
    * leakage that was lightly edited (exact hash misses it). */
  def deconNear(s: SparkSession, dir: String): DataFrame =
    Decontaminate.nearDupReport(train(s, dir), benchmark(s, dir),
      "doc_id", "text", NearTau)

  /** text_top_global — corpus-level heavy hitters via the mg_topk
    * Misra-Gries aggregate (one scan, O(k) state per partial). */
  def textTopGlobal(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    docs(s, dir)
      .select(explode(split(lower(trim(col("text"))), " ")).as("term"))
      .filter(col("term") =!= "")
      .agg(expr(s"mg_topk(term, $MgK)").as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "e")))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("e.term").as("term"), col("e.count").as("term_count"))
      .filter(col("rank") <= 10)
  }

  /** pack_sequences — deterministic concat-and-chunk shard assignment
    * per source (group-parallel, integer-exact). */
  def packSequences(s: SparkSession, dir: String): DataFrame =
    Pack.sequences(
      docs(s, dir).select(col("doc_id"), col("source"),
        size(split(lower(trim(col("text"))), " ")).cast("long")
          .as("n_tokens")),
      col("source"), col("doc_id"), col("n_tokens"), ShardTokens)

  /** pack_bestfit (round-13) — [[Pack.bestFitShards]]: best-fit-
    * decreasing whole-doc shard packing per source, the
    * padding-minimizing alternative to pack_sequences' concat-and-
    * chunk (docs never split). The oracle replays the same BFD fold
    * as a per-source recursive CTE carrying the open shards' fill
    * levels. */
  def packBestFit(s: SparkSession, dir: String): DataFrame =
    Pack.bestFitShards(
      docs(s, dir).select(col("doc_id"), col("source"),
        size(split(lower(trim(col("text"))), " ")).cast("long")
          .as("n_tokens")),
      "source", "doc_id", "n_tokens", BestFitTokens)

  /** pack_bestfit_shards (round-13) — [[Pack.bestFitPacked]]: the BFD
    * shards materialized per (source, shard) with fill, PADDING (the
    * metric that chooses between whole-doc packing and
    * concat-and-chunk) and the docs' normalized text in placement
    * order, projected to an md5 so the oracle checks each shard's
    * exact membership AND order. */
  def packBestFitShards(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("source"),
      lower(trim(col("text"))).as("t"),
      size(split(lower(trim(col("text"))), " ")).cast("long")
        .as("n_tokens"))
    Pack.bestFitPacked(d, "source", "doc_id", "n_tokens", "t",
      BestFitTokens)
      .select(col("source"), col("shard_ix"), col("n_docs"),
        col("fill"), col("padding"),
        md5(array_join(col("payloads"), " ")).as("docs_md5"))
  }

  /** pack_tokens (round-9) — the packed shards THEMSELVES: per-doc
    * `bpe_tokens` id arrays ([[graft.functions.BpeTokens]], the
    * text_bpe_tokens vocabulary) concatenated per source in doc_id
    * order and cut every [[ShardTokens]] ids by
    * [[Pack.packedShards]]. The driver row projects each shard to
    * (n_tokens, md5 of the comma-joined id stream) so the oracle
    * checks the exact content AND order of every shard without
    * hashing raw array columns; the reassembly invariant on the raw
    * arrays lives in ScalaTest. */
  def packTokens(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val toks = docs(s, dir).select(col("doc_id"), col("source"),
      call_function("bpe_tokens", lower(trim(col("text"))),
        typedLit(TextQueries.BpeVocab)).as("toks"))
    Pack.packedShards(toks, "source", "doc_id", "toks", ShardTokens)
      .select(col("source"), col("shard_ix"), col("n_tokens"),
        md5(array_join(transform(col("tokens"),
          t => t.cast("string")), ",")).as("tokens_md5"))
  }

  /** q23_cube — CUBE over (returnflag, linestatus) with grouping flags:
    * the grouping-sets surface q10's ROLLUP does not cover. */
  def q23Cube(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"),
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(Core.cents(col("l_extendedprice"))).as("revenue_cents"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("g_rf"), col("g_ls"), col("n_rows"), col("sum_qty"),
        col("revenue_cents"))

  /** Per-source quality quota size. */
  val SourceQuota = 10

  /** curation_source_quota — the training-mix recipe step: keep the Q
    * best docs per source by quality, deterministic hash tie-break.
    * The score is the INTEGER 0–10 form of [[TextOps.qualityScore]]
    * (round(score·10)) so the ordering is exact across engines. */
  def curationSourceQuota(s: SparkSession, dir: String): DataFrame = {
    val scored = TextOps.qualityScore(docs(s, dir), "doc_id", "text")
      .select(col("doc_id"),
        round(col("quality_score") * 10).cast("long").as("score_10"))
    val withSource = scored
      .join(docs(s, dir).select(col("doc_id"), col("source")), "doc_id")
    Sampling.takeTopBy(withSource, col("source"),
      Seq(col("score_10").desc, Sampling.hashBucket(col("doc_id")).asc,
        col("doc_id").asc), SourceQuota)
      .select(col("doc_id"), col("source"), col("score_10"),
        col("quota_rank"))
  }

  /** corpus_jaccard — exact pairwise n-gram Jaccard between all source
    * pairs: the corpus-composition affinity matrix ([[Corpus]]). */
  def corpusJaccard(s: SparkSession, dir: String): DataFrame =
    Corpus.pairwiseJaccard(docs(s, dir), col("source"), "doc_id",
      "text", NgramN)

  /** corpus_snapshot_diff (round-9) — [[Corpus.snapshotDiff]] between
    * two deterministically-derived snapshots of `documents` (the
    * refresh-audit surface: what did this crawl change?): the old
    * snapshot omits doc_id % 10 == 7 (those diff as `added`), the new
    * omits % 10 == 5 (`removed`) and revises % 10 == 3 with a
    * deterministic edit (`changed`); everything else is `unchanged`. */
  def corpusSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val oldSnap = d.filter(col("doc_id") % 10 =!= 7)
    val newSnap = d.filter(col("doc_id") % 10 =!= 5)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 3,
          concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")).as("text"))
    Corpus.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
  }

  /** curation_source_report (round-8) — the per-source corpus report
    * card: document count, exact-unique count (normalized content
    * hash), token volume, and mean quality score, one row per source —
    * the composition dashboard a curation run starts and ends with.
    * Exact-integer aggregation throughout: token counts sum as longs,
    * quality scores sum as round(q·10⁶) micro-units (each per-row score
    * is bit-identical across engines — text_quality_score is
    * hash-checked — so the rounded micro-value is too), and the two
    * means are single divisions from exact parts. Two
    * map-side-combined aggregates (per-source + per-(source, hash)
    * distinct) joined on the source key. */
  def curationSourceReport(s: SparkSession, dir: String): DataFrame =
    sourceReport(docs(s, dir))

  /** [[curationSourceReport]] over any (doc_id, source, text) frame. */
  def sourceReport(d: DataFrame): DataFrame = {
    val perDoc = d.select(col("doc_id"), col("source"),
        md5(graft.operators.Dedup.normalized(col("text"))).as("_h"),
        size(split(lower(trim(col("text"))), " ")).cast("long").as("_nt"))
      .join(TextOps.qualityScore(d, "doc_id", "text")
        .select(col("doc_id"), col("quality_score")), "doc_id")
      .withColumn("_qmicro",
        expr("CAST(round(quality_score * 1000000) AS BIGINT)"))
    val base = perDoc.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("_nt")).as("sum_tokens"),
      sum(col("_qmicro")).as("_sq"))
    val uniq = perDoc.select(col("source"), col("_h")).distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("n_unique"))
    base.join(uniq, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_unique"),
        col("sum_tokens"),
        (col("sum_tokens").cast("double") / col("n_docs").cast("double"))
          .as("mean_tokens"),
        (col("_sq").cast("double") /
          (lit(1000000.0) * col("n_docs").cast("double")))
          .as("mean_quality"))
  }

  /** curation_dsir — [[graft.operators.Dsir.resample]] (round-12):
    * DSIR importance resampling. Target = the src0/src1 slice, raw =
    * the rest; top-50 raw docs whose hashed-n-gram distribution is
    * most target-like, Gumbel-seeded. Rows-only by design (float log
    * sums — the vocab_train_bpe precedent); exact-arithmetic
    * verification lives in Round12Spec. */
  def curationDsir(s: SparkSession, dir: String): DataFrame = {
    val d = graft.Tables(s, dir, "documents")
    graft.operators.Dsir.resample(
      d.filter(!col("source").isin("src0", "src1")),
      d.filter(col("source").isin("src0", "src1")),
      "doc_id", "text", k = 50, seed = 7L)
  }

  /** The BFD fold as a DuckDB recursive CTE (shared by BOTH bestfit
    * oracles — one copy, one placement rule): docs per source in
    * (size desc, doc_id) order, each placed into the fullest shard
    * that still fits (tie -> lowest index), else a new shard; state =
    * the open shards' fill levels. */
  private val bfdOracleCte: String = s"""      WITH RECURSIVE sized AS (
        SELECT doc_id, source, lower(trim(text)) AS t,
          CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS n
        FROM documents),
      ord AS (
        SELECT doc_id, source, n,
          CAST(ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY n DESC, doc_id) AS BIGINT) AS rn
        FROM sized),
      step AS (
        SELECT source, CAST(0 AS BIGINT) AS rn,
          CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS n,
          CAST(NULL AS BIGINT) AS shard_ix,
          CAST([] AS BIGINT[]) AS fills
        FROM (SELECT DISTINCT source FROM sized)
        UNION ALL
        SELECT o.source, o.rn, o.doc_id, o.n,
          CASE WHEN b.best IS NULL THEN CAST(len(s.fills) AS BIGINT)
               ELSE b.best - 1 END,
          CASE WHEN b.best IS NULL THEN list_append(s.fills, o.n)
               ELSE list_transform(range(1, len(s.fills) + 1),
                      i -> CASE WHEN i = b.best THEN s.fills[i] + o.n
                                ELSE s.fills[i] END)
          END
        FROM step s
        JOIN ord o ON o.source = s.source AND o.rn = s.rn + 1,
        LATERAL (
          SELECT list_sort(
                   list_transform(
                     list_filter(range(1, len(s.fills) + 1),
                       i -> s.fills[i] + o.n <= $BestFitTokens),
                     i -> [-s.fills[i], i]))[1][2] AS best) b
      )"""

  /** dsir_seeded — [[graft.operators.Dsir.resampleSeeded]] (round-18):
    * the hash-gated DSIR twin. Same corpus split, features, smoothing
    * and top-k plan as curation_dsir; scoring is the fixed-point
    * BIGINT log (no `ln`, no Gumbel), so the DuckDB oracle replays the
    * ENTIRE selection — md5 bucketing, Laplace smoothing, integer
    * range reduction, atanh series, exact weight sums — bit-for-bit.
    * curation_dsir stays the production form (true ln + Gumbel
    * resampling); this twin pins its pipeline. */
  def dsirSeeded(s: SparkSession, dir: String): DataFrame = {
    val d = graft.Tables(s, dir, "documents")
    graft.operators.Dsir.resampleSeeded(
      d.filter(!col("source").isin("src0", "src1")),
      d.filter(col("source").isin("src0", "src1")),
      "doc_id", "text", k = 50)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "curation_dsir" -> curationDsir,
    "dsir_seeded" -> dsirSeeded,
    "curation_pipeline" -> curationPipeline,
    "curation_source_report" -> curationSourceReport,
    "curation_source_quota" -> curationSourceQuota,
    "corpus_jaccard" -> corpusJaccard,
    "corpus_snapshot_diff" -> corpusSnapshotDiff,
    "decon_exact" -> deconExact,
    "decon_bloom" -> deconBloom,
    "decon_ngram" -> deconNgram,
    "decon_near" -> deconNear,
    "text_repetition" -> textRepetition,
    "text_gopher_filter" -> textGopherFilter,
    "text_top_global" -> textTopGlobal,
    "pii_scan" -> piiScan,
    "pii_redact" -> piiRedact,
    "sample_weighted" -> sampleWeighted,
    "pack_sequences" -> packSequences,
    "pack_bestfit" -> packBestFit,
    "pack_bestfit_shards" -> packBestFitShards,
    "pack_tokens" -> packTokens,
    "q23_cube" -> q23Cube)

  /** [[Dedup.normalized]] → md5, as DuckDB SQL, over `ref`.text. */
  private def normHashOf(ref: String): String =
    s"md5(lower(regexp_replace(trim($ref.text), '\\s+', ' ', 'g')))"

  /** [[Dedup.normalized]] → md5, as DuckDB SQL (unqualified `text`). */
  private val normHash =
    "md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))"

  /** Distinct word n-grams of `documents` rows matching `where`. */
  private def gramCte(alias: String, where: String): String = s"""
      $alias AS (
        SELECT DISTINCT doc_id,
          array_to_string(list_slice(w, i, i + ${NgramN - 1}), ' ') AS g
        FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
              FROM documents WHERE $where),
          LATERAL (SELECT unnest(range(1, len(w) - $NgramN + 2)) AS i)
        WHERE len(w) >= $NgramN)"""

  private val piiCounts = Pii.patterns.map { case (kind, re) =>
    s"CAST(len(regexp_extract_all(text, '$re')) AS BIGINT) AS n_$kind"
  }.mkString(",\n        ")
  private val piiTotal = Pii.patterns.map { case (kind, _) => s"n_$kind" }
    .mkString(" + ")

  /** One side of the cross-corpus MinHash replay (shingles → md5
    * minhash signature → banded buckets → per-side bucket cap),
    * mirroring [[Decontaminate.nearDupReport]]'s engine pipeline with
    * [[DedupQueries]]' 16×4 signature shape. */
  private def nearSideCtes(side: String, where: String): String = {
    val k = DedupQueries.MinhashK
    val bands = DedupQueries.Bands
    val rows = k / bands
    val sigCols = (0 until k).map(i =>
      s"MIN(substr(md5('$i:' || s), 1, 16)) AS h$i").mkString(",\n          ")
    val bandCols = (0 until bands).map { b =>
      val hs = (0 until rows).map(r => s"h${b * rows + r}").mkString(" || ")
      s"md5($hs) AS band$b"
    }.mkString(",\n          ")
    val unions = (0 until bands).map(b =>
      s"SELECT doc_id, $b AS band, band$b AS bh FROM banded$side")
      .mkString("\n        UNION ALL\n        ")
    s"""
      words$side AS (
        SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        FROM documents WHERE $where),
      sh$side AS (
        SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        FROM words$side, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i)
        WHERE len(w) >= 3),
      sig$side AS (
        SELECT doc_id,
          $sigCols
        FROM sh$side GROUP BY doc_id),
      banded$side AS (
        SELECT doc_id,
          $bandCols
        FROM sig$side),
      exploded$side AS (
        $unions),
      explodedc$side AS (
        SELECT * FROM exploded$side
        QUALIFY COUNT(*) OVER (PARTITION BY band, bh)
          <= ${graft.operators.Dedup.DefaultMaxBucket})"""
  }

  /** The 60-bit md5 hash bucket on doc_id, as DuckDB SQL (same grid as
    * [[Sampling.hashBucket]]). */
  private val docBucket =
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"

  /** The Gopher-filter replay, shared by text_gopher_filter and the
    * composed curation_pipeline oracle. */
  private val gopherOracle: String = """
      WITH toks AS (
        SELECT doc_id, string_split(lower(trim(text)), ' ') AS w,
          CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
            / len(string_split(lower(trim(text)), ' ')) AS avg_word_len
        FROM documents),
      uni AS (
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
          CAST(COUNT(*) AS BIGINT) AS n_distinct,
          CAST(MAX(tf) AS BIGINT) AS top_token_tf
        FROM (SELECT doc_id, t, COUNT(*) AS tf
              FROM (SELECT doc_id, unnest(w) AS t FROM toks)
              WHERE t <> '' GROUP BY doc_id, t)
        GROUP BY doc_id),
      bi AS (
        SELECT doc_id, CAST(SUM(bf) AS BIGINT) AS n_bigrams,
          CAST(MAX(bf) AS BIGINT) AS top_bigram_tf
        FROM (SELECT doc_id, b, COUNT(*) AS bf
              FROM (SELECT doc_id,
                      unnest(list_transform(range(1, len(w)),
                        i -> w[i] || ' ' || w[i + 1])) AS b
                    FROM toks WHERE len(w) >= 2)
              GROUP BY doc_id, b)
        GROUP BY doc_id),
      sig AS (
        SELECT u.doc_id, u.n_tokens, t.avg_word_len,
          CAST(u.n_distinct AS DOUBLE) / u.n_tokens AS distinct_ratio,
          CAST(u.top_token_tf AS DOUBLE) / u.n_tokens AS top_token_frac,
          CAST(COALESCE(bi.top_bigram_tf, 0) AS DOUBLE)
            / greatest(COALESCE(bi.n_bigrams, 0), 1) AS top_bigram_frac
        FROM uni u
        LEFT JOIN bi USING (doc_id)
        JOIN toks t USING (doc_id)),
      flagged AS (
        SELECT *,
          (n_tokens BETWEEN 30 AND 50000) AS f_tokens,
          (avg_word_len BETWEEN 3.0 AND 10.0) AS f_awl,
          (distinct_ratio >= 0.2) AS f_dr,
          (top_token_frac <= 0.2) AS f_ttf,
          (top_bigram_frac <= 0.2) AS f_tbf
        FROM sig)
      SELECT doc_id, n_tokens, avg_word_len, distinct_ratio,
        top_token_frac, top_bigram_frac,
        CAST(CASE WHEN f_tokens AND f_awl AND f_dr AND f_ttf AND f_tbf
          THEN 1 ELSE 0 END AS INTEGER) AS keep,
        (CASE WHEN f_tokens THEN '' ELSE 'n_tokens;' END ||
         CASE WHEN f_awl THEN '' ELSE 'avg_word_len;' END ||
         CASE WHEN f_dr THEN '' ELSE 'distinct_ratio;' END ||
         CASE WHEN f_ttf THEN '' ELSE 'top_token_frac;' END ||
         CASE WHEN f_tbf THEN '' ELSE 'top_bigram_frac;' END)
          AS drop_reasons
      FROM flagged"""

  val oracleSql: Map[String, String] = Map(
    // dsir_seeded: full DSIR replay — features (unigram+bigram md5
    // buckets), Laplace smoothing over the union universe, the
    // fixed-point log (exact integer range reduction via bin()
    // bit lengths + atanh series, every literal CAST AS DOUBLE so
    // DuckDB's decimal parser can't diverge), BIGINT weight sums,
    // top-50. Arithmetic mirrors Dsir.fixedLog tree-for-tree.
    "dsir_seeded" -> """
      WITH raw_prep AS MATERIALIZED (
        SELECT doc_id,
          list_filter(string_split(
            lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' '),
            x -> x <> '') AS w
        FROM documents WHERE source NOT IN ('src0', 'src1')),
      tgt_prep AS MATERIALIZED (
        SELECT doc_id,
          list_filter(string_split(
            lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' '),
            x -> x <> '') AS w
        FROM documents WHERE source IN ('src0', 'src1')),
      raw_feat AS (
        SELECT doc_id, substr(md5(f), 1, 4) AS b FROM (
          SELECT doc_id, unnest(w) AS f FROM raw_prep
          UNION ALL
          SELECT doc_id, unnest(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i + 1])) AS f FROM raw_prep) t0),
      tgt_feat AS (
        SELECT doc_id, substr(md5(f), 1, 4) AS b FROM (
          SELECT doc_id, unnest(w) AS f FROM tgt_prep
          UNION ALL
          SELECT doc_id, unnest(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i + 1])) AS f FROM tgt_prep) t1),
      raw_cnt AS MATERIALIZED (
        SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c
        FROM raw_feat GROUP BY doc_id, b),
      nrr AS (SELECT b, CAST(SUM(c) AS BIGINT) AS nr
        FROM raw_cnt GROUP BY b),
      ntt AS (SELECT b, CAST(SUM(c) AS BIGINT) AS nt
        FROM (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c
              FROM tgt_feat GROUP BY doc_id, b) GROUP BY b),
      uni AS MATERIALIZED (
        SELECT COALESCE(nrr.b, ntt.b) AS b,
          COALESCE(nr, 0) AS nr, COALESCE(nt, 0) AS nt
        FROM nrr FULL OUTER JOIN ntt ON nrr.b = ntt.b),
      tot AS MATERIALIZED (
        SELECT CAST(SUM(nr) AS BIGINT) AS totr,
          CAST(SUM(nt) AS BIGINT) AS tott,
          CAST(COUNT(*) AS BIGINT) AS u FROM uni),
      st1 AS (
        SELECT b, (nt + 1) * (totr + u) AS num,
          (nr + 1) * (tott + u) AS den FROM uni, tot),
      st2 AS (
        SELECT b, num, den,
          CAST(length(bin(num)) - length(bin(den)) AS INTEGER) AS k0
        FROM st1),
      st3 AS (
        SELECT b, k0,
          CASE WHEN k0 >= 0 THEN num ELSE num << (-k0) END AS ns,
          CASE WHEN k0 >= 0 THEN den << k0 ELSE den END AS ds
        FROM st2),
      st4 AS (
        SELECT b, k0, CAST(ns AS DOUBLE) / CAST(ds AS DOUBLE) AS m0
        FROM st3),
      st5 AS (
        SELECT b,
          CAST(CASE WHEN m0 < CAST(1 AS DOUBLE) THEN k0 - 1 ELSE k0
            END AS DOUBLE) AS k,
          CASE WHEN m0 < CAST(1 AS DOUBLE) THEN m0 * CAST(2 AS DOUBLE)
            ELSE m0 END AS m
        FROM st4),
      st6 AS (
        SELECT b, k,
          (m - CAST(1 AS DOUBLE)) / (m + CAST(1 AS DOUBLE)) AS zz
        FROM st5),
      st7 AS (SELECT b, k, zz, zz * zz AS z2 FROM st6),
      sc AS MATERIALIZED (
        SELECT b, CAST(floor((k * CAST('0.6931471805599453' AS DOUBLE)
          + CAST(2 AS DOUBLE) * zz * (CAST(1 AS DOUBLE) + z2 *
            (CAST(1 AS DOUBLE)/CAST(3 AS DOUBLE) + z2 *
            (CAST(1 AS DOUBLE)/CAST(5 AS DOUBLE) + z2 *
            (CAST(1 AS DOUBLE)/CAST(7 AS DOUBLE) + z2 *
            (CAST(1 AS DOUBLE)/CAST(9 AS DOUBLE) + z2 *
            (CAST(1 AS DOUBLE)/CAST(11 AS DOUBLE) + z2 *
            (CAST(1 AS DOUBLE)/CAST(13 AS DOUBLE) + z2 *
            (CAST(1 AS DOUBLE)/CAST(15 AS DOUBLE)))))))))) *
          CAST(1073741824 AS DOUBLE)) AS BIGINT) AS w
        FROM st7),
      wsum AS (
        SELECT doc_id, CAST(SUM(c * w) AS BIGINT) AS weight
        FROM raw_cnt JOIN sc USING (b) GROUP BY doc_id),
      wf AS MATERIALIZED (
        SELECT a.doc_id, COALESCE(ws.weight, 0) AS weight
        FROM (SELECT doc_id FROM documents
              WHERE source NOT IN ('src0', 'src1')) a
        LEFT JOIN wsum ws USING (doc_id)),
      top AS (SELECT doc_id, weight FROM wf
        ORDER BY weight DESC, doc_id LIMIT 50)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY weight DESC, doc_id)
          AS BIGINT) AS rank,
        doc_id, weight
      FROM top""",
    "curation_source_report" -> s"""
      WITH perdoc AS (
        SELECT d.doc_id, d.source,
          md5(lower(regexp_replace(trim(d.text), '\\s+', ' ', 'g'))) AS h,
          CAST(len(string_split(lower(trim(d.text)), ' ')) AS BIGINT)
            AS nt,
          CAST(round(q.quality_score * 1000000) AS BIGINT) AS qmicro
        FROM documents d
        JOIN (${TextQueries.oracleSql("text_quality_score")}) q
          ON d.doc_id = q.doc_id),
      base AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(nt) AS BIGINT) AS sum_tokens,
          CAST(SUM(qmicro) AS BIGINT) AS sq
        FROM perdoc GROUP BY 1),
      uniq AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_unique
        FROM (SELECT DISTINCT source, h FROM perdoc) GROUP BY 1)
      SELECT b.source, b.n_docs, u.n_unique, b.sum_tokens,
        CAST(b.sum_tokens AS DOUBLE) / CAST(b.n_docs AS DOUBLE)
          AS mean_tokens,
        CAST(b.sq AS DOUBLE) / (1000000.0 * CAST(b.n_docs AS DOUBLE))
          AS mean_quality
      FROM base b JOIN uniq u ON b.source = u.source""",
    "curation_source_quota" -> s"""
      WITH feat AS (
        SELECT doc_id,
          CAST(length(text) AS INTEGER) AS char_len,
          CAST(len(string_split(lower(trim(text)), ' ')) AS INTEGER)
            AS n_tokens,
          len(list_filter(string_split(lower(trim(text)), ' '),
            t -> t IN (${TextOps.stopwords.map(w => s"'$w'").mkString(", ")})))
            AS n_stop,
          length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
            AS punct_chars,
          length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars
        FROM documents),
      ind AS (
        SELECT doc_id,
          CASE WHEN char_len BETWEEN 100 AND 5000 THEN 1 ELSE 0 END AS len_ok,
          CASE WHEN CAST(punct_chars AS DOUBLE) / char_len <= 0.1
            THEN 1 ELSE 0 END AS punct_ok,
          CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens BETWEEN 0.02 AND 0.6
            THEN 1 ELSE 0 END AS stop_ok,
          CASE WHEN CAST(alpha_chars AS DOUBLE) / n_tokens
            BETWEEN 3.0 AND 8.0 THEN 1 ELSE 0 END AS wordlen_ok
        FROM feat),
      scored AS (
        SELECT i.doc_id, d.source,
          CAST(round((len_ok * 0.3 + punct_ok * 0.2 + stop_ok * 0.3
            + wordlen_ok * 0.2) * 10) AS BIGINT) AS score_10
        FROM ind i JOIN documents d USING (doc_id)),
      ranked AS (
        SELECT *, CAST(row_number() OVER (PARTITION BY source
          ORDER BY score_10 DESC, $docBucket ASC, doc_id ASC) AS BIGINT)
          AS quota_rank
        FROM scored)
      SELECT doc_id, source, score_10, quota_rank
      FROM ranked WHERE quota_rank <= $SourceQuota""",
    "corpus_snapshot_diff" -> """
      WITH oldsnap AS (
        SELECT doc_id, md5(text) AS h_old
        FROM documents WHERE doc_id % 10 <> 7),
      newsnap AS (
        SELECT doc_id,
          md5(CASE WHEN doc_id % 10 = 3 THEN text || ' [rev2]'
              ELSE text END) AS h_new
        FROM documents WHERE doc_id % 10 <> 5)
      SELECT doc_id, h_old, h_new,
        CASE WHEN h_old IS NULL THEN 'added'
             WHEN h_new IS NULL THEN 'removed'
             WHEN h_old = h_new THEN 'unchanged'
             ELSE 'changed' END AS status
      FROM oldsnap FULL JOIN newsnap USING (doc_id)""",
    "corpus_jaccard" -> s"""
      WITH g AS (
        SELECT DISTINCT source,
          array_to_string(list_slice(w, i, i + ${NgramN - 1}), ' ') AS s
        FROM (SELECT source, string_split(lower(trim(text)), ' ') AS w
              FROM documents),
          LATERAL (SELECT unnest(range(1, len(w) - $NgramN + 2)) AS i)
        WHERE len(w) >= $NgramN),
      sizes AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY 1),
      pairs AS (
        SELECT a.source AS grp_a, b.source AS grp_b, a.n AS n_a, b.n AS n_b
        FROM sizes a JOIN sizes b ON a.source < b.source),
      i AS (
        SELECT a.source AS grp_a, b.source AS grp_b,
          CAST(COUNT(*) AS BIGINT) AS n_inter
        FROM g a JOIN g b ON a.s = b.s AND a.source < b.source
        GROUP BY 1, 2)
      SELECT p.grp_a, p.grp_b, p.n_a, p.n_b,
        COALESCE(i.n_inter, 0) AS n_inter,
        CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
          / (p.n_a + p.n_b - COALESCE(i.n_inter, 0)) AS jaccard
      FROM pairs p LEFT JOIN i USING (grp_a, grp_b)""",
    "decon_near" -> s"""
      WITH ${nearSideCtes("T", s"source <> '$BenchmarkSource'")},
      ${nearSideCtes("B", s"source = '$BenchmarkSource'")},
      cand AS (
        SELECT DISTINCT t.doc_id AS train_id, b.doc_id AS bench_id
        FROM explodedcT t
        JOIN explodedcB b ON t.band = b.band AND t.bh = b.bh),
      sizesT AS (SELECT doc_id, COUNT(*) AS n FROM shT GROUP BY doc_id),
      sizesB AS (SELECT doc_id, COUNT(*) AS n FROM shB GROUP BY doc_id),
      inter AS (
        SELECT c.train_id, c.bench_id, COUNT(*) AS n_inter
        FROM cand c
        JOIN shT sa ON c.train_id = sa.doc_id
        JOIN shB sb ON c.bench_id = sb.doc_id AND sa.s = sb.s
        GROUP BY c.train_id, c.bench_id)
      SELECT i.train_id, i.bench_id,
        CAST(i.n_inter AS DOUBLE) / (st.n + sb.n - i.n_inter) AS jaccard
      FROM inter i
      JOIN sizesT st ON i.train_id = st.doc_id
      JOIN sizesB sb ON i.bench_id = sb.doc_id
      WHERE CAST(i.n_inter AS DOUBLE) / (st.n + sb.n - i.n_inter)
        >= $NearTau""",
    "text_top_global" -> """
      SELECT rank, term, term_count FROM (
        SELECT CAST(row_number() OVER (ORDER BY cnt DESC, term ASC)
            AS BIGINT) AS rank,
          term, cnt AS term_count
        FROM (SELECT term, COUNT(*) AS cnt
              FROM (SELECT unnest(string_split(lower(trim(text)), ' '))
                      AS term FROM documents)
              WHERE term <> '' GROUP BY term))
      WHERE rank <= 10""",
    "pack_sequences" -> s"""
      SELECT doc_id, source, n_tokens,
        CAST(start // $ShardTokens AS BIGINT) AS shard_ix,
        CAST(start % $ShardTokens AS BIGINT) AS shard_offset
      FROM (
        SELECT doc_id, source, n_tokens,
          COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) - n_tokens, 0) AS start
        FROM (SELECT doc_id, source,
                CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT)
                  AS n_tokens
              FROM documents))""",
    // the same BFD fold as the engine, replayed per source by a
    // recursive CTE whose state is the open shards' fill levels:
    // docs in (size desc, doc_id) order, each placed into the
    // fullest shard that still fits (tie -> lowest index), else a
    // new shard
    "pack_bestfit" -> s"""
$bfdOracleCte
      SELECT doc_id, source, n AS n_tokens, shard_ix
      FROM step WHERE rn > 0""",
    // same BFD fold, aggregated per shard; docs_md5 orders by
    // PLACEMENT (size desc, doc_id) — checks membership AND order
    "pack_bestfit_shards" -> s"""
$bfdOracleCte
      SELECT a.source, a.shard_ix,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(a.n) AS BIGINT) AS fill,
        CAST($BestFitTokens - SUM(a.n) AS BIGINT) AS padding,
        md5(string_agg(d.t, ' ' ORDER BY a.n DESC, a.doc_id)) AS docs_md5
      FROM (SELECT doc_id, source, n, shard_ix FROM step WHERE rn > 0) a
      JOIN sized d USING (doc_id)
      GROUP BY 1, 2""",
    // greedy-tokenize replay emitting IDS (1-based vocab position via
    // arg_max over matching entries, 0 for the one-codepoint unknown
    // fallback), globally positioned per source by (doc_id, word,
    // token), then cut every $ShardTokens ids — md5 of the ordered
    // comma-joined stream checks each shard's exact content and order
    "pack_tokens" -> s"""
      WITH RECURSIVE varr AS (
        SELECT [${TextQueries.BpeVocab.map(v => s"'$v'").mkString(", ")}]
          AS a),
      vocab AS (
        SELECT a[i] AS v, CAST(i AS BIGINT) AS vid
        FROM varr, LATERAL (SELECT unnest(generate_series(1, len(a)))
          AS i) r),
      words AS (
        SELECT doc_id, source, i AS w_ix, parts[i] AS w
        FROM (SELECT doc_id, source,
                string_split(lower(trim(text)), ' ') AS parts
              FROM documents) t,
             LATERAL (SELECT unnest(generate_series(1, len(parts)))
               AS i) r),
      seg AS (
        SELECT doc_id, source, w_ix, w, CAST(0 AS BIGINT) AS pos,
          CAST(0 AS BIGINT) AS t_ix, CAST(NULL AS BIGINT) AS tid
        FROM words
        UNION ALL
        SELECT doc_id, source, w_ix, w,
          pos + COALESCE((SELECT MAX(len(v)) FROM vocab
            WHERE substr(w, CAST(pos + 1 AS INT), len(v)) = v), 1),
          t_ix + 1,
          COALESCE((SELECT arg_max(vid, len(v)) FROM vocab
            WHERE substr(w, CAST(pos + 1 AS INT), len(v)) = v), 0)
        FROM seg WHERE pos < len(w)),
      toks AS (
        SELECT source, doc_id, w_ix, t_ix, tid FROM seg
        WHERE tid IS NOT NULL),
      ordered AS (
        SELECT source, tid,
          CAST(row_number() OVER (PARTITION BY source
            ORDER BY doc_id, w_ix, t_ix) - 1 AS BIGINT) AS gpos
        FROM toks)
      SELECT source, CAST(gpos // $ShardTokens AS BIGINT) AS shard_ix,
        CAST(COUNT(*) AS BIGINT) AS n_tokens,
        md5(string_agg(CAST(tid AS VARCHAR), ',' ORDER BY gpos))
          AS tokens_md5
      FROM ordered GROUP BY 1, 2""",
    // NOT EXISTS, not NOT IN (ADVICE r3): one NULL text in the
    // benchmark slice makes NOT IN three-valued-NULL for EVERY row,
    // emptying the oracle while the engine's left_anti keeps
    // non-matching rows. NOT EXISTS matches anti-join semantics.
    "decon_exact" -> s"""
      SELECT d.doc_id, ${normHashOf("d")} AS content_hash
      FROM documents d
      WHERE d.source <> '$BenchmarkSource'
        AND NOT EXISTS (
          SELECT 1 FROM documents b
          WHERE b.source = '$BenchmarkSource'
            AND ${normHashOf("b")} = ${normHashOf("d")})""",
    // bloomClean is exactClean's result through a different plan — the
    // oracle is deliberately identical (no false negatives; false
    // positives re-checked exactly)
    "decon_bloom" -> s"""
      SELECT d.doc_id, ${normHashOf("d")} AS content_hash
      FROM documents d
      WHERE d.source <> '$BenchmarkSource'
        AND NOT EXISTS (
          SELECT 1 FROM documents b
          WHERE b.source = '$BenchmarkSource'
            AND ${normHashOf("b")} = ${normHashOf("d")})""",
    "decon_ngram" -> s"""
      WITH ${gramCte("tg", s"source <> '$BenchmarkSource'")},
      ${gramCte("bg", s"source = '$BenchmarkSource'")},
      shared AS (
        SELECT tg.doc_id, COUNT(*) AS n
        FROM tg JOIN (SELECT DISTINCT g FROM bg) b USING (g)
        GROUP BY tg.doc_id)
      SELECT d.doc_id,
        CAST(COALESCE(s.n, 0) AS BIGINT) AS n_shared_ngrams,
        CAST(CASE WHEN COALESCE(s.n, 0) >= 1 THEN 1 ELSE 0 END AS INTEGER)
          AS contaminated
      FROM documents d LEFT JOIN shared s USING (doc_id)
      WHERE d.source <> '$BenchmarkSource'""",
    "text_repetition" -> """
      WITH toks AS (
        SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        FROM documents),
      uni AS (
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
          CAST(COUNT(*) AS BIGINT) AS n_distinct,
          CAST(MAX(tf) AS BIGINT) AS top_token_tf
        FROM (SELECT doc_id, t, COUNT(*) AS tf
              FROM (SELECT doc_id, unnest(w) AS t FROM toks)
              WHERE t <> '' GROUP BY doc_id, t)
        GROUP BY doc_id),
      bi AS (
        SELECT doc_id, CAST(SUM(bf) AS BIGINT) AS n_bigrams,
          CAST(MAX(bf) AS BIGINT) AS top_bigram_tf
        FROM (SELECT doc_id, b, COUNT(*) AS bf
              FROM (SELECT doc_id,
                      unnest(list_transform(range(1, len(w)),
                        i -> w[i] || ' ' || w[i + 1])) AS b
                    FROM toks WHERE len(w) >= 2)
              GROUP BY doc_id, b)
        GROUP BY doc_id)
      SELECT u.doc_id, u.n_tokens, u.n_distinct,
        CAST(u.n_distinct AS DOUBLE) / u.n_tokens AS distinct_ratio,
        u.top_token_tf,
        CAST(u.top_token_tf AS DOUBLE) / u.n_tokens AS top_token_frac,
        COALESCE(bi.n_bigrams, 0) AS n_bigrams,
        COALESCE(bi.top_bigram_tf, 0) AS top_bigram_tf,
        CAST(COALESCE(bi.top_bigram_tf, 0) AS DOUBLE)
          / greatest(COALESCE(bi.n_bigrams, 0), 1) AS top_bigram_frac
      FROM uni u LEFT JOIN bi USING (doc_id)""",
    "text_gopher_filter" -> gopherOracle,
    "curation_pipeline" -> s"""
      WITH ${TextQueries.LmReplayCtes},
      s1 AS (
        SELECT doc_id, predicted_lang
        FROM (${TextQueries.langIdOracle})
        WHERE predicted_lang <> 'unknown'),
      s2 AS (
        SELECT s1.* FROM s1
        JOIN ($gopherOracle) g USING (doc_id)
        WHERE g.keep = 1),
      hsh AS (
        SELECT doc_id,
          md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS h
        FROM documents),
      s3 AS (
        SELECT doc_id, predicted_lang FROM (
          SELECT s2.doc_id, s2.predicted_lang,
            MIN(s2.doc_id) OVER (PARTITION BY hsh.h) AS keeper
          FROM s2 JOIN hsh USING (doc_id))
        WHERE doc_id = keeper),
      rk AS (
        SELECT s3.doc_id, s3.predicted_lang,
          ntile(3) OVER (PARTITION BY s3.predicted_lang
            ORDER BY lm.avg_logp DESC, s3.doc_id) AS tile
        FROM s3 JOIN lm USING (doc_id)
        WHERE lm.n_bigrams > 0),
      srcs AS (SELECT doc_id, source FROM documents),
      f1 AS (SELECT predicted_lang, source, COUNT(*) AS n
             FROM s1 JOIN srcs USING (doc_id) GROUP BY 1, 2),
      f2 AS (SELECT predicted_lang, source, COUNT(*) AS n
             FROM s2 JOIN srcs USING (doc_id) GROUP BY 1, 2),
      f3 AS (SELECT predicted_lang, source, COUNT(*) AS n
             FROM s3 JOIN srcs USING (doc_id) GROUP BY 1, 2),
      f4 AS (SELECT predicted_lang, source, COUNT(*) AS n
             FROM rk JOIN srcs USING (doc_id)
             WHERE tile <= 2 GROUP BY 1, 2)
      SELECT f1.predicted_lang AS lang, f1.source,
        CAST(f1.n AS BIGINT) AS n_lang,
        CAST(COALESCE(f2.n, 0) AS BIGINT) AS n_quality,
        CAST(COALESCE(f3.n, 0) AS BIGINT) AS n_dedup,
        CAST(COALESCE(f4.n, 0) AS BIGINT) AS n_final
      FROM f1
      LEFT JOIN f2 USING (predicted_lang, source)
      LEFT JOIN f3 USING (predicted_lang, source)
      LEFT JOIN f4 USING (predicted_lang, source)""",
    "pii_scan" -> s"""
      SELECT doc_id,
        $piiCounts,
        $piiTotal AS n_pii_total
      FROM documents""",
    "pii_redact" -> s"""
      SELECT doc_id,
        ${Pii.patterns.map { case (_, re) =>
          s"CAST(len(regexp_extract_all(text, '$re')) AS BIGINT)"
        }.mkString(" + ")} AS n_pii_total,
        ${Pii.patterns.foldLeft("text") { case (expr, (kind, re)) =>
          s"regexp_replace($expr, '$re', '[${kind.toUpperCase}]', 'g')"
        }} AS redacted
      FROM documents""",
    "sample_weighted" -> s"""
      SELECT doc_id, n_chars, source FROM documents
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
          AS BIGINT) % $WeightDen
        < least(n_chars * $WeightNum, $WeightDen)""",
    "q23_cube" -> """
      SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        COALESCE(l_linestatus, 'ALL') AS linestatus,
        CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
        CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
        COUNT(*) AS n_rows,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
          AS revenue_cents
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)""")
}
