package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-substring dedup (round-12): remove repeated ≥k-token spans
  * across the corpus REGARDLESS of document structure — the
  * distributed analog of Lee et al. 2021's ExactSubstr pass
  * (arXiv:2107.06499), the strongest known train-set-repetition
  * reducer. [[Paragraph.dedupParagraphs]] only sees repeats that are
  * DELIMITER-ALIGNED (a whole paragraph shared verbatim); a licence
  * header straddling a paragraph break, or boilerplate pasted
  * mid-sentence, is invisible to it. This pass works on the token
  * stream itself, so alignment never matters.
  *
  * The suffix-array construction of the paper is inherently
  * single-machine; the Spark-shaped equivalent is k-token shingling
  * at stride 1 — a span of ≥ k tokens repeats somewhere in the corpus
  * iff EVERY k-token window inside it repeats, so marking duplicated
  * windows and removing the tokens they cover deletes exactly the
  * maximal repeated spans of length ≥ k (a window-granular
  * over-approximation of at most k−1 tokens at each span edge).
  *
  * Pipeline: normalize → token array → per-start 128-bit window
  * identity (xxhash64 under two seeds, computed INSIDE the row via a
  * higher-order `transform`/`slice`, no self-join) → corpus-frequency
  * of each window identity (one map-side-combined groupBy) →
  * duplicated starts → covered token positions → per-doc rewrite
  * keeping uncovered tokens in order.
  *
  * `keepFirst = true` (default, the paper's all-but-one policy) keeps
  * the globally first occurrence of each repeated window ordered by
  * (doc_id, position) — the first document to say something keeps
  * saying it; later copies are removed. `false` removes every
  * occurrence (the more aggressive policy some open implementations
  * apply).
  *
  * Scale: the shingle relation is one row per token (hash-only, 16
  * bytes — the window TEXT never shuffles); frequency is a map-side
  * combined count on the 128-bit identity; only DUPLICATED starts explode into
  * covered positions (duplicated-content-sized × k, not corpus ×
  * k); the rewrite shuffles once on doc_id buffering one document
  * per group — the same envelope as [[Paragraph]]. Stop-window skew
  * (a window repeated millions of times) lands on the frequency
  * groupBy, which is a counter per key, not a buffer.
  */
object ExactSubstr {

  private def guard(docs: DataFrame): Unit =
    Seq("_pos", "_tok", "_h1", "_h2", "_cnt", "_first", "_rm", "_toks",
      "n_tokens", "n_removed", "text_clean").foreach(c =>
      require(!docs.columns.contains(c),
        s"input column $c collides with exact-substring internals; rename it first"))

  /** (doc_id, _toks): each doc's normalized token array. */
  private def tokenized(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // the empty doc normalizes to [""] — array_remove leaves zero
    // real tokens (non-empty docs contain no "" after normalization)
    val toks = array_remove(split(Dedup.normalized(col(textCol)), " "), "")
    docs.select(col(idCol).as("doc_id"), toks.as("_toks"))
  }

  /** (doc_id, _pos, _h1, _h2): a 128-bit identity of the k-token
    * window starting at each position — xxhash64 under two seeds (the
    * bare hash and the hash salted with a distinct leading literal),
    * computed in-row via `transform`/`slice`, so the only per-token
    * state that ever leaves the scan is 16 bytes of hash. 64 bits
    * alone cannot carry the declared 100 TB target: at ~10^13
    * distinct windows, birthday collisions produce ~10^6 false
    * window matches, each silently deleting up to k tokens of UNIQUE
    * text; at 128 bits the expected collision count is ~10^-12 —
    * the same discipline as [[Paragraph.ParagraphIndex]]'s md5. Docs
    * shorter than one window filter out BEFORE sequence() (which
    * would count backwards for a negative end). */
  private def windowStarts(base: DataFrame, k: Int): DataFrame =
    base.filter(size(col("_toks")) >= k)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(col("_toks")) - k),
          i => {
            // hash the token SLICE directly — Spark's xxhash64 folds
            // array elements length-delimited, so no window string is
            // ever built (the round-12 form concat_ws'd ~50 bytes per
            // window per hash; ×2 hashes that dominated the scan)
            val win = slice(col("_toks"), i + 1, lit(k))
            struct(xxhash64(win).as("_h1"),
              xxhash64(lit(0x9E3779B97F4A7C15L), win).as("_h2"))
          })).as(Seq("_pos", "_h")))
      .select(col("doc_id"), col("_pos").cast("long").as("_pos"),
        col("_h._h1").as("_h1"), col("_h._h2").as("_h2"))

  /** Rebuild one row per input doc from duplicated window starts:
    * explode each into its covered token positions, flag, and re-join
    * the kept tokens in order. */
  private def rewrite(docs: DataFrame, idCol: String, base: DataFrame,
      dupStarts: DataFrame, k: Int): DataFrame = {
    val covered = dupStarts
      .select(col("doc_id"),
        explode(sequence(col("_pos"), col("_pos") + (k - 1))).as("_pos"))
      .distinct()
      .withColumn("_rm", lit(true))
    val tokens = base.select(col("doc_id"),
      posexplode(col("_toks")).as(Seq("_pos", "_tok")))
      .select(col("doc_id"), col("_pos").cast("long").as("_pos"),
        col("_tok"))
    val flagged = tokens.join(covered, Seq("doc_id", "_pos"), "left")
      .withColumn("_rm", coalesce(col("_rm"), lit(false)))
    val agg = flagged.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_rm"), 1L).otherwise(0L)).as("n_removed"),
        array_join(
          transform(
            filter(
              array_sort(collect_list(
                struct(col("_pos"), col("_rm"), col("_tok")))),
              x => !x.getField("_rm")),
            x => x.getField("_tok")),
          " ").as("text_clean"))
    docs.select(col(idCol).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** Rewrite docs removing every repeated k-token span. Output: one
    * row per input doc — (doc_id, n_tokens, n_removed, text_clean)
    * where n_tokens counts the doc's (normalized, non-empty) tokens,
    * n_removed the ones covered by a duplicated window, and
    * text_clean re-joins the kept tokens in order with single
    * spaces. */
  def dedupSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, keepFirst: Boolean = true): DataFrame = {
    require(k >= 2, s"window must span at least 2 tokens, got $k")
    guard(docs)
    val base = tokenized(docs, idCol, textCol)
    val starts = windowStarts(base, k)
    // corpus frequency per window hash; with keepFirst also the
    // globally first occurrence (min over the unique (doc_id, pos)
    // pair) — an agg, never a window, so a million-fold repeated
    // window costs a counter, not a sort
    val freq = starts.groupBy(col("_h1"), col("_h2"))
      .agg(count(lit(1)).as("_cnt"),
        min(struct(col("doc_id"), col("_pos"))).as("_first"))
      .filter(col("_cnt") >= 2)
    val dupStarts = starts.join(freq, Seq("_h1", "_h2"))
      .filter(if (keepFirst)
        !(col("doc_id") === col("_first.doc_id") &&
          col("_pos") === col("_first._pos"))
      else lit(true))
    rewrite(docs, idCol, base, dupStarts, k)
  }

  /** The standing corpus' repeated-window fingerprint: the DISTINCT
    * 128-bit identity (`_h1`, `_h2` — xxhash64 under two seeds) of
    * every k-token window the corpus contains, plus the k it was
    * derived under (like [[Paragraph.ParagraphIndex]], the parameter
    * travels WITH the relation — a probe windowed differently would
    * silently match nothing). 16 bytes per distinct window on disk;
    * no text. */
  final case class SubstrIndex(hashes: DataFrame, k: Int)

  /** Derive a [[SubstrIndex]] from a corpus — one scan + one
    * map-side-combined distinct. */
  def buildSubstrIndex(corpus: DataFrame, idCol: String, textCol: String,
      k: Int): SubstrIndex = {
    require(k >= 2, s"window must span at least 2 tokens, got $k")
    guard(corpus)
    SubstrIndex(
      windowStarts(tokenized(corpus, idCol, textCol), k)
        .select(col("_h1"), col("_h2")).distinct(),
      k)
  }

  /** Persist/load a [[SubstrIndex]] as a parquet table bucketed by the
    * probe key ([[graft.sources.BucketedTables]]); k and the hash
    * width ride in the meta table — `hash_bits` lets [[loadSubstrIndex]]
    * REFUSE a pre-round-13 single-xxhash64 index instead of silently
    * probing 64-bit identities against a 128-bit batch. */
  def saveSubstrIndex(index: SubstrIndex, prefix: String, path: String,
      nBuckets: Int = 64): Unit = {
    val s = index.hashes.sparkSession
    graft.sources.BucketedTables.save(index.hashes, s"${prefix}_substr",
      s"$path/substr", Seq("_h1", "_h2"), nBuckets)
    import s.implicits._
    Seq((index.k, nBuckets, 128)).toDF("k", "n_buckets", "hash_bits")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  def loadSubstrIndex(s: org.apache.spark.sql.SparkSession,
      prefix: String, path: String): SubstrIndex = {
    val metaDf = s.read.parquet(s"$path/meta")
    require(metaDf.columns.contains("hash_bits"),
      s"substr index at $path predates 128-bit window identity " +
        "(round 13); rebuild it with buildSubstrIndex/saveSubstrIndex")
    val meta = metaDf.head()
    require(meta.getAs[Int]("hash_bits") == 128,
      s"substr index at $path has unsupported hash width " +
        s"${meta.getAs[Int]("hash_bits")}; expected 128")
    SubstrIndex(
      hashes = graft.sources.BucketedTables.load(s, s"${prefix}_substr",
        s"$path/substr", "_h1 BIGINT, _h2 BIGINT", Seq("_h1", "_h2"),
        meta.getAs[Int]("n_buckets")),
      k = meta.getAs[Int]("k"))
  }

  /** Daily-ingest form: rewrite an ARRIVING batch removing every span
    * the CORPUS already contains — the corpus keeps its copy (the
    * all-but-one policy with the corpus as the standing first
    * occurrence). Batch-internal repetition is deliberately not
    * counted here, the same static-index contract as
    * [[Paragraph.cleanAgainstIndex]] — it becomes corpus knowledge
    * when the batch is folded in and the index refreshed. The corpus
    * contributes only its hash fingerprint — bucketed on the probe
    * key when loaded from [[saveSubstrIndex]], so nothing
    * corpus-sized shuffles per ingest; the probe is a left_semi
    * equi-join on the 16-byte 128-bit identity. Output shape
    * identical to [[dedupSpans]]. */
  def cleanAgainstIndex(index: SubstrIndex, batch: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    guard(batch)
    val base = tokenized(batch, idCol, textCol)
    val dupStarts = windowStarts(base, index.k)
      .join(index.hashes, Seq("_h1", "_h2"), "left_semi")
    rewrite(batch, idCol, base, dupStarts, index.k)
  }
}
