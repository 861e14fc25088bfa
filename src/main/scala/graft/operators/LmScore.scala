package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical language-model quality scoring (round-7): train an
  * add-one-smoothed word-BIGRAM model on the corpus itself and score
  * every document by its mean per-bigram log-probability — the
  * KenLM-style "does this read like the rest of the corpus" curation
  * signal (low scorers are boilerplate, lists, garbled extraction;
  * see e.g. CCNet, Wenzek et al. 2019). Everything is count
  * arithmetic, so unlike a real KenLM the whole pipeline is exact,
  * distributed, and DuckDB-replayable.
  *
  * Model: P(w2|w1) = (C(w1,w2) + 1) / (C(w1) + V), with C(·) corpus
  * token/bigram occurrence counts and V the unigram vocabulary size.
  * Doc score = Σ ln P over the doc's bigram INSTANCES (repeats count
  * each time), reported as avg_logp = logp / n_bigrams (6 dp).
  *
  * Scale (the canonical distributed n-gram-LM shape):
  *  - unigram and bigram counts are map-side-combined aggregations —
  *    one shuffle each on the gram key;
  *  - the vocabulary size V is a ONE-ROW broadcast;
  *  - scoring joins the bigram-instance relation to the two count
  *    tables: bigram-instances ⋈ bigram-counts is co-partitioned
  *    (both shuffle on (w1,w2)), the unigram join re-shuffles on w1,
  *    and the final per-doc aggregation shuffles on doc_id. Four
  *    shuffles of the instance relation, nothing wider than it, no
  *    driver-side model state of any kind.
  */
object LmScore {

  /** Per-doc bigram-LM score. Output: (doc_id, n_tokens, n_bigrams,
    * avg_logp) — docs with fewer than 2 tokens get n_bigrams = 0 and
    * a null avg_logp. */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      split(lower(trim(col(textCol))), " ").as("w"))
    val uni = base.select(explode(col("w")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c1"))
    val voc = uni.agg(count(lit(1)).as("v"))
    // bigram instances via an indexed transform + slice (explode of an
    // empty slice drops sub-2-token docs; the left join restores them;
    // `get` is the null-on-out-of-bounds index — the slice discards
    // that last null pair, and ANSI mode never sees a bad subscript)
    val bg = base.select(col("doc_id"), explode(expr(
        "slice(transform(w, (x, i) -> struct(x AS w1, get(w, i + 1) AS w2))," +
          " 1, size(w) - 1)")).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
    val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val scored = bg
      .join(cb, Seq("w1", "w2"))
      .join(uni.withColumnRenamed("t", "w1"), Seq("w1"))
      .crossJoin(broadcast(voc))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(log((col("cb") + lit(1L)).cast("double") /
          (col("c1") + col("v")).cast("double"))).as("_logp"))
    base.select(col("doc_id"), size(col("w")).as("n_tokens"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(col("_logp") / col("n_bigrams"), 6).as("avg_logp"))
  }
}
