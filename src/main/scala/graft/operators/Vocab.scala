package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocabulary induction + out-of-vocabulary scoring (round-7): fix a
  * top-V corpus vocabulary (the tokenizer-building first pass) and
  * score every document by the fraction of its token INSTANCES that
  * fall outside it — the curation signal for "this doc is mostly
  * tokens the model will fragment" (code in a prose corpus, foreign
  * scripts, OCR noise).
  *
  * Scale: term counting is one map-side-combined aggregation (shuffle
  * on term); the top-V selection is a global ordered rank over the
  * TERM table (vocabulary-sized, ≪ corpus) with a deterministic
  * (count desc, term asc) tie-break; the vocab itself is V rows —
  * broadcast — so per-doc scoring is the token explode joined against
  * a broadcast hash set plus one shuffle on doc_id. Nothing
  * corpus-sized is ever ranked or broadcast.
  */
object Vocab {

  /** Top-V vocabulary: (term, n, rank), rank 1..V by corpus frequency,
    * ties broken by term ascending — deterministic on any engine. */
  def topV(docs: DataFrame, textCol: String, v: Int): DataFrame = {
    require(v > 0, "v must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("term").asc)
    docs
      .select(explode(split(lower(trim(col(textCol))), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= v)
  }

  /** Per-doc OOV report against the corpus' own top-V vocabulary:
    * (doc_id, n_tokens, n_oov, oov_rate). Exact integer counts; the
    * rate is one integer division per row. */
  def oovReport(docs: DataFrame, idCol: String, textCol: String,
      v: Int): DataFrame = {
    val vocab = topV(docs, textCol, v).select(col("term"))
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(split(lower(trim(col(textCol))), " ")).as("term"))
    toks
      .join(broadcast(vocab.withColumn("_graft_in", lit(1))),
        Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_graft_in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }
}
