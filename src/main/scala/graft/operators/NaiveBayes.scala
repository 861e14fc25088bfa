package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained naive-Bayes document classifier (round-9): the
  * fastText-style quality-classifier curation signal (Joulin et al.
  * 2016; the "train a cheap classifier on weak labels, score the
  * whole corpus" step of e.g. the LLaMA/GPT-3 data pipelines) as a
  * fully distributed, exact, DuckDB-replayable operator — the
  * [[LmScore]] recipe applied to supervised scoring.
  *
  * Model: add-one-smoothed multinomial NB over whitespace tokens.
  *   P(c)    = (D_c + 1) / (D + 2)            (smoothed doc prior)
  *   P(w|c)  = (C(w,c) + 1) / (T_c + V)       (smoothed token prob)
  * Doc log-score per class = ln P(c) + Σ ln P(w|c) over the doc's
  * token INSTANCES (repeats count each time); pred = argmax on the
  * 6-dp-rounded scores (ties → positive), so the decision is
  * cross-engine deterministic.
  *
  * Scale (the canonical distributed count-model shape):
  *  - per-token per-class counts are ONE map-side-combined
  *    aggregation on the token key (class splits are conditional
  *    sums, not a (token, class) key — the relation stays
  *    vocabulary-sized);
  *  - the model scalars (T_pos, T_neg, V, D_pos, D) are a ONE-ROW
  *    broadcast;
  *  - scoring joins the token-instance relation to the vocabulary
  *    counts (co-partitioned shuffle on the token key) and
  *    aggregates per doc — nothing wider than the instance relation
  *    ever shuffles, and there is no driver-side model state, so the
  *    same plan trains on 100 TB of weak labels.
  */
object NaiveBayes {

  /** Train on `labelCol` (boolean weak labels) and score every doc.
    * Output: (doc_id, label 0/1, n_tokens, lp_pos, lp_neg, pred 0/1)
    * — lp_* are the full per-class log-scores at 6 dp. */
  def trainScore(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(labelCol).cast("boolean").as("label"),
      split(lower(trim(col(textCol))), " ").as("w"))
    val inst = base.select(col("doc_id"), col("label"),
      explode(col("w")).as("t"))
    val counts = inst.groupBy(col("t")).agg(
      sum(when(col("label"), 1L).otherwise(0L)).as("c_pos"),
      sum(when(col("label"), 0L).otherwise(1L)).as("c_neg"))
    // model scalars: token totals + vocab size, doc totals — two
    // one-row aggregates crossed into one broadcast row
    val model = counts.agg(
        sum(col("c_pos")).as("t_pos"), sum(col("c_neg")).as("t_neg"),
        count(lit(1)).as("v"))
      .crossJoin(base.agg(
        sum(when(col("label"), 1L).otherwise(0L)).as("d_pos"),
        count(lit(1)).as("d")))
    val scored = inst.join(counts, Seq("t"))
      .crossJoin(broadcast(model))
      .groupBy(col("doc_id"))
      .agg(
        sum(log((col("c_pos") + lit(1L)).cast("double") /
          (col("t_pos") + col("v")).cast("double"))).as("_lp_pos"),
        sum(log((col("c_neg") + lit(1L)).cast("double") /
          (col("t_neg") + col("v")).cast("double"))).as("_lp_neg"))
    base.select(col("doc_id"), col("label"), size(col("w")).as("n_tokens"))
      .join(scored, Seq("doc_id"), "left")
      .crossJoin(broadcast(model))
      .select(col("doc_id"), col("label").cast("long").as("label"),
        col("n_tokens"),
        round(log((col("d_pos") + lit(1L)).cast("double") /
          (col("d") + lit(2L)).cast("double")) + col("_lp_pos"), 6)
          .as("lp_pos"),
        round(log((col("d") - col("d_pos") + lit(1L)).cast("double") /
          (col("d") + lit(2L)).cast("double")) + col("_lp_neg"), 6)
          .as("lp_neg"))
      .withColumn("pred",
        when(col("lp_pos") >= col("lp_neg"), 1L).otherwise(0L))
  }
}
