package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Paragraph-level exact dedup (round-8): drop REPEATED SPANS inside
  * documents — the boilerplate pass of a training-data pipeline
  * (nav chrome, license headers, syndicated disclaimers repeated
  * across thousands of otherwise-distinct pages). The whole-doc dedup
  * family ([[Dedup]]) cannot see these: two docs sharing one
  * boilerplate paragraph are far below any whole-doc τ. This is the
  * exact-match form of Lee et al. 2021's repeated-substring removal
  * (arXiv:2107.06499) restricted to delimiter-aligned spans — fully
  * oracle-expressible, no distributed suffix array.
  *
  * Pipeline: split each doc on `splitRegex` (default blank lines) →
  * whitespace-normalized paragraph → per-paragraph document frequency
  * (distinct docs containing it) → rewrite each doc keeping only
  * paragraphs with df ≤ maxDf, preserving paragraph order.
  *
  * Scale: the explode is paragraph-count-sized (≈ the corpus itself);
  * the df relation is paragraph-VOCABULARY-sized with map-side
  * combine, equi-joined back on the normalized paragraph (hash
  * shuffle — at 100 TB the hot keys are exactly the boilerplate
  * paragraphs, whose per-key row count is the df being measured;
  * reduce-side work per key is a counter, not a buffer). The doc
  * rebuild shuffles once on doc_id and buffers one DOCUMENT per group
  * (collect_list of its own paragraphs) — bounded by max doc length,
  * the same envelope every whole-doc operator already assumes. */
object Paragraph {

  /** Rewrite docs dropping paragraphs shared by more than `maxDf`
    * distinct documents. Output: one row per input doc —
    * (doc_id, n_paragraphs, n_dropped, text_clean) where n_paragraphs
    * counts the doc's non-empty normalized paragraphs, n_dropped the
    * ones removed, and text_clean re-joins the kept paragraphs (in
    * order, normalized) with `joiner`. */
  def dedupParagraphs(docs: DataFrame, idCol: String, textCol: String,
      maxDf: Long, splitRegex: String = "\\n\\s*\\n",
      joiner: String = "\n\n"): DataFrame = {
    require(maxDf >= 1, "maxDf must be at least 1")
    Seq("_pos", "_para", "_df", "_keep",
      "n_paragraphs", "n_dropped", "text_clean").foreach(c =>
      require(!docs.columns.contains(c),
        s"input column $c collides with dedupParagraphs internals; rename it first"))
    val parts = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), splitRegex)).as(Seq("_pos", "_raw")))
      .select(col("doc_id"), col("_pos").cast("long").as("_pos"),
        Dedup.normalized(col("_raw")).as("_para"))
      .filter(col("_para") =!= "")
    val dfCounts = parts.select(col("_para"), col("doc_id")).distinct()
      .groupBy(col("_para")).agg(count(lit(1)).as("_df"))
    val rebuilt = parts.join(dfCounts, Seq("_para"))
      .withColumn("_keep", col("_df") <= maxDf)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_paragraphs"),
        sum(when(col("_keep"), 0L).otherwise(1L)).as("n_dropped"),
        array_join(
          transform(
            filter(
              array_sort(collect_list(
                struct(col("_pos"), col("_keep"), col("_para")))),
              x => x.getField("_keep")),
            x => x.getField("_para")),
          joiner).as("text_clean"))
    // every input doc gets a row — a doc with no non-empty paragraphs
    // (or all of them dropped) reports zeros and empty text
    docs.select(col(idCol).as("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_paragraphs"), lit(0L)).as("n_paragraphs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }
}
