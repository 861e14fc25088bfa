package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-corpus decontamination (round-3 addition, SURVEY.md §2c) —
  * the training-data operation the single-corpus dedup family cannot
  * express: remove (or flag) training documents that leak content from
  * a held-out benchmark/eval corpus, so a model is not trained on its
  * own test set.
  *
  * Scale design: both operators reduce the BENCHMARK side to a distinct
  * key set (content hashes or n-grams) before touching the training
  * corpus. Benchmarks are small relative to 100 TB of training data, so
  * AQE broadcasts the reduced key set and the training side is never
  * shuffled — the whole check runs at scan speed; only the per-doc
  * match aggregation in [[ngramReport]] shuffles (combiner-friendly,
  * keyed by doc).
  */
object Decontaminate {

  /** Exact decontamination: drop training docs whose normalized content
    * hash ([[Dedup.normalized]] → md5) appears in the benchmark. Returns
    * (doc_id, content_hash) of the SURVIVING training docs — one
    * anti-join on the distinct benchmark hash set. */
  def exactClean(train: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def hashed(df: DataFrame): DataFrame =
      df.select(col(idCol).as("doc_id"),
        md5(Dedup.normalized(col(textCol))).as("content_hash"))
    hashed(train).join(hashed(benchmark).select("content_hash").distinct(),
      Seq("content_hash"), "left_anti")
      .select(col("doc_id"), col("content_hash"))
  }

  /** N-gram overlap report: for every training doc, how many of its
    * distinct word n-grams also occur anywhere in the benchmark, and
    * whether that crosses the contamination threshold. Partial overlap
    * catches quoted/excerpted leakage that exact hashing misses.
    * Output: (doc_id, n_shared_ngrams, contaminated 0/1). */
  def ngramReport(train: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      minShared: Long = 1L): DataFrame = {
    val benchGrams = Dedup.shingles(benchmark, idCol, textCol, n)
      .select(col("s")).distinct()
    val shared = Dedup.shingles(train, idCol, textCol, n)
      .join(benchGrams, "s")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_ngrams"))
    train.select(col(idCol).cast("long").as("doc_id"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared_ngrams"), lit(0L)).as("n_shared_ngrams"))
      .withColumn("contaminated",
        (col("n_shared_ngrams") >= minShared).cast("int"))
  }

  /** The filtering form of [[ngramReport]]: training rows that share
    * fewer than `minShared` n-grams with the benchmark, unchanged. */
  def ngramClean(train: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      minShared: Long = 1L): DataFrame = {
    val contaminated = ngramReport(train, benchmark, idCol, textCol, n,
      minShared)
      .filter(col("contaminated") === 1)
      .select(col("doc_id").as(idCol))
    train.join(contaminated, Seq(idCol), "left_anti")
  }
}
