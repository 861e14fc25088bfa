package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text retrieval primitives (round-4 addition, SURVEY §2d):
  * inverted-index construction and BM25 ranking — the search side of a
  * corpus store (find the docs about X), complementing the similarity
  * family's embedding side.
  *
  * Scale design:
  *  - [[invertedIndex]] is the classic two-level aggregation: (term,
  *    doc) partial counts combine map-side, then one shuffle keyed by
  *    term. Postings are emitted HEAD-BOUNDED (`postingsCap`) — a full
  *    postings list for a stopword-grade term at 100 TB is a
  *    multi-GB row; the unbounded form belongs in a bucketed write
  *    keyed by term, not in a single row.
  *  - [[bm25TopK]] never explodes tokens: per-term tf comes from a
  *    codegen'd `size(filter(tokens, …))` projection per LITERAL query
  *    term (queries are short), so the corpus is scanned once,
  *    narrowly. The per-term df/avgdl statistics aggregate to ONE row
  *    broadcast back. The final score is a FIXED-ORDER expression sum
  *    (term 1 + term 2 + …), not a data-order float reduction — the
  *    same bits on every engine, every partitioning.
  */
object Search {

  private def toks(textCol: Column): Column =
    split(lower(trim(textCol)), " ")

  /** term → (df, cf, head of the sorted postings list). `minDf` prunes
    * the hapax tail, `postingsCap` bounds row width AND aggregation
    * state: postings are ranked per term (`row_number` ordered by
    * doc_id) and filtered to the cap BEFORE `collect_list`, so the rank
    * filter plans as a `WindowGroupLimit` — per-task window state is
    * O(cap), never the full postings list of a stopword-grade term
    * (which at 100 TB is a multi-GB buffer on one reducer). df/cf stay
    * exact: they aggregate the UNCAPPED (term, doc) counts in a
    * separate branch joined back on term.
    *
    * The two branches each recompute the (term, doc) count relation —
    * the same deliberate recompute-beats-cache trade as the dedup
    * shingle pipelines: the relation is one narrow scan + map-side-
    * combined agg, while materializing it corpus-wide would spill a
    * multi-TB intermediate. Both branches shuffle on `term`, so the
    * final join is co-partitioned. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      minDf: Long = 1L, postingsCap: Int = 64): DataFrame = {
    def tf = docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(toks(col(textCol))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
      .filter(col("df") >= minDf)
    val byDocId = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term")).orderBy(col("doc_id").asc)
    val heads = tf.select(col("term"), col("doc_id"))
      .withColumn("_rn", row_number().over(byDocId))
      .filter(col("_rn") <= postingsCap) // -> WindowGroupLimit, state O(cap)
      .groupBy(col("term"))
      .agg(array_join(
        transform(sort_array(collect_list(col("doc_id"))),
          x => x.cast("string")), ",").as("postings_head"))
    stats.join(heads, Seq("term"))
      .select(col("term"), col("df"), col("cf"), col("postings_head"))
  }

  /** BM25 parameters (Robertson et al.; Lucene's defaults). */
  val K1 = 1.2
  val B = 0.75

  /** Top-k docs for a literal query term set under BM25 (idf form
    * ln(1 + (N - df + 0.5)/(df + 0.5)), non-negative). Output:
    * (doc_id, score, rank). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val base = docs.select(
      col(idCol).cast("long").as("doc_id"),
      toks(col(textCol)).as("w"))
    // terms are bound as LITERALS via the typed lambda API — caller
    // text (query terms are user data) never reaches SQL text, so a
    // quote/backslash in a term is just a token to match
    val withTf = queryTerms.zipWithIndex.foldLeft(
      base.withColumn("dl", size(col("w")).cast("double"))) {
      case (df, (t, i)) =>
        df.withColumn(s"tf_$i",
          size(filter(col("w"), x => x === lit(t))).cast("double"))
    }
    // corpus statistics: ONE row, broadcast back to the scan
    val statAggs = count(lit(1)).cast("double").as("n_docs") +:
      avg(col("dl")).as("avgdl") +:
      queryTerms.indices.map(i =>
        sum((col(s"tf_$i") > 0).cast("long")).cast("double").as(s"df_$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    // fixed-order score: contribution of term 0 + term 1 + … — never a
    // data-order float reduction
    val score = queryTerms.indices.map { i =>
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df_$i") + lit(0.5)) /
          (col(s"df_$i") + lit(0.5)))
      val tf = col(s"tf_$i")
      idf * (tf * lit(K1 + 1.0)) /
        (tf + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))
    }.reduceLeft(_ + _)
    val scored = withTf.crossJoin(broadcast(stats))
      .select(col("doc_id"), score.as("score"))
      .filter(col("score") > 0.0)
    val top = scored.orderBy(col("score").desc, col("doc_id").asc).limit(k)
    // rank re-derived on the k survivors (tiny single partition)
    top.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
  }
}
