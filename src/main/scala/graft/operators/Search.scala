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

  /** The (doc_id, text) scan [[bm25TopK]] tokenizes, spread over the
    * session's cores first ([[Skew.spread]], guide §2.5): a
    * single-split corpus file would otherwise pin the per-doc
    * tokenize + term-count projections — bm25's only expensive narrow
    * op, with no downstream shuffle to re-parallelize them — to one
    * core; at real scan parallelism the spread is a no-op.
    * Tokenization stays ABOVE the exchange (only the narrow id+text
    * columns shuffle). Deliberately NOT applied to
    * [[invertedIndex]]/[[tfidfTopK]]: their explode branches fork the
    * input TWICE and the doubled spread exchange measured SLOWER than
    * the single-split scan they spread (full-bench pair: search_index
    * 0.98 → 1.34 s, search_tfidf 1.20 → 1.45 s — reverted). */
  private def spreadDocs(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    Skew.spread(
      docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("_graft_text")),
      col("doc_id"))

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

  /** TF-IDF cosine retrieval (round-7): top-k docs for a literal query
    * under the vector-space model with smoothed idf
    * (`ln((N+1)/(df+1)) + 1`, sklearn's form — strictly positive, so
    * corpus-wide terms still contribute). Doc weight = tf·idf, query
    * weight = idf (query tf is 1 per distinct term), score = cosine
    * between the two, ROUNDED to 6 dp before ranking so rank
    * boundaries are deterministic across engines. Output:
    * (doc_id, score, rank).
    *
    * Two branches, like [[invertedIndex]]:
    *  - the match side never explodes: per-term tf is a codegen'd
    *    `size(filter(tokens, …))` projection per literal query term,
    *    corpus statistics (N, per-term df) aggregate to ONE broadcast
    *    row, and the query-side dot product / norm are FIXED-ORDER
    *    expression sums over the literal terms;
    *  - the doc L2 norm is the one inherently corpus-vocabulary-wide
    *    quantity: (term, doc, tf) explode → per-term df (one shuffle
    *    on term, map-side combined, co-partitioned with the tf
    *    relation it joins) → per-doc Σ(tf·idf)² (one shuffle on doc).
    * Docs matching no query term are filtered BEFORE the norm join,
    * so AQE sees a query-selectivity-sized build side at 100 TB. */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct == queryTerms,
      "queryTerms must be distinct (query tf is 1 per term)")
    val base = docs.select(
      col(idCol).cast("long").as("doc_id"), toks(col(textCol)).as("w"))
    // terms bound as literals via the typed lambda API (never SQL text)
    val withTf = queryTerms.zipWithIndex.foldLeft(base) {
      case (df, (t, i)) =>
        df.withColumn(s"tf_$i",
          size(filter(col("w"), x => x === lit(t))).cast("double"))
    }
    val statAggs = count(lit(1)).cast("double").as("n_docs") +:
      queryTerms.indices.map(i =>
        sum((col(s"tf_$i") > 0).cast("long")).cast("double").as(s"df_$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    // doc-norm branch: Σ over the doc's FULL vocabulary of (tf·idf)²
    def tf = base
      .select(col("doc_id"), explode(col("w")).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val dfPerTerm = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val norms = tf.join(dfPerTerm, Seq("term"))
      .crossJoin(broadcast(stats.select(col("n_docs"))))
      .withColumn("_wt", col("tf").cast("double") *
        (log((col("n_docs") + lit(1.0)) /
          (col("df").cast("double") + lit(1.0))) + lit(1.0)))
      .groupBy(col("doc_id"))
      .agg(sum(col("_wt") * col("_wt")).as("_norm2"))
    def idf(i: Int) =
      log((col("n_docs") + lit(1.0)) / (col(s"df_$i") + lit(1.0))) +
        lit(1.0)
    // fixed-order sums over the literal terms — never a data-order
    // float reduction
    val dot = queryTerms.indices
      .map(i => col(s"tf_$i") * idf(i) * idf(i)).reduceLeft(_ + _)
    val qnorm2 = queryTerms.indices
      .map(i => idf(i) * idf(i)).reduceLeft(_ + _)
    val scored = withTf.crossJoin(broadcast(stats))
      .select(col("doc_id"), dot.as("_dot"), qnorm2.as("_qn2"))
      .filter(col("_dot") > 0.0)
      .join(norms, Seq("doc_id"))
      .select(col("doc_id"),
        round(col("_dot") / (sqrt(col("_norm2")) * sqrt(col("_qn2"))), 6)
          .as("score"))
    val top = scored.orderBy(col("score").desc, col("doc_id").asc).limit(k)
    top.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
  }

  /** Top-k docs for a literal query term set under BM25 (idf form
    * ln(1 + (N - df + 0.5)/(df + 0.5)), non-negative). Output:
    * (doc_id, score, rank). The score is ROUNDED to 6 dp before
    * ranking: every per-doc term contribution is a fixed-order
    * expression sum, but `avgdl` is a corpus-order float average, so
    * raw scores can drift an ulp across engines/partitionings —
    * rounding pins both the value and the rank boundary. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val base = spreadDocs(docs, idCol, textCol)
      .select(col("doc_id"), toks(col("_graft_text")).as("w"))
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
      .select(col("doc_id"), round(score, 6).as("score"))
      .filter(col("score") > 0.0)
    val top = scored.orderBy(col("score").desc, col("doc_id").asc).limit(k)
    // rank re-derived on the k survivors (tiny single partition)
    top.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
  }
}
