package graft

import org.apache.spark.sql.functions._

import graft.operators.Search

/** Behavior tests for the search family (SURVEY §2d): literal binding
  * of caller query terms and the bounded-state postings contract (the
  * driver oracle covers the testdata bindings). */
class SearchSpec extends SparkSpec {
  private val s = SparkSpec.spark
  import s.implicits._

  test("bm25TopK binds query terms as literals — quotes and backslashes " +
    "are tokens, not SQL") {
    val docs = Seq(
      (1L, "don't panic don't"),
      (2L, "a\\b matches backslash"),
      (3L, "plain words only")).toDF("doc_id", "text")
    // a quote and a backslash in user terms must neither throw a parse
    // error nor rewrite the predicate
    val out = Search.bm25TopK(docs, "doc_id", "text",
      Seq("don't", "a\\b"), k = 10).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L)) // doc 3 scores 0
    val byRank = out.sortBy(_.getAs[Long]("rank"))
    // tf really counted through the literal: "don't" twice in doc 1
    // outranks the single "a\b" in doc 2 (same df, same dl-free idf)
    assert(byRank.head.getLong(0) == 1L)
    assert(byRank(1).getLong(0) == 2L)
  }

  test("bm25TopK: a term that is pure SQL text matches nothing rather " +
    "than executing") {
    val docs = Seq((1L, "select x from t"), (2L, "harmless words"))
      .toDF("doc_id", "text")
    // would throw (or match everything) if spliced into expression text
    val out = Search.bm25TopK(docs, "doc_id", "text",
      Seq("') OR true --", "x'"), k = 5).collect()
    assert(out.isEmpty)
  }

  test("invertedIndex caps postings_head while df/cf stay exact") {
    val docs = (1L to 10000L).map(i => (i, s"common unique$i"))
      .toDF("doc_id", "text")
    val idx = Search.invertedIndex(docs, "doc_id", "text",
      postingsCap = 64)
    val row = idx.filter(col("term") === "common").head()
    // df/cf aggregate the UNCAPPED branch: exact despite the cap
    assert(row.getAs[Long]("df") == 10000L)
    assert(row.getAs[Long]("cf") == 10000L)
    val postings = row.getAs[String]("postings_head").split(",")
    assert(postings.length == 64) // head bounded at the cap
    assert(postings.toSeq == (1L to 64L).map(_.toString)) // sorted head
    // rare terms keep their full (sub-cap) postings list
    val rare = idx.filter(col("term") === "unique42").head()
    assert(rare.getAs[Long]("df") == 1L)
    assert(rare.getAs[String]("postings_head") == "42")
  }
}
