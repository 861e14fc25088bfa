package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Text analysis (SURVEY.md §2.7) — per-document feature extraction for
  * training-data curation. Every operator is a narrow projection (no
  * shuffle at all): at 100 TB these run at scan speed, fully inside
  * whole-stage codegen. Counts are exact integers; ratios derive from
  * them, so the DuckDB oracle matches bit-for-bit.
  */
object TextQueries {

  private val BpeishToken = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  val stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")

  private def tokens: Column = split(lower(trim(col("text"))), " ")

  /** #36 text_stats — token counts (whitespace + BPE-ish regex), char
    * length, average word length, punctuation ratio. */
  def textStats(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .withColumn("char_len", length(col("text")))
      .withColumn("n_tokens_ws", size(tokens))
      .withColumn("n_tokens_bpe", regexp_count(col("text"), lit(BpeishToken)))
      .withColumn("alpha_chars",
        length(regexp_replace(col("text"), "[^A-Za-z]", "")))
      .withColumn("punct_chars",
        length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", "")))
      .select(
        col("doc_id"), col("char_len"), col("n_tokens_ws"),
        col("n_tokens_bpe"),
        (col("alpha_chars").cast("double") / col("n_tokens_ws"))
          .as("avg_word_len"),
        (col("punct_chars").cast("double") / col("char_len"))
          .as("punct_ratio"))

  /** #37 text_quality_score — composite 0–1 score from four indicator
    * features (reference-style banded thresholds: data_quality.py uses
    * the same score→status banding shape). */
  def textQualityScore(s: SparkSession, dir: String): DataFrame = {
    val stopArray = stopwords.map(w => s"'$w'").mkString("(", ", ", ")")
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .withColumn("char_len", length(col("text")))
      .withColumn("n_tokens", size(tokens))
      .withColumn("n_stop", expr(
        s"size(filter(split(lower(trim(text)), ' '), t -> t IN $stopArray))"))
      .withColumn("punct_chars",
        length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", "")))
      .withColumn("alpha_chars",
        length(regexp_replace(col("text"), "[^A-Za-z]", "")))
      .withColumn("stop_ratio",
        col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("punct_ratio",
        col("punct_chars").cast("double") / col("char_len"))
      .withColumn("avg_word_len",
        col("alpha_chars").cast("double") / col("n_tokens"))
      .withColumn("len_ok",
        when(col("char_len").between(100, 5000), 1).otherwise(0))
      .withColumn("punct_ok", when(col("punct_ratio") <= 0.1, 1).otherwise(0))
      .withColumn("stop_ok",
        when(col("stop_ratio").between(0.02, 0.6), 1).otherwise(0))
      .withColumn("wordlen_ok",
        when(col("avg_word_len").between(3.0, 8.0), 1).otherwise(0))
      .withColumn("quality_score",
        (col("len_ok") * 0.3 + col("punct_ok") * 0.2 +
          col("stop_ok") * 0.3 + col("wordlen_ok") * 0.2))
      .withColumn("quality_band",
        when(col("quality_score") >= 0.8, "high")
          .when(col("quality_score") >= 0.5, "medium")
          .otherwise("low"))
      .select(col("doc_id"), col("char_len"), col("n_tokens"),
        col("stop_ratio"), col("punct_ratio"), col("avg_word_len"),
        col("quality_score"), col("quality_band"))
  }

  /** Per-language marker-word lists for the n-gram/stopword heuristic
    * language ID (#38). Tiny and broadcast-inlined as literals. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "is", "and", "of", "to"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("de", "shi", "zai", "le", "wo"))

  /** #38 text_lang_id (rows-only) — marker-hit counts per language, one
    * pass; predicted = argmax with a deterministic lexicographic
    * tie-break. A heuristic, not a model: the operator shape (narrow
    * scan → argmax over K literal profiles) is what scales. */
  def textLangId(s: SparkSession, dir: String): DataFrame = {
    val hitCols = langMarkers.toSeq.sortBy(_._1).map { case (lang, words) =>
      val arr = words.map(w => s"'$w'").mkString("(", ", ", ")")
      expr(s"size(filter(split(lower(trim(text)), ' '), t -> t IN $arr))")
        .as(s"hits_$lang")
    }
    val withHits = Tables(s, dir, "documents")
      .select(col("doc_id") +: col("lang").as("actual_lang") +: hitCols: _*)
    val langs = langMarkers.keys.toSeq.sorted
    val best = langs.map(l => col(s"hits_$l")).reduce(greatest(_, _))
    val predicted = langs.foldRight(lit("unknown")) { (l, acc) =>
      when(col(s"hits_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
    withHits.withColumn("predicted_lang", predicted)
  }

  /** #39 text_fingerprint (rows-only) — winnowing fingerprints via the
    * native codegen'd expression (k=8-gram hashes, window 4), plus the
    * full-document SimHash. */
  def textFingerprint(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        expr("winnow(lower(trim(text)), 8, 4)").as("fingerprints"),
        expr("simhash64(split(lower(trim(text)), ' '))").as("simhash"))
      .select(col("doc_id"), col("fingerprints"),
        size(col("fingerprints")).as("n_fingerprints"), col("simhash"))
  }

  /** text_top_terms — per-document top-3 terms by frequency with corpus
    * document-frequency attached (the tf/df half of tf-idf; idf's log is
    * left to the caller because libm rounding differs across engines).
    * explode → two keyed aggs → windowed top-k; all outputs integer. */
  def textTopTerms(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(tokens).as("term"))
      .filter(col("term") =!= "")
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = terms.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("term").asc)
    tf.join(df, "term")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_top_terms" -> textTopTerms,
    "text_stats" -> textStats,
    "text_quality_score" -> textQualityScore,
    "text_lang_id" -> textLangId,
    "text_fingerprint" -> textFingerprint)

  val oracleSql: Map[String, String] = Map(
    "text_top_terms" -> s"""
      WITH terms AS (
        SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS term
        FROM documents),
      filtered AS (SELECT * FROM terms WHERE term <> ''),
      tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM filtered GROUP BY doc_id, term),
      df AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df
        FROM filtered GROUP BY term),
      ranked AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
          CAST(row_number() OVER (PARTITION BY tf.doc_id
            ORDER BY tf.tf DESC, tf.term ASC) AS BIGINT) AS rank
        FROM tf JOIN df USING (term))
      SELECT doc_id, rank, term, tf, df
      FROM ranked WHERE rank <= 3""",
    "text_stats" -> s"""
      SELECT doc_id,
        CAST(length(text) AS INTEGER) AS char_len,
        CAST(len(string_split(lower(trim(text)), ' ')) AS INTEGER)
          AS n_tokens_ws,
        CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
          AS INTEGER) AS n_tokens_bpe,
        CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
          / len(string_split(lower(trim(text)), ' ')) AS avg_word_len,
        CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
          / length(text) AS punct_ratio
      FROM documents""",
    "text_quality_score" -> s"""
      WITH feat AS (
        SELECT doc_id,
          CAST(length(text) AS INTEGER) AS char_len,
          CAST(len(string_split(lower(trim(text)), ' ')) AS INTEGER)
            AS n_tokens,
          len(list_filter(string_split(lower(trim(text)), ' '),
            t -> t IN (${stopwords.map(w => s"'$w'").mkString(", ")})))
            AS n_stop,
          length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
            AS punct_chars,
          length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars
        FROM documents),
      ratios AS (
        SELECT doc_id, char_len, n_tokens,
          CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
          CAST(punct_chars AS DOUBLE) / char_len AS punct_ratio,
          CAST(alpha_chars AS DOUBLE) / n_tokens AS avg_word_len
        FROM feat),
      ind AS (
        SELECT *,
          CASE WHEN char_len BETWEEN 100 AND 5000 THEN 1 ELSE 0 END AS len_ok,
          CASE WHEN punct_ratio <= 0.1 THEN 1 ELSE 0 END AS punct_ok,
          CASE WHEN stop_ratio BETWEEN 0.02 AND 0.6 THEN 1 ELSE 0 END
            AS stop_ok,
          CASE WHEN avg_word_len BETWEEN 3.0 AND 8.0 THEN 1 ELSE 0 END
            AS wordlen_ok
        FROM ratios),
      scored AS (
        SELECT *, len_ok * 0.3 + punct_ok * 0.2 + stop_ok * 0.3
          + wordlen_ok * 0.2 AS quality_score
        FROM ind)
      SELECT doc_id, char_len, n_tokens, stop_ratio, punct_ratio,
        avg_word_len, CAST(quality_score AS DOUBLE) AS quality_score,
        CASE WHEN quality_score >= 0.8 THEN 'high'
             WHEN quality_score >= 0.5 THEN 'medium'
             ELSE 'low' END AS quality_band
      FROM scored""")
}
