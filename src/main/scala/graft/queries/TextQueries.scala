package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextOps

/** Text analysis (SURVEY.md §2.7) — per-document feature extraction for
  * training-data curation. Every operator is a narrow projection (no
  * shuffle at all): at 100 TB these run at scan speed, fully inside
  * whole-stage codegen. Counts are exact integers; ratios derive from
  * them, so the DuckDB oracle matches bit-for-bit.
  */
object TextQueries {

  val stopwords: Seq[String] = TextOps.stopwords

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** #36 text_stats — [[TextOps.stats]] on `documents`. */
  def textStats(s: SparkSession, dir: String): DataFrame =
    TextOps.stats(docs(s, dir), "doc_id", "text")

  /** #37 text_quality_score — [[TextOps.qualityScore]]. */
  def textQualityScore(s: SparkSession, dir: String): DataFrame =
    TextOps.qualityScore(docs(s, dir), "doc_id", "text")

  /** Per-language marker-word lists for the heuristic language ID. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "is", "and", "of", "to"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("de", "shi", "zai", "le", "wo"))

  /** #38 text_lang_id (rows-only) — [[TextOps.langId]] carrying the
    * actual label for accuracy inspection. */
  def textLangId(s: SparkSession, dir: String): DataFrame =
    TextOps.langId(docs(s, dir), "doc_id", "text", langMarkers,
      passthrough = Seq("lang" -> "actual_lang"))

  /** #39 text_fingerprint (rows-only) — [[TextOps.fingerprint]]
    * (winnowing k=8, window 4, plus SimHash). */
  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    TextOps.fingerprint(docs(s, dir), "doc_id", "text")

  /** text_top_terms — [[TextOps.topTerms]] (top-3, tf/df). */
  def textTopTerms(s: SparkSession, dir: String): DataFrame =
    TextOps.topTerms(docs(s, dir), "doc_id", "text", k = 3)

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
