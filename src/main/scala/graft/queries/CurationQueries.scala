package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Decontaminate, Pii, Sampling, TextOps}

/** Round-3 additions (SURVEY.md §2c) — corpus-curation operators bound
  * to the testdata, each DuckDB-oracle-checked: cross-corpus
  * decontamination (exact + n-gram), repetition signals + Gopher-style
  * filtering, PII scanning, weighted sampling, and the CUBE grouping
  * surface. The benchmark corpus for decontamination is the `src0`
  * slice of `documents`; everything else is the training corpus.
  */
object CurationQueries {

  val BenchmarkSource = "src0"
  /** 3-gram overlap for the synthetic corpus (its ~40-word vocabulary
    * makes 3-gram collisions informative; the API default of 8 suits
    * natural text). */
  val NgramN = 3
  /** Weighted-sampling odds: P(keep) = min(1, n_chars·700/1e6). */
  val WeightNum = 700L
  val WeightDen = 1000000L

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
  private def train(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).filter(col("source") =!= BenchmarkSource)
  private def benchmark(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).filter(col("source") === BenchmarkSource)

  /** decon_exact — training docs surviving exact-hash decontamination
    * against the benchmark slice. */
  def deconExact(s: SparkSession, dir: String): DataFrame =
    Decontaminate.exactClean(train(s, dir), benchmark(s, dir),
      "doc_id", "text")

  /** decon_ngram — per-training-doc benchmark n-gram overlap report. */
  def deconNgram(s: SparkSession, dir: String): DataFrame =
    Decontaminate.ngramReport(train(s, dir), benchmark(s, dir),
      "doc_id", "text", n = NgramN)

  /** text_repetition — within-document repetition signals. */
  def textRepetition(s: SparkSession, dir: String): DataFrame =
    TextOps.repetition(docs(s, dir), "doc_id", "text")

  /** text_gopher_filter — keep/drop with auditable reasons. */
  def textGopherFilter(s: SparkSession, dir: String): DataFrame =
    TextOps.gopherFilter(docs(s, dir), "doc_id", "text")

  /** pii_scan — per-doc PII match counts. */
  def piiScan(s: SparkSession, dir: String): DataFrame =
    Pii.scan(docs(s, dir), "doc_id", "text")

  /** sample_weighted — length-weighted deterministic Bernoulli. */
  def sampleWeighted(s: SparkSession, dir: String): DataFrame =
    Sampling.weightedBernoulli(
      docs(s, dir).select(col("doc_id"), col("n_chars"), col("source")),
      col("doc_id"), col("n_chars"), WeightNum, WeightDen)

  /** q23_cube — CUBE over (returnflag, linestatus) with grouping flags:
    * the grouping-sets surface q10's ROLLUP does not cover. */
  def q23Cube(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"),
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(Core.cents(col("l_extendedprice"))).as("revenue_cents"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("g_rf"), col("g_ls"), col("n_rows"), col("sum_qty"),
        col("revenue_cents"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "decon_exact" -> deconExact,
    "decon_ngram" -> deconNgram,
    "text_repetition" -> textRepetition,
    "text_gopher_filter" -> textGopherFilter,
    "pii_scan" -> piiScan,
    "sample_weighted" -> sampleWeighted,
    "q23_cube" -> q23Cube)

  /** [[Dedup.normalized]] → md5, as DuckDB SQL. */
  private val normHash =
    "md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))"

  /** Distinct word n-grams of `documents` rows matching `where`. */
  private def gramCte(alias: String, where: String): String = s"""
      $alias AS (
        SELECT DISTINCT doc_id,
          array_to_string(list_slice(w, i, i + ${NgramN - 1}), ' ') AS g
        FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
              FROM documents WHERE $where),
          LATERAL (SELECT unnest(range(1, len(w) - $NgramN + 2)) AS i)
        WHERE len(w) >= $NgramN)"""

  private val piiCounts = Pii.patterns.map { case (kind, re) =>
    s"CAST(len(regexp_extract_all(text, '$re')) AS BIGINT) AS n_$kind"
  }.mkString(",\n        ")
  private val piiTotal = Pii.patterns.map { case (kind, _) => s"n_$kind" }
    .mkString(" + ")

  val oracleSql: Map[String, String] = Map(
    "decon_exact" -> s"""
      SELECT doc_id, $normHash AS content_hash
      FROM documents
      WHERE source <> '$BenchmarkSource'
        AND $normHash NOT IN (
          SELECT $normHash FROM documents WHERE source = '$BenchmarkSource')""",
    "decon_ngram" -> s"""
      WITH ${gramCte("tg", s"source <> '$BenchmarkSource'")},
      ${gramCte("bg", s"source = '$BenchmarkSource'")},
      shared AS (
        SELECT tg.doc_id, COUNT(*) AS n
        FROM tg JOIN (SELECT DISTINCT g FROM bg) b USING (g)
        GROUP BY tg.doc_id)
      SELECT d.doc_id,
        CAST(COALESCE(s.n, 0) AS BIGINT) AS n_shared_ngrams,
        CAST(CASE WHEN COALESCE(s.n, 0) >= 1 THEN 1 ELSE 0 END AS INTEGER)
          AS contaminated
      FROM documents d LEFT JOIN shared s USING (doc_id)
      WHERE d.source <> '$BenchmarkSource'""",
    "text_repetition" -> """
      WITH toks AS (
        SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        FROM documents),
      uni AS (
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
          CAST(COUNT(*) AS BIGINT) AS n_distinct,
          CAST(MAX(tf) AS BIGINT) AS top_token_tf
        FROM (SELECT doc_id, t, COUNT(*) AS tf
              FROM (SELECT doc_id, unnest(w) AS t FROM toks)
              WHERE t <> '' GROUP BY doc_id, t)
        GROUP BY doc_id),
      bi AS (
        SELECT doc_id, CAST(SUM(bf) AS BIGINT) AS n_bigrams,
          CAST(MAX(bf) AS BIGINT) AS top_bigram_tf
        FROM (SELECT doc_id, b, COUNT(*) AS bf
              FROM (SELECT doc_id,
                      unnest(list_transform(range(1, len(w)),
                        i -> w[i] || ' ' || w[i + 1])) AS b
                    FROM toks WHERE len(w) >= 2)
              GROUP BY doc_id, b)
        GROUP BY doc_id)
      SELECT u.doc_id, u.n_tokens, u.n_distinct,
        CAST(u.n_distinct AS DOUBLE) / u.n_tokens AS distinct_ratio,
        u.top_token_tf,
        CAST(u.top_token_tf AS DOUBLE) / u.n_tokens AS top_token_frac,
        COALESCE(bi.n_bigrams, 0) AS n_bigrams,
        COALESCE(bi.top_bigram_tf, 0) AS top_bigram_tf,
        CAST(COALESCE(bi.top_bigram_tf, 0) AS DOUBLE)
          / greatest(COALESCE(bi.n_bigrams, 0), 1) AS top_bigram_frac
      FROM uni u LEFT JOIN bi USING (doc_id)""",
    "text_gopher_filter" -> """
      WITH toks AS (
        SELECT doc_id, string_split(lower(trim(text)), ' ') AS w,
          CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
            / len(string_split(lower(trim(text)), ' ')) AS avg_word_len
        FROM documents),
      uni AS (
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
          CAST(COUNT(*) AS BIGINT) AS n_distinct,
          CAST(MAX(tf) AS BIGINT) AS top_token_tf
        FROM (SELECT doc_id, t, COUNT(*) AS tf
              FROM (SELECT doc_id, unnest(w) AS t FROM toks)
              WHERE t <> '' GROUP BY doc_id, t)
        GROUP BY doc_id),
      bi AS (
        SELECT doc_id, CAST(SUM(bf) AS BIGINT) AS n_bigrams,
          CAST(MAX(bf) AS BIGINT) AS top_bigram_tf
        FROM (SELECT doc_id, b, COUNT(*) AS bf
              FROM (SELECT doc_id,
                      unnest(list_transform(range(1, len(w)),
                        i -> w[i] || ' ' || w[i + 1])) AS b
                    FROM toks WHERE len(w) >= 2)
              GROUP BY doc_id, b)
        GROUP BY doc_id),
      sig AS (
        SELECT u.doc_id, u.n_tokens, t.avg_word_len,
          CAST(u.n_distinct AS DOUBLE) / u.n_tokens AS distinct_ratio,
          CAST(u.top_token_tf AS DOUBLE) / u.n_tokens AS top_token_frac,
          CAST(COALESCE(bi.top_bigram_tf, 0) AS DOUBLE)
            / greatest(COALESCE(bi.n_bigrams, 0), 1) AS top_bigram_frac
        FROM uni u
        LEFT JOIN bi USING (doc_id)
        JOIN toks t USING (doc_id)),
      flagged AS (
        SELECT *,
          (n_tokens BETWEEN 30 AND 50000) AS f_tokens,
          (avg_word_len BETWEEN 3.0 AND 10.0) AS f_awl,
          (distinct_ratio >= 0.2) AS f_dr,
          (top_token_frac <= 0.2) AS f_ttf,
          (top_bigram_frac <= 0.2) AS f_tbf
        FROM sig)
      SELECT doc_id, n_tokens, avg_word_len, distinct_ratio,
        top_token_frac, top_bigram_frac,
        CAST(CASE WHEN f_tokens AND f_awl AND f_dr AND f_ttf AND f_tbf
          THEN 1 ELSE 0 END AS INTEGER) AS keep,
        (CASE WHEN f_tokens THEN '' ELSE 'n_tokens;' END ||
         CASE WHEN f_awl THEN '' ELSE 'avg_word_len;' END ||
         CASE WHEN f_dr THEN '' ELSE 'distinct_ratio;' END ||
         CASE WHEN f_ttf THEN '' ELSE 'top_token_frac;' END ||
         CASE WHEN f_tbf THEN '' ELSE 'top_bigram_frac;' END)
          AS drop_reasons
      FROM flagged""",
    "pii_scan" -> s"""
      SELECT doc_id,
        $piiCounts,
        $piiTotal AS n_pii_total
      FROM documents""",
    "sample_weighted" -> s"""
      SELECT doc_id, n_chars, source FROM documents
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
          AS BIGINT) % $WeightDen
        < least(n_chars * $WeightNum, $WeightDen)""",
    "q23_cube" -> """
      SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        COALESCE(l_linestatus, 'ALL') AS linestatus,
        CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
        CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
        COUNT(*) AS n_rows,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
          AS revenue_cents
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)""")
}
