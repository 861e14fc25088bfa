package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction (round-3 addition, SURVEY.md §2c) —
  * regex scanning for personally identifiable information, the
  * compliance step a training-data pipeline runs before anything ships
  * to a model. Patterns use explicit character classes only (no
  * lookaround, no shorthand classes), so Java regex (Spark) and RE2
  * (DuckDB, for the oracle) agree match-for-match, and both engines'
  * count/replace operate on the same leftmost non-overlapping matches.
  *
  * Scale: both operators are narrow codegen'd projections — no shuffle,
  * scan speed at 100 TB. Patterns are intentionally high-precision /
  * lower-recall (formatted identifiers); a production deployment layers
  * an NER model on top via the same [[Media]]-style mapPartitions shape.
  */
object Pii {

  /** (kind, regex) — the scan/redact pattern set, ordered. */
  val patterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}",
    "phone" -> "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}",
    "ssn" -> "[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "ipv4" -> "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}",
    "credit_card" -> "[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}")

  /** Per-document match counts, one column per pattern kind plus a
    * total. Output: (doc_id, n_email, n_phone, n_ssn, n_ipv4,
    * n_credit_card, n_pii_total). */
  def scan(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = patterns.map { case (kind, re) =>
      regexp_count(col(textCol), lit(re)).cast("long").as(s"n_$kind")
    }
    val total = patterns.map { case (kind, _) => col(s"n_$kind") }
      .reduce(_ + _).as("n_pii_total")
    docs.select(col(idCol).as("doc_id") +: counts: _*)
      .withColumn("n_pii_total", total)
  }

  /** Redacted text: every match replaced by `[KIND]`. Patterns apply in
    * [[patterns]] order (SSNs match the phone pattern's shape first —
    * order is part of the contract). */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (c, (kind, re)) =>
      regexp_replace(c, re, s"[${kind.toUpperCase}]")
    }

  /** Scan + redact in one projection: (doc_id, n_pii_total, redacted). */
  def redacted(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val total = patterns.map { case (_, re) =>
      regexp_count(col(textCol), lit(re)).cast("long")
    }.reduce(_ + _)
    docs.select(col(idCol).as("doc_id"), total.as("n_pii_total"),
      redact(col(textCol)).as("redacted"))
  }
}
