package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed re-expression of the reference's quality framework
  * (/root/reference/src/quality/data_quality.py:27-205 — zones,
  * dimensions, thresholds, weighted scoring).
  *
  * The reference evaluates R rules with R driver-local passes over
  * `list[dict]`. Here every rule is a `Column` predicate and ALL rule
  * counters are computed in ONE `agg()` — a single scan regardless of
  * rule count, with map-side partial aggregation. At 100 TB this is the
  * difference between one scan and R scans.
  */
object DataZone extends Enumeration {
  val Raw, Bronze, Silver, Gold, Platinum = Value
}

object Dimension extends Enumeration {
  val Completeness, Accuracy, Consistency, Timeliness, Uniqueness,
    Validity, Integrity = Value

  /** Dimension weights — data_quality.py:424-432. */
  val weights: Map[Value, Double] = Map(
    Completeness -> 1.0, Accuracy -> 1.2, Consistency -> 1.1,
    Uniqueness -> 1.0, Validity -> 0.9, Integrity -> 1.0,
    Timeliness -> 0.8)
}

object Status extends Enumeration {
  val Passed, Warning, Failed, Skipped = Value
}

/** Zone-promotion thresholds — data_quality.py:152-206.
  * `maxFailedCritical` budgets ALL failed rules (the reference gate,
  * data_quality.py:517-524, counts every FAILED check against it).
  * `maxFailedMajor` is a DELIBERATE EXTENSION, not reference parity:
  * the reference declares max_failed_major (data_quality.py:158) but
  * its gate never enforces it; here it additionally budgets failures of
  * major-severity rules, so it only bites when a caller loosens
  * `maxFailedCritical` above zero — set it to `Int.MaxValue` for exact
  * reference gate behavior.
  *
  * Field order: the Int budgets precede the Double score floor so a
  * positional caller can never have an Int silently widen into
  * `overallMinScore` (ADVICE r3) — a misplace fails to compile. */
final case class Thresholds(
    minCompleteness: Double, minAccuracy: Double, minConsistency: Double,
    minUniqueness: Double = 1.0, maxFailedCritical: Int = 0,
    maxFailedMajor: Int = 5, overallMinScore: Double = 0.95)

/** One quality rule.
  *
  * @param fails      row-level predicate: true ⇒ the row FAILS the rule
  * @param applicable rows the rule examines (reference rules skip rows
  *                   lacking the field); score = passed/applicable
  * @param failBelow  score below which the rule is FAILED
  * @param warnBelow  score below which the rule is WARNING
  */
final case class Rule(
    ruleId: String, name: String, dimension: Dimension.Value,
    severity: String, fails: Column, applicable: Column = lit(true),
    failBelow: Double = 0.95, warnBelow: Double = 0.99,
    applicableZones: Set[DataZone.Value] =
      Set(DataZone.Bronze, DataZone.Silver, DataZone.Gold))

final case class CheckResult(
    ruleId: String, name: String, dimension: Dimension.Value,
    status: Status.Value, score: Double, recordsChecked: Long,
    recordsPassed: Long, recordsFailed: Long, severity: String = "major")

final case class Report(
    datasetName: String, zone: DataZone.Value, totalRecords: Long,
    checkResults: Seq[CheckResult], overallScore: Double,
    overallStatus: Status.Value, promotionEligible: Boolean)

class QualityValidator(datasetName: String, rules: Seq[Rule],
    thresholdOverrides: Map[DataZone.Value, Thresholds] = Map.empty) {

  /** ZONE_THRESHOLDS — data_quality.py:152-206; per-zone overrides for
    * callers tuning the failure budgets. */
  val zoneThresholds: Map[DataZone.Value, Thresholds] = Map(
    DataZone.Raw -> Thresholds(0.0, 0.0, 0.0, overallMinScore = 0.0),
    DataZone.Bronze -> Thresholds(0.90, 0.95, 0.95, overallMinScore = 0.90),
    DataZone.Silver -> Thresholds(0.95, 0.98, 0.99, overallMinScore = 0.95),
    DataZone.Gold -> Thresholds(0.99, 0.99, 0.99, overallMinScore = 0.98),
    DataZone.Platinum -> Thresholds(1.0, 0.99, 1.0, overallMinScore = 0.99)
  ) ++ thresholdOverrides

  def activeRules(zone: DataZone.Value): Seq[Rule] =
    rules.filter(_.applicableZones.contains(zone))

  /** ONE scan: total count + (checked, failed) per rule in a single agg. */
  def validate(df: DataFrame, zone: DataZone.Value): Report = {
    val active = activeRules(zone)
    val counters: Seq[Column] =
      count(lit(1)).as("_total") +: active.zipWithIndex.flatMap {
        case (r, i) =>
          Seq(
            sum(when(r.applicable, 1L).otherwise(0L)).as(s"_chk_$i"),
            sum(when(r.applicable && r.fails, 1L).otherwise(0L)).as(s"_fail_$i"))
      }
    val row = df.agg(counters.head, counters.tail: _*).collect()(0)
    val total = row.getAs[Long]("_total")

    val results = active.zipWithIndex.map { case (r, i) =>
      val checked = Option(row.getAs[Long](s"_chk_$i")).getOrElse(0L)
      val failed = Option(row.getAs[Long](s"_fail_$i")).getOrElse(0L)
      val passed = checked - failed
      val score = if (checked > 0) passed.toDouble / checked else 1.0
      val status =
        if (score < r.failBelow) Status.Failed
        else if (score < r.warnBelow) Status.Warning
        else Status.Passed
      CheckResult(r.ruleId, r.name, r.dimension, status, score,
        checked, passed, failed, r.severity)
    }

    val overall = overallScore(results)
    val overallStatus =
      if (results.isEmpty) Status.Skipped
      else if (results.exists(_.status == Status.Failed)) Status.Failed
      else if (results.exists(_.status == Status.Warning)) Status.Warning
      else Status.Passed

    Report(datasetName, zone, total, results, overall, overallStatus,
      promotionEligible(results, overall, zone))
  }

  /** Weighted overall score — data_quality.py:418-446. */
  def overallScore(results: Seq[CheckResult]): Double = {
    val live = results.filter(_.status != Status.Skipped)
    val tw = live.map(r => Dimension.weights(r.dimension)).sum
    if (tw == 0.0) 0.0
    else live.map(r => r.score * Dimension.weights(r.dimension)).sum / tw
  }

  /** Promotion gate — data_quality.py:477-526: overall score, per-dimension
    * mean thresholds, then critical-failure count. */
  def promotionEligible(
      results: Seq[CheckResult], overall: Double,
      zone: DataZone.Value): Boolean = {
    val t = zoneThresholds(zone)
    if (overall < t.overallMinScore) return false
    val byDim = results.groupBy(_.dimension).map { case (d, rs) =>
      d -> rs.map(_.score).sum / rs.size
    }
    val dimOk = byDim.forall {
      case (Dimension.Completeness, s) => s >= t.minCompleteness
      case (Dimension.Accuracy, s) => s >= t.minAccuracy
      case (Dimension.Consistency, s) => s >= t.minConsistency
      case (Dimension.Uniqueness, s) => s >= t.minUniqueness
      case _ => true
    }
    val failed = results.filter(_.status == Status.Failed)
    dimOk && failed.size <= t.maxFailedCritical &&
      failed.count(_.severity == "major") <= t.maxFailedMajor
  }

  /** Quarantine split: rows failing any FAILED rule are quarantined
    * (data_quality.py:352-356 collects failed ids of failed checks).
    * Returns (clean, quarantined) off one computed `_dq_pass` column —
    * two narrow filters, never a driver-side id collection.
    */
  def split(df: DataFrame, zone: DataZone.Value, report: Report)
      : (DataFrame, DataFrame) = {
    val failedIds = report.checkResults
      .filter(_.status == Status.Failed).map(_.ruleId).toSet
    val preds = activeRules(zone)
      .filter(r => failedIds.contains(r.ruleId))
      .map(r => r.applicable && r.fails)
    if (preds.isEmpty) (df, df.limit(0))
    else {
      val bad = preds.reduce(_ || _)
      val tagged = df.withColumn("_dq_pass", !coalesce(bad, lit(false)))
      (tagged.filter(col("_dq_pass")).drop("_dq_pass"),
        tagged.filter(!col("_dq_pass")).drop("_dq_pass"))
    }
  }

  def validateAndSplit(df: DataFrame, zone: DataZone.Value)
      : (Report, DataFrame, DataFrame) = {
    val report = validate(df, zone)
    val (clean, quarantined) = split(df, zone, report)
    (report, clean, quarantined)
  }
}

object QualityValidator {

  /** Standard rule set re-targeted from the reference's healthcare fields
    * (data_quality.py:214-312) to the testdata star schema — rule SHAPE
    * preserved: required-fields (DQ001), format validity (DQ002/DQ003),
    * range checks (DQ006), uniqueness (DQ005 — needs a pre-computed dup
    * flag; see [[withDupFlag]]).
    */
  def ordersRules: Seq[Rule] = Seq(
    Rule("DQ001", "required_fields_present", Dimension.Completeness,
      "critical",
      fails = col("o_orderkey").isNull || col("o_custkey").isNull ||
        col("o_orderstatus").isNull || col("o_totalprice").isNull ||
        col("o_orderdate").isNull),
    Rule("DQ002", "valid_date_range", Dimension.Validity, "major",
      fails = !(col("o_orderdate") >= lit("1992-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("2002-01-01").cast("timestamp")),
      applicable = col("o_orderdate").isNotNull,
      applicableZones = Set(DataZone.Silver, DataZone.Gold)),
    Rule("DQ003", "valid_id_format", Dimension.Validity, "critical",
      fails = col("o_orderkey") < 0 || col("o_custkey") < 0,
      failBelow = 0.99, warnBelow = 1.0),
    Rule("DQ006", "valid_value_ranges", Dimension.Accuracy, "major",
      fails = col("o_totalprice") < 0 || col("o_totalprice") > 1000000,
      applicable = col("o_totalprice").isNotNull,
      applicableZones = Set(DataZone.Silver, DataZone.Gold)),
    // DQ004 shape (data_quality.py:249-259 valid_icd10_codes): a
    // code-FORMAT rule scored in the ACCURACY dimension, Silver/Gold
    // only, skipping rows without the code — here the priority code
    // ("1-URGENT" style) stands in for the ICD-10 column.
    Rule("DQ004", "valid_priority_code_format", Dimension.Accuracy, "major",
      fails = !upper(trim(col("o_orderpriority"))).rlike("^[1-5]-[A-Z ]+$"),
      applicable = col("o_orderpriority").isNotNull,
      applicableZones = Set(DataZone.Silver, DataZone.Gold)),
    // DQ008 shape (data_quality.py:295-305 phi_fields_present): a
    // WARNING-severity completeness rule scoped to Raw/Bronze that can
    // warn (score < 0.5) but never fail the gate.
    Rule("DQ008", "audit_fields_present", Dimension.Completeness, "warning",
      fails = col("o_orderstatus").isNull && col("o_orderpriority").isNull,
      failBelow = 0.0, warnBelow = 0.5,
      applicableZones = Set(DataZone.Raw, DataZone.Bronze)))

  /** Rule preset for the event-telemetry table (≈ device feeds): format
    * validity on the JSON props, per-type value ranges (DQ006 shape),
    * required fields. */
  def eventsRules: Seq[Rule] = Seq(
    Rule("DQ001", "required_fields_present", Dimension.Completeness,
      "critical",
      fails = col("event_id").isNull || col("user_id").isNull ||
        col("event_type").isNull),
    Rule("DQ002", "props_json_format", Dimension.Validity, "major",
      fails = !col("props").rlike("^\\{\"k\": [0-9]+\\}$"),
      applicable = col("props").isNotNull,
      applicableZones = Set(DataZone.Silver, DataZone.Gold)),
    Rule("DQ006", "valid_value_ranges", Dimension.Accuracy, "major",
      fails = col("value") < 0 || col("value") > 1000,
      applicable = col("value").isNotNull,
      applicableZones = Set(DataZone.Silver, DataZone.Gold)))

  /** Rule preset for the documents table (≈ clinical notes): language
    * code format, non-empty text, advertised-length consistency (the
    * reference's cross-field consistency dimension). */
  def documentsRules: Seq[Rule] = Seq(
    Rule("DQ001", "required_fields_present", Dimension.Completeness,
      "critical", fails = col("doc_id").isNull || col("text").isNull),
    Rule("DQ003", "lang_code_format", Dimension.Validity, "critical",
      fails = !col("lang").rlike("^[a-z]{2}$"),
      applicable = col("lang").isNotNull,
      failBelow = 0.99, warnBelow = 1.0),
    Rule("DQ00X", "n_chars_consistent", Dimension.Consistency, "major",
      fails = length(col("text")) =!= col("n_chars"),
      applicable = col("text").isNotNull && col("n_chars").isNotNull))

  /** DQ002 shape (data_quality.py:582-630 valid_date_formats): string
    * date fields must be ISO 8601 — reference regex reproduced, rows
    * without the field skipped, Validity/major with the standard
    * 0.95/0.99 bands. */
  def iso8601Rule(dateCol: String): Rule =
    Rule("DQ002", "valid_date_formats", Dimension.Validity, "major",
      fails = !col(dateCol).rlike(
        "^\\d{4}-\\d{2}-\\d{2}(T\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?" +
          "(Z|[+-]\\d{2}:\\d{2})?)?$"),
      applicable = col(dateCol).isNotNull)

  /** DQ005 uniqueness as a predicate: duplicate = not the first row for
    * its key. One window shuffle on the key, then the flag joins the
    * single-pass agg like any other rule. */
  def withDupFlag(df: DataFrame, key: Column*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key: _*)
    df.withColumn("_dup", count(lit(1)).over(w) > 1)
  }

  /** DQ007 referential integrity as a predicate (data_quality.py:285-294
    * runs FK checks inside the validator; :821-838 the check body):
    * precompute `_orphan` — the child FK value has no matching parent —
    * so FK failures can fail a promotion gate and be QUARANTINED like
    * any other rule, not just reported. NULL FKs get a NULL flag (the
    * reference skips rows lacking the field — pair with [[orphanRule]],
    * whose `applicable` excludes them from the score denominator).
    *
    * One left join against the DISTINCT parent key set; dimension
    * parents are small, so AQE broadcasts it — no extra shuffle of the
    * child at 100 TB. */
  def withOrphanFlag(df: DataFrame, childKey: Column,
      parents: DataFrame, parentKey: Column): DataFrame = {
    val p = parents.select(parentKey.as("_fk_parent")).distinct()
    df.join(p, childKey === col("_fk_parent"), "left")
      .withColumn("_orphan",
        when(childKey.isNull, lit(null).cast("boolean"))
          .otherwise(col("_fk_parent").isNull))
      .drop("_fk_parent")
  }

  /** The Integrity-dimension gate rule over [[withOrphanFlag]]'s
    * precomputed flag — DQ007's shape: critical severity, rows with a
    * NULL FK skipped (data_quality.py:285-294). */
  def orphanRule(ruleId: String = "DQ007",
      name: String = "referential_integrity"): Rule =
    Rule(ruleId, name, Dimension.Integrity, "critical",
      fails = col("_orphan"), applicable = col("_orphan").isNotNull,
      failBelow = 1.0, warnBelow = 1.0)
}
