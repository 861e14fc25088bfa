package graft

import org.apache.spark.sql.functions._

import graft.quality._

/** SURVEY.md §2.2 #21 — QualityValidator engine semantics (zones,
  * thresholds, weighted score, quarantine split), mirroring
  * /root/reference/src/quality/data_quality.py behavior. */
class QualitySpec extends SparkSpec {
  private val s = SparkSpec.spark
  import s.implicits._

  private def df = Seq(
    (1L, "A", 10.0), (2L, "B", 20.0), (3L, null.asInstanceOf[String], 30.0),
    (4L, "D", -5.0), (4L, "D2", 40.0), (6L, "F", 50.0))
    .toDF("id", "name", "value")

  private def rules = Seq(
    Rule("R1", "name_present", Dimension.Completeness, "critical",
      fails = col("name").isNull),
    Rule("R2", "value_nonneg", Dimension.Accuracy, "major",
      fails = col("value") < 0, applicable = col("value").isNotNull),
    Rule("R3", "id_unique", Dimension.Uniqueness, "critical",
      fails = col("_dup"), failBelow = 1.0, warnBelow = 1.0))

  test("one-pass validate computes per-rule counters and scores") {
    val v = new QualityValidator("t", rules.take(2))
    val report = v.validate(df, DataZone.Bronze)
    assert(report.totalRecords == 6)
    val r1 = report.checkResults.find(_.ruleId == "R1").get
    assert(r1.recordsChecked == 6 && r1.recordsFailed == 1)
    assert(math.abs(r1.score - 5.0 / 6.0) < 1e-12)
    assert(r1.status == Status.Failed) // 0.833 < 0.95
    val r2 = report.checkResults.find(_.ruleId == "R2").get
    assert(r2.recordsChecked == 6 && r2.recordsFailed == 1)
  }

  test("uniqueness via withDupFlag feeds the same one-pass agg") {
    val v = new QualityValidator("t", rules)
    val flagged = QualityValidator.withDupFlag(df, col("id"))
    val report = v.validate(flagged, DataZone.Bronze)
    val r3 = report.checkResults.find(_.ruleId == "R3").get
    assert(r3.recordsFailed == 2) // both rows of key 4 are dup-flagged
    assert(r3.status == Status.Failed)
  }

  test("weighted overall score uses reference dimension weights") {
    val v = new QualityValidator("t", rules.take(2))
    val report = v.validate(df, DataZone.Bronze)
    val s1 = 5.0 / 6.0; val s2 = 5.0 / 6.0
    val expected = (s1 * 1.0 + s2 * 1.2) / 2.2
    assert(math.abs(report.overallScore - expected) < 1e-12)
  }

  test("promotion gate: clean data promotes, dirty does not") {
    val clean = Seq((1L, "A", 1.0), (2L, "B", 2.0)).toDF("id", "name", "value")
    val v = new QualityValidator("t", rules.take(2))
    assert(v.validate(clean, DataZone.Silver).promotionEligible)
    assert(!v.validate(df, DataZone.Silver).promotionEligible)
  }

  test("zone applicability filters rules like applicable_zones") {
    val zoned = Seq(
      Rule("RB", "bronze_only", Dimension.Completeness, "critical",
        fails = lit(false), applicableZones = Set(DataZone.Bronze)))
    val v = new QualityValidator("t", zoned)
    assert(v.validate(df, DataZone.Bronze).checkResults.size == 1)
    assert(v.validate(df, DataZone.Gold).checkResults.isEmpty)
  }

  test("split quarantines only rows failing FAILED rules") {
    val v = new QualityValidator("t", rules.take(2))
    val (report, cleanDf, quarantined) = v.validateAndSplit(df, DataZone.Bronze)
    // R1 fails (score 0.833 < 0.95); R2 fails too (0.833 < 0.95):
    // quarantine = null-name row + negative-value row.
    assert(report.overallStatus == Status.Failed)
    assert(quarantined.count() == 2)
    assert(cleanDf.count() == 4)
    assert(quarantined.columns.sameElements(df.columns)) // no leak of _dq_pass
  }

  test("ordersRules preset validates clean testdata as promotable") {
    val orders = QualityValidator.withDupFlag(
      Tables(spark, sf, "orders"), col("o_orderkey"))
    val rules = QualityValidator.ordersRules :+
      Rule("DQ005", "no_duplicate_records", Dimension.Uniqueness,
        "critical", fails = col("_dup"), failBelow = 1.0, warnBelow = 1.0)
    val v = new QualityValidator("orders", rules)
    val report = v.validate(orders, DataZone.Silver)
    assert(report.totalRecords == orders.count())
    assert(report.checkResults.size == 6) // all but DQ008 active at Silver
    assert(report.overallStatus == Status.Passed)
    assert(report.promotionEligible)
  }

  test("events and documents rule presets run one-pass on testdata") {
    val ev = new QualityValidator("events", QualityValidator.eventsRules)
      .validate(Tables.events(spark, sf), DataZone.Silver)
    assert(ev.checkResults.size == 3)
    assert(ev.checkResults.forall(_.recordsChecked > 0))
    val docs = new QualityValidator("documents",
      QualityValidator.documentsRules)
      .validate(Tables(spark, sf, "documents"), DataZone.Silver)
    assert(docs.checkResults.size == 3)
    val consistency = docs.checkResults.find(_.ruleId == "DQ00X").get
    assert(consistency.recordsChecked == 500)
  }

  test("DQ004-shape rule: code format scored in the ACCURACY dimension") {
    val dq004 = QualityValidator.ordersRules.find(_.ruleId == "DQ004").get
    assert(dq004.dimension == Dimension.Accuracy)
    assert(dq004.applicableZones == Set(DataZone.Silver, DataZone.Gold))
    val codes = Seq(Some("1-URGENT"), Some("5-LOW"), Some("X-BAD"), None)
      .toDF("o_orderpriority")
    val rep = new QualityValidator("t", Seq(dq004))
      .validate(codes, DataZone.Silver)
    val r = rep.checkResults.head
    assert(r.recordsChecked == 3) // rows without the code are skipped
    assert(r.recordsFailed == 1)
    assert(r.status == Status.Failed) // 2/3 < 0.95
  }

  test("DQ008-shape rule: warning severity, Raw/Bronze only, never fails") {
    val dq008 = QualityValidator.ordersRules.find(_.ruleId == "DQ008").get
    assert(dq008.severity == "warning")
    assert(dq008.applicableZones == Set(DataZone.Raw, DataZone.Bronze))
    val sparse = Seq(
      (Some("O"), Some("1-URGENT")),
      (None: Option[String], None: Option[String]),
      (None: Option[String], None: Option[String]),
      (None: Option[String], None: Option[String]))
      .toDF("o_orderstatus", "o_orderpriority")
    val v = new QualityValidator("t", Seq(dq008))
    val r = v.validate(sparse, DataZone.Bronze).checkResults.head
    assert(math.abs(r.score - 0.25) < 1e-12)
    assert(r.status == Status.Warning) // < 0.5 warns, can never FAIL
    assert(v.validate(sparse, DataZone.Silver).checkResults.isEmpty)
  }

  test("DQ002-shape ISO 8601 rule accepts the reference's format family") {
    val dates = Seq(
      Some("1997-02-03"), Some("1997-02-03T10:11:12"),
      Some("1997-02-03T10:11:12.5Z"), Some("1997-02-03T10:11:12+02:00"),
      Some("02/03/1997"), Some("not a date"), None)
      .toDF("admission_date")
    val rep = new QualityValidator("t",
      Seq(QualityValidator.iso8601Rule("admission_date")))
      .validate(dates, DataZone.Silver)
    val r = rep.checkResults.head
    assert(r.recordsChecked == 6) // null skipped
    assert(r.recordsFailed == 2) // slash format + garbage
    assert(r.dimension == Dimension.Validity)
  }

  test("DQ007 orphan flag fails the gate and quarantines FK orphans") {
    val parents = Seq(1L, 2L).toDF("pid")
    val children = Seq(
      (10L, Some(1L)), (11L, Some(2L)), (12L, Some(99L)), // 99 = orphan
      (13L, None)) // NULL FK → skipped, like the reference
      .toDF("id", "fk")
    val flagged = QualityValidator.withOrphanFlag(
      children, col("fk"), parents, col("pid"))
    val v = new QualityValidator("t", Seq(QualityValidator.orphanRule()))
    val report = v.validate(flagged, DataZone.Bronze)
    val r = report.checkResults.head
    assert(r.dimension == Dimension.Integrity)
    assert(r.recordsChecked == 3) // NULL FK excluded from the denominator
    assert(r.recordsFailed == 1)
    assert(r.status == Status.Failed) // any orphan fails (failBelow=1.0)
    assert(!report.promotionEligible) // critical failure, budget 0

    // end-to-end: the orphan row is quarantined by a gated job, the
    // NULL-FK row promotes (data_quality.py:285-294, :821-838)
    val root = java.nio.file.Files.createTempDirectory("fk").toString
    val p = new graft.etl.MedallionPipeline(spark, root)
    p.write(DataZone.Raw, "child", children, graft.etl.LoadType.Full)
    val res = p.runJob("fkjob", "child", DataZone.Raw, DataZone.Bronze,
      graft.etl.LoadType.Full,
      transforms = Seq(d => QualityValidator.withOrphanFlag(
        d, col("fk"), parents, col("pid"))),
      rules = Seq(QualityValidator.orphanRule()))
    assert(res.recordsQuarantined == 1)
    assert(res.recordsWritten == 3)
    assert(p.quarantined("fkjob", "child").head().getAs[Long]("id") == 12L)
    assert(p.read(DataZone.Bronze, "child")
      .select("id").collect().map(_.getLong(0)).toSet == Set(10L, 11L, 13L))
  }

  test("maxFailedMajor budgets major failures once critical budget loosens") {
    val major = Rule("M1", "always_fails", Dimension.Accuracy, "major",
      fails = lit(true), failBelow = 1.0, warnBelow = 1.0)
    val loose = Thresholds(0.0, 0.0, 0.0, minUniqueness = 0.0,
      maxFailedCritical = 10, maxFailedMajor = 0, overallMinScore = 0.0)
    val strict = new QualityValidator("t", Seq(major),
      Map(DataZone.Bronze -> loose))
    assert(!strict.validate(df, DataZone.Bronze).promotionEligible)
    val allowed = new QualityValidator("t", Seq(major),
      Map(DataZone.Bronze -> loose.copy(maxFailedMajor = 1)))
    assert(allowed.validate(df, DataZone.Bronze).promotionEligible)
  }

  test("raw zone thresholds accept anything") {
    val v = new QualityValidator("t", rules.take(2))
    val report = v.validate(df, DataZone.Raw)
    // No rule applies at RAW (default applicable_zones = Bronze/Silver/
    // Gold) and RAW thresholds are all 0.0 ⇒ eligible, like the reference.
    assert(report.checkResults.isEmpty)
    assert(report.promotionEligible)
  }
}
