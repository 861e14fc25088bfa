package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.execution.streaming.runtime.LongOffset

/** Round-14 hardening: byte-budget admission after an unknown-size
  * commit (no sentinel poisoning), zero-cost commits co-admitting
  * behind an unknown one, and the bestFitPacked duplicate-(group,
  * order) refusal.
  */
class Round14Spec extends SparkSpec {

  private def tmp(prefix: String): Path =
    Files.createTempDirectory(prefix)

  /** Strip the recorded `bytes` field from ONE commit's json — a
    * commit written before byte recording. */
  private def stripBytes(dir: String, v: Long): Unit = {
    val logDir = java.nio.file.Paths.get(dir, graft.sources.TxLog.LogDir)
    val p = logDir.resolve(f"$v%020d.json")
    val t = new String(Files.readAllBytes(p), "UTF-8")
    Files.write(p, t.replaceAll(",\"bytes\":\\d+", "").getBytes("UTF-8"))
    ()
  }

  // ---- admission after an unknown-size commit ----------------------

  test("byte budget: a known-size commit never co-admits behind an unknown-size one") {
    val s = spark
    import s.implicits._
    val dir = tmp("r14adm").toString
    def df(i: Long) = Seq((i, s"n$i")).toDF("id", "name")
    graft.sources.TxLog.commitOverwrite(spark, dir, df(1))   // v0
    (2L to 4L).foreach(i =>
      graft.sources.TxLog.commitAppend(spark, dir, df(i)))   // v1..v3
    stripBytes(dir, 1L) // v1 predates byte recording
    // a budget far above any real file size — the old sentinel
    // (Long.MaxValue/4) fit under it, silently co-admitting the
    // known-size commits after the unknown one
    val src = new graft.sources.TxLogSource(spark, dir,
      maxFiles = None, maxRows = None,
      maxBytes = Some(Long.MaxValue / 2))
    def step(from: Long): Long =
      src.latestOffset(LongOffset(from), ReadLimit.allAvailable()) match {
        case o: LongOffset => o.offset
      }
    assert(step(-1L) == 0L, "v0 fits, v1 (unknown) must stop the grant")
    assert(step(0L) == 1L,
      "the unknown-size commit admits ALONE — known-size v2/v3 must " +
        "not co-admit no matter how large the budget")
    assert(step(1L) == 3L, "after the unknown commit, budgeting resumes")
  }

  test("byte budget: zero-cost commits co-admit behind an unknown-size commit") {
    val s = spark
    import s.implicits._
    val dir = tmp("r14admz").toString
    def df(i: Long) = Seq((i, s"n$i")).toDF("id", "name")
    graft.sources.TxLog.commitOverwrite(spark, dir, df(1))   // v0
    graft.sources.TxLog.commitAppend(spark, dir, df(2))      // v1
    graft.sources.TxLog.compact(spark, dir, targetFiles = 1) // v2 (zero)
    graft.sources.TxLog.commitAppend(spark, dir, df(3))      // v3
    stripBytes(dir, 1L)
    val budget = graft.sources.TxLog.snapshot(spark, dir)
      .files.flatMap(_.bytes).max // roughly one file
    val src = new graft.sources.TxLogSource(spark, dir,
      maxFiles = None, maxRows = None, maxBytes = Some(budget))
    def step(from: Long): Long =
      src.latestOffset(LongOffset(from), ReadLimit.allAvailable()) match {
        case o: LongOffset => o.offset
      }
    // v1 admits alone (unknown) and the compact rides along free —
    // maintenance must not stall a trigger behind an unknown commit
    assert(step(0L) == 2L,
      "zero-cost compact must co-admit with the unknown-size commit")
    assert(step(2L) == 3L)
  }

  // ---- bestFitPacked duplicate-key refusal -------------------------

  test("bestFitPacked: duplicate (group, order) refuses loudly instead of fanning out") {
    val s = spark
    import s.implicits._
    val clean = Seq(
      ("a", 1L, 6L, "p1"), ("a", 2L, 4L, "p2"), ("a", 3L, 3L, "p3"))
      .toDF("src", "ord", "n_tok", "payload")
    val packed = graft.operators.Pack.bestFitPacked(clean,
      "src", "ord", "n_tok", "payload", maxTokens = 10L)
    val rows = packed.collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 3L)
    assert(rows.flatMap(_.getSeq[String](rows.head.fieldIndex("payloads")))
      .sorted.toSeq == Seq("p1", "p2", "p3"))

    val dup = clean.union(
      Seq(("a", 2L, 4L, "p2b")).toDF("src", "ord", "n_tok", "payload"))
    val e = intercept[Exception] {
      graft.operators.Pack.bestFitPacked(dup,
        "src", "ord", "n_tok", "payload", maxTokens = 10L).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("duplicate (src, ord)"))),
      s"expected the duplicate-key refusal, got: $e")
  }
}
