package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.TxLog

/** Round-12 additions: the clone × incremental-consumption fixes
  * (dv-bearing clone v0 refuses / subtracts instead of resurrecting
  * deleted rows; streams on clones resolve absolute paths), streaming
  * admission control (maxFilesPerTrigger / maxRowsPerTrigger), time
  * travel by timestamp, and the clone commit carrying constraints
  * atomically.
  */
class Round12Spec extends SparkSpec {

  private def tmp(prefix: String): Path =
    Files.createTempDirectory(prefix)

  private def df(ids: Long*): DataFrame = {
    val s = spark
    import s.implicits._
    ids.map(i => (i, s"name_$i")).toDF("id", "name")
  }

  private def idSet(d: DataFrame): Set[Long] =
    d.select("id").collect().map(_.getLong(0)).toSet

  // ---- clone × incremental consumption -----------------------------

  test("clone of a dv-bearing table: changesSince and the stream refuse; change feed subtracts") {
    val s = spark
    import s.implicits._
    val src = tmp("r12src").toString
    TxLog.commitOverwrite(spark, src,
      (1L to 20L).map(i => (i, s"n$i")).toDF("id", "name")
        .repartitionByRange(2, col("id")))
    TxLog.deleteMor(spark, src, col("id") <= 5)
    val dst = tmp("r12dst").toString
    TxLog.clone(spark, src, dst)

    // the batch pull refuses loudly — reading the cloned files raw
    // would resurrect the 5 source-deleted rows as live inserts
    val e = intercept[IllegalArgumentException] {
      TxLog.changesSince(spark, dst, -1).count()
    }
    assert(e.getMessage.contains("deletion vector"), e.getMessage)

    // the continuous form refuses with the SAME contract
    val q = spark.readStream.format("txlog").load(dst)
      .writeStream.format("memory").queryName("r12_dvclone")
      .option("checkpointLocation", tmp("r12dvck").toString)
      .outputMode("append").start()
    try {
      val se = intercept[Exception] { q.processAllAvailable() }
      def mentions(t: Throwable): Boolean = t != null &&
        (Option(t.getMessage).exists(_.contains("deletion vector")) ||
          mentions(t.getCause))
      assert(mentions(se), s"stream failed for the wrong reason: $se")
    } finally q.stop()

    // the CHANGE FEED's initial load subtracts the vectors: its
    // insert image IS read() of the cloned snapshot, never more
    val feed = TxLog.changeFeed(spark, dst, -1)
    assert(feed.select("_change_type").distinct()
      .as[String].collect().toSeq == Seq("insert"))
    assert(idSet(feed) == (6L to 20L).toSet,
      "clone v0 feed must not resurrect dv-deleted rows")
    assert(idSet(feed) == idSet(TxLog.read(spark, dst)))
  }

  test("streaming from a dv-free clone resolves absolute v0 entries") {
    val s = spark
    import s.implicits._
    val src = tmp("r12cs").toString
    TxLog.commitOverwrite(spark, src, df(1, 2, 3))
    val dst = tmp("r12cd").toString
    TxLog.clone(spark, src, dst)
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("txlog").load(dst)
      .writeStream.outputMode("append")
      .option("checkpointLocation", tmp("r12csck").toString)
      .foreachBatch { (b: DataFrame, _: Long) =>
        got ++= b.select("id").as[Long].collect(); ()
      }.start()
    try {
      q.processAllAvailable()
      assert(got.toSet == Set(1L, 2L, 3L),
        "absolute clone entries must resolve as themselves")
      // the clone's own (dir-relative) appends flow through the same
      // stream
      TxLog.commitAppend(spark, dst, df(4))
      q.processAllAvailable()
      assert(got.toSet == Set(1L, 2L, 3L, 4L))
    } finally q.stop()
  }

  // ---- streaming admission control ---------------------------------

  test("maxRowsPerTrigger: a backlog drains in bounded micro-batches, exactly once across restarts") {
    val dir = tmp("r12adm").toString
    TxLog.commitOverwrite(spark, dir, df(1, 2))               // v0: 2 rows
    (3L to 8L).foreach(i => TxLog.commitAppend(spark, dir, df(i))) // v1..v6
    val cp = tmp("r12admck").toString
    val out = tmp("r12admout").toString
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    // each run = one Trigger.Once micro-batch from the checkpoint — a
    // RESTART mid-backlog on every iteration
    def runOnce(): Unit = {
      val q = spark.readStream.format("txlog")
        .option("maxRowsPerTrigger", 3).load(dir)
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp.toString)
        .trigger(Trigger.Once())
        .foreachBatch { (b: DataFrame, bid: Long) =>
          sizes += b.count()
          TxLog.commitAppend(b.sparkSession, out.toString, b,
            txn = Some(("r12adm", bid)))
          ()
        }.start()
      assert(q.awaitTermination(120000), "trigger-once run timed out")
    }
    runOnce(); runOnce(); runOnce()
    assert(sizes.toSeq == Seq(3L, 3L, 2L),
      s"admission must slice the 8-row backlog as 3/3/2, got $sizes")
    assert(idSet(TxLog.read(spark, out.toString)) == (1L to 8L).toSet,
      "exactly-once across restarts")
    // drained: one more run admits nothing new
    runOnce()
    assert(TxLog.read(spark, out.toString).count() == 8)
  }

  test("maxFilesPerTrigger bounds by file count; compactions cost nothing; uncapped unchanged") {
    val dir = tmp("r12admf").toString
    // v0: two files (range partitions); v1..v2: one file each
    TxLog.commitOverwrite(spark, dir,
      df(1L, 2L, 3L, 4L).repartitionByRange(2, col("id")))
    TxLog.commitAppend(spark, dir, df(5))
    TxLog.commitAppend(spark, dir, df(6))
    TxLog.compact(spark, dir, targetFiles = 1)               // v3: rewrites
    TxLog.commitAppend(spark, dir, df(7))                    // v4
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("txlog")
      .option("maxFilesPerTrigger", 2).load(dir)
      .writeStream.outputMode("append")
      .option("checkpointLocation", tmp("r12admfck").toString)
      .foreachBatch { (b: DataFrame, _: Long) =>
        sizes += b.count(); ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    // v0 fills the 2-file budget alone; v1+v2 share the next trigger;
    // the compaction (zero admission cost, zero rows) rides free with
    // v4's append
    assert(sizes.filter(_ > 0).toSeq == Seq(4L, 2L, 1L),
      s"file-capped slicing diverged: $sizes")
    assert(sizes.sum == 7L)
  }

  // ---- time travel by timestamp ------------------------------------

  private def setCommitTime(dir: String, v: Long, ts: Long): Unit =
    Files.setLastModifiedTime(
      java.nio.file.Paths.get(dir, TxLog.LogDir, f"$v%020d.json"),
      java.nio.file.attribute.FileTime.fromMillis(ts))

  test("TIMESTAMP AS OF: between-commits resolution, refusals, monotonic clock repair") {
    val dir = tmp("r12ts").toString
    TxLog.commitOverwrite(spark, dir, df(1, 2))   // v0
    TxLog.commitAppend(spark, dir, df(3))         // v1
    TxLog.commitOverwrite(spark, dir, df(9))      // v2
    setCommitTime(dir, 0, 100000L)
    setCommitTime(dir, 1, 200000L)
    setCommitTime(dir, 2, 300000L)
    // exact and between-commit times resolve to the latest version ≤ ts
    assert(TxLog.versionAt(spark, dir, 100000L) == 0L)
    assert(TxLog.versionAt(spark, dir, 150000L) == 0L)
    assert(TxLog.versionAt(spark, dir, 200000L) == 1L)
    assert(TxLog.versionAt(spark, dir, 299999L) == 1L)
    assert(TxLog.versionAt(spark, dir, 300000L) == 2L)
    assert(TxLog.versionAt(spark, dir, Long.MaxValue) == 2L)
    assert(idSet(TxLog.readAt(spark, dir, 250000L)) == Set(1L, 2L, 3L))
    // before the first commit: refuse, like Delta
    val e = intercept[IllegalArgumentException] {
      TxLog.versionAt(spark, dir, 99999L)
    }
    assert(e.getMessage.contains("before the first available commit"))
    // history exposes the same axis
    val h = TxLog.history(spark, dir).orderBy("version").collect()
    assert(h.map(_.getAs[Long]("timestamp")).toSeq ==
      Seq(100000L, 200000L, 300000L))
    // a clock that jumped BACKWARD between commits: later versions
    // must still resolve later (Delta's monotonicity adjustment)
    setCommitTime(dir, 0, 500000L)
    assert(TxLog.versionAt(spark, dir, 500000L) == 0L)
    assert(TxLog.versionAt(spark, dir, 500001L) == 1L)
    assert(TxLog.versionAt(spark, dir, 500002L) == 2L)
    // a timestamp clone: the table as it stood back then
    val dst = tmp("r12tsclone").toString
    TxLog.cloneAt(spark, dir, dst, 500001L)
    assert(idSet(TxLog.read(spark, dst)) == Set(1L, 2L, 3L))
  }

  test("timestamp travel refuses truncated history in parity with version asOf") {
    val dir = tmp("r12tstr").toString
    TxLog.commitOverwrite(spark, dir, df(0))
    (1L to 10L).foreach(i => TxLog.commitAppend(spark, dir, df(i)))
    // checkpoint at v10 → commits below it may be dropped
    assert(TxLog.truncateLog(spark, dir) == 10)
    // version time travel below the checkpoint refuses…
    intercept[IllegalArgumentException] {
      TxLog.read(spark, dir, Some(5)).count()
    }
    // …and so does any timestamp older than the first SURVIVING commit
    val firstTs = TxLog.history(spark, dir).orderBy("version")
      .select("timestamp").collect().head.getLong(0)
    val e = intercept[IllegalArgumentException] {
      TxLog.versionAt(spark, dir, firstTs - 1)
    }
    assert(e.getMessage.contains("truncated"))
    // the surviving span still resolves
    assert(TxLog.versionAt(spark, dir, firstTs) == 10L)
  }

  // ---- clone commit atomicity --------------------------------------

  test("clone carries constraints in its v0 commit — no unvalidated window") {
    val s = spark
    import s.implicits._
    val src = tmp("r12cc").toString
    TxLog.commitOverwrite(spark, src, df(1, 2))
    TxLog.addCheckConstraint(spark, src, "id_pos", "id > 0")
    val dst = tmp("r12ccd").toString
    TxLog.clone(spark, src, dst)
    // ONE commit: the constraint is active at version 0 itself, so no
    // writer can ever land on the clone before validation exists
    assert(TxLog.history(spark, dst).count() == 1)
    assert(TxLog.snapshot(spark, dst, Some(0L)).constraints ==
      Map("id_pos" -> "id > 0"))
    intercept[IllegalArgumentException] {
      TxLog.commitAppend(spark, dst, Seq((-7L, "bad")).toDF("id", "name"))
    }
    assert(idSet(TxLog.read(spark, dst)) == Set(1L, 2L))
    // a clone target created CONCURRENTLY (between the pre-check and
    // the v0 claim) is never clobbered: simulate the race by planting
    // a foreign v0 in the claimed slot
    val dst2 = tmp("r12ccd2").toString
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dst2, TxLog.LogDir))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dst2, TxLog.LogDir, f"${0L}%020d.json"),
      """{"version":0,"op":"append","add":[],"remove":[]}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    intercept[Exception] { TxLog.clone(spark, src, dst2) }
    // the foreign table survives untouched
    assert(TxLog.snapshot(spark, dst2).version == 0L)
    assert(TxLog.snapshot(spark, dst2).files.isEmpty)
  }
}
