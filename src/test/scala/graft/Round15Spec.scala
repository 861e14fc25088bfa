package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{MaterializedAgg, Scd2, TxLog}

/** Round-15 hardening: the deep-clone reader-generation gate for
  * column-mapped sources, empty-span watermark advances (the
  * compaction-only-feed repeated-work fix), the snapshotAt watermark
  * refusal, and the maintenance-refresh-vs-concurrent-source-DML
  * race contract.
  */
class Round15Spec extends SparkSpec {

  private def tmp(prefix: String): Path =
    Files.createTempDirectory(prefix)

  private def payload(n: Int, tag: String): DataFrame = {
    val s = spark
    import s.implicits._
    (0 until n).map(i => (i.toLong, i.toLong * 2, s"$tag$i"))
      .toDF("k", "v", "name")
  }

  // ---- deep clone: reader generation for mapped sources ------------

  test("deep clone of a column-mapped table requires generation-3 readers") {
    val dir = tmp("r15dc").toString
    val clone = tmp("r15dcc").toString + "/t"
    TxLog.commitOverwrite(spark, dir, payload(6, "a"))
    TxLog.renameColumn(spark, dir, "name", "label") // mapping is now live
    assert(TxLog.snapshot(spark, dir).minReader == 3)
    TxLog.deepClone(spark, dir, clone)
    val snap = TxLog.snapshot(spark, clone)
    assert(snap.mapping.nonEmpty, "clone must carry the mapping")
    assert(snap.minReader >= 3,
      "a generation-1/2 reader would project stale physical names — " +
        "the clone must gate exactly like its source")
    // and the clone actually reads under the logical names
    assert(TxLog.read(spark, clone).columns.toSeq ==
      Seq("k", "v", "label"))
  }

  test("deep clone of an identity table still gates at generation 4") {
    val dir = tmp("r15dci").toString
    val clone = tmp("r15dcic").toString + "/t"
    TxLog.commitOverwrite(spark, dir, payload(4, "a"),
      identity = Map("id" -> TxLog.IdentitySpec(1L, 1L)))
    TxLog.renameColumn(spark, dir, "name", "label")
    TxLog.deepClone(spark, dir, clone)
    assert(TxLog.snapshot(spark, clone).minReader == 4)
  }

  // ---- empty-span marker advance ------------------------------------

  test("applyChanges with an empty directive batch still advances a supplied marker") {
    val s = spark
    import s.implicits._
    val dir = tmp("r15adv").toString
    TxLog.commitOverwrite(spark, dir, payload(5, "a"))
    val v0 = TxLog.snapshot(spark, dir).version
    val empty = payload(0, "x").withColumn("_del", lit(false))
    // no marker: a pure no-op, no commit
    TxLog.applyChanges(spark, dir, empty, Seq("k"), "_del")
    assert(TxLog.snapshot(spark, dir).version == v0)
    // marker supplied: metadata-only commit, marker advances, no files
    TxLog.applyChanges(spark, dir, empty, Seq("k"), "_del",
      txn = Some(("app", 7L)))
    val snap = TxLog.snapshot(spark, dir)
    assert(snap.txns.get("app").contains(7L))
    assert(snap.version == v0 + 1)
    assert(snap.files.map(_.path).sorted ==
      TxLog.snapshot(spark, dir, Some(v0)).files.map(_.path).sorted,
      "the marker advance must move no files")
    // replay of the same marker is a no-op again
    TxLog.applyChanges(spark, dir, empty, Seq("k"), "_del",
      txn = Some(("app", 7L)))
    assert(TxLog.snapshot(spark, dir).version == v0 + 1)
    // merge-on-read form: empty batch and all-no-op delete batch
    TxLog.applyChangesMor(spark, dir, empty, Seq("k"), "_del",
      txn = Some(("app", 8L)))
    assert(TxLog.snapshot(spark, dir).txns.get("app").contains(8L))
    val noopDel = Seq((999L, 0L, "zz")).toDF("k", "v", "name")
      .withColumn("_del", lit(true)) // key not in the table
    TxLog.applyChangesMor(spark, dir, noopDel, Seq("k"), "_del",
      txn = Some(("app", 9L)))
    assert(TxLog.snapshot(spark, dir).txns.get("app").contains(9L))
    assert(TxLog.read(spark, dir).count() == 5)
  }

  test("SCD2 refresh over a no-change source span advances the watermark once") {
    val s = spark
    import s.implicits._
    val src = tmp("r15scd").toString + "/src"
    val scd = tmp("r15scd").toString + "/scd"
    TxLog.commitOverwrite(spark, src, payload(8, "a")
      .repartition(4), statsCols = Seq("k"))
    Scd2.create(spark, src, scd, keys = Seq("k"))
    // compaction-only span: the feed nets to zero directives
    TxLog.compact(spark, src, targetFiles = 1)
    val head = TxLog.snapshot(spark, src).version
    assert(Scd2.refresh(spark, scd) == head)
    assert(Scd2.watermark(spark, scd) == head,
      "the watermark must move past a netted-to-nothing span")
    val vAfter = TxLog.snapshot(spark, scd).version
    // a second refresh is now a TRUE no-op (no re-read, no commit)
    assert(Scd2.refresh(spark, scd) == head)
    assert(TxLog.snapshot(spark, scd).version == vAfter)
    // history content is untouched
    assert(Scd2.current(spark, scd).count() == 8)
  }

  test("MV refresh over a no-change source span advances the watermark once") {
    val src = tmp("r15mv").toString + "/src"
    val mv = tmp("r15mv").toString + "/mv"
    TxLog.commitOverwrite(spark, src, payload(8, "a")
      .repartition(4), statsCols = Seq("k"))
    MaterializedAgg.create(spark, src, mv, keys = Seq("name"),
      sums = Seq("v"))
    TxLog.compact(spark, src, targetFiles = 1)
    val head = TxLog.snapshot(spark, src).version
    assert(MaterializedAgg.refresh(spark, mv) == head)
    assert(MaterializedAgg.watermark(spark, mv) == head)
    val vAfter = TxLog.snapshot(spark, mv).version
    assert(MaterializedAgg.refresh(spark, mv) == head)
    assert(TxLog.snapshot(spark, mv).version == vAfter,
      "the second refresh must not commit again")
  }

  // ---- snapshotAt beyond the watermark ------------------------------

  test("Scd2.snapshotAt refuses a version beyond the watermark") {
    val s = spark
    import s.implicits._
    val src = tmp("r15sa").toString + "/src"
    val scd = tmp("r15sa").toString + "/scd"
    TxLog.commitOverwrite(spark, src, payload(4, "a"))
    Scd2.create(spark, src, scd, keys = Seq("k"))
    // an unfolded source commit: the history has not seen it
    TxLog.delete(spark, src, col("k") >= 2L)
    val head = TxLog.snapshot(spark, src).version
    val e = intercept[IllegalArgumentException] {
      Scd2.snapshotAt(spark, scd, head).collect()
    }
    assert(e.getMessage.contains("watermark"))
    // after the refresh the same call answers — and matches the source
    Scd2.refresh(spark, scd)
    val got = Scd2.snapshotAt(spark, scd, head)
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == Seq(0L, 1L))
  }

  // ---- batch "txlog" DataSource --------------------------------------

  test("batch txlog source: full read equals the Scala API, incl. vectors and mapping") {
    val s = spark
    import s.implicits._
    val dir = tmp("r15bs").toString
    TxLog.commitOverwrite(spark, dir,
      payload(40, "a").repartition(4), statsCols = Seq("k"))
    TxLog.deleteMor(spark, dir, col("k") % 7 === 0L) // standing vectors
    TxLog.renameColumn(spark, dir, "name", "label")  // live mapping
    val viaFormat = spark.read.format("txlog").load(dir)
    assert(viaFormat.columns.toSeq == Seq("k", "v", "label"))
    val want = TxLog.read(spark, dir).collect().map(_.toSeq)
      .sortBy(_.toString).toSeq
    val got = viaFormat.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(got == want)
    // count(*) through the format (empty required schema) works
    assert(viaFormat.count() == want.size)
  }

  test("batch txlog source: pushed filters prune files exactly like readPrunedAll") {
    val s = spark
    import s.implicits._
    val dir = tmp("r15bp").toString
    TxLog.commitOverwrite(spark, dir,
      payload(4000, "a").repartitionByRange(8, col("k")),
      statsCols = Seq("k"))
    val total = TxLog.snapshot(spark, dir).files.size
    val out = spark.read.format("txlog").load(dir)
      .filter(col("k") >= 100L && col("k") < 600L)
      .select("k").as[Long].collect().sorted.toSeq
    assert(out == (100L until 600L).toSeq, "row results must be exact")
    val planned = graft.sources.TxLogBatch.lastScan.get().sorted
    assert(planned.nonEmpty && planned.size < total,
      s"pushdown did not prune: planned ${planned.size} of $total")
    // parity with the Scala pruning surface on the same intervals
    val snap = TxLog.snapshot(spark, dir)
    val want = TxLog.prunedSnapshotFiles(spark, snap,
      Seq(("k", Some(100L), None), ("k", None, Some(600L))))
      .map(_.path).sorted
    assert(planned == want,
      "the batch scan and readPrunedAll must plan the same file set")
    // and the pruned read agrees with readPrunedAll's rows
    val viaApi = TxLog.readPrunedAll(spark, dir, Seq(("k", 100L, 600L)))
      .filter(col("k") >= 100L && col("k") < 600L)
      .select("k").as[Long].collect().sorted.toSeq
    assert(out == viaApi)
  }

  test("batch txlog source: versionAsOf and timestampAsOf time travel") {
    val s = spark
    import s.implicits._
    val dir = tmp("r15bt").toString
    TxLog.commitOverwrite(spark, dir, payload(5, "a"))
    TxLog.commitAppend(spark, dir, payload(3, "b"))
    val tsAfterV1 = TxLog.history(spark, dir)
      .filter(col("version") === 1L).select("timestamp")
      .as[Long].head()
    TxLog.delete(spark, dir, col("k") >= 3L)
    assert(spark.read.format("txlog")
      .option("versionAsOf", "0").load(dir).count() == 5)
    assert(spark.read.format("txlog")
      .option("versionAsOf", "1").load(dir).count() == 8)
    assert(spark.read.format("txlog")
      .option("timestampAsOf", tsAfterV1.toString).load(dir)
      .count() == 8)
    // delete k >= 3 removes k=3,4 of the first batch: 8 - 2 = 6 live
    assert(spark.read.format("txlog").load(dir).count() == 6)
    intercept[IllegalArgumentException] {
      spark.read.format("txlog").option("versionAsOf", "0")
        .option("timestampAsOf", "1").load(dir)
    }
  }

  test("batch txlog source: SQL over a registered table works and prunes") {
    val s = spark
    import s.implicits._
    val dir = tmp("r15bsql").toString
    TxLog.commitOverwrite(spark, dir,
      payload(2000, "a").repartitionByRange(8, col("k")),
      statsCols = Seq("k"))
    spark.sql("DROP TABLE IF EXISTS r15_logged")
    spark.sql(
      s"CREATE TABLE r15_logged USING txlog OPTIONS (path '$dir')")
    try {
      val n = spark.sql(
        "SELECT count(*) AS n FROM r15_logged WHERE k < 250")
        .as[Long].head()
      assert(n == 250L)
      val total = TxLog.snapshot(spark, dir).files.size
      val planned = graft.sources.TxLogBatch.lastScan.get()
      assert(planned.size < total,
        s"SQL predicate did not prune: ${planned.size} of $total")
    } finally {
      spark.sql("DROP TABLE IF EXISTS r15_logged")
      ()
    }
  }

  test("batch txlog source: streaming read/write still resolves the v1 source") {
    val s = spark
    import s.implicits._
    val dir = tmp("r15bstr").toString
    TxLog.commitOverwrite(spark, dir, payload(4, "a"))
    // readStream through the same short name must still build (v1
    // fallback: the batch table declares BATCH_READ only)
    val stream = spark.readStream.format("txlog").load(dir)
    assert(stream.isStreaming)
    assert(stream.columns.toSeq == Seq("k", "v", "name"))
  }

  // ---- refresh vs concurrent source DML (the race contract) ---------

  test("SCD2: a refresh bounded at head-as-read lands exactly (w, head]; the racer folds next") {
    val s = spark
    import s.implicits._
    val src = tmp("r15race").toString + "/src"
    val scd = tmp("r15race").toString + "/scd"
    TxLog.commitOverwrite(spark, src, payload(6, "a"),
      statsCols = Seq("k"))
    Scd2.create(spark, src, scd, keys = Seq("k"))
    val w = Scd2.watermark(spark, scd)
    TxLog.delete(spark, src, col("k") === 0L)
    // replicate refresh's body with a RACER commit landing between
    // the head read and the feed fold — exactly the interleaving a
    // concurrent writer produces
    val head = TxLog.snapshot(spark, src).version
    TxLog.delete(spark, src, col("k") === 1L) // the racer
    val spec = Scd2.readMeta(spark, scd)
    val feed = TxLog.changeFeed(spark, src, w, Some(head))
    Scd2.applyDirectives(spark, scd, Scd2.feedDirectives(spec, feed),
      "_scd2_del", "_scd2_seq",
      txn = Some((Scd2.WatermarkApp, head)))
    // the fold stopped at head-as-read: k=0 closed, k=1 still current
    assert(Scd2.watermark(spark, scd) == head)
    assert(Scd2.current(spark, scd).select("k").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // the next refresh picks up the racer
    val head2 = TxLog.snapshot(spark, src).version
    assert(Scd2.refresh(spark, scd) == head2)
    assert(Scd2.current(spark, scd).select("k").as[Long]
      .collect().sorted.toSeq == Seq(2L, 3L, 4L, 5L))
    // and the full history equals the per-version source states
    (w to head2).foreach { v =>
      val want = TxLog.read(spark, src, Some(v))
        .select("k").as[Long].collect().sorted.toSeq
      val got = Scd2.snapshotAt(spark, scd, v)
        .select("k").as[Long].collect().sorted.toSeq
      assert(got == want, s"snapshotAt($v) diverged")
    }
  }

  test("MV: a refresh bounded at head-as-read folds exactly (w, head]; the racer folds next") {
    val s = spark
    import s.implicits._
    val src = tmp("r15mvrace").toString + "/src"
    val mv = tmp("r15mvrace").toString + "/mv"
    TxLog.commitOverwrite(spark, src, payload(6, "a"),
      statsCols = Seq("k"))
    MaterializedAgg.create(spark, src, mv, keys = Seq("name"),
      sums = Seq("v"))
    val w = MaterializedAgg.watermark(spark, mv)
    TxLog.delete(spark, src, col("k") === 0L)
    val head = TxLog.snapshot(spark, src).version
    TxLog.delete(spark, src, col("k") === 1L) // the racer
    val spec = MaterializedAgg.readMeta(spark, mv)
    val feed = TxLog.changeFeed(spark, src, w, Some(head))
    MaterializedAgg.applyFeed(spark, mv, spec, feed, endVersion = head)
    assert(MaterializedAgg.watermark(spark, mv) == head)
    // the view reflects source@head (k=0 gone, k=1 still counted)
    def names(df: DataFrame): Seq[String] =
      df.select("name").as[String].collect().sorted.toSeq
    assert(names(TxLog.read(spark, mv)) ==
      names(TxLog.read(spark, src, Some(head))))
    // next refresh folds the racer; view == recompute
    MaterializedAgg.refresh(spark, mv)
    val want = MaterializedAgg.aggregate(TxLog.read(spark, src),
      Seq("name"), Seq("v"), Nil, Nil)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val got = TxLog.read(spark, mv)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(got == want)
  }
}
