package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-13 additions: 128-bit ExactSubstr window identity (with
  * refusal of pre-round-13 64-bit persisted indexes), DSIR fail-fast
  * on non-integral id columns, skipChangeCommits / ignoreDeletes on
  * the plain streaming source, merge-on-read applyChanges,
  * maxBytesPerTrigger admission, best-fit shard packing, and
  * timestamp-bounded batch change feeds.
  */
class Round13Spec extends SparkSpec {

  private def tmp(prefix: String): Path =
    Files.createTempDirectory(prefix)

  // ---- ExactSubstr 128-bit identity --------------------------------

  test("substr index: persisted format carries hash_bits=128; pre-round-13 index refused") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val dir = tmp("substr128").toString
    val idx = graft.operators.ExactSubstr
      .buildSubstrIndex(corpus, "doc_id", "text", k = 4)
    assert(idx.hashes.columns.toSeq == Seq("_h1", "_h2"))
    graft.operators.ExactSubstr.saveSubstrIndex(idx, "r13es", dir,
      nBuckets = 2)
    val meta = s.read.parquet(s"$dir/meta").head()
    assert(meta.getAs[Int]("hash_bits") == 128)
    val loaded = graft.operators.ExactSubstr
      .loadSubstrIndex(s, "r13es", dir)
    assert(loaded.k == 4)
    assert(loaded.hashes.count() == idx.hashes.count())

    // a pre-round-13 index (single _h column, no hash_bits in meta)
    // must refuse loudly, not silently probe 64-bit identities
    val oldDir = tmp("substr64").toString
    idx.hashes.select(col("_h1").as("_h"))
      .write.parquet(s"$oldDir/substr")
    Seq((4, 2)).toDF("k", "n_buckets")
      .write.parquet(s"$oldDir/meta")
    val e = intercept[IllegalArgumentException] {
      graft.operators.ExactSubstr.loadSubstrIndex(s, "r13es_old", oldDir)
    }
    assert(e.getMessage.contains("128-bit"))
  }

  test("dedupSpans after widening: planted repeat removed, unique text intact") {
    val s = spark
    import s.implicits._
    val boiler = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq(
      (1L, s"p1a p1b p1c $boiler s1a s1b s1c"),
      (2L, s"p2a p2b p2c $boiler s2a s2b s2c"),
      (3L, "entirely unique text with no repeats anywhere at all ok"))
      .toDF("doc_id", "text")
    val out = graft.operators.ExactSubstr
      .dedupSpans(docs, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
    // doc 1 is the first occurrence — keeps everything
    assert(out(0).getAs[Long]("n_removed") == 0L)
    // doc 2 loses the repeated 10-token boilerplate (only windows fully
    // inside it are shared — the distinct prefixes/suffixes keep
    // straddling windows unique)
    assert(out(1).getAs[Long]("n_removed") == 10L)
    assert(out(1).getAs[String]("text_clean") == "p2a p2b p2c s2a s2b s2c")
    // doc 3 untouched
    assert(out(2).getAs[Long]("n_removed") == 0L)
    assert(out(2).getAs[String]("text_clean").startsWith("entirely unique"))
  }

  // ---- skipChangeCommits / ignoreDeletes ---------------------------

  test("batch changesSince: ignoreDeletes skips deletes; skipChangeCommits also skips updates") {
    val s = spark
    import s.implicits._
    val dir = tmp("r13skip").toString
    def df(ids: Long*): org.apache.spark.sql.DataFrame =
      ids.map(i => (i, s"n$i")).toDF("id", "name")
    graft.sources.TxLog.commitOverwrite(spark, dir,
      df(1L to 10L: _*).repartition(2))                   // v0
    graft.sources.TxLog.commitAppend(spark, dir, df(11, 12))  // v1
    graft.sources.TxLog.delete(spark, dir, col("id") <= 3)    // v2 CoW delete
    graft.sources.TxLog.commitAppend(spark, dir, df(13))      // v3

    // default: the delete refuses, mentioning the escape hatches
    val e = intercept[IllegalArgumentException] {
      graft.sources.TxLog.changesSince(spark, dir, -1).count()
    }
    assert(e.getMessage.contains("skipChangeCommits"), e.getMessage)

    // ignoreDeletes: v2 skipped wholesale — the delete is not
    // reflected (documented), nothing duplicates (the CoW rewrite's
    // adds are NOT emitted)
    val ign = graft.sources.TxLog.changesSince(spark, dir, -1,
      ignoreDeletes = true)
    assert(ign.select("id").as[Long].collect().sorted.toSeq ==
      (1L to 13L))

    graft.sources.TxLog.update(spark, dir, col("id") === 11,
      Map("name" -> lit("updated")))                          // v4 CoW update
    graft.sources.TxLog.commitAppend(spark, dir, df(14))      // v5

    // ignoreDeletes alone still refuses the update
    val e2 = intercept[IllegalArgumentException] {
      graft.sources.TxLog.changesSince(spark, dir, -1,
        ignoreDeletes = true).count()
    }
    assert(e2.getMessage.contains("'update'"), e2.getMessage)

    // skipChangeCommits skips delete AND update; appends still flow
    val skp = graft.sources.TxLog.changesSince(spark, dir, -1,
      skipChangeCommits = true)
    assert(skp.select("id").as[Long].collect().sorted.toSeq ==
      (1L to 14L))
  }

  test("stream: skipChangeCommits lets appends flow through a MoR delete; default refuses; CDC refuses the flag") {
    val s = spark
    import s.implicits._
    val dir = tmp("r13strm").toString
    def df(ids: Long*): org.apache.spark.sql.DataFrame =
      ids.map(i => (i, s"n$i")).toDF("id", "name")
    graft.sources.TxLog.commitOverwrite(spark, dir, df(1, 2, 3))
    graft.sources.TxLog.deleteMor(spark, dir, col("id") === 2)
    graft.sources.TxLog.commitAppend(spark, dir, df(4, 5))

    // default: the DML commit bricks the appends-only stream
    val q0 = spark.readStream.format("txlog").load(dir)
      .writeStream.format("memory").queryName("r13_noskip")
      .option("checkpointLocation", tmp("r13ck0").toString)
      .outputMode("append").start()
    try {
      intercept[Exception] { q0.processAllAvailable() }
      ()
    } finally q0.stop()

    // skipChangeCommits: initial load + appends flow, delete skipped
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("txlog")
      .option("skipChangeCommits", "true").load(dir)
      .writeStream.outputMode("append")
      .option("checkpointLocation", tmp("r13ck1").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.select("id").as[Long].collect(); ()
      }.start()
    try {
      q.processAllAvailable()
      assert(got.sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L),
        "initial load keeps id=2 (v0 predates the delete); later appends flow")
      graft.sources.TxLog.delete(spark, dir, col("id") === 4) // CoW too
      graft.sources.TxLog.commitAppend(spark, dir, df(6))
      q.processAllAvailable()
      assert(got.sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    } finally q.stop()

    // ignoreDeletes on the STREAM: pure deletes skip, but a later
    // UPDATE still bricks it (the narrower hatch, Delta's contract)
    val got2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val qi = spark.readStream.format("txlog")
      .option("ignoreDeletes", "true").load(dir)
      .writeStream.outputMode("append")
      .option("checkpointLocation", tmp("r13cki").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got2 ++= b.select("id").as[Long].collect(); ()
      }.start()
    try {
      qi.processAllAvailable()
      assert(got2.sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
      graft.sources.TxLog.update(spark, dir, col("id") === 6,
        Map("name" -> lit("u")))
      graft.sources.TxLog.commitAppend(spark, dir, df(7))
      intercept[Exception] { qi.processAllAvailable() }
      ()
    } finally qi.stop()

    // the flags are refused in change-feed mode
    val qc = spark.readStream.format("txlog")
      .option("readChangeFeed", "true")
      .option("ignoreDeletes", "true").load(dir)
      .writeStream.format("memory").queryName("r13_cdcflag")
      .option("checkpointLocation", tmp("r13ck2").toString)
      .outputMode("append")
    val ce = intercept[Exception] { val qq = qc.start()
      try qq.processAllAvailable() finally qq.stop() }
    def mentions(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("plain source only")) ||
        mentions(t.getCause))
    assert(mentions(ce), s"wrong refusal: $ce")
  }

  test("startingVersion=latest: a stale end offset yields an empty batch, not a crash loop") {
    val s = spark
    import s.implicits._
    val dir = tmp("r13latest").toString
    graft.sources.TxLog.commitOverwrite(spark, dir,
      Seq((1L, "a")).toDF("id", "name"))
    graft.sources.TxLog.commitAppend(spark, dir,
      Seq((2L, "b")).toDF("id", "name"))
    // head is now 1; construct a source whose since0 resolves to the
    // head, then replay a WAL offset from BEFORE the downtime commits
    val src = new graft.sources.TxLogSource(spark, dir, None, None,
      startingVersion = Some("latest"))
    val b = src.getBatch(None,
      org.apache.spark.sql.execution.streaming.runtime.LongOffset(0L))
    // streaming-planned — don't execute; the point is that getBatch
    // returned an EMPTY batch instead of a changedFiles refusal
    assert(b.schema.fieldNames.toSeq == Seq("id", "name"))
    assert(b.queryExecution.logical.toString.contains("LocalRelation"),
      s"since0 > oldEnd must replay as an empty batch, got " +
        b.queryExecution.logical)
  }

  test("txlog sink: checkpoint-derived appId is canonicalized — respelled path is the same idempotence scope") {
    val s = spark
    import s.implicits._
    val dir = tmp("r13sink").toString
    graft.sources.TxLog.commitOverwrite(spark, dir,
      Seq((1L, "a")).toDF("id", "name"))
    val ckReal = tmp("r13sinkck")
    val prov = new graft.sources.TxLogStreamProvider
    def sink(ck: String) = prov.createSink(spark.sqlContext,
      Map("path" -> dir, "checkpointLocation" -> ck), Nil,
      org.apache.spark.sql.streaming.OutputMode.Append())
    val batch = Seq((2L, "b")).toDF("id", "name")
    sink(ckReal.toString).addBatch(7L, batch)
    // same logical checkpoint, different spelling: parent/../name
    val respelled = s"${ckReal.getParent}/./${ckReal.getFileName}"
    sink(respelled).addBatch(7L, batch) // replay — must be recognized
    assert(graft.sources.TxLog.read(spark, dir).count() == 2L,
      "a replayed batch under a respelled checkpoint path must not commit twice")
  }

  // ---- followStream on a source with DML history -------------------

  test("followStream batch 0 over a whole DML history: net-deleted keys are absence, not a refusal") {
    val s = spark
    import s.implicits._
    val src = tmp("r13follow").toString
    def df(ids: Long*): org.apache.spark.sql.DataFrame =
      ids.map(i => (i, s"n$i")).toDF("id", "name")
    graft.sources.TxLog.commitOverwrite(spark, src, df(1, 2, 3)) // v0
    graft.sources.TxLog.commitAppend(spark, src, df(4))          // v1
    graft.sources.TxLog.delete(spark, src, col("id") === 2)      // v2
    // a fresh follower's uncapped first batch spans all three
    // commits: key 2's net state is 'deleted' — that must create the
    // follower WITHOUT key 2, not refuse
    val dst = tmp("r13followdst").toString
    val q = graft.sources.TxLog.changeFeedApplySink(
      spark.readStream.format("txlog")
        .option("readChangeFeed", "true").load(src),
      dst, Seq("id"), "r13follow", tmp("r13followck").toString)
    try {
      q.processAllAvailable()
      assert(graft.sources.TxLog.read(spark, dst)
        .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 4L))
    } finally q.stop()
  }

  // ---- merge-on-read CDC apply -------------------------------------

  test("applyChangesMor: directives land through a vector — no touched file rewritten") {
    val s = spark
    import s.implicits._
    val dir = tmp("r13mor").toString
    graft.sources.TxLog.commitOverwrite(spark, dir,
      (1L to 12L).map(i => (i, s"n$i")).toDF("id", "name")
        .repartitionByRange(3, col("id")), statsCols = Seq("id"))
    val before = graft.sources.TxLog.snapshot(spark, dir)
    assert(before.files.size == 3)

    // scattered keys: one per file — replace 1, delete 5, insert 99,
    // and a no-op delete for an absent key
    graft.sources.TxLog.applyChangesMor(spark, dir,
      Seq((1L, "one", false), (5L, "x", true), (99L, "new", false),
        (77L, "x", true))
        .toDF("id", "name", "del"), Seq("id"), "del",
      txn = Some(("r13mor", 0L)))

    val after = graft.sources.TxLog.snapshot(spark, dir)
    // every pre-existing data file SURVIVES (now carrying a vector);
    // the only new files are the images/inserts
    val beforePaths = before.files.map(_.path).toSet
    assert(beforePaths.subsetOf(after.files.map(_.path).toSet),
      "merge-on-read apply must not rewrite touched data files")
    assert(after.files.filter(f => beforePaths(f.path))
      .count(_.dv.isDefined) == 2,
      "the two files holding keys 1 and 5 carry the vector")
    val got = graft.sources.TxLog.read(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(got == ((2L to 12L).filter(_ != 5L).map(i => i -> s"n$i").toMap
      + (1L -> "one") + (99L -> "new")))
    // the commit is the dv shape and carries the txn marker
    val h = graft.sources.TxLog.history(spark, dir)
      .orderBy(col("version").desc).limit(1).collect()(0)
    assert(h.getAs[String]("op") == "update-dv")
    // replay under the same marker: recognized, nothing lands
    val v = after.version
    graft.sources.TxLog.applyChangesMor(spark, dir,
      Seq((1L, "again", false)).toDF("id", "name", "del"),
      Seq("id"), "del", txn = Some(("r13mor", 0L)))
    assert(graft.sources.TxLog.snapshot(spark, dir).version == v)
    // compact folds the vector away with contents intact
    graft.sources.TxLog.compact(spark, dir, targetFiles = 2)
    assert(graft.sources.TxLog.read(spark, dir)
      .as[(Long, String)].collect().toMap == got)
  }

  test("followStream(mor=true): follower tracks random source DML; update batches rewrite nothing") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(1307)
    val src = tmp("r13morfollow").toString
    def mkDf(rows: Seq[(Long, String)]): org.apache.spark.sql.DataFrame =
      rows.toDF("id", "name")
    var nextId = 100L
    def freshIds(n: Int): Seq[Long] = {
      val r = (nextId until nextId + n).toSeq; nextId += n; r
    }
    graft.sources.TxLog.commitOverwrite(spark, src,
      mkDf((1L to 8L).map(i => (i, s"n$i"))))
    val dst = tmp("r13morfollowdst").toString
    val q = graft.sources.TxLog.changeFeedApplySink(
      spark.readStream.format("txlog")
        .option("readChangeFeed", "true").load(src),
      dst, Seq("id"), "r13morf", tmp("r13morfck").toString, mor = true)
    def multiset(dir: String): Map[(Long, String), Int] =
      graft.sources.TxLog.read(spark, dir).as[(Long, String)]
        .collect().toSeq.groupBy(identity).view.mapValues(_.size).toMap
    try {
      q.processAllAvailable()
      assert(multiset(dst) == multiset(src))
      var followerCreatedFiles =
        graft.sources.TxLog.snapshot(spark, dst).files.map(_.path).toSet
      (1 to 12).foreach { step =>
        val existing = graft.sources.TxLog.read(spark, src)
          .select("id").as[Long].collect().toSeq.sorted
        def pick(): Long = existing(rnd.nextInt(existing.size))
        rnd.nextInt(5) match {
          case 0 =>
            graft.sources.TxLog.commitAppend(spark, src,
              mkDf(freshIds(2).map(i => (i, s"a$step-$i"))))
          case 1 if existing.nonEmpty =>
            graft.sources.TxLog.delete(spark, src, col("id") === pick())
          case 2 if existing.nonEmpty =>
            graft.sources.TxLog.updateMor(spark, src, col("id") === pick(),
              Map("name" -> lit(s"u$step")))
          case 3 if existing.nonEmpty =>
            graft.sources.TxLog.merge(spark, src,
              mkDf(Seq((pick(), s"g$step")) ++
                freshIds(1).map(i => (i, s"g$step-$i"))).distinct(),
              Seq("id"))
          case _ =>
            graft.sources.TxLog.commitAppend(spark, src,
              mkDf(freshIds(1).map(i => (i, s"a$step-$i"))))
        }
        q.processAllAvailable()
        assert(multiset(dst) == multiset(src), s"step $step diverged")
        // zero data-file rewrites, ever: every follower file present
        // before this batch is still registered after it
        val nowFiles = graft.sources.TxLog.snapshot(spark, dst)
          .files.map(_.path).toSet
        assert(followerCreatedFiles.subsetOf(nowFiles),
          s"step $step rewrote follower files")
        followerCreatedFiles = nowFiles
      }
      // the vectors fold away on schedule without disturbing parity
      graft.sources.TxLog.compact(spark, dst, targetFiles = 2)
      assert(multiset(dst) == multiset(src))
    } finally q.stop()
  }

  // ---- maxBytesPerTrigger ------------------------------------------

  test("maxBytesPerTrigger slices a backlog by recorded file sizes; pre-bytes commits admit alone") {
    val s = spark
    import s.implicits._
    val dir = tmp("r13bytes").toString
    def df(ids: Long*): org.apache.spark.sql.DataFrame =
      ids.map(i => (i, s"n$i")).toDF("id", "name")
    graft.sources.TxLog.commitOverwrite(spark, dir, df(1))   // v0
    (2L to 5L).foreach(i =>
      graft.sources.TxLog.commitAppend(spark, dir, df(i)))   // v1..v4
    // every commit writes one small parquet file; find its size and
    // budget exactly two commits per trigger
    val perCommit = graft.sources.TxLog.snapshot(spark, dir)
      .files.map(_.bytes.get)
    assert(perCommit.forall(_ > 0), "commit must record file bytes")
    val budget = perCommit.max * 2
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("txlog")
      .option("maxBytesPerTrigger", budget).load(dir)
      .writeStream.outputMode("append")
      .option("checkpointLocation", tmp("r13bytesck").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        sizes += b.count(); ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(sizes.filter(_ > 0).toSeq == Seq(2L, 2L, 1L),
      s"byte-capped slicing diverged: $sizes")

    // OLD-LOG COMPATIBILITY: strip the recorded bytes from every
    // commit (a table written before byte recording) — the budget
    // must then admit one commit per trigger (conservative), never
    // treat unknown sizes as free and admit the whole backlog
    val old = tmp("r13bytesold").toString
    graft.sources.TxLog.commitOverwrite(spark, old, df(1))
    (2L to 3L).foreach(i =>
      graft.sources.TxLog.commitAppend(spark, old, df(i)))
    val logDir = java.nio.file.Paths.get(old, graft.sources.TxLog.LogDir)
    java.nio.file.Files.list(logDir).forEach { p =>
      if (p.toString.endsWith(".json")) {
        val t = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        java.nio.file.Files.write(p,
          t.replaceAll(",\"bytes\":\\d+", "").getBytes("UTF-8"))
        ()
      }
    }
    assert(graft.sources.TxLog.snapshot(spark, old)
      .files.forall(_.bytes.isEmpty), "strip failed")
    val oldSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q2 = spark.readStream.format("txlog")
      .option("maxBytesPerTrigger", Long.MaxValue / 2).load(old)
      .writeStream.outputMode("append")
      .option("checkpointLocation", tmp("r13bytesoldck").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        oldSizes += b.count(); ()
      }.start()
    try q2.processAllAvailable() finally q2.stop()
    assert(oldSizes.filter(_ > 0).toSeq == Seq(1L, 1L, 1L),
      s"unknown-size commits must admit alone: $oldSizes")
  }

  // ---- best-fit shard packing --------------------------------------

  test("bestFitShards: hand-computed BFD placement, invariants, determinism, oversized refusal") {
    val s = spark
    import s.implicits._
    // one group, budget 10: sizes desc = 7(a) 6(b) 4(c) 3(d) 2(e) 1(f)
    //   7 -> shard0 (rem 3); 6 -> shard1 (rem 4); 4 -> shard1 (rem 0)
    //   3 -> shard0 (rem 0); 2 -> shard2 (rem 8); 1 -> shard2 (rem 7)
    val docs = Seq(("g", 1L, 7L), ("g", 2L, 6L), ("g", 3L, 4L),
      ("g", 4L, 3L), ("g", 5L, 2L), ("g", 6L, 1L))
      .toDF("src", "id", "n")
    val got = graft.operators.Pack
      .bestFitShards(docs, "src", "id", "n", 10L)
      .select("id", "shard_ix").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 0L,
      5L -> 2L, 6L -> 2L))

    // randomized invariants across several groups: every doc placed
    // exactly once, whole; no shard over budget; deterministic
    val rnd = new scala.util.Random(13)
    val big = (1 to 400).map(i =>
      (s"g${i % 7}", i.toLong, 1L + rnd.nextInt(64).toLong))
      .toDF("src", "id", "n")
    def run() = graft.operators.Pack
      .bestFitShards(big, "src", "id", "n", 64L)
    val r1 = run().collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    val r2 = run().collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    assert(r1.toSeq == r2.toSeq, "BFD must be deterministic")
    assert(r1.map(_._2).toSeq.sorted == (1L to 400L), "every doc exactly once")
    val fills = r1.groupBy(t => (t._1, t._4)).view.mapValues(_.map(_._3).sum)
    assert(fills.values.forall(_ <= 64L), "no shard over budget")
    // BFD never uses more shards than docs, and with avg size 32 the
    // packing should be near 2 docs/shard — sanity, not a theorem
    val nShards = fills.size
    assert(nShards < 400 / 7 * 7, s"suspicious shard count $nShards")

    val e = intercept[org.apache.spark.SparkException] {
      graft.operators.Pack.bestFitShards(
        Seq(("g", 1L, 11L)).toDF("src", "id", "n"), "src", "id", "n", 10L)
        .collect()
    }
    def mentions(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("never split")) ||
        mentions(t.getCause))
    assert(mentions(e), s"oversized doc must refuse loudly: $e")

    // bestFitPacked reassembly: every doc's payload appears exactly
    // once across its group's shards, fill/padding are exact, and
    // payloads ride in placement order (size desc, then id)
    val packed = graft.operators.Pack
      .bestFitPacked(big.withColumn("pay", col("id")),
        "src", "id", "n", "pay", 64L).collect()
    val allPays = packed.flatMap(_.getAs[scala.collection.Seq[Long]]("payloads"))
    assert(allPays.sorted.toSeq == (1L to 400L), "reassembly invariant")
    packed.foreach { r =>
      assert(r.getAs[Long]("fill") + r.getAs[Long]("padding") == 64L)
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[scala.collection.Seq[Long]]("payloads").size.toLong)
    }
  }

  // ---- timestamp-bounded batch change feeds ------------------------

  test("changesSinceTimestamp / changeFeedByTimestamp: between-commit bounds, refusals") {
    val s = spark
    import s.implicits._
    val dir = tmp("r13ts").toString
    def df(ids: Long*): org.apache.spark.sql.DataFrame =
      ids.map(i => (i, s"n$i")).toDF("id", "name")
    def setTime(v: Long, ts: Long): Unit = {
      val p = java.nio.file.Paths.get(dir, graft.sources.TxLog.LogDir,
        f"$v%020d.json")
      val t = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      java.nio.file.Files.write(p,
        t.replaceFirst("\"ts\":\\d+", "\"ts\":" + ts).getBytes("UTF-8"))
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(ts))
      ()
    }
    graft.sources.TxLog.commitOverwrite(spark, dir, df(1))   // v0
    graft.sources.TxLog.commitAppend(spark, dir, df(2))      // v1
    graft.sources.TxLog.commitAppend(spark, dir, df(3))      // v2
    setTime(0, 100000L); setTime(1, 200000L); setTime(2, 300000L)
    def ids(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.select("id").as[Long].collect().sorted.toSeq

    // between-commit bounds: (150k, 250k] window holds exactly v1
    assert(ids(graft.sources.TxLog.changesSinceTimestamp(spark, dir,
      150000L, Some(250000L))) == Seq(2L))
    // from before v0: the initial load + everything after
    assert(ids(graft.sources.TxLog.changesSinceTimestamp(spark, dir,
      50000L)) == Seq(1L, 2L, 3L))
    // the feed form stamps versions for the same window
    val feed = graft.sources.TxLog.changeFeedByTimestamp(spark, dir,
      150000L, Some(300000L))
    assert(feed.select("_commit_version").distinct()
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // an empty window between two commits refuses loudly
    val e = intercept[IllegalArgumentException] {
      graft.sources.TxLog.changesSinceTimestamp(spark, dir,
        210000L, Some(290000L))
    }
    assert(e.getMessage.contains("no"), e.getMessage)
    // a window entirely before the first commit refuses with the
    // truncation-aware versionAt message
    val e2 = intercept[IllegalArgumentException] {
      graft.sources.TxLog.changesSinceTimestamp(spark, dir,
        10000L, Some(20000L))
    }
    assert(e2.getMessage.contains("before the first"), e2.getMessage)
    // a window starting after the last commit refuses like the stream
    val e3 = intercept[IllegalArgumentException] {
      graft.sources.TxLog.changeFeedByTimestamp(spark, dir, 999999L)
    }
    assert(e3.getMessage.contains("at or after"), e3.getMessage)
  }

  // ---- mid-stream DDL: schema pinned at query start ----------------

  test("plain stream survives mid-stream rename and add-column under its start schema; drop refuses; CDC refuses with restart message") {
    val s = spark
    import s.implicits._
    val dir = tmp("r13ddl").toString
    graft.sources.TxLog.commitOverwrite(spark, dir,
      Seq((1L, "a")).toDF("id", "name"))
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val ck = tmp("r13ddlck").toString
    def start() = spark.readStream.format("txlog").load(dir)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ck)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.select(b.columns.map(col).toSeq: _*)
          .collect().map(r => (r.getLong(0), r.getString(1)))
        ()
      }.start()
    val q = start()
    try {
      q.processAllAvailable()
      // RENAME mid-stream: physical column unchanged — rows keep
      // flowing under the query-start name
      graft.sources.TxLog.renameColumn(spark, dir, "name", "label")
      graft.sources.TxLog.commitAppend(spark, dir,
        Seq((2L, "b")).toDF("id", "label"))
      q.processAllAvailable()
      assert(got.toSet == Set((1L, "a"), (2L, "b")),
        s"rename must not disturb the started stream: $got")
      // ADD column mid-stream: not projected until restart
      graft.sources.TxLog.commitAppend(spark, dir,
        Seq((3L, "c", 9L)).toDF("id", "label", "extra"),
        mergeSchema = true)
      q.processAllAvailable()
      assert(got.toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
    // restart adopts the evolved schema (new names, new columns)
    val widened = scala.collection.mutable.ArrayBuffer.empty[String]
    val q2 = spark.readStream.format("txlog").load(dir)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ck)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        widened += b.columns.mkString(","); ()
      }.start()
    try {
      graft.sources.TxLog.commitAppend(spark, dir,
        Seq((4L, "d", 10L)).toDF("id", "label", "extra"))
      q2.processAllAvailable()
      assert(widened.forall(_ == "id,label,extra"),
        s"restart must adopt the evolved schema: $widened")
    } finally q2.stop()

    // DROP of a query-start column refuses with the restart contract
    val q3 = spark.readStream.format("txlog").load(dir)
      .writeStream.format("memory").queryName("r13ddldrop")
      .option("checkpointLocation", tmp("r13ddlck3").toString)
      .outputMode("append").start()
    def mentions(t: Throwable, m: String): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains(m)) ||
        mentions(t.getCause, m))
    try {
      q3.processAllAvailable()
      graft.sources.TxLog.dropColumn(spark, dir, "extra")
      graft.sources.TxLog.commitAppend(spark, dir,
        Seq((5L, "e")).toDF("id", "label"))
      val e = intercept[Exception] { q3.processAllAvailable() }
      assert(mentions(e, "dropped mid-stream"), s"wrong refusal: $e")
    } finally q3.stop()

    // CDC mode: any mid-stream DDL refuses with the restart message
    val cdcDir = tmp("r13ddlcdc").toString
    graft.sources.TxLog.commitOverwrite(spark, cdcDir,
      Seq((1L, "a")).toDF("id", "name"))
    val q4 = spark.readStream.format("txlog")
      .option("readChangeFeed", "true").load(cdcDir)
      .writeStream.format("memory").queryName("r13ddlcdcq")
      .option("checkpointLocation", tmp("r13ddlck4").toString)
      .outputMode("append").start()
    try {
      q4.processAllAvailable()
      graft.sources.TxLog.renameColumn(spark, cdcDir, "name", "label")
      graft.sources.TxLog.commitAppend(spark, cdcDir,
        Seq((2L, "b")).toDF("id", "label"))
      val e = intercept[Exception] { q4.processAllAvailable() }
      assert(mentions(e, "restart the query"), s"wrong refusal: $e")
    } finally q4.stop()
  }

  // ---- medallion parity for the new stream options -----------------

  test("promoteStream(skipChangeCommits) survives upstream DML; byte cap slices the backlog") {
    val s = spark
    import s.implicits._
    val root = tmp("r13med").toString
    val p = new graft.etl.MedallionPipeline(spark, root, useTxLog = true)
    import graft.etl.LoadType
    import graft.quality.DataZone
    def batch(ids: Long*): org.apache.spark.sql.DataFrame =
      ids.map(i => (i, s"n$i")).toDF("id", "name")
    p.write(DataZone.Bronze, "pts", batch(1, 2), LoadType.Full)
    p.write(DataZone.Bronze, "pts", batch(3), LoadType.Append)
    // upstream correction: a CoW delete that would brick a plain
    // appends-only promotion
    graft.sources.TxLog.delete(spark, p.path(DataZone.Bronze, "pts"),
      col("id") === 1)
    p.write(DataZone.Bronze, "pts", batch(4), LoadType.Append)
    val perCommit = graft.sources.TxLog
      .snapshot(spark, p.path(DataZone.Bronze, "pts"))
      .files.flatMap(_.bytes)
    val q = p.promoteStream("r13med", "pts", DataZone.Bronze,
      DataZone.Silver, checkpointDir = Some(tmp("r13medck").toString),
      maxBytesPerTrigger = Some(perCommit.max * 2),
      skipChangeCommits = true)
    try {
      q.processAllAvailable()
      // the delete is NOT promoted (documented skip semantics): the
      // silver copy holds every appended row including id=1
      assert(p.read(DataZone.Silver, "pts")
        .select("id").as[Long].collect().sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L))
      // several txn batches under the byte cap
      assert(p.history(DataZone.Silver, "pts")
        .filter(col("app_id") === "r13med").count() >= 2)
    } finally q.stop()
  }

  test("TxFile.bytes survives checkpoint replay (byte admission never silently degrades)") {
    val s = spark
    import s.implicits._
    val dir = tmp("r13ckbytes").toString
    graft.sources.TxLog.commitOverwrite(spark, dir,
      Seq((0L, "x")).toDF("id", "name"))
    (1L to 11L).foreach(i => graft.sources.TxLog.commitAppend(spark, dir,
      Seq((i, s"n$i")).toDF("id", "name")))
    // v10 wrote a checkpoint; snapshot resolves THROUGH it
    val snap = graft.sources.TxLog.snapshot(spark, dir)
    assert(snap.files.nonEmpty &&
      snap.files.forall(_.bytes.exists(_ > 0L)),
      "bytes must replay through the checkpoint")
  }

  // ---- vacuum collects orphaned claim temps ------------------------

  test("vacuum collects a crashed writer's dot-tmp claim files; age guard protects in-flight ones") {
    val s = spark
    import s.implicits._
    val dir = tmp("r13tmp").toString
    graft.sources.TxLog.commitOverwrite(spark, dir,
      Seq((1L, "a")).toDF("id", "name"))
    // simulate a crash between staging and link
    val orphan = java.nio.file.Paths.get(dir,
      graft.sources.TxLog.LogDir, ".00000000000000000001.json.abcd1234.tmp")
    java.nio.file.Files.write(orphan, "half".getBytes("UTF-8"))
    // young temp survives an age-guarded vacuum (could be in flight)
    assert(graft.sources.TxLog.vacuumDryRun(spark, dir,
      minAgeMs = 60000L).forall(!_.endsWith(".tmp")))
    // old temp is listed and collected
    java.nio.file.Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(1000L))
    val listed = graft.sources.TxLog.vacuumDryRun(spark, dir)
    assert(listed.exists(_.endsWith(".tmp")), listed.toString)
    graft.sources.TxLog.vacuum(spark, dir)
    assert(!java.nio.file.Files.exists(orphan))
    // the table is untouched
    assert(graft.sources.TxLog.read(spark, dir).count() == 1L)
  }

  // ---- DSIR id-type guard ------------------------------------------

  test("DSIR refuses a non-integral id column instead of returning all-zero weights") {
    val s = spark
    import s.implicits._
    val raw = Seq(("a", "some text here"), ("b", "other text there"))
      .toDF("doc_id", "text")
    val target = Seq((1L, "some text here")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Dsir.importanceWeights(raw, target, "doc_id", "text")
    }
    assert(e.getMessage.contains("integral"))
  }
}
