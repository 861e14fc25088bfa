package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.sources.{TxLog, TxLogBatch}

/** Round-20 pins — the round-19 advisory fixes first:
  *  - PHYSICAL-FIRST partition-column resolution (a rename chain that
  *    reuses a former partition column's name must keep binding the
  *    registered column, in both the planner presentation and the
  *    partition-pure stage);
  *  - MapType-safe salted staging (`tasksPerValue > 1` must not fail
  *    analysis on a map-bearing table — Spark's hash() rejects maps);
  *  - `FLATTEN` is not a reserved word (`OPTIMIZE … WHERE x =
  *    flatten` keeps the identifier in the predicate).
  */
class Round20Spec extends SparkSpec {

  private def tmp(prefix: String): Path =
    Files.createTempDirectory(prefix)

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // ---- physical-first partition resolution under rename reuse ------

  test("rename chain reusing a former partition column's name binds the registered column") {
    val s = spark
    import s.implicits._
    val dir = tmp("r20renmchain").toString + "/t"
    (0 until 300).map(i => (i.toLong, i.toLong * 10,
      Seq("en", "fr", "de")(i % 3))).toDF("k", "v", "lang")
      .write.partitionBy("lang").parquet(dir)
    TxLog.convertInPlace(s, dir, statsCols = Seq("k"))
    // the trap: free the name, then give it to a NON-partition column
    TxLog.renameColumn(s, dir, "lang", "locale")
    TxLog.renameColumn(s, dir, "v", "lang")
    // the registration entry is the PHYSICAL "lang" — it must keep
    // binding the partition column (now logical "locale"), NOT the
    // renamed v that wears the name "lang" today
    val t = s.read.format("txlog").load(dir)
    assert(t.columns.toSeq == Seq("k", "lang", "locale"))
    assert(t.queryExecution.optimizedPlan.stats.sizeInBytes <
      BigInt(Long.MaxValue) / 2,
      "rename-reuse chain demoted the table to the V1 presentation")
    assert(t.filter(col("locale") === "fr").count() == 100)
    val planned = TxLogBatch.lastScan.get()
    val snap0 = TxLog.snapshot(s, dir)
    assert(planned.size < snap0.files.size &&
      planned.forall(_.contains("lang=fr")),
      s"partition pruning lost after the rename-reuse chain: $planned")
    // the renamed v ("lang" today) is a DATA column — filtering on it
    // must not be treated as partition pruning, and values survive
    assert(t.filter(col("lang") === 50L).select("k")
      .collect().map(_.getLong(0)).toSeq == Seq(5L))
    // appends stage partition-PURE by the REGISTERED column: the
    // batch carries (k, lang=old v, locale=partition value)
    TxLog.commitAppend(s, dir,
      (300 until 330).map(i => (i.toLong, i.toLong * 10,
        Seq("en", "fr", "de")(i % 3))).toDF("k", "lang", "locale"))
    val snap = TxLog.snapshot(s, dir)
    val fresh = snap.files.map(_.path)
      .filterNot(snap0.files.map(_.path).toSet)
    assert(fresh.nonEmpty && fresh.forall(_.contains("lang=")),
      s"post-rename-chain append staged by the WRONG column: $fresh")
    val t2 = s.read.format("txlog").load(dir)
    assert(t2.filter(col("locale") === "fr").count() == 110)
    assert(TxLogBatch.lastScan.get().forall(_.contains("lang=fr")),
      "append after the rename-reuse chain lost partition pruning")
  }

  // ---- MapType-safe salted staging ---------------------------------

  test("tasksPerValue > 1 on a map-bearing table salts without hashing the map") {
    val s = spark
    import s.implicits._
    val dir = tmp("r20mapsalt").toString + "/t"
    (0 until 10).map(i => (i.toLong, Map("a" -> i), "en"))
      .toDF("k", "attrs", "lang")
      .write.partitionBy("lang").parquet(dir)
    TxLog.convertInPlace(s, dir, statsCols = Seq("k"))
    val before = TxLog.snapshot(s, dir).files.size
    withConf("spark.graft.write.tasksPerValue" -> "4") {
      // pre-fix this failed at ANALYSIS: hash() rejects MapType
      // Option-valued map: parquet round-trips maps with
      // valueContainsNull=true, and append schemas match strictly
      TxLog.commitAppend(s, dir,
        (10 until 2010).map(i => (i.toLong, Map("a" -> Option(i)), "en"))
          .toDF("k", "attrs", "lang"))
    }
    val snap = TxLog.snapshot(s, dir)
    assert(snap.files.size - before >= 2,
      s"map-safe salt did not parallelize: ${snap.files.size - before}")
    assert(snap.files.forall(_.path.contains("lang=en")),
      "map-safe salted staging broke partition purity")
    val t = s.read.format("txlog").load(dir)
    assert(t.count() == 2010)
    assert(t.filter(col("k") === 1500L)
      .select(col("attrs")("a")).collect().head.getInt(0) == 1500)
  }

  // ---- FLATTEN is not reserved -------------------------------------

  test("OPTIMIZE WHERE predicate ending in an identifier named 'flatten' parses") {
    val s = spark
    import s.implicits._
    val dir = tmp("r20flatten").toString + "/t"
    (0 until 300).map(i => (i.toLong, (i % 7).toLong,
      Seq("en", "fr", "de")(i % 3))).toDF("k", "flatten", "lang")
      .write.partitionBy("lang").parquet(dir)
    TxLog.convertInPlace(s, dir, statsCols = Seq("k", "flatten"))
    TxLog.commitAppend(s, dir,
      (300 until 330).map(i => (i.toLong, (i % 7).toLong,
        Seq("en", "fr", "de")(i % 3))).toDF("k", "flatten", "lang"))
    // pre-fix: the regex backtracked to pred="k =" + FLATTEN and the
    // statement FAILED expression parsing; post-fix the identifier
    // stays in the predicate and the keyword flag stays off (purify)
    s.sql(s"OPTIMIZE '$dir' WHERE k = flatten TARGET 2 FILES")
    val snap = TxLog.snapshot(s, dir)
    assert(snap.files.forall(_.path.contains("lang=")),
      "a predicate ending in 'flatten' must NOT imply FLATTEN " +
        s"(flat rewrite ran): ${snap.files.map(_.path).take(3)}")
    assert(s.read.format("txlog").load(dir).count() == 330)
    // the keyword still works when it IS trailing after a complete
    // predicate — including one that USES the column named flatten
    s.sql(s"OPTIMIZE '$dir' WHERE flatten >= 0 FLATTEN")
    val flat = TxLog.snapshot(s, dir)
    assert(flat.files.forall(!_.path.contains("=")),
      "an explicit trailing FLATTEN keyword lost its meaning")
    assert(s.read.format("txlog").load(dir).count() == 330)
  }
}
