package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.TxLog

/** TxLog scale-stress (round-10, PLANS.md): measures the three claims
  * the log's 100 TB story rests on, against the sf0.1 lineitem
  * (~600k rows) — big enough that table-sized vs batch-sized work is
  * visibly different in wall-clock.
  *
  *  1. COMMIT COST IS BATCH-SIZED: appending 1k rows to the 600k-row
  *     logged table must cost what staging 1k rows costs — the log
  *     write itself is one tiny JSON file regardless of table size.
  *  2. STATS-IN-LOG SKIPPING WORKS: with the table range-laid on the
  *     stats column, a narrow readPruned must plan over a small
  *     fraction of the files and return EXACTLY the rows the full
  *     scan's filter returns.
  *  3. DELTA READS ARE DELTA-SIZED: changesSince after the append
  *     must read only the appended files.
  *
  * Run: SPARK_GRAFT_SF_DIR=... runMain graft.StressTxLog
  */
object StressTxLog {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress-txlog] $what%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val dir = java.nio.file.Files.createTempDirectory("txstress").toString
    val li = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")

    // 32 range-laid files so per-file l_orderkey ranges are disjoint
    timed(s"commitOverwrite ${li.count()} rows, 32 range files") {
      TxLog.commitOverwrite(spark, dir,
        li.repartitionByRange(32, col("l_orderkey")),
        statsCols = Seq("l_orderkey"))
    }

    // claim 1: batch-sized commit
    val batch = li.limit(1000).withColumn("l_orderkey",
      col("l_orderkey") + 100000000L) // out-of-range keys: new files only
    timed("commitAppend 1k rows to 600k table") {
      TxLog.commitAppend(spark, dir, batch, statsCols = Seq("l_orderkey"))
    }

    // claim 2: narrow probe plans over a file sliver, rows exact
    val snap = TxLog.snapshot(spark, dir)
    val (lo, hi) = (1000L, 2000L)
    val pruned = TxLog.readPruned(spark, dir, "l_orderkey", lo, hi)
    val nFilesPruned = pruned.inputFiles.length
    val prunedRows = timed("readPruned narrow range count") {
      pruned.filter(col("l_orderkey").between(lo, hi)).count()
    }
    val fullRows = timed("full-scan filter count") {
      TxLog.read(spark, dir).filter(col("l_orderkey").between(lo, hi))
        .count()
    }
    println(s"[stress-txlog] files planned: $nFilesPruned of " +
      s"${snap.files.size}; rows pruned=$prunedRows full=$fullRows")
    require(prunedRows == fullRows, "pruning changed the answer")
    require(nFilesPruned * 4 <= snap.files.size,
      s"expected <=25% of files for a narrow probe, got $nFilesPruned")

    // claim 3: the delta read scans only the appended files
    val delta = TxLog.changesSince(spark, dir, sinceVersion = 0)
    println(s"[stress-txlog] delta rows=${delta.count()} files=" +
      s"${delta.inputFiles.length}")
    require(delta.count() == 1000, "delta must be exactly the batch")

    // claim 4: DML cost is affected-data-sized — a key-range delete
    // against the 600k-row table must rewrite only the file sliver
    // whose stats intersect the range, at a cost far under the
    // table write's
    val preDel = TxLog.snapshot(spark, dir)
    val cdfSince = preDel.version
    timed("delete narrow key range (copy-on-write)") {
      TxLog.delete(spark, dir, col("l_orderkey").between(lo, hi))
    }
    val postDel = TxLog.snapshot(spark, dir)
    val rewrittenDel = preDel.files.map(_.path)
      .diff(postDel.files.map(_.path)).size
    println(s"[stress-txlog] delete rewrote $rewrittenDel of " +
      s"${preDel.files.size} files")
    require(rewrittenDel * 4 <= preDel.files.size,
      s"a narrow delete must rewrite <=25% of files, got $rewrittenDel")
    require(TxLog.read(spark, dir)
      .filter(col("l_orderkey").between(lo, hi)).count() == 0)

    // claim 5: merge prunes by the source's key envelope — an upsert
    // whose keys live in one file's range touches that sliver only
    val preMrg = TxLog.snapshot(spark, dir)
    val src = TxLog.read(spark, dir)
      .filter(col("l_orderkey").between(10000L, 11000L))
      .groupBy("l_orderkey", "l_partkey")
      .agg(min(col("l_quantity")).as("l_quantity"),
        min(col("l_extendedprice")).as("l_extendedprice"))
      .withColumn("l_extendedprice", col("l_extendedprice") * 2)
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
      .localCheckpoint()
    timed(s"merge ${src.count()}-row keyed source") {
      TxLog.merge(spark, dir, src, Seq("l_orderkey", "l_partkey"),
        statsCols = Seq("l_orderkey"))
    }
    val postMrg = TxLog.snapshot(spark, dir)
    val rewrittenMrg = preMrg.files.map(_.path)
      .diff(postMrg.files.map(_.path)).size
    println(s"[stress-txlog] merge rewrote $rewrittenMrg of " +
      s"${preMrg.files.size} files")
    require(rewrittenMrg * 4 <= preMrg.files.size,
      s"a narrow merge must rewrite <=25% of files, got $rewrittenMrg")

    // claim 6: the change feed over the DML span is touched-file-sized
    val feed = TxLog.changeFeed(spark, dir, cdfSince)
    val byType = feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"[stress-txlog] changeFeed over DML span: $byType")
    require(byType.getOrElse("delete", 0L) > 0 &&
      byType.getOrElse("insert", 0L) > 0)

    // claim 7: merge-on-read delete cost is MATCHED-ROWS-sized, not
    // touched-FILE-sized — the same narrow delete shape as claim 4
    // on a fresh copy of the table, once copy-on-write and once via
    // deletion vectors; MoR must rewrite ZERO data files and beat
    // CoW wall-clock on the same sliver (CoW rewrites the touched
    // files whole; MoR writes a vector of just the matches)
    val dirCow = java.nio.file.Files.createTempDirectory("txmorA").toString
    val dirMor = java.nio.file.Files.createTempDirectory("txmorB").toString
    val laid = li.repartitionByRange(32, col("l_orderkey"))
      .localCheckpoint()
    TxLog.commitOverwrite(spark, dirCow, laid, statsCols = Seq("l_orderkey"))
    TxLog.commitOverwrite(spark, dirMor, laid, statsCols = Seq("l_orderkey"))
    val (dlo, dhi) = (20000L, 21000L)
    val tCow = {
      val t0 = System.nanoTime()
      TxLog.delete(spark, dirCow, col("l_orderkey").between(dlo, dhi))
      (System.nanoTime() - t0) / 1e9
    }
    val tMor = {
      val t0 = System.nanoTime()
      TxLog.deleteMor(spark, dirMor, col("l_orderkey").between(dlo, dhi))
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[stress-txlog] narrow delete: CoW $tCow%.2f s vs MoR $tMor%.2f s")
    val morFiles = TxLog.snapshot(spark, dirMor).files
    require(morFiles.count(_.dv.isDefined) >= 1 &&
      morFiles.map(_.path).toSet ==
        TxLog.snapshot(spark, dirMor, Some(0)).files.map(_.path).toSet,
      "MoR delete must keep every data file by path")
    val cowDel = TxLog.read(spark, dirCow)
      .filter(col("l_orderkey").between(dlo, dhi)).count()
    val morDel = TxLog.read(spark, dirMor)
      .filter(col("l_orderkey").between(dlo, dhi)).count()
    require(cowDel == 0 && morDel == 0, "both modes must delete the range")
    require(TxLog.countWhere(spark, dirMor, Nil) ==
      TxLog.countWhere(spark, dirCow, Nil),
      "MoR and CoW must agree on the surviving row count")
    // vector-subtracted full read stays within 2x of the clean read
    val tReadCow = {
      val t0 = System.nanoTime()
      TxLog.read(spark, dirCow).count()
      (System.nanoTime() - t0) / 1e9
    }
    val tReadMor = {
      val t0 = System.nanoTime()
      TxLog.read(spark, dirMor).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[stress-txlog] full read after delete: CoW $tReadCow%.2f s" +
      f" vs MoR (vector-subtracting) $tReadMor%.2f s")

    // claim 8: DDL and clone are METADATA-speed — rename and shallow
    // clone of the 600k-row table must cost milliseconds (one KB
    // commit each), and the maintenance no-op must answer from the
    // log alone
    val tRename = {
      val t0 = System.nanoTime()
      TxLog.renameColumn(spark, dirMor, "l_quantity", "qty")
      (System.nanoTime() - t0) / 1e9
    }
    val cloneDir = java.nio.file.Files.createTempDirectory("txclone").toString
    val tClone = {
      val t0 = System.nanoTime()
      TxLog.clone(spark, dirMor, cloneDir)
      (System.nanoTime() - t0) / 1e9
    }
    val tNoop = {
      val t0 = System.nanoTime()
      val m = TxLog.maintain(spark, dirMor, maxFiles = 1000,
        maxDvFraction = 0.99)
      require(!m.compacted, "healthy table must not compact")
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[stress-txlog] rename $tRename%.3f s, shallow clone " +
      f"$tClone%.3f s, maintain no-op $tNoop%.3f s (600k-row table)")
    require(TxLog.read(spark, cloneDir).count() ==
      TxLog.read(spark, dirMor).count(), "clone must read equal")
    require(tRename < 2 && tClone < 2 && tNoop < 2,
      "DDL/clone/no-op must be metadata-speed")

    spark.stop()
  }
}
