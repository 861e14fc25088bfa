package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{BloomIndex, TxLog}

/** Bloom-filter file skipping (SURVEY §2, row 159): point-lookup
  * pruning on high-cardinality keys where min/max stats are blind —
  * exactness (no false negatives, ever), conservatism for unindexed
  * files, and the logged-table staleness contract.
  */
class BloomIndexSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** 4000 high-cardinality string keys hash-scattered over 16 files:
    * every file spans the whole key range, so min/max stats can never
    * prune a point probe. */
  private def scattered(): DataFrame = {
    val s = spark
    import s.implicits._
    (0 until 4000).map(i => (s"key_%05d".format(i), i.toLong))
      .toDF("k", "v")
      .repartition(16, col("k"))
  }

  test("point probes prune files with zero false negatives") {
    val dir = tmp("bloomidx")
    scattered().write.mode("overwrite").parquet(dir)
    BloomIndex.write(spark, dir, Seq("k"))

    // the present-key sweep: every probed key's rows must survive
    // pruning bit-for-bit (bloom = no false negatives)
    val full = spark.read.parquet(dir)
    var keptTotal = 0
    (0 until 200 by 7).foreach { i =>
      val key = s"key_%05d".format(i)
      val (kept, total) = BloomIndex.prunedFiles(spark, dir, "k", key)
      assert(total == 16)
      keptTotal += kept.size
      val got = BloomIndex.prunedRead(spark, dir, "k", key)
        .filter(col("k") === key).select("v").collect().map(_.getLong(0))
      val want = full.filter(col("k") === key)
        .select("v").collect().map(_.getLong(0))
      assert(got.toSeq == want.toSeq, s"probe $key lost rows")
    }
    // …and pruning must actually bite: ~1 true file + ~1% fpp of 15
    val probes = (0 until 200 by 7).size
    assert(keptTotal < probes * 4,
      s"expected ~1-2 files kept per probe, got $keptTotal/$probes")

    // absent keys: usually zero files planned, never a wrong result
    val (keptAbsent, _) =
      BloomIndex.prunedFiles(spark, dir, "k", "no_such_key")
    assert(keptAbsent.size <= 2)
    assert(BloomIndex.prunedRead(spark, dir, "k", "no_such_key")
      .filter(col("k") === "no_such_key").count() == 0)

    // a column the index doesn't cover prunes nothing (conservative)
    val (keptV, totalV) = BloomIndex.prunedFiles(spark, dir, "v", 17L)
    assert(keptV.size == totalV)
  }

  test("logged tables: DML-rewritten files are conservatively kept") {
    val s = spark
    import s.implicits._
    val dir = tmp("bloomtx")
    val data = (0 until 2000).map(i => (s"id_%04d".format(i), i.toLong))
      .toDF("k", "v").repartition(8, col("k"))
    TxLog.commitOverwrite(spark, dir, data)
    BloomIndex.write(spark, dir, Seq("k"))
    val (kept0, total0) = BloomIndex.prunedFiles(spark, dir, "k", "id_0100")
    assert(total0 == 8 && kept0.size < 8)

    // DML rewrites one file → its rewrite is NOT in the index → kept
    // conservatively; results stay exact for keys in rewritten files
    TxLog.delete(spark, dir, col("k") === "id_0100")
    val (kept1, _) = BloomIndex.prunedFiles(spark, dir, "k", "id_0101")
    val probe = BloomIndex.prunedRead(spark, dir, "k", "id_0101")
      .filter(col("k") === "id_0101")
    assert(probe.count() ==
      TxLog.read(spark, dir).filter(col("k") === "id_0101").count())
    assert(kept1.nonEmpty)
    // the deleted key is gone THROUGH the pruned read too
    assert(BloomIndex.prunedRead(spark, dir, "k", "id_0100")
      .filter(col("k") === "id_0100").count() == 0)

    // rebuilding restores full pruning over the post-DML file set
    BloomIndex.write(spark, dir, Seq("k"))
    val (kept2, total2) = BloomIndex.prunedFiles(spark, dir, "k", "id_0101")
    assert(kept2.size < total2)
  }

  test("refresh indexes only uncovered files and drops dead rows") {
    val s = spark
    import s.implicits._
    val dir = tmp("bloomrefresh")
    val data = (0 until 2000).map(i => (s"id_%04d".format(i), i.toLong))
      .toDF("k", "v").repartition(8, col("k"))
    TxLog.commitOverwrite(spark, dir, data)
    BloomIndex.write(spark, dir, Seq("k"))
    assert(BloomIndex.refresh(spark, dir) == 0) // already covered

    // an append + a DML rewrite leave exactly their files uncovered
    TxLog.commitAppend(spark, dir,
      (2000 until 2400).map(i => (s"id_%04d".format(i), i.toLong))
        .toDF("k", "v").repartition(2, col("k")))
    TxLog.delete(spark, dir, col("k") === "id_0100")
    val preFiles = TxLog.snapshot(spark, dir).files.size
    val indexed = BloomIndex.refresh(spark, dir)
    assert(indexed >= 3, s"append (2) + rewrite (1) files, got $indexed")

    // post-refresh: probes over appended AND rewritten ranges prune
    // again, results exact, dead-file rows no longer in the index
    val idx = spark.read.parquet(s"$dir/${BloomIndex.IndexDir}")
    val liveNames = TxLog.snapshot(spark, dir).files.map(_.path).toSet
    assert(idx.select("file").distinct().collect()
      .map(_.getString(0)).forall(liveNames))
    Seq("id_2200", "id_0101").foreach { key =>
      val (kept, total) = BloomIndex.prunedFiles(spark, dir, "k", key)
      assert(total == preFiles && kept.size < total,
        s"$key planned $kept of $total")
      assert(BloomIndex.prunedRead(spark, dir, "k", key)
        .filter(col("k") === key).count() ==
        TxLog.read(spark, dir).filter(col("k") === key).count())
    }
  }

  test("bloom_probe round-trips bloom_agg bytes") {
    graft.functions.GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    val bloom = (1L to 500L).toDF("x")
      .agg(expr("bloom_agg(xxhash64(x), 500L, 8192L)").as("b"))
    val hits = bloom.select(
      (1L to 500L).map(i =>
        expr(s"bloom_probe(b, xxhash64(${i}L))").as(s"h$i")): _*)
      .head()
    assert((0 until 500).forall(hits.getBoolean),
      "a bloom filter must never report a present value absent")
  }
}
