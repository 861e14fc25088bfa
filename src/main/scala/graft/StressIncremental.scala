package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scale-stress for the INCREMENTAL dedup path (not part of the driver
  * contract): on the [[StressDedup]] sf1-scale corpus (10× sf0.1,
  * clique + chain duplicate structure), split copy 9 off as "today's
  * batch" and dedup it against copies 0–8 as the standing corpus.
  * The claim under test is incremental's 100 TB point: ingest cost is
  * governed by the BATCH size (the corpus contributes two map-side
  * aggregations and is never self-joined), so the incremental clean
  * should run well under a full-corpus re-dedup at the same total
  * scale — which is also timed for the ratio.
  *
  * Usage: runMain graft.StressIncremental [baseDir] [copies] [tau]
  */
object StressIncremental {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 10
    val tau = if (args.length > 2) args(2).toDouble else 0.6
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val allPath = "/tmp/graft_stress_incr.parquet"
    StressDedup.scaledCorpus(spark, baseDir, copies)
      .write.mode(SaveMode.Overwrite).parquet(allPath)
    val all = spark.read.parquet(allPath)
    // copy index i is doc_id mod copies; the last copy is the batch
    val corpus = all.filter(col("doc_id") % copies =!= (copies - 1))
    val batch = all.filter(col("doc_id") % copies === (copies - 1))
    val (nCorpus, nBatch) = (corpus.count(), batch.count())

    // recompute form: corpus signatures derived inline per ingest
    val (nSurvivors, tIncr) = time(
      Dedup.incrementalClean(corpus, batch, "doc_id", "text", tau)
        .count())

    // persisted-index form: the corpus' dedup structures are bucketed
    // parquet tables built once (timed separately); ingest only probes
    // them — the corpus side reads pre-partitioned, no shuffle
    val idxBase = "/tmp/graft_stress_incr_idx"
    val (_, tBuild) = time(
      Dedup.saveIndex(Dedup.buildIndex(corpus, "doc_id", "text"),
        "graft_stress_idx", idxBase))
    val loaded = Dedup.loadIndex(spark, "graft_stress_idx", idxBase)
    val (nIndexed, tIndexed) = time(
      Dedup.incrementalCleanIndexed(loaded, batch, "doc_id", "text", tau)
        .count())

    // the non-incremental alternative at the same total scale
    val (nFull, tFull) = time(
      Dedup.dropNearDuplicates(all, "doc_id", "text", tau).count())

    println(
      s"""{"stress":"incremental","base":"$baseDir","copies":$copies,""" +
        s""""tau":$tau,"n_corpus":$nCorpus,"n_batch":$nBatch,""" +
        s""""incremental":{"survivors":$nSurvivors,"sec":$tIncr},""" +
        s""""index_build":{"sec":$tBuild},""" +
        s""""incremental_indexed":{"survivors":$nIndexed,"sec":$tIndexed},""" +
        s""""full_rededup":{"survivors":$nFull,"sec":$tFull}}""")
    spark.stop()
  }
}
