package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ExactSubstr

/** Scale-stress for EXACT-SUBSTRING dedup (not part of the driver
  * contract): sf1-scale corpus (10× sf0.1 documents ≈ 50k docs,
  * ~14M tokens → one window-hash row per token) with PLANTED repeated
  * spans at skew levels a 100 TB run hits on licence headers / nav
  * chrome. Mirrors the [[StressParagraph]] protocol. Claims:
  *
  *  1. a window repeated across ~1/3 of the corpus (the mega span:
  *     ~16.6k occurrences PER window hash) costs a map-side-combined
  *     COUNTER in the frequency agg, never a per-key sort/buffer —
  *     the full pass completes with flat task times;
  *  2. ingest against the persisted bucketed index computes the SAME
  *     rewrite as the inline-index form (parity, xxhash64-summed);
  *  3. ingest cost is batch-governed: cleaning a 10% batch against
  *     the standing fingerprint runs well under the full-corpus pass.
  *
  * Corpus shape per (base doc d, copy i): every 6th token of the base
  * text is tagged with the (doc, copy) id, so NO ≥6-token window of
  * content ever repeats across copies (each window contains a unique
  * tag) — all repetition is planted:
  *  - d % 3 == 0  → the 12-token MEGA span prepended (each of its
  *    5 k=8 windows ≈ 16.6k occurrences);
  *  - (d + i) % 4 == 0 → one of 16 pool spans appended (~780 each).
  *
  * Usage: runMain graft.StressSubstr [baseDir] [copies] [k]
  */
object StressSubstr {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  val Mega = "all rights reserved this page is provided as is without any warranty"

  def substrCorpus(spark: SparkSession, baseDir: String,
      copies: Int): DataFrame = {
    val base = Tables(spark, baseDir, "documents").select("doc_id", "text")
    (0 until copies).map { i =>
      val id = col("doc_id") * copies + i
      val tagged = array_join(
        transform(split(col("text"), " "), (w, wi) =>
          when(pmod(wi, lit(6)) === 0,
            concat(w, lit("t"), id.cast("string"))).otherwise(w)),
        " ")
      val withMega = when(col("doc_id") % 3 === 0,
        concat_ws(" ", lit(Mega), tagged)).otherwise(tagged)
      val withPool = when((col("doc_id") + i) % 4 === 0,
        concat_ws(" ", withMega,
          concat(lit("subscribe to the newsletter footer promo block "
            + "number "), pmod(col("doc_id") + i, lit(16)).cast("string"))))
        .otherwise(withMega)
      base.select(id.as("doc_id"), withPool.as("text"))
    }.reduce(_.unionByName(_))
  }

  /** Order-insensitive content signature for parity checks. */
  private def sig(cleaned: DataFrame): Long =
    cleaned.agg(expr(
      "bit_xor(xxhash64(doc_id, n_tokens, n_removed, text_clean))"))
      .head().getLong(0)

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 10
    val k = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val allPath = "/tmp/graft_stress_substr.parquet"
    substrCorpus(spark, baseDir, copies)
      .write.mode(SaveMode.Overwrite).parquet(allPath)
    val all = spark.read.parquet(allPath)
    val corpus = all.filter(col("doc_id") % copies =!= (copies - 1))
    val batch = all.filter(col("doc_id") % copies === (copies - 1))
    val (nCorpus, nBatch) = (corpus.count(), batch.count())

    // claim 1: the full pass over the skewed corpus (hot window ≈
    // corpus/3 occurrences on ONE hash key)
    val (fullStats, tFull) = time {
      val out = ExactSubstr.dedupSpans(all, "doc_id", "text", k)
      out.agg(count(lit(1)), sum(col("n_removed")),
        sum(when(col("n_removed") > 0, 1L).otherwise(0L))).head()
    }

    // claim 2+3: inline vs persisted-index ingest of a 10% batch
    val ((inlineSig, inlineRemoved), tInline) = time {
      val idx = ExactSubstr.buildSubstrIndex(corpus, "doc_id", "text", k)
      val out = ExactSubstr.cleanAgainstIndex(idx, batch, "doc_id", "text")
      val removed = out.agg(sum(col("n_removed"))).head().getLong(0)
      (sig(out), removed)
    }
    val idxBase = "/tmp/graft_stress_substr_idx"
    val (_, tBuild) = time(
      ExactSubstr.saveSubstrIndex(
        ExactSubstr.buildSubstrIndex(corpus, "doc_id", "text", k),
        "graft_stress_substr", idxBase))
    val loaded = ExactSubstr.loadSubstrIndex(spark, "graft_stress_substr",
      idxBase)
    val ((indexedSig, indexedRemoved), tIndexed) = time {
      val out = ExactSubstr.cleanAgainstIndex(loaded, batch, "doc_id",
        "text")
      val removed = out.agg(sum(col("n_removed"))).head().getLong(0)
      (sig(out), removed)
    }

    println(
      s"""{"stress":"substr","base":"$baseDir","copies":$copies,"k":$k,""" +
        s""""n_corpus":$nCorpus,"n_batch":$nBatch,""" +
        s""""full":{"docs":${fullStats.getLong(0)},""" +
        s""""removed":${fullStats.getLong(1)},""" +
        s""""docs_hit":${fullStats.getLong(2)},"sec":$tFull},""" +
        s""""inline":{"removed":$inlineRemoved,"sig":$inlineSig,""" +
        s""""sec":$tInline},""" +
        s""""index_build":{"sec":$tBuild},""" +
        s""""indexed":{"removed":$indexedRemoved,"sig":$indexedSig,""" +
        s""""sec":$tIndexed},""" +
        s""""parity":${inlineSig == indexedSig}}""")
    spark.stop()
  }
}
