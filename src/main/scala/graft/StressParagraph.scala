package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Paragraph

/** Scale-stress for the PARAGRAPH dedup family (not part of the driver
  * contract): sf1-scale corpus (10× sf0.1 documents ≈ 50k docs) given
  * explicit paragraph structure with PLANTED boilerplate at ~25–30%
  * incidence, mirroring the [[StressDedup]]/[[StressIncremental]]
  * protocol. The claims under test:
  *
  *  1. the df join's hot keys really are "exactly the df being
  *     measured" (PLANS.md round-8): the hottest planted paragraph
  *     lands in ~1/3 of docs (~16k rows on ONE join key) — the skew
  *     case a 100 TB run hits on nav chrome / license headers;
  *  2. ingest against the persisted bucketed index computes the SAME
  *     survivors as the inline-index form (parity, xxhash64-summed
  *     over (doc_id, n_dropped, text_clean));
  *  3. ingest cost is batch-governed: cleaning a 10% batch against
  *     the standing index runs well under the full-corpus re-dedup.
  *
  * Corpus shape per (base doc d, copy i): the base text's words are
  * cut into 4 content paragraphs, each tagged with its copy+doc id
  * (df = 1 by construction); then
  *  - d % 3 == 0  → the MEGA boilerplate paragraph (one fixed string,
  *    df ≈ 16.6k) is prepended;
  *  - (d + i) % 4 == 0 → one of 16 pool-A boilerplates appended
  *    (df ≈ 780 each);
  *  - (d + i) % 10 == 0 → one of 4 pool-B boilerplates appended
  *    (df ≈ 1.2k each).
  *
  * Usage: runMain graft.StressParagraph [baseDir] [copies] [maxDf]
  */
object StressParagraph {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  val Mega = "all rights reserved this page is provided as is without warranty of any kind either express or implied"

  def paragraphCorpus(spark: SparkSession, baseDir: String,
      copies: Int): DataFrame = {
    val base = Tables(spark, baseDir, "documents").select("doc_id", "text")
    (0 until copies).map { i =>
      val id = col("doc_id") * copies + i
      // 4 content paragraphs: word w goes to paragraph w mod 4, each
      // paragraph tagged per (doc, copy) so its corpus df is exactly 1
      val contentParas = transform(sequence(lit(0), lit(3)), p =>
        concat(
          array_join(
            filter(transform(split(col("text"), " "),
              (w, wi) => when(pmod(wi, lit(4)) === p, w)),
              x => x.isNotNull),
            " "),
          lit(" t"), id.cast("string"), lit("c"), p.cast("string")))
      val withMega = when(col("doc_id") % 3 === 0,
        concat(array(lit(Mega)), contentParas)).otherwise(contentParas)
      val withA = when((col("doc_id") + i) % 4 === 0,
        concat(withMega,
          array(concat(lit("poolA boilerplate navigation chrome block "),
            pmod(col("doc_id") + i, lit(16)).cast("string")))))
        .otherwise(withMega)
      val withB = when((col("doc_id") + i) % 10 === 0,
        concat(withA,
          array(concat(lit("poolB subscribe footer promo block "),
            pmod(col("doc_id") + i, lit(4)).cast("string")))))
        .otherwise(withA)
      base.select(id.as("doc_id"),
        array_join(withB, "\n\n").as("text"))
    }.reduce(_.unionByName(_))
  }

  /** Order-insensitive content signature for parity checks (xor-fold
    * of per-row hashes — overflow-free under ANSI). */
  private def sig(cleaned: DataFrame): Long =
    cleaned.agg(expr(
      "bit_xor(xxhash64(doc_id, n_paragraphs, n_dropped, text_clean))"))
      .head().getLong(0)

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 10
    val maxDf = if (args.length > 2) args(2).toLong else 5L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val allPath = "/tmp/graft_stress_para.parquet"
    paragraphCorpus(spark, baseDir, copies)
      .write.mode(SaveMode.Overwrite).parquet(allPath)
    val all = spark.read.parquet(allPath)
    val corpus = all.filter(col("doc_id") % copies =!= (copies - 1))
    val batch = all.filter(col("doc_id") % copies === (copies - 1))
    val (nCorpus, nBatch) = (corpus.count(), batch.count())

    // full-corpus re-dedup (the non-incremental alternative)
    val (fullStats, tFull) = time {
      val out = Paragraph.dedupParagraphs(all, "doc_id", "text", maxDf)
      out.agg(count(lit(1)), sum(col("n_dropped"))).head()
    }

    // inline-index ingest: corpus df relation derived per run
    val ((inlineSig, inlineDropped), tInline) = time {
      val idx = Paragraph.buildParagraphIndex(corpus, "doc_id", "text")
      val out = Paragraph.cleanAgainstIndex(idx, batch, "doc_id", "text",
        maxDf)
      val dropped = out.agg(sum(col("n_dropped"))).head().getLong(0)
      (sig(out), dropped)
    }

    // persisted-index ingest: bucketed on-disk df relation, probed only
    val idxBase = "/tmp/graft_stress_para_idx"
    val (_, tBuild) = time(
      Paragraph.saveParagraphIndex(
        Paragraph.buildParagraphIndex(corpus, "doc_id", "text"),
        "graft_stress_para", idxBase))
    val loaded = Paragraph.loadParagraphIndex(spark, "graft_stress_para",
      idxBase)
    val ((indexedSig, indexedDropped), tIndexed) = time {
      val out = Paragraph.cleanAgainstIndex(loaded, batch, "doc_id",
        "text", maxDf)
      val dropped = out.agg(sum(col("n_dropped"))).head().getLong(0)
      (sig(out), dropped)
    }

    println(
      s"""{"stress":"paragraph","base":"$baseDir","copies":$copies,""" +
        s""""max_df":$maxDf,"n_corpus":$nCorpus,"n_batch":$nBatch,""" +
        s""""full":{"docs":${fullStats.getLong(0)},""" +
        s""""dropped":${fullStats.getLong(1)},"sec":$tFull},""" +
        s""""inline":{"dropped":$inlineDropped,"sig":$inlineSig,""" +
        s""""sec":$tInline},""" +
        s""""index_build":{"sec":$tBuild},""" +
        s""""indexed":{"dropped":$indexedDropped,"sig":$indexedSig,""" +
        s""""sec":$tIndexed},""" +
        s""""parity":${inlineSig == indexedSig}}""")
    spark.stop()
  }
}
