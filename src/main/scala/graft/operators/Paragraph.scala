package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Paragraph-level exact dedup (round-8): drop REPEATED SPANS inside
  * documents — the boilerplate pass of a training-data pipeline
  * (nav chrome, license headers, syndicated disclaimers repeated
  * across thousands of otherwise-distinct pages). The whole-doc dedup
  * family ([[Dedup]]) cannot see these: two docs sharing one
  * boilerplate paragraph are far below any whole-doc τ. This is the
  * exact-match form of Lee et al. 2021's repeated-substring removal
  * (arXiv:2107.06499) restricted to delimiter-aligned spans — fully
  * oracle-expressible, no distributed suffix array.
  *
  * Pipeline: split each doc on `splitRegex` (default blank lines) →
  * whitespace-normalized paragraph → per-paragraph document frequency
  * (distinct docs containing it) → rewrite each doc keeping only
  * paragraphs with df ≤ maxDf, preserving paragraph order.
  *
  * Scale: the explode is paragraph-count-sized (≈ the corpus itself);
  * the df relation is paragraph-VOCABULARY-sized with map-side
  * combine, equi-joined back on the normalized paragraph (hash
  * shuffle — at 100 TB the hot keys are exactly the boilerplate
  * paragraphs, whose per-key row count is the df being measured;
  * reduce-side work per key is a counter, not a buffer). The doc
  * rebuild shuffles once on doc_id and buffers one DOCUMENT per group
  * (collect_list of its own paragraphs) — bounded by max doc length,
  * the same envelope every whole-doc operator already assumes. */
object Paragraph {

  private def guard(docs: DataFrame): Unit =
    Seq("_pos", "_para", "_df", "_keep",
      "n_paragraphs", "n_dropped", "text_clean").foreach(c =>
      require(!docs.columns.contains(c),
        s"input column $c collides with paragraph-dedup internals; rename it first"))

  /** (doc_id, _pos, _para): each doc's non-empty normalized paragraphs
    * in order. */
  private def parts(docs: DataFrame, idCol: String, textCol: String,
      splitRegex: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), splitRegex)).as(Seq("_pos", "_raw")))
      .select(col("doc_id"), col("_pos").cast("long").as("_pos"),
        Dedup.normalized(col("_raw")).as("_para"))
      .filter(col("_para") =!= "")

  /** Rebuild one row per input doc from flagged paragraphs
    * (doc_id, _pos, _para, _keep): counts + kept text in order; docs
    * with no non-empty paragraphs (or all dropped) report zeros and
    * empty text. */
  private def rebuild(flagged: DataFrame, docs: DataFrame, idCol: String,
      joiner: String): DataFrame = {
    val agg = flagged
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_paragraphs"),
        sum(when(col("_keep"), 0L).otherwise(1L)).as("n_dropped"),
        array_join(
          transform(
            filter(
              array_sort(collect_list(
                struct(col("_pos"), col("_keep"), col("_para")))),
              x => x.getField("_keep")),
            x => x.getField("_para")),
          joiner).as("text_clean"))
    docs.select(col(idCol).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_paragraphs"), lit(0L)).as("n_paragraphs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** Rewrite docs dropping paragraphs shared by more than `maxDf`
    * distinct documents. Output: one row per input doc —
    * (doc_id, n_paragraphs, n_dropped, text_clean) where n_paragraphs
    * counts the doc's non-empty normalized paragraphs, n_dropped the
    * ones removed, and text_clean re-joins the kept paragraphs (in
    * order, normalized) with `joiner`. */
  def dedupParagraphs(docs: DataFrame, idCol: String, textCol: String,
      maxDf: Long, splitRegex: String = "\\n\\s*\\n",
      joiner: String = "\n\n"): DataFrame = {
    require(maxDf >= 1, "maxDf must be at least 1")
    guard(docs)
    val p = parts(docs, idCol, textCol, splitRegex)
    val dfCounts = p.select(col("_para"), col("doc_id")).distinct()
      .groupBy(col("_para")).agg(count(lit(1)).as("_df"))
    rebuild(
      p.join(dfCounts, Seq("_para"))
        .withColumn("_keep", col("_df") <= maxDf),
      docs, idCol, joiner)
  }

  /** The standing corpus' paragraph document-frequency relation:
    * (ph = md5 of the normalized paragraph, df = distinct corpus docs
    * containing it) plus the split regex it was derived under — like
    * [[Dedup.DedupIndex]], the parameter travels WITH the relation
    * because a probe split differently would silently match nothing.
    * md5 keys keep the persisted relation narrow (no paragraph text
    * on disk) and make the probe join key fixed-width. */
  final case class ParagraphIndex(dfs: DataFrame, splitRegex: String)

  /** Derive a [[ParagraphIndex]] from a corpus — one paragraph explode
    * + one map-side-combined distinct-doc count. */
  def buildParagraphIndex(corpus: DataFrame, idCol: String,
      textCol: String, splitRegex: String = "\\n\\s*\\n")
      : ParagraphIndex = {
    guard(corpus)
    val dfs = parts(corpus, idCol, textCol, splitRegex)
      .select(md5(col("_para")).as("ph"), col("doc_id")).distinct()
      .groupBy(col("ph")).agg(count(lit(1)).as("df"))
    ParagraphIndex(dfs, splitRegex)
  }

  /** Persist/load a [[ParagraphIndex]] as a parquet table bucketed by
    * the probe key ([[graft.sources.BucketedTables]]); the split regex
    * rides in the meta table so a probe can never run under a
    * different segmentation than the index was built with. */
  def saveParagraphIndex(index: ParagraphIndex, prefix: String,
      path: String, nBuckets: Int = 64): Unit = {
    val s = index.dfs.sparkSession
    graft.sources.BucketedTables.save(index.dfs, s"${prefix}_paradf",
      s"$path/paradf", Seq("ph"), nBuckets)
    import s.implicits._
    Seq((index.splitRegex, nBuckets)).toDF("split_regex", "n_buckets")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  def loadParagraphIndex(s: org.apache.spark.sql.SparkSession,
      prefix: String, path: String): ParagraphIndex = {
    val meta = s.read.parquet(s"$path/meta").head()
    ParagraphIndex(
      dfs = graft.sources.BucketedTables.load(s, s"${prefix}_paradf",
        s"$path/paradf", "ph STRING, df BIGINT", Seq("ph"),
        meta.getAs[Int]("n_buckets")),
      splitRegex = meta.getAs[String]("split_regex"))
  }

  /** Daily-ingest form: rewrite an ARRIVING batch dropping paragraphs
    * the CORPUS already knows as boilerplate (corpus df > maxDf) —
    * batch-internal repetition is deliberately not counted here (it
    * becomes corpus knowledge when the batch is folded in and the
    * index refreshed, the same static-index contract as
    * [[Dedup.incrementalCleanIndexed]]). The corpus contributes only
    * its (ph, df) relation — bucketed on the probe key when loaded
    * from [[saveParagraphIndex]], so nothing corpus-sized shuffles per
    * ingest. Output shape identical to [[dedupParagraphs]]. */
  def cleanAgainstIndex(index: ParagraphIndex, batch: DataFrame,
      idCol: String, textCol: String, maxDf: Long,
      joiner: String = "\n\n"): DataFrame = {
    require(maxDf >= 1, "maxDf must be at least 1")
    guard(batch)
    val flagged = parts(batch, idCol, textCol, index.splitRegex)
      .withColumn("ph", md5(col("_para")))
      .join(index.dfs, Seq("ph"), "left")
      .withColumn("_keep", col("df").isNull || col("df") <= maxDf)
    rebuild(flagged, batch, idCol, joiner)
  }
}
