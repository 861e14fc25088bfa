package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocabulary induction + out-of-vocabulary scoring (round-7): fix a
  * top-V corpus vocabulary (the tokenizer-building first pass) and
  * score every document by the fraction of its token INSTANCES that
  * fall outside it — the curation signal for "this doc is mostly
  * tokens the model will fragment" (code in a prose corpus, foreign
  * scripts, OCR noise).
  *
  * Scale: term counting is one map-side-combined aggregation (shuffle
  * on term); the top-V selection is a global ordered rank over the
  * TERM table (vocabulary-sized, ≪ corpus) with a deterministic
  * (count desc, term asc) tie-break; the vocab itself is V rows —
  * broadcast — so per-doc scoring is the token explode joined against
  * a broadcast hash set plus one shuffle on doc_id. Nothing
  * corpus-sized is ever ranked or broadcast.
  */
object Vocab {

  /** Top-V vocabulary: (term, n, rank), rank 1..V by corpus frequency,
    * ties broken by term ascending — deterministic on any engine. */
  def topV(docs: DataFrame, textCol: String, v: Int): DataFrame = {
    require(v > 0, "v must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("term").asc)
    docs
      .select(explode(split(lower(trim(col(textCol))), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= v)
  }

  /** Per-doc OOV report against the corpus' own top-V vocabulary:
    * (doc_id, n_tokens, n_oov, oov_rate). Exact integer counts; the
    * rate is one integer division per row. */
  def oovReport(docs: DataFrame, idCol: String, textCol: String,
      v: Int): DataFrame = {
    val vocab = topV(docs, textCol, v).select(col("term"))
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(split(lower(trim(col(textCol))), " ")).as("term"))
    toks
      .join(broadcast(vocab.withColumn("_graft_in", lit(1))),
        Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_graft_in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }

  /** Distributed BPE merge LEARNING (Sennrich et al. 2016, arXiv:
    * 1508.07909 — the algorithm behind GPT/Llama tokenizers): learn
    * `numMerges` byte-pair merges from the corpus. Returns the merge
    * table `(rank, left, right, token, freq)` in learned order — the
    * trained-tokenizer artifact ([[bpeVocab]] turns it into the
    * longest-match vocabulary [[graft.functions.BpeTok]] consumes, so
    * train → tokenize → fertility runs entirely in-engine).
    *
    * The scalable shape: the CORPUS is touched exactly ONCE — a
    * map-side-combined aggregation to the `(word, count)` relation
    * (vocabulary-sized, ≪ corpus; the classic trainer's first step) —
    * and every merge iteration runs over that small relation:
    * adjacent-pair explode → map-side-combined pair count → global
    * argmax of a pair-vocabulary-sized relation (deterministic
    * (freq desc, left asc, right asc) tie-break) → the merge applied
    * as a catalyst HIGHER-ORDER fold (`aggregate` over the symbol
    * array — left-to-right non-overlapping, the BPE application
    * rule; no UDF anywhere). The relation is locally checkpointed
    * each iteration so plan depth stays O(1), not O(merges). At
    * 100 TB the corpus scan dominates and happens once; iterations
    * cost what the (shardable) word-frequency table costs,
    * independent of corpus size.
    *
    * Word-internal merges only (no end-of-word marker), matching the
    * longest-match inference rule of `bpe_count`: every learned token
    * is a plain substring of some word. Training stops early when no
    * pair reaches `minPairFreq` (merges of hapax pairs memorize
    * noise). */
  def trainBpe(docs: DataFrame, textCol: String, numMerges: Int,
      minPairFreq: Long = 2L): DataFrame = {
    require(numMerges > 0, "numMerges must be positive")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    var syms = words
      .select(split(col("w"), "").as("syms"), col("cnt"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var rank = 1L
    var done = false
    while (rank <= numMerges && !done) {
      val best = syms
        .select(explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1).as("l"),
          slice(col("syms"), lit(2), size(col("syms")) - 1).as("r")))
          .as("p"), col("cnt"))
        .select(col("p.l").as("a"), col("p.r").as("b"), col("cnt"))
        .groupBy("a", "b").agg(sum("cnt").as("freq"))
        .orderBy(col("freq").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty || best.head.getLong(2) < minPairFreq) done = true
      else {
        val (a, b, f) =
          (best.head.getString(0), best.head.getString(1),
            best.head.getLong(2))
        val ab = a + b
        merges += ((rank, a, b, ab, f))
        // left-to-right non-overlapping replacement of (a, b) → ab,
        // as a pure catalyst fold — literals bind as expressions, so
        // corpus tokens containing quotes are safe
        val fold = aggregate(col("syms"),
          array().cast("array<string>"),
          (acc, x) => when(size(acc) > 0 &&
              element_at(acc, -1) === lit(a) && x === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(ab))))
            .otherwise(concat(acc, array(x))))
        syms = syms.select(fold.as("syms"), col("cnt")).localCheckpoint()
        rank += 1
      }
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      merges.toSeq.map(m => org.apache.spark.sql.Row(
        m._1, m._2, m._3, m._4, m._5)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("left",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("right",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("token",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("freq",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** The longest-match inference vocabulary of a trained merge table:
    * every merge token (driver-side — `numMerges` strings). Single
    * characters need no entry: `bpe_count` already falls back to one
    * character when nothing matches, so base symbols are implicit. */
  def bpeVocab(merges: DataFrame): Seq[String] =
    merges.orderBy("rank").select("token").collect()
      .map(_.getString(0)).toSeq
}
