package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking (round-4, §2d) — cut each document's token stream
  * into fixed-size overlapping windows, the step that turns curated
  * documents into model-sized training chunks (the per-document
  * complement of [[Pack.sequences]], which packs across documents).
  *
  * Chunk i covers tokens [i·stride, i·stride + chunkTokens) where
  * stride = chunkTokens − overlapTokens; chunks are emitted while their
  * start is inside the document, so the tail chunk may be short and a
  * doc shorter than one window still yields exactly one chunk.
  *
  * Scale: a narrow codegen'd projection + explode — no shuffle, no
  * state; the row-explosion factor is ~tokens/stride and each output
  * row carries only its own window, so the operator streams at scan
  * speed on any corpus size and parallelism is inherited from the
  * input partitioning. Integer arithmetic end-to-end (`div`, not `/`)
  * keeps chunk boundaries exact and oracle-reproducible.
  */
object Chunk {

  /** Output: (idCol, chunk_ix, chunk_text, chunk_tokens) — one row per
    * window. Whitespace tokenization, lowercased, matching the corpus
    * conventions of [[TextOps]]/[[Dedup]]. */
  def fixedWindows(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      "overlapTokens must be in [0, chunkTokens)")
    val stride = chunkTokens - overlapTokens
    df.select(col(idCol), col(textCol))
      .withColumn("_w", split(lower(trim(col(textCol))), " "))
      .withColumn("_n", size(col("_w")).cast("long"))
      // last chunk index = (n−1) div stride; split("") = [""] so _n ≥ 1
      // and the sequence is never empty/descending (Spark's sequence
      // counts DOWN when start > stop — guarded by construction here)
      .withColumn("_last", expr(s"(_n - 1L) div ${stride}L"))
      .select(col(idCol), col("_w"), col("_n"),
        explode(sequence(lit(0L), col("_last"))).as("chunk_ix"))
      .select(
        col(idCol),
        col("chunk_ix"),
        array_join(
          slice(col("_w"), sliceStart(col("chunk_ix"), stride),
            lit(chunkTokens)), " ").as("chunk_text"),
        least(lit(chunkTokens.toLong),
          col("_n") - col("chunk_ix") * stride).as("chunk_tokens"))
  }

  /** Guarded 1-based slice start: chunk_ix·stride + 1 as int. `slice`
    * takes an Int position, so a document past ~2^31 tokens cannot be
    * windowed by position — fail LOUDLY (raise_error) instead of
    * letting the cast wrap negative and return wrong windows; such a
    * doc must be pre-split upstream. */
  private[graft] def sliceStart(chunkIx: org.apache.spark.sql.Column,
      stride: Long): org.apache.spark.sql.Column = {
    val start = chunkIx * stride + lit(1L)
    when(start <= lit(Int.MaxValue.toLong), start.cast("int"))
      .otherwise(raise_error(concat(
        lit("Chunk.fixedWindows: window start "), start.cast("string"),
        lit(" overflows Int (document exceeds 2^31 tokens) — pre-split the document"))))
  }
}
