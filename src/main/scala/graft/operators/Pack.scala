package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing (round-3 addition, §2c) — assign documents to
  * fixed-token-budget training shards, the "concatenate and chunk"
  * step that turns a curated corpus into pretraining sequences: docs
  * are laid out in a deterministic order, the token stream is cut
  * every `maxTokens`, and each doc learns which shard its first token
  * lands in and at what offset.
  *
  * Scale: one shuffle on the group column; the running total is a
  * window cumsum WITHIN each group, so parallelism = number of groups
  * (shard-assignment for a 100 TB corpus runs per source/date/bucket
  * partition, never through a single global window — a global total
  * order would serialize the whole corpus through one task). Integer
  * arithmetic end-to-end: deterministic and oracle-reproducible.
  */
object Pack {

  /** Adds (shard_ix, shard_offset): the 0-based shard (within the
    * group) holding the doc's first token, and the token offset inside
    * that shard. `orderCol` must be a total order within each group
    * (append a unique id tie-break if needed) — determinism comes from
    * it. Docs longer than `maxTokens` straddle shards (their tail
    * flows into following shards, like a real token stream). */
  def sequences(df: DataFrame, groupCol: Column, orderCol: Column,
      tokensCol: Column, maxTokens: Long): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
    df.withColumn("_start",
        coalesce(sum(tokensCol).over(w) - tokensCol, lit(0L)).cast("long"))
      // `div` is Spark SQL's INTEGRAL division (ADVICE r3): `/` on
      // bigint is double division, whose quotient can round across an
      // integer boundary once cumulative tokens pass ~2^52, diverging
      // from the oracle's exact `//`. `_start` is our own column and
      // maxTokens a validated literal — no caller text reaches the SQL.
      .withColumn("shard_ix", expr(s"_start div ${maxTokens}L"))
      .withColumn("shard_offset", pmod(col("_start"), lit(maxTokens))
        .cast("long"))
      .drop("_start")
  }
}
