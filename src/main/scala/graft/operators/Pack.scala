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

  /** The packed token STREAM itself (round-9): where [[sequences]]
    * assigns each doc its shard bookkeeping, this emits the artifact a
    * training job consumes — per (group, shard) the concatenated
    * token-id array, cut every `maxTokens` ids, docs straddling shard
    * boundaries split mid-array exactly like a real token stream.
    * `tokensCol` is an `array<bigint>` of ids (plug in
    * `bpe_tokens(text, vocab)` — [[graft.functions.BpeTokens]]);
    * `orderCol` must totally order each group.
    *
    * Every shard but each group's last holds exactly `maxTokens` ids,
    * and flattening a group's shards in shard_ix order reproduces the
    * concatenation of its docs' arrays in `orderCol` order (the
    * reassembly invariant — tested).
    *
    * Scale: the same per-group window cumsum as [[sequences]] (group
    * parallelism, never a global order), then ONE generator expression
    * per doc exploding it into its straddled shards (rows out = docs +
    * boundary crossings, each carrying only its in-shard slice), then
    * one aggregation keyed (group, shard) whose state is bounded by
    * `maxTokens` ids — shard assembly shuffles token ids once and
    * holds ≤ one shard per aggregation state. Integer arithmetic
    * end-to-end; deterministic and oracle-reproducible. */
  def packedShards(df: DataFrame, groupCol: String, orderCol: String,
      tokensCol: String, maxTokens: Long): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
    df.select(col(groupCol), col(orderCol), col(tokensCol).as("_toks"))
      .withColumn("_n", size(col("_toks")).cast("long"))
      .filter(col("_n") > 0)
      .withColumn("_start",
        coalesce(sum(col("_n")).over(w) - col("_n"), lit(0L)).cast("long"))
      .withColumn("shard_ix",
        explode(sequence(expr(s"_start div ${maxTokens}L"),
          expr(s"(_start + _n - 1) div ${maxTokens}L"))))
      // the doc's ids covering [shard_ix·max, (shard_ix+1)·max) ∩
      // [_start, _start+_n), re-based 1-relative into _toks
      .withColumn("_from",
        greatest(col("shard_ix") * maxTokens, col("_start")))
      .withColumn("_until",
        least((col("shard_ix") + 1) * maxTokens, col("_start") + col("_n")))
      .withColumn("_piece", slice(col("_toks"),
        (col("_from") - col("_start") + 1).cast("int"),
        (col("_until") - col("_from")).cast("int")))
      .groupBy(col(groupCol), col("shard_ix"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("_from"), col("_piece")))),
        s => s.getField("_piece"))).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
      .select(col(groupCol), col("shard_ix"), col("n_tokens"),
        col("tokens"))
  }

  /** Best-fit-decreasing shard packing (round-13) — the OTHER standard
    * training-shard policy beside [[sequences]]' concat-and-chunk:
    * docs are never split across shards; within each group they are
    * placed largest-first into the open shard whose remaining
    * capacity fits them most tightly (classic BFD, within 11/9·OPT+1
    * of the optimal shard count), opening a new shard only when none
    * fits. Curation pipelines choose per dataset: concat-and-chunk
    * fills every shard exactly but splits documents mid-stream; BFD
    * keeps each document whole at the cost of per-shard padding —
    * which this operator makes measurable (`maxTokens − sum(n_tokens)`
    * per shard).
    *
    * Output: one row per input doc — (group, order, n_tokens,
    * shard_ix), deterministic given `orderCol` totally ordering each
    * group (ties in size break by it).
    *
    * Scale: bin packing is inherently sequential WITHIN a group, so
    * the shape is the secondary-sort recipe — one hash exchange on the
    * group column, an in-partition sort by (group, size desc, order),
    * then a streaming per-group fold whose state is the open shards'
    * remaining capacities (a TreeSet, O(shards-per-group)), never the
    * docs. Parallelism = number of groups, the same envelope as
    * [[sequences]]' per-group window — and like [[graft.operators
    * .Dsir.featureCounts]], the imperative fold is a documented
    * compiled-beats-interpreted boundary: no declarative operator
    * expresses tightest-fit placement. A doc longer than `maxTokens`
    * cannot be placed whole and refuses loudly. */
  def bestFitShards(df: DataFrame, groupCol: String, orderCol: String,
      tokensCol: String, maxTokens: Long): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val out = StructType(Seq(
      df.schema(groupCol), df.schema(orderCol),
      StructField("n_tokens", LongType, nullable = false),
      StructField("shard_ix", LongType, nullable = false)))
    df.select(col(groupCol), col(orderCol),
        col(tokensCol).cast("long").as("_n"))
      .repartition(col(groupCol))
      .sortWithinPartitions(col(groupCol), col("_n").desc, col(orderCol))
      .mapPartitions { rows =>
        var curGroup: Any = null
        var started = false
        // open shards as (remaining, shard_ix), ordered ascending —
        // rangeFrom((n, MIN)) yields the TIGHTEST fit, ties to the
        // lowest shard index (deterministic)
        var open = scala.collection.immutable.TreeSet.empty[(Long, Long)]
        var nShards = 0L
        rows.map { r =>
          val g = r.get(0)
          if (!started || g != curGroup) {
            curGroup = g; started = true
            open = scala.collection.immutable.TreeSet.empty[(Long, Long)]
            nShards = 0L
          }
          if (r.isNullAt(2)) throw new IllegalArgumentException(
            s"bestFitShards: null in token-count column '$tokensCol' " +
              s"(order ${r.get(1)}) — fill or filter null sizes first")
          val n = r.getLong(2)
          if (n > maxTokens) throw new IllegalArgumentException(
            s"bestFitShards: a document of $n tokens cannot be placed " +
              s"whole under maxTokens=$maxTokens — filter or chunk it " +
              "first (docs are never split here)")
          val ix = open.rangeFrom((n, Long.MinValue)).headOption match {
            case Some((rem, i)) =>
              open = open - ((rem, i)) + ((rem - n, i)); i
            case None =>
              val i = nShards; nShards += 1
              open = open + ((maxTokens - n, i)); i
          }
          Row(g, r.get(1), n, ix)
        }
      }(org.apache.spark.sql.Encoders.row(out))
  }

  /** The best-fit shards MATERIALIZED (the [[packedShards]] analog for
    * [[bestFitShards]]): one row per (group, shard) carrying the
    * shard's fill, its padding against the budget — THE metric a
    * curation pipeline compares against concat-and-chunk when
    * choosing a policy — and the docs' `payloadCol` values in
    * PLACEMENT order (size desc, then `orderCol`; deterministic).
    * Payload is caller-chosen: token-id arrays for a training
    * artifact, doc ids for a manifest, text for an audit.
    *
    * Scale: [[bestFitShards]]' fold (one group exchange), one
    * payload join back on (group, order), one (group, shard)-keyed
    * aggregation whose state is bounded by the shard budget. */
  def bestFitPacked(df: DataFrame, groupCol: String, orderCol: String,
      tokensCol: String, payloadCol: String, maxTokens: Long): DataFrame = {
    val assigned = bestFitShards(df, groupCol, orderCol, tokensCol,
      maxTokens)
    // The payload joins back on (group, order); a duplicated order
    // value would silently fan the join out (inflating n_docs / fill
    // / payloads while bestFitShards placed each input row
    // separately). Refuse loudly instead — mirroring applyChanges'
    // dupKeys guard — by aggregating the payload side to unique keys
    // and raising on any key seen twice. The aggregation hashes on
    // the same (group, order) keys the join needs, so the exchange
    // is shared, not added.
    val payload = df
      .groupBy(col(groupCol), col(orderCol))
      .agg(count(lit(1)).as("_n"), first(col(payloadCol)).as(payloadCol))
      .select(col(groupCol), col(orderCol),
        when(col("_n") > 1, raise_error(format_string(
          s"bestFitPacked: duplicate ($groupCol, $orderCol) key " +
            "(%s, %s) — the payload join would silently fan out; " +
            "de-duplicate the order column first",
          col(groupCol).cast("string"), col(orderCol).cast("string"))))
          .otherwise(col(payloadCol)).as(payloadCol))
    assigned
      .join(payload, Seq(groupCol, orderCol))
      .groupBy(col(groupCol), col("shard_ix"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("fill"),
        (lit(maxTokens) - sum(col("n_tokens"))).as("padding"),
        transform(
          array_sort(collect_list(struct((-col("n_tokens")).as("_negn"),
            col(orderCol).as("_ord"), col(payloadCol).as("_p")))),
          s => s.getField("_p")).as("payloads"))
  }
}
