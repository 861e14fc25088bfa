package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.quality.Rule

/** Structured Streaming operators (SURVEY.md §2.9) — streaming forms of
  * the batch event-window (#11) and sessionization (#12) queries.
  *
  * The transforms are written against plain DataFrames/Datasets so the
  * SAME code runs in batch (unit-testable, oracle-comparable) and
  * streaming (`readStream` source + watermark): Spark's unified model.
  *
  * Scale: the windowed agg is a streaming state-store agg keyed by
  * (window, event_type) — state is bounded by the watermark; the
  * sessionizer keys state by user_id and expires via event-time timeout,
  * so state size is O(active users), not O(events).
  */
final case class Event(
    event_id: Long, ts: Timestamp, user_id: Long, event_type: String,
    value: Double)

final case class SessionOut(
    user_id: Long, session_start: Timestamp, session_end: Timestamp,
    n_events: Long, total_value: Double)

private final case class SessionState(
    start: Long, last: Long, n: Long, total: Double)

object Streaming {

  /** #42 — watermarked tumbling-window aggregation. Apply to a
    * `readStream` DataFrame for streaming or a batch DataFrame for
    * testing; identical results where no late data is dropped. */
  def windowedEventCounts(events: DataFrame,
      watermark: String = "2 hours",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Trending terms per tumbling window (round-4, §2d): the streaming
    * token-count surface of the text family — explode tokens, count
    * per (window, term), drop the sub-`minCount` tail so the emitted
    * per-window vocabulary stays bounded. Same code runs in batch for
    * the oracle comparison; [[trendingTopK]] / [[trendingTopKStream]]
    * rank the closed windows top-k.
    * State is one counter per (open window, term) — watermark-bounded;
    * on real feeds pair with [[graft.functions.MisraGriesAgg]] in
    * foreachBatch when the per-window vocabulary itself is too wide.
    * Expects a `ts` timestamp column. */
  def windowedTermCounts(docs: DataFrame, textCol: String = "text",
      watermark: String = "2 hours", windowLen: String = "1 hour",
      minCount: Long = 1L): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .select(col("ts"),
        explode(split(lower(trim(col(textCol))), " ")).as("term"))
      .groupBy(window(col("ts"), windowLen), col("term"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("term"), col("n"))

  /** Rank a (window_start, window_end, term, n) count table top-k per
    * window: row_number ordered by (n desc, term asc), kept ≤ k — the
    * ranking [[windowedTermCounts]]'s doc promises. Deterministic
    * tie-break on term so batch and streaming agree bit-for-bit. */
  def rankWindows(counts: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start"))
      .orderBy(col("n").desc, col("term").asc)
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Batch form of trending top-k: [[windowedTermCounts]] →
    * [[rankWindows]]. One shuffle for the count, one window pass for
    * the rank (WindowGroupLimit-capped — per-task state is O(k)). */
  def trendingTopK(docs: DataFrame, textCol: String = "text",
      k: Int = 10, watermark: String = "2 hours",
      windowLen: String = "1 hour", minCount: Long = 1L): DataFrame =
    rankWindows(
      windowedTermCounts(docs, textCol, watermark, windowLen, minCount), k)

  /** Streaming form of trending top-k. A ranking cannot follow a
    * streaming aggregation inside one query (non-time-window agg on
    * agg is unsupported), so the counts run in Append mode — a
    * window's rows are all emitted together in the micro-batch where
    * the watermark closes it — and each micro-batch is ranked with the
    * SAME [[rankWindows]] the batch path uses before reaching `sink`.
    * Call `.start()` on the returned writer. */
  def trendingTopKStream(docs: DataFrame, textCol: String = "text",
      k: Int = 10, watermark: String = "2 hours",
      windowLen: String = "1 hour", minCount: Long = 1L)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    scoreClosedWindows(
      windowedTermCounts(docs, textCol, watermark, windowLen, minCount))(
      batch => rankWindows(batch, k))(sink)

  /** The shared monitor shape: a watermarked windowed aggregation runs
    * in Append mode (a window's rows all emit in the micro-batch where
    * the watermark closes it) and each micro-batch is re-scored with
    * the SAME batch-path transform before reaching `sink` — the
    * pattern behind [[trendingTopKStream]], [[driftMonitorStream]] and
    * [[anomalyMonitorStream]], where the scoring step (a rank, a PSI
    * fold, a k-sigma flag) cannot legally follow a streaming
    * aggregation inside one query. Call `.start()` on the returned
    * writer. */
  def scoreClosedWindows(windowed: DataFrame)(
      score: DataFrame => DataFrame)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    windowed.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(score(batch.toDF()), id)
      }

  /** First-seen-wins per key: watermark-bounded streaming state
    * (`dropDuplicatesWithinWatermark` — duplicates farther apart than
    * the watermark may BOTH survive, the tradeoff that keeps state
    * O(keys per watermark window) on an unbounded feed), or a
    * deterministic (ts, doc_id)-ordered window in batch (plain
    * dropDuplicates keeps an ARBITRARY row, which would not match
    * replaying a time-ordered stream). Expects (doc_id, ts, <key>).
    *
    * SURVIVOR-SET CAVEAT: the streaming branch keeps the first row to
    * ARRIVE per key, the batch branch the min-(ts, doc_id) row. With
    * out-of-order arrival inside the watermark the streaming survivor
    * can therefore be a LATER-timestamped doc than batch would keep —
    * the duplicate is still dropped, only which copy survives differs.
    * Callers needing batch-replay parity of survivor IDENTITY on
    * out-of-order feeds must keep min-ts state themselves
    * (flatMapGroupsWithState emitting on watermark expiry), trading
    * per-key buffering and emission latency for it. */
  private def firstSeenPerKey(df: DataFrame, keyCol: String,
      watermark: String): DataFrame =
    if (df.isStreaming)
      df.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keyCol)
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(keyCol))
        .orderBy(col("ts").asc, col("doc_id").asc)
      df.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
    }

  /** Streaming exact-dedup (the streaming form of
    * [[graft.operators.Dedup.exact]]): first-seen wins per content hash
    * (normalize → md5), state bounded by the watermark
    * ([[firstSeenPerKey]] — see its caveat: on out-of-order feeds the
    * streaming survivor is the first-ARRIVED copy, not the min-ts one).
    * Output: (doc_id, ts, content_hash), one row per first-seen
    * content. */
  def dedupExact(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, watermark: String = "1 hour"): DataFrame =
    firstSeenPerKey(
      docs.select(
        col(idCol).as("doc_id"), col(tsCol).as("ts"),
        md5(graft.operators.Dedup.normalized(col(textCol)))
          .as("content_hash")),
      "content_hash", watermark)

  /** Streaming identical-signature dedup: drop any doc whose 64-bit
    * SimHash equals one seen inside the watermark (hamming distance 0
    * ONLY — the hamming ≤ k neighborhood of the batch pipeline
    * ([[graft.operators.Dedup.simhashPairs]]) needs a join and is not
    * expressible as streaming dedup state). SimHash is a bag-of-tokens
    * vote, so token-reordered boilerplate collapses where exact dedup
    * would not; 64-bit collisions across genuinely different docs are
    * possible. Use it as the cheap in-flight filter in front of the
    * batch near-dup pipeline, not as ground truth. Same
    * watermark-bounded state contract as [[dedupExact]], including the
    * [[firstSeenPerKey]] first-arrived-vs-min-ts survivor caveat. */
  def dedupSimhash(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, watermark: String = "1 hour"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    firstSeenPerKey(
      docs.select(col(idCol).as("doc_id"), col(tsCol).as("ts"),
        col(textCol).as("_text"))
        .select(col("doc_id"), col("ts"),
          expr("simhash64(split(lower(trim(_text)), ' '))").as("simhash")),
      "simhash", watermark)
  }

  /** Streaming quality monitor: the QualityValidator counters
    * ([[graft.quality.QualityValidator.validate]] — checked/failed per
    * rule) as a watermarked tumbling-window aggregation. One state-store
    * row per window with map-side partial aggregation, so an unbounded
    * feed gets per-window quality scores with O(open windows) state.
    * The SAME `Rule` predicates drive the batch gate and this monitor.
    * Output per window: n_rows plus (checked_<id>, failed_<id>) per
    * rule. */
  def windowedQuality(df: DataFrame, tsCol: String, rules: Seq[Rule],
      watermark: String = "2 hours",
      windowLen: String = "1 hour"): DataFrame = {
    val counters: Seq[Column] = count(lit(1)).as("n_rows") +:
      rules.flatMap { r =>
        Seq(
          sum(when(r.applicable, 1L).otherwise(0L))
            .as(s"checked_${r.ruleId}"),
          sum(when(r.applicable && r.fails, 1L).otherwise(0L))
            .as(s"failed_${r.ruleId}"))
      }
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(counters.head, counters.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }

  /** Per-window (feature, bucket) counts for the PSI drift monitor —
    * the SAME code runs in batch (oracle-comparable) and streaming
    * (watermarked state-store agg, state = one counter per open
    * (window, feature, bucket)). `edges` is [[graft.operators.Drift
    * .numericEdges]] over the REFERENCE (a one-row static frame; the
    * stream-static cross join broadcasts it), so bucket boundaries
    * never move with the data under test. */
  def windowedFeatureCounts(df: DataFrame, tsCol: String,
      numeric: Seq[(String, Int)], categorical: Seq[String],
      edges: DataFrame, watermark: String = "2 hours",
      windowLen: String = "1 hour"): DataFrame = {
    val withEdges =
      if (numeric.isEmpty) df else df.crossJoin(broadcast(edges))
    withEdges
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), explode(array(
        graft.operators.Drift.featureStructs(numeric, categorical): _*))
        .as("_f"))
      .groupBy(window(col(tsCol), windowLen),
        col("_f.feature").as("feature"), col("_f.bucket").as("bucket"))
      .agg(count(lit(1)).as("cur_cnt"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("feature"), col("bucket"), col("cur_cnt"))
  }

  /** PSI per (closed window, feature) of a windowed count relation
    * against static reference counts ([[graft.operators.Drift
    * .referenceCounts]]): every window compares against the FULL
    * reference bucket set (windows × reference cross join restores
    * buckets the window never saw; buckets the reference never saw
    * join in from the current side), then the shared
    * [[graft.operators.Drift.psiFold]]. */
  def psiWindows(counts: DataFrame, refCounts: DataFrame): DataFrame = {
    val wins = counts.select(col("window_start"), col("window_end"))
      .distinct()
    val refPerWin = wins.crossJoin(refCounts)
    val joined = refPerWin.join(counts,
      Seq("window_start", "window_end", "feature", "bucket"), "full_outer")
    graft.operators.Drift
      .psiFold(joined, Seq("window_start", "window_end"))
  }

  /** Streaming PSI drift monitor: windowed feature counts run in
    * Append mode (a window's buckets all emit in the micro-batch where
    * the watermark closes it) and each micro-batch is scored with the
    * SAME [[psiWindows]] the batch path uses before reaching `sink` —
    * the population-level alarm ([[graft.operators.Drift]]) as a
    * continuous monitor. Call `.start()` on the returned writer. */
  def driftMonitorStream(stream: DataFrame, reference: DataFrame,
      tsCol: String, numeric: Seq[(String, Int)],
      categorical: Seq[String], watermark: String = "2 hours",
      windowLen: String = "1 hour")(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] = {
    val edges = graft.operators.Drift.numericEdges(reference, numeric)
    val refCounts = graft.operators.Drift
      .referenceCounts(reference, numeric, categorical)
      .localCheckpoint(true) // computed once, joined every micro-batch
    scoreClosedWindows(
      windowedFeatureCounts(stream, tsCol, numeric, categorical, edges,
        watermark, windowLen))(
      batch => psiWindows(batch, refCounts))(sink)
  }

  /** Streaming volume-anomaly monitor — the third streaming monitor
    * beside [[windowedQuality]] and [[driftMonitorStream]]: per-window
    * per-group row counts, each CLOSED window flagged against static
    * BASELINE moments ([[graft.operators.Anomaly]]'s exact-integer
    * k-sigma test, with the baseline supplying n/S/Q) in
    * foreachBatch. `baseline` is a (group, value) observation table —
    * e.g. historical per-window counts; its moments are computed once.
    * Call `.start()` on the returned writer. */
  def anomalyMonitorStream(stream: DataFrame, baseline: DataFrame,
      tsCol: String, groupCol: String, k: Int = 3,
      watermark: String = "2 hours", windowLen: String = "1 hour")(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] = {
    val moments = baselineMoments(baseline, groupCol).localCheckpoint(true)
    scoreClosedWindows(
      windowedGroupCounts(stream, tsCol, groupCol, watermark, windowLen))(
      batch => flagAgainstBaseline(batch, moments, k))(sink)
  }

  /** Per-(window, group) row counts — batch- and stream-compatible. */
  def windowedGroupCounts(df: DataFrame, tsCol: String, groupCol: String,
      watermark: String = "2 hours", windowLen: String = "1 hour")
      : DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(groupCol))
      .agg(count(lit(1)).as("n_rows"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(groupCol), col("n_rows"))

  /** Baseline (group, n, S, Q) integer moments of a (group, value)
    * observation table. Moments accumulate as decimal(38,0) — the same
    * overflow headroom (and the same integral-input contract: a double
    * value column fails fast rather than silently rounding) as
    * [[graft.operators.Anomaly.flagOutliers]]. */
  def baselineMoments(baseline: DataFrame, groupCol: String): DataFrame = {
    graft.operators.Anomaly.requireIntegral(baseline, "value",
      "baselineMoments")
    def d(c: Column) = c.cast("decimal(38,0)")
    baseline.groupBy(col(groupCol)).agg(
      count(lit(1)).as("_graft_n"),
      sum(d(col("value"))).as("_graft_s"),
      sum(d(col("value")) * d(col("value"))).as("_graft_q"))
  }

  /** The exact-integer k-sigma flag of a windowed count relation
    * against precomputed baseline moments — shared by the streaming
    * monitor and its batch twin.
    *
    * The count relation is first completed to the full window ×
    * baseline-group grid with n_rows zero-filled, so a baseline group
    * that went SILENT in a window is tested at n_rows = 0 (flagged
    * whenever the baseline mean sits more than kσ from zero) instead
    * of silently producing no row. A group the baseline has never seen
    * keeps its observed count with null baseline_n and is flagged
    * outright — a brand-new source is an anomaly until the baseline
    * learns it. Windows are taken from the count relation itself: a
    * stream that emits NOTHING in a window closes no window and cannot
    * be scored from data alone — pair with a driver-side liveness
    * check for the whole-feed-dead case. */
  def flagAgainstBaseline(counts: DataFrame, moments: DataFrame,
      k: Int): DataFrame = {
    def d(c: Column) = c.cast("decimal(38,0)")
    val keyCols = counts.columns.intersect(moments.columns).toSeq
    val grid = counts.select(col("window_start"), col("window_end"))
      .distinct()
      .crossJoin(moments)
    val full = grid.join(counts,
        Seq("window_start", "window_end") ++ keyCols, "full_outer")
      .withColumn("n_rows", coalesce(col("n_rows"), lit(0L)))
    val dev = d(col("_graft_n")) * d(col("n_rows")) - col("_graft_s")
    val rhs = d(lit(k.toLong * k)) *
      (d(col("_graft_n")) * col("_graft_q") -
        col("_graft_s") * col("_graft_s"))
    full
      .withColumn("is_anomaly",
        when(col("_graft_n").isNull, lit(1))
          .otherwise((dev * dev > rhs).cast("int")))
      .withColumnRenamed("_graft_n", "baseline_n")
      .drop("_graft_s", "_graft_q")
  }

  /** Batch twin of [[anomalyMonitorStream]]. */
  def anomalyMonitorBatch(df: DataFrame, baseline: DataFrame,
      tsCol: String, groupCol: String, k: Int = 3,
      watermark: String = "2 hours", windowLen: String = "1 hour")
      : DataFrame =
    flagAgainstBaseline(
      windowedGroupCounts(df, tsCol, groupCol, watermark, windowLen),
      baselineMoments(baseline, groupCol), k)

  /** Batch twin of [[driftMonitorStream]] for oracle comparison. */
  def driftMonitorBatch(df: DataFrame, reference: DataFrame,
      tsCol: String, numeric: Seq[(String, Int)],
      categorical: Seq[String], watermark: String = "2 hours",
      windowLen: String = "1 hour"): DataFrame = {
    val edges = graft.operators.Drift.numericEdges(reference, numeric)
    psiWindows(
      windowedFeatureCounts(df, tsCol, numeric, categorical, edges,
        watermark, windowLen),
      graft.operators.Drift.referenceCounts(reference, numeric, categorical))
  }

  /** Continuous-ingest dedup: every micro-batch is cleaned against a
    * STATIC persisted corpus index (and within itself) by the SAME
    * [[graft.operators.Dedup.incrementalCleanIndexed]] the batch path
    * uses — exact-vs-corpus, exact-within-batch, near-vs-corpus,
    * near-within-batch — before reaching `sink`. The index is static
    * for the query's lifetime: batches do NOT dedup against EARLIER
    * micro-batches (that state is the corpus'; refresh the index and
    * restart after folding ingested data in — the standard
    * static-side-stream contract). The checkpointed component labels
    * each micro-batch creates are released after the sink consumes
    * them, so a long-running query's storage stays flat. Call
    * `.start()` on the returned writer. */
  def dedupIngestStream(stream: DataFrame,
      index: graft.operators.Dedup.DedupIndex,
      idCol: String, textCol: String, tau: Double,
      maxBucket: Long = graft.operators.Dedup.DefaultMaxBucket)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val cleaned = graft.operators.Dedup.incrementalCleanIndexed(
          index, batch.toDF(), idCol, textCol, tau, maxBucket)
        try sink(cleaned, id)
        finally graft.operators.Dedup.release(cleaned)
      }

  /** Continuous-ingest boilerplate removal: every micro-batch is
    * rewritten against a STATIC persisted paragraph-df index by the
    * SAME [[graft.operators.Paragraph.cleanAgainstIndex]] the batch
    * path uses — corpus-known boilerplate paragraphs drop in flight;
    * batch-internal repetition waits for the next index refresh
    * (identical static-index contract to [[dedupIngestStream]]). Call
    * `.start()` on the returned writer. */
  def paragraphIngestStream(stream: DataFrame,
      index: graft.operators.Paragraph.ParagraphIndex,
      idCol: String, textCol: String, maxDf: Long,
      joiner: String = "\n\n")(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(graft.operators.Paragraph.cleanAgainstIndex(
          index, batch.toDF(), idCol, textCol, maxDf, joiner), id)
      }

  /** Continuous quality-classifier scoring: every micro-batch is
    * scored against a STATIC persisted [[graft.operators.NaiveBayes]]
    * model by the SAME batch scorer — the classifier trains on corpus
    * refresh cadence, the stream consumes it (identical static-index
    * contract to [[dedupIngestStream]]/[[paragraphIngestStream]]; OOV
    * tokens in never-seen stream text stay exactly smoothed). Call
    * `.start()` on the returned writer. */
  def nbScoreStream(stream: DataFrame,
      model: graft.operators.NaiveBayes.NbModel,
      idCol: String, textCol: String)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(graft.operators.NaiveBayes.score(
          model, batch.toDF(), idCol, textCol), id)
      }

  /** Watermarked STREAM-STREAM interval join (round-9): each left
    * event pairs with right events sharing its key whose timestamp
    * falls in [leftTs − lookback, leftTs] — the online form of the
    * attribution/correlation joins (purchase ⋈ its prior clicks,
    * alert ⋈ its causal window). Spark buffers both sides in state;
    * the watermark + the interval bound are exactly what lets it
    * EVICT: right rows older than (left watermark − lookback) can
    * never match again and are dropped, so state is bounded by
    * lookback × arrival rate, not by stream length — the condition
    * shape is load-bearing, not stylistic. Inner join; append mode. */
  def streamIntervalJoin(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTsCol: String, rightTsCol: String,
      lookback: String, watermark: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val l = left.withWatermark(leftTsCol, watermark)
    val r = right.withWatermark(rightTsCol, watermark)
    val cond = keyCols.map(k => l(k) === r(k)).reduce(_ && _) &&
      r(rightTsCol) >= l(leftTsCol) - expr(s"INTERVAL $lookback") &&
      r(rightTsCol) <= l(leftTsCol)
    // inner equi-join on the keys -> the right copies are redundant
    keyCols.foldLeft(l.join(r, cond))((df, k) => df.drop(r(k)))
  }

  val SessionGapMs: Long = 30L * 60L * 1000L

  /** #43 — stateful gap-based sessionization via
    * flatMapGroupsWithState: per-user state carries the open session;
    * events beyond the 30-min gap close it and emit. Event-time timeout
    * flushes idle sessions once the watermark passes. */
  def sessionize(events: Dataset[Event],
      gapMs: Long = SessionGapMs,
      watermark: String = "2 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", watermark) else events
    // batch runs have no watermark/timeout: flush the trailing open
    // session so batch output is the complete sessionization
    val flushOpen = !streaming
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId, it, state) => sessionStep(userId, it, state, gapMs, flushOpen))
  }

  /** One state-update step; pure function of (events, prior state) so
    * batch tests can drive it directly. */
  def sessionStep(
      userId: Long,
      it: Iterator[Event],
      state: GroupState[SessionState],
      gapMs: Long,
      flushOpen: Boolean = false): Iterator[SessionOut] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]

    if (state.hasTimedOut) {
      state.getOption.foreach { s =>
        out += SessionOut(userId, new Timestamp(s.start),
          new Timestamp(s.last), s.n, s.total)
      }
      state.remove()
      return out.iterator
    }

    // within a micro-batch events may arrive unordered — sort by event
    // time (and id for total order) before folding into the session
    val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var cur = state.getOption
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.last <= gapMs =>
          cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1,
            total = s.total + e.value))
        case Some(s) =>
          out += SessionOut(userId, new Timestamp(s.start),
            new Timestamp(s.last), s.n, s.total)
          cur = Some(SessionState(t, t, 1L, e.value))
        case None =>
          cur = Some(SessionState(t, t, 1L, e.value))
      }
    }
    cur match {
      case Some(s) if flushOpen =>
        out += SessionOut(userId, new Timestamp(s.start),
          new Timestamp(s.last), s.n, s.total)
      case Some(s) =>
        state.update(s)
        state.setTimeoutTimestamp(s.last + gapMs)
      case None => ()
    }
    out.iterator
  }
}
