package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{Event, Streaming}

/** MemoryStream record for the streaming-dedup tests. */
final case class StreamDoc(doc_id: Long, ts: Timestamp, text: String)

/** MemoryStream record for the streaming-ingestion test. */
final case class IngestRec(id: Long, label: String, value: Double)

/** SURVEY.md §2.9 #42/#43 — Structured Streaming operators, driven by
  * MemoryStream micro-batches, checked against their batch equivalents.
  */
class StreamingSpec extends SparkSpec {
  private val s = SparkSpec.spark
  import s.implicits._

  // keep clear of epoch 0: an event at the initial watermark (t=0) is
  // on the late-data boundary
  private def ts(min: Long): Timestamp = new Timestamp((min + 10080) * 60000L)

  test("#42 streaming windowed agg emits closed windows (append mode)") {
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Event]
    val query = Streaming
      .windowedEventCounts(src.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(2, ts(20), 1, "click", 2.0),
        Event(3, ts(40), 2, "view", 3.0))
      query.processAllAvailable()
      // watermark = 40min - 10min = 30min: hour-0 window not closed yet
      assert(spark.table("win_out").count() == 0)
      src.addData(Event(4, ts(200), 3, "click", 4.0))
      query.processAllAvailable()
      val rows = spark.table("win_out")
        .orderBy("window_start", "event_type").collect()
      assert(rows.length == 2) // hour-0 closed: (click,2) and (view,1)
      assert(rows.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 1L))
    } finally query.stop()
  }

  test("#42 same transform runs in batch and matches manual grouping") {
    val batch = Seq(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(20), 1, "click", 2.0),
      Event(3, ts(75), 2, "click", 3.0)).toDF()
    val out = Streaming.windowedEventCounts(batch)
      .orderBy("window_start").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_events") == 2L)
    assert(out(1).getAs[Long]("n_events") == 1L)
  }

  test("#43 streaming sessionization: timeout closes idle sessions") {
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Event]
    val query = Streaming.sessionize(src.toDS(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 10 min apart (one session)
      src.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 2.0))
      query.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // still open
      // much later event advances the watermark past last+gap ⇒ timeout
      src.addData(Event(3, ts(600), 2, "view", 1.0))
      query.processAllAvailable()
      src.addData(Event(4, ts(1200), 3, "view", 1.0))
      query.processAllAvailable()
      val sessions = spark.table("sess_out")
        .filter(col("user_id") === 1).collect()
      assert(sessions.length == 1)
      assert(sessions(0).getAs[Long]("n_events") == 2L)
      assert(sessions(0).getAs[Double]("total_value") == 3.0)
    } finally query.stop()
  }

  test("#42 file-source readStream over events parquet matches batch agg") {
    // the real readStream path: parquet file source + watermark + window
    val schema = Tables(spark, sf, "events").schema
    // the file source streams a DIRECTORY; stage the table file into one
    val streamDir = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      streamDir.resolve("events.parquet"))
    val rawStream = spark.readStream.schema(schema)
      .parquet(streamDir.toString)
    val stream = rawStream
      .select(Tables.tsCol(rawStream).as("ts"),
        col("event_type"), col("value"))
    val query = Streaming.windowedEventCounts(stream, watermark = "1 hour")
      .writeStream.format("memory").queryName("file_win")
      .outputMode(OutputMode.Append).start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("file_win")
      val rawBatch = Tables(spark, sf, "events")
      val batch = Streaming.windowedEventCounts(
        rawBatch.select(Tables.tsCol(rawBatch).as("ts"),
          col("event_type"), col("value")))
      // append mode emits only watermark-closed windows: a prefix of batch
      val closed = streamed.count()
      assert(closed > 0)
      val mismatched = streamed.as("s").join(batch.as("b"),
        Seq("window_start", "event_type"))
        .filter(col("s.n_events") =!= col("b.n_events")).count()
      assert(mismatched == 0)
    } finally query.stop()
  }

  test("#43 streaming sessionization equals batch on real events") {
    implicit val sql = spark.sqlContext
    val events = Tables.events(spark, sf)
      .select(col("event_id"), expr("timestamp_millis(ts_ns div 1000000)")
        .as("ts"), col("user_id"), col("event_type"), col("value"))
      .filter(col("user_id") < 20)
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val (chunk1, chunk2) = events.splitAt(events.length / 2)
    val sentinel = Event(-1L,
      new Timestamp(events.last.ts.getTime + 10L * Streaming.SessionGapMs),
      -1L, "sentinel", 0.0)

    val src = MemoryStream[Event]
    val query = Streaming.sessionize(src.toDS(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess_eq")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(chunk1.toIndexedSeq); query.processAllAvailable()
      src.addData(chunk2.toIndexedSeq); query.processAllAvailable()
      src.addData(sentinel); query.processAllAvailable()
      // one more batch so the sentinel-advanced watermark fires timeouts
      src.addData(Event(-2L, new Timestamp(
        sentinel.ts.getTime + Streaming.SessionGapMs), -2L, "s2", 0.0))
      query.processAllAvailable()

      val streamed = spark.table("sess_eq")
        .filter(col("user_id") >= 0)
        .select("user_id", "session_start", "n_events", "total_value")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
        .toSet
      val batch = Streaming.sessionize(
        Tables.events(spark, sf)
          .select(col("event_id"),
            expr("timestamp_millis(ts_ns div 1000000)").as("ts"),
            col("user_id"), col("event_type"), col("value"))
          .filter(col("user_id") < 20).as[Event])
        .select("user_id", "session_start", "n_events", "total_value")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
        .toSet
      assert(streamed == batch)
    } finally query.stop()
  }

  test("streaming exact-dedup keeps the first-seen doc per content hash") {
    implicit val sql = spark.sqlContext
    val src = MemoryStream[StreamDoc]
    val query = Streaming.dedupExact(src.toDF(), "doc_id", "text", "ts")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      // "ALPHA  BETA" normalizes to the same content as "alpha beta"
      src.addData(
        StreamDoc(1, ts(0), "alpha beta"),
        StreamDoc(2, ts(1), "ALPHA  BETA"),
        StreamDoc(3, ts(2), "gamma"))
      query.processAllAvailable()
      src.addData(
        StreamDoc(4, ts(3), "alpha beta"), // dup across micro-batches
        StreamDoc(5, ts(4), "delta"))
      query.processAllAvailable()
      val streamed = spark.table("dedup_stream").collect()
      assert(streamed.length == 3) // alpha-beta once, gamma, delta
      val streamedHashes = streamed.map(_.getAs[String]("content_hash")).toSet
      val batch = Streaming.dedupExact(
        Seq(
          StreamDoc(1, ts(0), "alpha beta"),
          StreamDoc(2, ts(1), "ALPHA  BETA"),
          StreamDoc(3, ts(2), "gamma"),
          StreamDoc(4, ts(3), "alpha beta"),
          StreamDoc(5, ts(4), "delta")).toDF(),
        "doc_id", "text", "ts")
      assert(batch.count() == 3)
      assert(batch.collect().map(_.getAs[String]("content_hash")).toSet ==
        streamedHashes)
      // batch keeper is deterministic first-seen: doc 1 (ts(0)) beats
      // its duplicates 2 and 4
      val keepers = batch.collect().map(_.getAs[Long]("doc_id")).toSet
      assert(keepers == Set(1L, 3L, 5L), keepers)
    } finally query.stop()
  }

  test("streaming simhash dedup collapses token-reordered boilerplate") {
    implicit val sql = spark.sqlContext
    val src = MemoryStream[StreamDoc]
    val query = Streaming.dedupSimhash(src.toDF(), "doc_id", "text", "ts")
      .writeStream.format("memory").queryName("simdedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(
        StreamDoc(1, ts(0), "terms of service apply here"),
        StreamDoc(3, ts(2), "completely different content entirely"))
      query.processAllAvailable()
      // same token bag, different order → same SimHash → suppressed,
      // even though exact dedup would keep it (different text)
      src.addData(StreamDoc(4, ts(3), "apply here terms of service"))
      query.processAllAvailable()
      val out = spark.table("simdedup_stream").collect()
      assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 3L))
      // batch path: deterministic first-seen over the same feed matches
      // the streaming survivors
      val batch = Streaming.dedupSimhash(
        Seq(
          StreamDoc(1, ts(0), "terms of service apply here"),
          StreamDoc(3, ts(2), "completely different content entirely"),
          StreamDoc(4, ts(3), "apply here terms of service"))
          .toDF(), "doc_id", "text", "ts")
      assert(batch.collect().map(_.getAs[Long]("doc_id")).toSet ==
        Set(1L, 3L))
    } finally query.stop()
  }

  test("streaming quality monitor matches batch counters per closed window") {
    import graft.quality.{Dimension, Rule}
    val rules = Seq(
      Rule("SQ1", "value_in_range", Dimension.Accuracy, "major",
        fails = col("value") < 0 || col("value") > 900,
        applicable = col("value").isNotNull),
      Rule("SQ2", "type_present", Dimension.Completeness, "critical",
        fails = col("event_type").isNull))
    def evCols(df: org.apache.spark.sql.DataFrame) = df.select(
      Tables.tsCol(df).as("ts"), col("event_type"), col("value"))
    val schema = Tables(spark, sf, "events").schema
    val streamDir = java.nio.file.Files.createTempDirectory("dqstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = evCols(spark.readStream.schema(schema)
      .parquet(streamDir.toString))
    val query = Streaming.windowedQuality(stream, "ts", rules,
      watermark = "1 hour")
      .writeStream.format("memory").queryName("dq_stream")
      .outputMode(OutputMode.Append).start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("dq_stream")
      assert(streamed.count() > 0) // watermark closed at least one window
      val batch = Streaming.windowedQuality(
        evCols(Tables(spark, sf, "events")), "ts", rules)
      val mismatched = streamed.as("s").join(batch.as("b"),
        Seq("window_start"))
        .filter(col("s.n_rows") =!= col("b.n_rows") ||
          col("s.checked_SQ1") =!= col("b.checked_SQ1") ||
          col("s.failed_SQ1") =!= col("b.failed_SQ1") ||
          col("s.failed_SQ2") =!= col("b.failed_SQ2")).count()
      assert(mismatched == 0)
    } finally query.stop()
  }

  test("streaming trending terms match the batch term counts per window") {
    import java.sql.Timestamp
    def t(min: Int) = new Timestamp(3600000L * 24 * 365 * 50 + min * 60000L)
    val rows = Seq(
      (t(0), "spark spark join"), (t(10), "join scan"),
      (t(70), "scan scan"), (t(80), "spark"),
      (t(200), "late window closer")) // advances watermark past w0/w1
    val dir = java.nio.file.Files.createTempDirectory("trend")
    rows.toDF("ts", "text").write.mode("overwrite")
      .parquet(dir.resolve("in").toString)
    val schema = spark.read.parquet(dir.resolve("in").toString).schema
    val stream = spark.readStream.schema(schema)
      .parquet(dir.resolve("in").toString)
    val query = Streaming.windowedTermCounts(stream, watermark = "30 minutes")
      .writeStream.format("memory").queryName("trend_stream")
      .outputMode(OutputMode.Append).start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("trend_stream")
      assert(streamed.count() > 0)
      val batch = Streaming.windowedTermCounts(rows.toDF("ts", "text"))
      // every closed window the stream emitted matches batch exactly
      val mismatched = streamed.as("s")
        .join(batch.as("b"), Seq("window_start", "term"), "left")
        .filter(col("s.n") =!= col("b.n")).count()
      assert(mismatched == 0)
      // the first window's counts are present and correct
      val w0 = streamed.filter(col("term") === "spark")
        .orderBy("window_start").collect()
      assert(w0.nonEmpty && w0.head.getAs[Long]("n") == 2L)
    } finally query.stop()
  }

  test("streaming trending top-k matches the batch ranking per closed window") {
    import java.sql.Timestamp
    def t(min: Int) = new Timestamp(3600000L * 24 * 365 * 50 + min * 60000L)
    val rows = Seq(
      (t(0), "spark spark join scan scan scan"), (t(10), "join scan"),
      (t(70), "scan scan spark"), (t(80), "spark"),
      (t(200), "late window closer")) // advances watermark past w0/w1
    val dir = java.nio.file.Files.createTempDirectory("trendtopk")
    rows.toDF("ts", "text").write.mode("overwrite")
      .parquet(dir.resolve("in").toString)
    val schema = spark.read.parquet(dir.resolve("in").toString).schema
    val stream = spark.readStream.schema(schema)
      .parquet(dir.resolve("in").toString)
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Timestamp, String, Long, Long)]
    val query = Streaming.trendingTopKStream(stream, k = 2,
      watermark = "30 minutes") { (ranked, _) =>
      buf ++= ranked.collect().map(r => (
        r.getAs[Timestamp]("window_start"), r.getAs[String]("term"),
        r.getAs[Long]("n"), r.getAs[Long]("rank")))
    }.start()
    try {
      query.processAllAvailable()
      assert(buf.nonEmpty) // at least one window closed and was ranked
      // each emitted (window, term, n, rank) equals the batch ranking
      val batch = Streaming.trendingTopK(rows.toDF("ts", "text"), k = 2)
        .collect().map(r => (
          r.getAs[Timestamp]("window_start"), r.getAs[String]("term"),
          r.getAs[Long]("n"), r.getAs[Long]("rank"))).toSet
      assert(buf.toSet.subsetOf(batch), s"stream=${buf.toSet} batch=$batch")
      // the k bound holds per window
      assert(buf.groupBy(_._1).values.forall(_.size <= 2))
      // window 0's winner: scan (n=4) over join (n=2, alphabetical tie
      // with spark broken by term asc)
      val w0 = buf.filter(r => r._1 == buf.map(_._1).minBy(_.getTime))
        .sortBy(_._4)
      assert(w0.map(r => (r._2, r._3, r._4)).toSeq ===
        Seq(("scan", 4L, 1L), ("join", 2L, 2L)))
    } finally query.stop()
  }

  test("streaming ingest lands in bronze gated identically to batch runJob") {
    import graft.etl.{LoadType, MedallionPipeline}
    import graft.quality.{DataZone, Dimension, Rule}
    implicit val sql = spark.sqlContext
    val rules = Seq(
      Rule("R1", "value_nonneg", Dimension.Accuracy, "critical",
        fails = col("value") < 0, failBelow = 1.0, warnBelow = 1.0))
    val rows = Seq(
      IngestRec(10, "a", 1.0), IngestRec(11, "b", -5.0), // batch 0
      IngestRec(12, "c", 2.0), IngestRec(13, "d", -1.0)) // batch 1

    val p = new MedallionPipeline(spark,
      java.nio.file.Files.createTempDirectory("ingest_s").toString)
    val src = MemoryStream[IngestRec]
    val query = p.ingestStream(src.toDF(), "sjob", "t", rules = rules)
    try {
      src.addData(rows(0), rows(1)); query.processAllAvailable()
      src.addData(rows(2), rows(3)); query.processAllAvailable()
    } finally query.stop()
    val bronzeIds = p.read(DataZone.Bronze, "t")
      .select("id").collect().map(_.getLong(0)).toSet
    // per-micro-batch quarantine artifacts carry the failing rows
    val quarantinedIds = Seq("sjob_b0", "sjob_b1")
      .map(j => p.quarantined(j, "t")).reduce(_.unionByName(_))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(quarantinedIds == Set(11L, 13L))

    // the batch runJob over the same rows promotes the same clean set
    val p2 = new MedallionPipeline(spark,
      java.nio.file.Files.createTempDirectory("ingest_b").toString)
    p2.write(DataZone.Raw, "t", rows.toDF(), LoadType.Full)
    val res = p2.runJob("bjob", "t", DataZone.Raw, DataZone.Bronze,
      LoadType.Full, rules = rules)
    assert(res.recordsQuarantined == 2)
    val batchIds = p2.read(DataZone.Bronze, "t")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(bronzeIds == batchIds && batchIds == Set(10L, 12L))
  }

  test("continuous-ingest dedup cleans each micro-batch like the batch path") {
    implicit val sql = spark.sqlContext
    def doc(tokens: Seq[String]) = tokens.mkString(" ")
    val base = (0 until 20).map(i => s"tok$i")
    val fresh = (0 until 20).map(i => s"new$i")
    val corpus = Seq((10L, doc(base))).toDF("doc_id", "text")
    val index = graft.operators.Dedup.buildIndex(corpus, "doc_id", "text")
    val b0 = Seq( // vs corpus: exact + near dup; one fresh keeper
      StreamDoc(20L, ts(0), doc(base)),
      StreamDoc(21L, ts(1), doc(base.init :+ "edited")),
      StreamDoc(22L, ts(2), doc(fresh)))
    val b1 = Seq( // within-batch exact + near dup of a new doc
      StreamDoc(30L, ts(3), doc(fresh.map(t => s"x$t"))),
      StreamDoc(31L, ts(4), doc(fresh.map(t => s"x$t"))),
      StreamDoc(32L, ts(5), doc((fresh.map(t => s"x$t")).init :+ "alt")))
    val src = MemoryStream[StreamDoc]
    val got = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val query = Streaming.dedupIngestStream(src.toDF(), index,
      "doc_id", "text", tau = 0.5) { (cleaned, id) =>
      got(id) = cleaned.select("doc_id")
        .collect().map(_.getLong(0)).toSet
    }.start()
    try {
      src.addData(b0: _*); query.processAllAvailable()
      src.addData(b1: _*); query.processAllAvailable()
    } finally query.stop()
    // batch 0: 20 (exact-vs-corpus) and 21 (near-vs-corpus) drop
    assert(got(0L) === Set(22L))
    // batch 1: 31 exact-dups 30, 32 near-dups 30 -> min id survives;
    // note batch 1 does NOT dedup against batch 0's docs (the index
    // is the corpus, not earlier micro-batches — documented contract)
    assert(got(1L) === Set(30L))
    // each micro-batch equals the batch-path clean over the same rows
    Seq(b0 -> 0L, b1 -> 1L).foreach { case (rows, id) =>
      val batchClean = graft.operators.Dedup.incrementalCleanIndexed(
        index, rows.toDF(), "doc_id", "text", tau = 0.5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(batchClean === got(id))
    }
  }

  test("streaming anomaly monitor flags spiking windows vs the baseline") {
    import java.sql.Timestamp
    def t(min: Int) = new Timestamp(3600000L * 24 * 365 * 50 + min * 60000L)
    // baseline hourly volumes for group "a": ten quiet hours of 100
    // plus one historic spike of 1000 (moments: flag iff count ≥ 959)
    val baseline = ((1 to 10).map(_ => ("a", 100L)) :+ (("a", 1000L)))
      .toDF("grp", "value")
    // w0: 100 rows (in family); w1: 1000 rows (spike); closer row
    val rows = (0 until 100).map(i => (t(i % 10), "a")) ++
      (0 until 1000).map(i => (t(70 + i % 10), "a")) ++
      Seq((t(300), "a"))
    val dir = java.nio.file.Files.createTempDirectory("anom")
    rows.toDF("ts", "grp").write.mode("overwrite")
      .parquet(dir.resolve("in").toString)
    val stream = spark.readStream
      .schema(spark.read.parquet(dir.resolve("in").toString).schema)
      .parquet(dir.resolve("in").toString)
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Timestamp, Long, Int)]
    val query = Streaming.anomalyMonitorStream(stream, baseline,
      "ts", "grp", k = 3, watermark = "30 minutes") { (flags, _) =>
      buf ++= flags.collect().map(r => (
        r.getAs[Timestamp]("window_start"), r.getAs[Long]("n_rows"),
        r.getAs[Int]("is_anomaly")))
    }.start()
    try {
      query.processAllAvailable()
      assert(buf.nonEmpty)
      val byWindow = buf.map(r => r._1 -> ((r._2, r._3))).toMap
      assert(byWindow(t(0)) === ((100L, 0)))
      assert(byWindow(t(60)) === ((1000L, 1)))
      // streamed flags match the batch twin per closed window
      val batch = Streaming.anomalyMonitorBatch(rows.toDF("ts", "grp"),
        baseline, "ts", "grp", k = 3)
        .collect().map(r => (r.getAs[Timestamp]("window_start"),
          r.getAs[Long]("n_rows"), r.getAs[Int]("is_anomaly"))).toSet
      assert(buf.toSet.subsetOf(batch), s"stream=${buf.toSet} batch=$batch")
    } finally query.stop()
  }

  test("continuous-ingest paragraph cleaning matches the batch path per micro-batch") {
    implicit val sql = spark.sqlContext
    val boiler = "subscribe to our newsletter"
    val corpus = Seq(
      (1L, s"one\n\n$boiler"), (2L, s"$boiler\n\ntwo"),
      (3L, s"three\n\n$boiler")).toDF("doc_id", "text")
    val index = graft.operators.Paragraph
      .buildParagraphIndex(corpus, "doc_id", "text")
    val b0 = Seq(StreamDoc(10L, ts(0), s"fresh stuff\n\n$boiler"),
      StreamDoc(11L, ts(1), "all original here"))
    val b1 = Seq(StreamDoc(12L, ts(2), s"$boiler"))
    val src = MemoryStream[StreamDoc]
    val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Long, String)]]
    val query = Streaming.paragraphIngestStream(src.toDF(), index,
      "doc_id", "text", maxDf = 2) { (cleaned, id) =>
      got(id) = cleaned.select("doc_id", "n_paragraphs", "n_dropped",
        "text_clean").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet
    }.start()
    try {
      src.addData(b0: _*); query.processAllAvailable()
      src.addData(b1: _*); query.processAllAvailable()
    } finally query.stop()
    assert(got(0L) === Set(
      (10L, 1L, "fresh stuff"),
      (11L, 0L, "all original here")))
    assert(got(1L) === Set((12L, 1L, ""))) // all-boilerplate doc emptied
    // per-micro-batch result equals the batch path over the same rows
    Seq(b0 -> 0L, b1 -> 1L).foreach { case (rows, id) =>
      val batchOut = graft.operators.Paragraph.cleanAgainstIndex(
        index, rows.toDF(), "doc_id", "text", maxDf = 2)
        .select("doc_id", "n_paragraphs", "n_dropped", "text_clean")
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
        .toSet
      assert(batchOut === got(id))
    }
  }

  test("continuous NB scoring matches the batch scorer per micro-batch") {
    implicit val sql = spark.sqlContext
    import graft.operators.NaiveBayes
    val corpus = ((0L until 10L).map(i => (i, "alpha beta gamma", true)) ++
      (10L until 20L).map(i => (i, "zork grok blark", false)))
      .toDF("doc_id", "text", "label")
    val model = NaiveBayes.train(corpus, "doc_id", "text", "label")
    val b0 = Seq(StreamDoc(30L, ts(0), "alpha beta zork"),
      StreamDoc(31L, ts(1), "totally unseen words"))
    val b1 = Seq(StreamDoc(32L, ts(2), "grok grok blark"))
    val src = MemoryStream[StreamDoc]
    val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Long)]]
    val query = Streaming.nbScoreStream(src.toDF(), model,
      "doc_id", "text") { (scored, id) =>
      got(id) = scored.select("doc_id", "pred").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }.start()
    try {
      src.addData(b0: _*); query.processAllAvailable()
      src.addData(b1: _*); query.processAllAvailable()
    } finally query.stop()
    assert(got(0L).map(_._1) === Set(30L, 31L))
    assert(got(1L) === Set(32L -> 0L))
    // per-micro-batch result equals the batch scorer over the same rows
    Seq(b0 -> 0L, b1 -> 1L).foreach { case (rows, id) =>
      val batchOut = NaiveBayes.score(model, rows.toDF(), "doc_id", "text")
        .select("doc_id", "pred").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batchOut === got(id))
    }
  }

  test("stream-stream interval join pairs purchases with in-window clicks only") {
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[StreamDoc]    // (doc_id=user, ts, text=channel)
    val buys = MemoryStream[StreamDoc]      // (doc_id=user, ts, text=amount)
    val joined = Streaming.streamIntervalJoin(
      buys.toDF().withColumnRenamed("text", "amount")
        .withColumnRenamed("ts", "p_ts"),
      clicks.toDF().withColumnRenamed("text", "channel")
        .withColumnRenamed("ts", "c_ts"),
      keyCols = Seq("doc_id"), leftTsCol = "p_ts", rightTsCol = "c_ts",
      lookback = "1 hour", watermark = "2 hours")
    val q = joined.writeStream.format("memory")
      .queryName("ssj").outputMode("append").start()
    try {
      // user 1: click 30 min before purchase (in window), click 90 min
      // before (outside); user 2: purchase with no click at all
      clicks.addData(StreamDoc(1L, ts(0), "search"),
        StreamDoc(1L, ts(60), "social"))
      buys.addData(StreamDoc(1L, ts(90), "9.99"),
        StreamDoc(2L, ts(95), "5.00"))
      q.processAllAvailable()
      val got = spark.table("ssj")
        .select("doc_id", "amount", "channel")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .toSet
      assert(got === Set((1L, "9.99", "social")))
      // a later click inside a later purchase's window still joins
      clicks.addData(StreamDoc(2L, ts(120), "email"))
      buys.addData(StreamDoc(2L, ts(150), "7.50"))
      q.processAllAvailable()
      val got2 = spark.table("ssj")
        .select("doc_id", "amount", "channel")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .toSet
      assert(got2 === Set((1L, "9.99", "social"), (2L, "7.50", "email")))
    } finally q.stop()
  }

  test("anomaly monitor surfaces silent baseline groups and brand-new groups") {
    import java.sql.Timestamp
    def t(min: Int) = new Timestamp(3600000L * 24 * 365 * 50 + min * 60000L)
    // baseline: group a hums at ~100/window; group b at exactly 50
    // (zero variance — silence is infinitely many σ from the mean)
    val baseline = ((1 to 10).map(_ => ("a", 100L)) ++
      (1 to 10).map(_ => ("b", 50L))).toDF("grp", "value")
    // the observed window has a-rows and rows from never-seen group c;
    // baseline group b emits NOTHING
    val rows = (0 until 100).map(i => (t(i % 10), "a")) ++
      (0 until 5).map(i => (t(i % 10), "c"))
    val out = Streaming.anomalyMonitorBatch(rows.toDF("ts", "grp"),
      baseline, "ts", "grp", k = 3)
      .select("grp", "n_rows", "is_anomaly")
      .as[(String, Long, Int)].collect().toSet
    assert(out === Set(
      ("a", 100L, 0), // in family
      ("b", 0L, 1),   // silent source: zero-filled row, flagged
      ("c", 5L, 1)))  // brand-new source: no baseline, flagged
  }

  test("streaming drift monitor matches the batch PSI per closed window") {
    import java.sql.Timestamp
    def t(min: Int) = new Timestamp(3600000L * 24 * 365 * 50 + min * 60000L)
    val reference = (0 until 100)
      .map(i => (i.toLong % 10, if (i % 2 == 0) "x" else "y"))
      .toDF("v", "c")
    // w0 reproduces the reference mix exactly; w1 is a gross shift
    // (numeric out of range + a category the reference never saw)
    val rows = (0 until 100)
      .map(i => (t(i % 10), i.toLong % 10, if (i % 2 == 0) "x" else "y")) ++
      (0 until 50).map(i => (t(70 + i % 10), 1000L, "z")) ++
      Seq((t(300), 0L, "x")) // closes w0/w1 past the watermark
    val dir = java.nio.file.Files.createTempDirectory("drift")
    rows.toDF("ts", "v", "c").write.mode("overwrite")
      .parquet(dir.resolve("in").toString)
    val stream = spark.readStream
      .schema(spark.read.parquet(dir.resolve("in").toString).schema)
      .parquet(dir.resolve("in").toString)
    val numeric = Seq(("v", 5))
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Timestamp, String, Double, String)]
    val query = Streaming.driftMonitorStream(stream, reference, "ts",
      numeric, Seq("c"), watermark = "30 minutes") { (psi, _) =>
      buf ++= psi.collect().map(r => (
        r.getAs[Timestamp]("window_start"), r.getAs[String]("feature"),
        r.getAs[Double]("psi"), r.getAs[String]("drift_band")))
    }.start()
    try {
      query.processAllAvailable()
      assert(buf.nonEmpty)
      // every emitted (window, feature) PSI equals the batch twin's
      val batch = Streaming.driftMonitorBatch(rows.toDF("ts", "v", "c"),
        reference, "ts", numeric, Seq("c"))
        .collect().map(r => (
          r.getAs[Timestamp]("window_start"), r.getAs[String]("feature"),
          r.getAs[Double]("psi"), r.getAs[String]("drift_band"))).toSet
      assert(buf.toSet.subsetOf(batch), s"stream=${buf.toSet} batch=$batch")
      // w0: identical mix -> psi 0 stable on both features
      val w0 = buf.filter(_._1 == buf.map(_._1).minBy(_.getTime))
      assert(w0.size === 2 && w0.forall(r => r._3 == 0.0 && r._4 == "stable"))
      // w1: clamped numeric + novel category -> shifted on both
      val w1 = buf.filter(_._1 == t(60))
      assert(w1.size === 2 && w1.forall(_._4 == "shifted"))
    } finally query.stop()
  }

  test("#43 batch sessionization matches the q12 window-based batch form") {
    // real event data (ms-truncated timestamps), gap semantics identical
    val events = Tables.events(spark, sf)
      .select(col("event_id"), expr("timestamp_millis(ts_ns div 1000000)")
        .as("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val sessions = Streaming.sessionize(events)
    // baseline: lag/cumsum sessionization on the same ms grid
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val base = events.toDF()
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev")) >
            Streaming.SessionGapMs, 1L).otherwise(0L))
      .agg(sum(col("new_sess"))).head().getLong(0)
    assert(sessions.count() == base)
    // per-session event counts also line up in total
    val totalEvents = sessions.agg(sum(col("n_events"))).head().getLong(0)
    assert(totalEvents == events.count())
  }
}
