package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Pins Tables.events across both parquet encodings of `events.ts`:
  *
  *   - epoch-nanos long — what a TIMESTAMP(NANOS) footer reads as under
  *     `nanosAsLong=true`, and exactly what a plain INT64 column reads as
  *     (the reader output is indistinguishable, so a long fixture covers
  *     the nanos-footer branch without needing a nanos writer, which
  *     Spark does not have);
  *   - TIMESTAMP(MICROS) — what the current testdata ships (reads as
  *     TIMESTAMP_NTZ under UTC session TZ).
  *
  * Both must expose the same `ts_ns: long` epoch-nanos column so the
  * whole event-time family (q11/q12/asof/gapfill/twa/...) is
  * encoding-agnostic. Guards against the round-9 regression where a
  * testdata regeneration flipped nanos→micros and 16 queries failed
  * analysis.
  */
class TablesSpec extends SparkSpec {

  test("events exposes identical ts_ns for long-encoded and micros-encoded parquet") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tablesenc")

    val rows = Seq(
      (1L, 1577836800123456L, 7L, "view", 1.5),  // 2020-01-01T00:00:00.123456Z
      (2L, 1577836801000001L, 7L, "click", 0.5),
      (3L, 1577923200999999L, 8L, "view", 2.0))

    // micros encoding: TimestampType writes TIMESTAMP(MICROS) parquet
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(s"$dir/micros/events.parquet")

    // long encoding: epoch-nanos INT64, the post-read shape of a
    // TIMESTAMP(NANOS) footer under nanosAsLong
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), (col("us") * 1000L).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(s"$dir/long/events.parquet")

    val fromMicros = Tables.events(spark, s"$dir/micros")
    val fromLong = Tables.events(spark, s"$dir/long")
    for (df <- Seq(fromMicros, fromLong)) {
      assert(df.schema("ts_ns").dataType == LongType)
      assert(!df.columns.contains("ts"))
    }
    val a = fromMicros.select("event_id", "ts_ns").as[(Long, Long)]
      .collect().sortBy(_._1)
    val b = fromLong.select("event_id", "ts_ns").as[(Long, Long)]
      .collect().sortBy(_._1)
    assert(a.sameElements(b))
    assert(a.map(_._2).sameElements(rows.map(_._2 * 1000L)))

    // tsCol: raw frames from both encodings agree at micros precision
    val rawM = Tables(spark, s"$dir/micros", "events")
    val rawL = Tables(spark, s"$dir/long", "events")
    val tm = rawM.select(col("event_id"), Tables.tsCol(rawM).as("t"))
      .as[(Long, java.sql.Timestamp)].collect().sortBy(_._1)
    val tl = rawL.select(col("event_id"), Tables.tsCol(rawL).as("t"))
      .as[(Long, java.sql.Timestamp)].collect().sortBy(_._1)
    assert(tm.sameElements(tl))
  }

  test("live testdata events reads as ts_ns whatever its current encoding") {
    val df = Tables.events(spark, sf)
    assert(df.schema("ts_ns").dataType == LongType)
    val n = df.count()
    assert(n > 0)
    // epoch-nanos magnitude sanity: all values in [2000-01-01, 2100-01-01)
    val bad = df.filter(col("ts_ns") < 946684800L * 1000000000L ||
      col("ts_ns") >= 4102444800L * 1000000000L).count()
    assert(bad == 0, s"$bad of $n ts_ns values outside plausible epoch-nanos range")
  }
}
