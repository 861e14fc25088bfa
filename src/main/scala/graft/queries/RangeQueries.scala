package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.RangeJoin

/** Range-join query — [[RangeJoin.pointInInterval]] on the testdata:
  * each telemetry event matched against its user's onboarding window
  * (first event time + 7 days), the device-enrollment-window shape.
  * Interval table is derived from the events themselves (one interval
  * per user), times compared at µs — the shared grid with DuckDB.
  */
object RangeQueries {

  val WindowUs: Long = 7L * 24 * 60 * 60 * 1000000L // 7 days in µs

  /** q21_range_join — bucket width = the window length, so each
    * interval explodes into at most 2 bucket rows. */
  def q21RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        expr("ts_ns div 1000").as("ts_us"))
    val windows = events.groupBy(col("user_id").as("w_user"))
      .agg(min(col("ts_us")).as("start_us"))
      .withColumn("end_us", col("start_us") + WindowUs)
    RangeJoin.pointInInterval(
      events, windows,
      pointKey = col("user_id"), intervalKey = col("w_user"),
      pointTime = col("ts_us"), start = col("start_us"),
      end = col("end_us"), bucketWidth = WindowUs)
      .select(col("event_id"), col("user_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_range_join" -> q21RangeJoin)

  val oracleSql: Map[String, String] = Map(
    "q21_range_join" -> s"""
      WITH iv AS (
        SELECT user_id AS w_user, MIN(epoch_us(ts)) AS start_us,
          MIN(epoch_us(ts)) + $WindowUs AS end_us
        FROM events GROUP BY user_id)
      SELECT e.event_id, e.user_id
      FROM events e
      JOIN iv ON e.user_id = iv.w_user
        AND epoch_us(e.ts) >= iv.start_us
        AND epoch_us(e.ts) <= iv.end_us""")
}
