package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated star schema (see TESTDATA.md).
  *
  * Healthcare mapping (reference: /root/reference README.md:15-28 medallion
  * zones): customer≈patients, orders≈encounters, lineitem≈claims,
  * events≈device telemetry, documents≈clinical notes, embeddings≈note
  * embeddings.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** When events.ts is parquet TIMESTAMP(NANOS), Spark's vectorized
    * reader rejects it unless `spark.sql.legacy.parquet.nanosAsLong=true`
    * (then it reads as a long of epoch-nanoseconds — exact integer
    * parity with DuckDB's epoch_ns(ts)). The conf must be set at
    * SparkSession BUILD time (Verify/Bench/SparkSpec all do): setting it
    * here per-read would be a racy session-wide side effect that also
    * silently changes how unrelated nanos parquet reads behave. The conf
    * is a no-op for micros/millis footers, so setting it unconditionally
    * is safe across testdata generations. */
  val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    try spark.read.parquet(s"$dir/$name.parquet")
    catch {
      // only a TIMESTAMP(NANOS) footer needs the legacy conf; surface the
      // build-time remedy instead of Spark's raw "Illegal Parquet type"
      case e: Exception
          if name == "events" && Option(e.getMessage).exists(_.contains("NANOS")) &&
            !spark.conf.getOption(NanosConf).contains("true") =>
        throw new IllegalArgumentException(
          s"'events' has a TIMESTAMP(NANOS) footer; set $NanosConf=true at session build time", e)
    }

  /** events with ts exposed as `ts_ns: long` (epoch nanoseconds),
    * regardless of how the parquet footer encodes the timestamp:
    *   - TIMESTAMP(NANOS) read under [[NanosConf]] → already an
    *     epoch-nanos long, just renamed;
    *   - TIMESTAMP(MICROS)/(MILLIS) → TimestampType/TimestampNTZType;
    *     `unix_micros` ×1000 is exact long arithmetic (no float, no TZ
    *     shift — session TZ is pinned UTC by every entry point, so the
    *     NTZ→TZ cast is the identity on the underlying micros value).
    * DuckDB oracles use epoch_ns(ts), which is exact for every encoding,
    * so the two sides agree without per-unit oracle forks. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = apply(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumnRenamed("ts", "ts_ns")
      case TimestampNTZType | TimestampType =>
        df.select(df.columns.map {
          case "ts" => (unix_micros(col("ts").cast(TimestampType)) * lit(1000L)).as("ts_ns")
          case c    => col(c)
        }: _*)
      case other =>
        throw new IllegalArgumentException(s"events.ts has unsupported type $other")
    }
  }

  /** Raw `ts` as TimestampType at micros precision, whatever the footer
    * encoding — for callers (streaming file sources) that keep the raw
    * events schema rather than going through [[events]]. */
  def tsCol(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType                         => expr("timestamp_micros(ts div 1000)")
    case TimestampNTZType | TimestampType => col("ts").cast(TimestampType)
    case other =>
      throw new IllegalArgumentException(s"events.ts has unsupported type $other")
  }
}
