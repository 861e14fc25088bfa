package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects unless `spark.sql.legacy.parquet.nanosAsLong=true`
    * (then it reads as a long of epoch-nanoseconds — exact integer
    * parity with DuckDB's epoch_ns(ts)). The conf must be set at
    * SparkSession BUILD time (Verify/Bench/SparkSpec all do): setting it
    * here per-read would be a racy session-wide side effect that also
    * silently changes how unrelated nanos parquet reads behave. */
  val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      require(spark.conf.getOption(NanosConf).contains("true"),
        s"reading 'events' requires $NanosConf=true at session build time")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events with ts exposed as `ts_ns: long` (epoch nanoseconds). */
  def events(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events").withColumnRenamed("ts", "ts_ns")
}
