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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects; read it as a long of epoch-nanoseconds instead.
      // Exact integer parity with DuckDB's epoch_ns(ts).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events with ts exposed as `ts_ns: long` (epoch nanoseconds). */
  def events(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events").withColumnRenamed("ts", "ts_ns")
}
