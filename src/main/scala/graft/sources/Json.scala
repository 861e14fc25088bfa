package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.Tables

/** Semi-structured column handling (lakehouse ingest surface): the
  * `events.props` JSON string parsed with an enforced schema via
  * `from_json` — schema-on-read without a UDF, codegen-friendly,
  * malformed rows become NULL structs (quarantinable by the quality
  * rules rather than failing the job).
  */
object Json {

  val propsSchema: StructType =
    StructType(Seq(StructField("k", IntegerType)))

  /** events with `props` parsed to a typed struct column. */
  def eventsWithProps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("props_struct", from_json(col("props"), propsSchema))
      .withColumn("k", col("props_struct").getField("k"))

  /** q15_json_extract — typed JSON extraction + group agg on the parsed
    * value (narrow parse, one small shuffle on a 10-value key). */
  def q15JsonExtract(s: SparkSession, dir: String): DataFrame =
    eventsWithProps(s, dir)
      .groupBy(pmod(col("k"), lit(10)).as("k_bucket"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k").cast("long")).as("sum_k"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_unparsed"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q15_json_extract" -> q15JsonExtract)

  val oracleSql: Map[String, String] = Map(
    "q15_json_extract" -> """
      WITH parsed AS (
        SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        FROM events)
      SELECT k % 10 AS k_bucket, COUNT(*) AS n_events,
        CAST(SUM(CAST(k AS BIGINT)) AS BIGINT) AS sum_k,
        CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_unparsed
      FROM parsed GROUP BY 1""")
}
