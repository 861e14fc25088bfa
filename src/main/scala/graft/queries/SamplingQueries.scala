package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Sampling

/** Deterministic-sampling queries — [[Sampling]] applied to `documents`.
  * Hash-addressed sampling is reproducible across engines, so both
  * entries are DuckDB-oracle-checked (an RNG sample never could be).
  */
object SamplingQueries {

  val Fraction = 0.25
  val Quota = 40
  private val Threshold: Long = (Fraction * Sampling.HashSpace).toLong

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** sample_bernoulli — deterministic 25% sample keyed on doc_id. */
  def sampleBernoulli(s: SparkSession, dir: String): DataFrame =
    Sampling.bernoulli(docs(s, dir), col("doc_id"), Fraction)
      .select(col("doc_id"), col("lang"), col("source"))

  /** sample_stratified — up to 40 docs per language, hash-ordered. */
  def sampleStratified(s: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedTake(
      docs(s, dir).select(col("doc_id"), col("lang")),
      col("lang"), col("doc_id"), Quota)

  /** sample_split — deterministic 80/10/10 train/val/test assignment
    * keyed on doc_id (round-4, §2d). */
  def sampleSplit(s: SparkSession, dir: String): DataFrame =
    Sampling.split(
      docs(s, dir).select(col("doc_id"), col("source")),
      col("doc_id"),
      Seq("train" -> 80, "val" -> 10, "test" -> 10))

  val Seed = "epoch0"
  val Shards = 16

  /** #170 training_order — [[Sampling.trainingOrder]]: the seeded
    * epoch permutation (shard + exact within-shard position) every
    * reproducible training run needs; same seed = bit-identical order
    * on any engine, next seed = next epoch. Positions come from the
    * order-aligned bucket identity, never a ≤nShards-reducer sort. */
  def trainingOrder(s: SparkSession, dir: String): DataFrame =
    Sampling.trainingOrder(docs(s, dir).select(col("doc_id")),
      col("doc_id"), Seed, Shards)
      .withColumnRenamed("k", "doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_bernoulli" -> sampleBernoulli,
    "sample_stratified" -> sampleStratified,
    "sample_split" -> sampleSplit,
    "training_order" -> trainingOrder)

  /** The 60-bit md5 hash bucket, as DuckDB SQL. */
  private val bucket =
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"

  val oracleSql: Map[String, String] = Map(
    "sample_bernoulli" -> s"""
      SELECT doc_id, lang, source FROM documents
      WHERE $bucket < $Threshold""",
    "sample_stratified" -> s"""
      SELECT doc_id, lang, sample_rank FROM (
        SELECT doc_id, lang,
          CAST(row_number() OVER (PARTITION BY lang
            ORDER BY $bucket ASC, doc_id ASC) AS BIGINT) AS sample_rank
        FROM documents)
      WHERE sample_rank <= $Quota""",
    "sample_split" -> s"""
      SELECT doc_id, source,
        CASE WHEN ($bucket) % 100 < 80 THEN 'train'
             WHEN ($bucket) % 100 < 90 THEN 'val'
             ELSE 'test' END AS split
      FROM documents""",
    "training_order" -> s"""
      WITH h AS (
        SELECT doc_id,
          CAST(('0x' || substr(md5('$Seed:' || CAST(doc_id AS VARCHAR)),
            1, 15)) AS BIGINT) AS hv
        FROM documents)
      SELECT doc_id, hv % $Shards AS shard,
        CAST(row_number() OVER (PARTITION BY hv % $Shards
          ORDER BY hv ASC, doc_id ASC) AS BIGINT) AS pos
      FROM h""")
}
