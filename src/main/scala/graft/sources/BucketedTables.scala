package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-parquet persistence for standing index relations (round-8)
  * — the shared machinery behind [[graft.operators.Dedup.saveIndex]]
  * and [[graft.operators.Similarity.savePqIndex]].
  *
  * Spark bucketing splits DATA (parquet files per bucket, durable)
  * from METADATA (the bucket spec, catalog state): the files survive
  * any restart, the spec lives only in the session catalog. [[save]]
  * writes both; [[load]] re-issues the external-table DDL idempotently
  * so ANY later session recovers the bucketing from (table, path)
  * alone — after which joins and aggregations on the bucket keys read
  * the relation pre-partitioned, with no Exchange above its scan. At
  * 100 TB that is the difference between probing a standing corpus
  * index and reshuffling the corpus per ingest. */
object BucketedTables {

  /** Write `df` as bucketed parquet table `table` rooted at `path`,
    * bucketed AND sorted by `keys`. Drops any previous catalog entry
    * first (the files at `path` are simply overwritten). */
  def save(df: DataFrame, table: String, path: String,
      keys: Seq[String], nBuckets: Int): Unit = {
    require(keys.nonEmpty, "bucket keys must be non-empty")
    require(nBuckets > 0, "nBuckets must be positive")
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $table")
    // repartition on the bucket keys first: a bucketed write emits one
    // file PER (task, bucket), so N input partitions × B buckets would
    // scatter each bucket over up to N small files — the small-files
    // tax is paid on every subsequent probe. Hash-repartitioning to B
    // tasks on the same keys (same Murmur3 hash the bucketing uses)
    // lands each bucket in exactly one task → one file per bucket.
    df.repartition(nBuckets, keys.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Register (if this session doesn't know it yet) and read the
    * bucketed table written by [[save]]. `schema` is the column DDL
    * (e.g. `"doc_id BIGINT, s STRING"`) — external-table DDL needs it
    * spelled out; it must match what [[save]] wrote. */
  def load(s: SparkSession, table: String, path: String, schema: String,
      keys: Seq[String], nBuckets: Int): DataFrame = {
    s.sql(
      s"""CREATE TABLE IF NOT EXISTS $table ($schema)
         |USING PARQUET
         |CLUSTERED BY (${keys.mkString(", ")})
         |SORTED BY (${keys.mkString(", ")})
         |INTO $nBuckets BUCKETS
         |LOCATION '$path'""".stripMargin)
    s.table(table)
  }
}
