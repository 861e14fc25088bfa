package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join. Spark plans a raw
  * `t BETWEEN s AND e` join predicate as a broadcast-nested-loop — the
  * O(n·m) plan that melts at scale. This operator makes it an EQUI-join:
  * bucket time by a fixed width, explode each interval into the buckets
  * it covers, and hash-join on (key, bucket); the exact containment
  * filter runs after the join. Each point lives in exactly one bucket,
  * so every qualifying (point, interval) pair matches exactly once — no
  * dedup pass.
  *
  * `bucketWidth` tunes the explosion: intervals spawn
  * ceil(len/width)+1 rows. Pick it near the typical interval length
  * (≤2 rows per interval) — the shuffle stays O(points + intervals),
  * and AQE's skew handling applies to the single hash exchange.
  */
object RangeJoin {

  /** @param points       point table; `pointTime` in any integral unit
    * @param intervals    interval table; `[start, end]` inclusive, same unit
    * @param bucketWidth  time-bucket size in the same unit
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointKey: Column, intervalKey: Column,
      pointTime: Column, start: Column, end: Column,
      bucketWidth: Long): DataFrame = {
    // exact integer floor division: `/` on longs is double division,
    // whose 53-bit mantissa mis-buckets epoch-nanosecond-scale times
    // near bucket boundaries (silently dropped pairs)
    def bucket(c: String): Column =
      expr(s"($c - pmod($c, ${bucketWidth}L)) div ${bucketWidth}L")
    val p = points
      .withColumn("_k", pointKey)
      .withColumn("_t", pointTime)
      .withColumn("_b", bucket("_t"))
    val iv = intervals
      .withColumn("_k", intervalKey)
      .withColumn("_s", start)
      .withColumn("_e", end)
      .withColumn("_b", explode(sequence(bucket("_s"), bucket("_e"))))
    p.join(iv, Seq("_k", "_b"))
      .filter(col("_t") >= col("_s") && col("_t") <= col("_e"))
      .drop("_k", "_b", "_s", "_e", "_t")
  }
}
