package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable distributed operators for skew and ranking (SURVEY.md §4).
  *
  * AQE's skew-join splitting handles moderate skew at runtime; these
  * helpers cover the cases AQE can't: a priori hot keys in an
  * aggregation, LSH/band buckets of pathological size (stop-shingle
  * buckets), and per-key top-k without a global sort.
  */
object Skew {

  /** Salted two-phase aggregation: pre-aggregate on (key, salt) to
    * spread a hot key over `salts` reducers, then combine. `aggs` must
    * be re-aggregable (sum/count/min/max style). The salt comes from the
    * input partition id, NOT from the aggregated value — a hot key whose
    * values are constant (the common count-skew case) would otherwise
    * hash to one salt and collapse back onto a single reducer. */
  def saltedSumCount(df: DataFrame, key: Column, valueCol: Column,
      salts: Int): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy(key.as("k"), col("_salt"))
      .agg(sum(valueCol).as("_s"), count(lit(1)).as("_c"))
      .groupBy(col("k"))
      .agg(sum(col("_s")).as("sum_value"), sum(col("_c")).as("n_rows"))

  /** Broadcast-salted join for a skewed LEFT side against a small-ish
    * right side: the right side is replicated `salts` times so each hot
    * left key spreads over `salts` tasks. Deterministic salt from a
    * stable column (no rand() — results must be reproducible). */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: Column,
      rightKey: Column, saltSource: Column, salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(saltSource), lit(salts)))
    val explodedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(explodedRight,
      leftKey === rightKey && saltedLeft("_salt") === explodedRight("_salt"))
      .drop("_salt")
  }

  /** Cap pathological buckets: drop (or keep) groups larger than
    * `maxSize`. The standard guard for LSH band buckets where a
    * stop-shingle would otherwise create an O(b²) candidate explosion —
    * a bucket that big carries no similarity signal anyway. */
  def capBuckets(df: DataFrame, bucketCols: Seq[Column], maxSize: Long)
      : DataFrame = {
    val w = Window.partitionBy(bucketCols: _*)
    df.withColumn("_bucket_n", count(lit(1)).over(w))
      .filter(col("_bucket_n") <= maxSize)
      .drop("_bucket_n")
  }

  /** Spread a low-partition-count input across the session's cores
    * before an expression-heavy pipeline (MinHash md5 banks, shingle
    * explosion, vec_dot fan-outs). A small/unsplittable input plans as
    * ONE scan task, and every narrow operator downstream then runs on
    * one core regardless of cluster size (guide §2.5 "input skew");
    * hash-repartitioning on the stable id column fixes that
    * deterministically (no round-robin, no rand()). Scale-adaptive by
    * construction: an input already planned with >= defaultParallelism
    * partitions — any real 100 TB scan — passes through untouched, so
    * the extra shuffle exists only where the data is small enough for
    * it to be trivially cheap.
    *
    * SCAN-ROOTED INPUTS ONLY: the partition-count probe
    * (`queryExecution.toRdd`) is free on a scan-rooted plan, but on a
    * plan containing an exchange it would MATERIALIZE the upstream
    * query stages under AQE during "planning" and throw that work away
    * when the logical plan is re-planned with the repartition. Guarded:
    * a plan with any shuffle-introducing operator below (aggregate,
    * join, window, sort, repartition, …) passes through unchanged —
    * post-shuffle parallelism is AQE's job, not this helper's. */
  def spread(df: DataFrame, key: Column): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.{logical => lp}
    val shuffleRooted = df.queryExecution.optimizedPlan.collectFirst {
      case n @ (_: lp.Aggregate | _: lp.Join | _: lp.Window |
                _: lp.Sort | _: lp.RepartitionOperation |
                _: lp.Distinct | _: lp.Deduplicate |
                _: lp.GlobalLimit) => n
    }.isDefined
    if (shuffleRooted) df
    else {
      val p = df.sparkSession.sparkContext.defaultParallelism
      if (df.queryExecution.toRdd.getNumPartitions >= p) df
      else df.repartition(p, key)
    }
  }

  /** Top-k rows per key with a total-order tie-break — single shuffle on
    * the key, no global sort. */
  def topKPerKey(df: DataFrame, keys: Seq[Column], ordering: Seq[Column],
      k: Int): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(ordering: _*)
    df.withColumn("_rank", row_number().over(w))
      .filter(col("_rank") <= k)
      .drop("_rank")
  }
}
