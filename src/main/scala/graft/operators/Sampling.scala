package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation. Both operators
  * sample by CONTENT-ADDRESSED hash, not an RNG: the same row is picked
  * on every run, every engine, every cluster size — the property a
  * curation pipeline needs for audit/replay (and what makes the DuckDB
  * oracle possible; `rand()`-based sampling can never hash-match).
  *
  * Scale: [[bernoulli]] is a narrow codegen'd filter at scan speed
  * (no shuffle, no state). [[stratifiedTake]] is one shuffle on the
  * stratum key; its rank≤quota filter gets Spark's WindowGroupLimit
  * pushdown, so each task keeps only `quota` rows per stratum.
  */
object Sampling {

  /** 60-bit uniform hash of the key: first 15 hex chars of md5. */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** 2^60 — the hash space [[hashBucket]] draws from. */
  val HashSpace: Double = math.pow(2, 60)

  /** Keep a row iff hash(key)/2^60 < fraction. Deterministic Bernoulli
    * sample keyed on row identity. */
  def bernoulli(df: DataFrame, keyCol: Column, fraction: Double): DataFrame =
    df.filter(hashBucket(keyCol) < (fraction * HashSpace).toLong)

  /** Weighted Bernoulli sample (round-3 addition, §2c): keep a row with
    * probability min(1, weight·num/den) — up-weighting high-value
    * documents (quality score, length, source priority) in a training
    * mix while staying deterministic and engine-reproducible. The
    * inclusion test is PURE INTEGER arithmetic ((hash mod den) <
    * weight·num), so the DuckDB oracle matches bit-for-bit where a
    * float threshold could diverge in the last ulp. Narrow codegen'd
    * filter — no shuffle, scan speed.
    *
    * `weightCol` MUST be an integral column (ADVICE r3): a fractional
    * weight like a 0..1 quality score would silently floor to 0 under
    * a cast and never be sampled. Pre-scale fractional weights into
    * num/den instead (e.g. weight 0.9 ⇒ weight=9, num·=1, den·=10) —
    * enforced here at plan-build time, not left to a runtime surprise. */
  def weightedBernoulli(df: DataFrame, keyCol: Column, weightCol: Column,
      num: Long, den: Long): DataFrame = {
    require(num > 0 && den > 0, "num/den must be positive")
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val wt = df.select(weightCol).schema.head.dataType
    val integral = wt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    require(integral,
      s"weightCol must be integral (byte/short/int/long), got " +
        s"${wt.simpleString}: fractional weights floor to 0 silently; " +
        "pre-scale them into num/den")
    df.filter(pmod(hashBucket(keyCol), lit(den)) <
      least(weightCol.cast("long") * num, lit(den)))
  }

  /** Deterministic train/val/test assignment (round-4, §2d): every row
    * gets a `split` label by content-addressed hash, with integer
    * percentage weights summing to 100. The assignment is stable across
    * runs, engines, and cluster sizes — the property an experiment
    * pipeline needs so a doc never migrates between train and eval.
    * Narrow codegen'd projection, no shuffle. */
  def split(df: DataFrame, keyCol: Column,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "split weights must be positive")
    require(splits.map(_._2).sum == 100, "split weights must sum to 100")
    val bucket = pmod(hashBucket(keyCol), lit(100L))
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val labeled = splits.map(_._1).zip(cum)
    val assigned = labeled.init.foldRight(
      lit(labeled.last._1): Column) { case ((name, hi), rest) =>
      when(bucket < hi, lit(name)).otherwise(rest)
    }
    df.withColumn("split", assigned)
  }

  /** Top-`quota` rows per stratum under an EXPLICIT ordering (round-4,
    * §2d) — the per-source quality quota of a training-mix recipe:
    * "keep the best Q docs from each source". `orderCols` must be a
    * total order within each stratum (append a hash/id tie-break).
    * Adds `quota_rank`; one shuffle, WindowGroupLimit keeps only Q rows
    * per stratum per task. */
  def takeTopBy(df: DataFrame, strataCol: Column, orderCols: Seq[Column],
      quota: Int): DataFrame = {
    val w = Window.partitionBy(strataCol).orderBy(orderCols: _*)
    df.withColumn("quota_rank", row_number().over(w).cast("long"))
      .filter(col("quota_rank") <= quota)
  }

  /** Exactly `quota` rows per stratum (fewer if the stratum is smaller),
    * chosen by hash order with the key as tie-break — a deterministic
    * per-class cap for building balanced training mixes. Adds
    * `sample_rank` (1-based within the stratum). */
  def stratifiedTake(df: DataFrame, strataCol: Column, keyCol: Column,
      quota: Int): DataFrame = {
    val w = Window.partitionBy(strataCol)
      .orderBy(hashBucket(keyCol).asc, keyCol.asc)
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= quota)
  }

  /** Deterministic TRAINING ORDER: a seeded global shuffle with shard
    * assignment and EXACT 1-based positions within each shard —
    * `(key, shard, pos)` such that replaying with the same seed
    * reproduces the epoch's data order bit-for-bit on any engine (the
    * reproducibility contract training runs need for resume/ablation;
    * a new seed is a new epoch permutation). Shard = hash mod
    * `nShards`; within-shard order = (hash asc, key asc).
    *
    * Scale: positions are NOT computed with a per-shard window (that
    * is a ≤nShards-reducer sort of the corpus — the banding cliff).
    * The hash splits into `nBuckets` ORDER-ALIGNED buckets per shard:
    * ranks come from (shard, bucket)-keyed windows (corpus/(shards·
    * buckets)-sized partitions), bucket offsets from a cumulative sum
    * over the (shard, bucket) COUNT relation (shards·buckets rows),
    * broadcast back — same identity as [[graft.operators.Banding]],
    * exact result, no wide sort. */
  def trainingOrder(df: DataFrame, keyCol: Column, seed: String,
      nShards: Int, nBuckets: Int = 1024): DataFrame = {
    require(nShards > 0 && nBuckets > 0, "shards/buckets must be positive")
    val width = math.max(1L, (HashSpace / nBuckets).toLong)
    val base = df.select(keyCol.as("k"),
      hashBucket(concat(lit(seed), lit(":"), keyCol.cast("string")))
        .as("_h"))
      .withColumn("shard", pmod(col("_h"), lit(nShards.toLong)))
      .withColumn("_b", (col("_h") / lit(width)).cast("long"))
    val rankW = Window.partitionBy(col("shard"), col("_b"))
      .orderBy(col("_h").asc, col("k").asc)
    val ranked = base.withColumn("_r", row_number().over(rankW).cast("long"))
    val offW = Window.partitionBy(col("shard")).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("shard"), col("_b"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_off", coalesce(sum(col("_n")).over(offW), lit(0L)))
      .select(col("shard"), col("_b"), col("_off"))
    ranked.join(broadcast(offsets), Seq("shard", "_b"))
      .select(col("k"), col("shard"), (col("_off") + col("_r")).as("pos"))
  }
}
