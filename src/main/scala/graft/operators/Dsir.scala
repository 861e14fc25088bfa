package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): select raw-corpus documents whose hashed n-gram
  * feature distribution looks like a TARGET corpus — the
  * data-selection method that picks "Wikipedia-like" (or
  * domain-like) text out of a web crawl without training a
  * classifier. Completes the selection family beside the NB quality
  * classifier (discriminative), perplexity buckets (model-based) and
  * mixture reweighting (source-level): DSIR is distribution-matching
  * at the FEATURE level, so it ranks individual documents even
  * inside one source.
  *
  * Method (the paper's hashed n-gram variant):
  *  1. features: unigrams + bigrams of the normalized token stream,
  *     hashed into a fixed bucket space — here the first 4 hex chars
  *     of md5 (65,536 buckets), so the bucketing is engine-portable
  *     and needs no modulo arithmetic;
  *  2. bucket distributions p_target / p_raw estimated with +1
  *     (Laplace) smoothing over the UNION bucket universe;
  *  3. per-doc log importance weight
  *     `w_d = Σ_b count_d(b) · ln(p_t(b) / p_r(b))`;
  *  4. Gumbel-top-k resampling: rank by `w_d + g_d` where `g_d` is
  *     deterministic seeded Gumbel noise (md5-derived uniform), the
  *     standard without-replacement sampling trick — `noise = false`
  *     gives plain top-k by weight.
  *
  * Scale: two feature scans (raw + target) feeding map-side-combined
  * (doc, bucket) and (bucket) counts; the distributions are
  * bucket-space-sized (≤ 65,536 rows — broadcast); the per-doc weight
  * is one join of the doc-feature relation against that broadcast
  * plus a doc-keyed sum; selection is a TakeOrderedAndProject, never
  * a global sort. Nothing corpus-sized shuffles except the
  * (doc, bucket) aggregation, which is the data itself.
  *
  * The weight is a float sum of logs — deliberately NOT
  * oracle-hashed (libm ulp differences across engines); correctness
  * rides the exact-arithmetic spec against a hand-computed reference
  * (Round12Spec) and the rows-only driver entry, the
  * [[Vocab.trainBpe]] precedent.
  */
object Dsir {

  val Buckets = 65536 // 16^4 — the md5-prefix bucket space

  private def guard(docs: DataFrame): Unit =
    Seq("_tok", "_b", "_cnt", "_w", "_g", "_u").foreach(c =>
      require(!docs.columns.contains(c),
        s"input column $c collides with DSIR internals; rename it first"))

  /** (doc_id, _b, _cnt): the doc's hashed feature counts — unigrams +
    * bigrams of the normalized token stream, bucket = first 4 md5 hex
    * chars of the feature string. Typed mapPartitions (one reused
    * MessageDigest per partition) — the same compiled-beats-interpreted
    * trade [[Dedup.shingles]] documents, byte-identical buckets. */
  private[graft] def featureCounts(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // a non-numeric id would cast to null here and every weight
    // downstream would silently come back 0 — fail fast instead,
    // matching the caller-named-column discipline of the rest of the
    // operator surface (e.g. winnow's analysis checks)
    val idType = docs.schema(idCol).dataType
    require(Seq(org.apache.spark.sql.types.ByteType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.LongType).contains(idType),
      s"DSIR id column '$idCol' must be an integral type, got " +
        s"${idType.simpleString}; hash string ids to long first " +
        "(e.g. xxhash64(id))")
    // md5 feature hashing is the expensive narrow op — spread a
    // single-split input over the cores first (Skew.spread no-ops at
    // real scan parallelism; bucket counts are partition-independent)
    Skew.spread(
      docs.select(col(idCol).cast("long").as("doc_id"),
        Dedup.normalized(col(textCol)).as("_t"))
        .filter(col("_t").isNotNull),
      col("doc_id"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def bucket(f: String): String = {
          val d = md.digest(f.getBytes("UTF-8"))
          f"${d(0) & 0xff}%02x${d(1) & 0xff}%02x"
        }
        it.flatMap { case (id, t) =>
          val w = t.split(" ").filter(_.nonEmpty)
          val uni = w.iterator.map(bucket)
          val bi = w.iterator.zip(w.iterator.drop(1))
            .map { case (a, b) => bucket(a + " " + b) }
          (uni ++ bi).map(b => (id, b))
        }
      }
      .toDF("doc_id", "_b")
      .groupBy(col("doc_id"), col("_b"))
      .agg(count(lit(1)).as("_cnt"))
  }

  /** (_b, _w): the smoothed log importance ratio
    * `ln(p_t(b)) − ln(p_r(b))` per bucket present in EITHER corpus —
    * bucket-space-sized, the broadcast side of the weighting join. */
  private[graft] def logRatios(rawFeats: DataFrame,
      targetFeats: DataFrame): DataFrame = {
    val nRaw = rawFeats.groupBy(col("_b")).agg(sum(col("_cnt")).as("_nr"))
    val nTgt = targetFeats.groupBy(col("_b")).agg(sum(col("_cnt")).as("_nt"))
    val universe = nRaw.join(nTgt, Seq("_b"), "full_outer")
      .select(col("_b"), coalesce(col("_nr"), lit(0L)).as("_nr"),
        coalesce(col("_nt"), lit(0L)).as("_nt"))
    // totals + universe size: one tiny driver row (bucket-space agg)
    val t = universe.agg(sum(col("_nr")), sum(col("_nt")),
      count(lit(1))).head()
    val (totR, totT, u) = (t.getLong(0), t.getLong(1), t.getLong(2))
    universe.select(col("_b"),
      (log((col("_nt") + 1).cast("double") / (totT + u)) -
        log((col("_nr") + 1).cast("double") / (totR + u))).as("_w"))
  }

  /** Per-doc log importance weights of the RAW corpus against the
    * TARGET: (doc_id, weight). Docs with zero features weigh 0. */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    guard(raw); guard(target)
    // each feature relation is consumed by BOTH the distribution agg
    // (incl. its construction-time totals read) and the weighting
    // join — checkpoint once instead of re-exploding the corpus per
    // consumer ((doc, bucket)-count sized, far below the token
    // stream; the blocks ride the result plan for [[Dedup.release]])
    val fRaw = featureCounts(raw, idCol, textCol).localCheckpoint(true)
    val ratios = logRatios(fRaw,
      featureCounts(target, idCol, textCol).localCheckpoint(true))
    val w = fRaw.join(broadcast(ratios), Seq("_b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("_cnt") * col("_w")).as("weight"))
    raw.select(col(idCol).as("doc_id")).join(w, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("weight"), lit(0.0)).as("weight"))
  }

  /** The hash-gated twin's scoring core: a TRANSCENDENTAL-FREE
    * fixed-point log. `ln` is the one piece of DSIR a cross-engine
    * oracle cannot replay (libm ulp differences), so the seeded twin
    * computes `floor(lnApprox(num/den) · 2³⁰)` as a BIGINT from
    * arithmetic that IS engine-portable:
    *
    *  1. exact integer range reduction — `k₀ = bitlen(num) −
    *     bitlen(den)` (via `length(bin(x))`, both engines exact),
    *     shift the integer with the SMALLER bit length so the
    *     mantissa ratio `m = numS/denS ∈ [1, 2)` is one double
    *     division of two exactly-representable integers;
    *  2. `ln(m)` by the atanh series `2z(1 + z²(1/3 + z²(1/5 + … +
    *     z²/15)))`, `z = (m−1)/(m+1) ∈ [0, 1/3]` — only +,−,×,÷ on
    *     doubles, IEEE-exact in any engine evaluating the same tree
    *     (truncation error < 5·10⁻⁹, below the 2⁻³⁰ fixed-point
    *     resolution);
    *  3. `ln(x) = k·ln2 + ln(m)` with ln2 as a shared double literal.
    *
    * The BIGINT weight sum downstream is then exact and
    * ORDER-INDEPENDENT — no float-sum partition sensitivity, no libm.
    * Overflow headroom: |score| ≤ ~2²⁰·2³⁰ and per-doc Σ cnt·score
    * stays far under 2⁶³ for any corpus whose token count fits 2⁵³
    * (the same bound the exact-double smoothing already needs). */
  private[graft] def fixedLog(df: DataFrame, num: String,
      den: String, out: String): DataFrame = {
    val third = lit(1.0) / lit(3.0)
    val fifth = lit(1.0) / lit(5.0)
    val seventh = lit(1.0) / lit(7.0)
    val ninth = lit(1.0) / lit(9.0)
    val eleventh = lit(1.0) / lit(11.0)
    val thirteenth = lit(1.0) / lit(13.0)
    val fifteenth = lit(1.0) / lit(15.0)
    df.withColumn("_k0",
      (length(bin(col(num))) - length(bin(col(den)))).cast("int"))
      .withColumn("_ns", expr(
        s"CASE WHEN _k0 >= 0 THEN $num ELSE shiftleft($num, -_k0) END"))
      .withColumn("_ds", expr(
        s"CASE WHEN _k0 >= 0 THEN shiftleft($den, _k0) ELSE $den END"))
      .withColumn("_m0", col("_ns").cast("double") / col("_ds").cast("double"))
      .withColumn("_k",
        when(col("_m0") < 1.0, col("_k0") - 1).otherwise(col("_k0"))
          .cast("double"))
      .withColumn("_m",
        when(col("_m0") < 1.0, col("_m0") * lit(2.0)).otherwise(col("_m0")))
      .withColumn("_zz", (col("_m") - lit(1.0)) / (col("_m") + lit(1.0)))
      .withColumn("_z2", col("_zz") * col("_zz"))
      .withColumn(out, floor(
        (col("_k") * lit(0.6931471805599453) +
          lit(2.0) * col("_zz") * (lit(1.0) + col("_z2") * (third +
            col("_z2") * (fifth + col("_z2") * (seventh +
              col("_z2") * (ninth + col("_z2") * (eleventh +
                col("_z2") * (thirteenth +
                  col("_z2") * fifteenth)))))))) *
          lit(1073741824.0)).cast("long"))
      .drop("_k0", "_ns", "_ds", "_m0", "_k", "_m", "_zz", "_z2")
  }

  /** Hash-gated DSIR twin: the SAME pipeline as [[resample]] —
    * hashed n-gram features, Laplace-smoothed distributions over the
    * union bucket universe, broadcast weighting join, top-k by
    * importance — with the literal `ln` replaced by [[fixedLog]]'s
    * fixed-point BIGINT score, so every value the entry emits is
    * exact integer arithmetic a DuckDB oracle replays bit-for-bit
    * (the seeded-ANN-twin doctrine: same plan shape, deterministic
    * scoring). Bucket score = fixedLog of the exact smoothed-ratio
    * rational `((n_t+1)(totR+u)) / ((n_r+1)(totT+u))`; per-doc
    * weight = Σ cnt·score (BIGINT, order-free); selection = plain
    * top-k (no Gumbel — `−ln(−ln u)` is transcendental again).
    * Output: (rank, doc_id, weight). */
  def resampleSeeded(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    guard(raw); guard(target)
    val fRaw = featureCounts(raw, idCol, textCol).localCheckpoint(true)
    val fTgt = featureCounts(target, idCol, textCol).localCheckpoint(true)
    val nRaw = fRaw.groupBy(col("_b")).agg(sum(col("_cnt")).as("_nr"))
    val nTgt = fTgt.groupBy(col("_b")).agg(sum(col("_cnt")).as("_nt"))
    val universe = nRaw.join(nTgt, Seq("_b"), "full_outer")
      .select(col("_b"), coalesce(col("_nr"), lit(0L)).as("_nr"),
        coalesce(col("_nt"), lit(0L)).as("_nt"))
    val t = universe.agg(sum(col("_nr")), sum(col("_nt")),
      count(lit(1))).head()
    val (totR, totT, u) = (t.getLong(0), t.getLong(1), t.getLong(2))
    val scored = fixedLog(
      universe.select(col("_b"),
        ((col("_nt") + 1L) * lit(totR + u)).as("_num"),
        ((col("_nr") + 1L) * lit(totT + u)).as("_den")),
      "_num", "_den", "_w").select(col("_b"), col("_w"))
    val w = fRaw.join(broadcast(scored), Seq("_b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("_cnt") * col("_w")).as("weight"))
    val top = raw.select(col(idCol).cast("long").as("doc_id"))
      .join(w, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("weight"), lit(0L)).as("weight"))
      .orderBy(col("weight").desc, col("doc_id").asc).limit(k)
    top.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("weight").desc, col("doc_id").asc)).cast("long"))
      .select(col("rank"), col("doc_id"), col("weight"))
  }

  /** Deterministic seeded Gumbel noise per doc: uniform from 60 md5
    * bits of (seed, doc_id), then `−ln(−ln(u))`. */
  private def gumbel(idCol: Column, seed: Long): Column = {
    val u = (conv(substring(md5(concat(lit(s"dsir:$seed:"),
      idCol.cast("string"))), 1, 15), 16, 10).cast("double") + 0.5) /
      math.pow(16.0, 15)
    -log(-log(u))
  }

  /** Select `k` raw docs by importance resampling: rank on
    * `weight + Gumbel(seed)` (`noise = false` → plain top-k by
    * weight; ties broken by doc_id for determinism). Output:
    * (rank, doc_id, weight) — rank 1 = best. */
  def resample(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, seed: Long = 0L,
      noise: Boolean = true): DataFrame = {
    require(k > 0, "k must be positive")
    val w = importanceWeights(raw, target, idCol, textCol)
    val keyed = w.withColumn("_g",
      if (noise) col("weight") + gumbel(col("doc_id"), seed)
      else col("weight"))
    // TakeOrderedAndProject (orderBy+limit), never a global sort; the
    // rank window runs over the k survivors only
    val top = keyed.orderBy(col("_g").desc, col("doc_id").asc).limit(k)
    top.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("_g").desc, col("doc_id").asc)).cast("long"))
      .select(col("rank"), col("doc_id"), col("weight"))
  }
}
