package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding storage transforms (round-4, §2d): L2 normalization and
  * symmetric int8 quantization — the two preprocessing steps an
  * embedding store applies before similarity search (normalized
  * vectors make cosine a plain dot product; int8 cuts the footprint
  * 4× with a per-vector scale).
  *
  * Both are narrow codegen'd projections — no shuffle, no state, scan
  * speed at any corpus size. All float math is float→double cast then
  * strict left-to-right folds (`vec_dot` /
  * [[graft.functions.VecOps]]), the same IEEE-754 contract the
  * similarity family uses, so results are bit-reproducible across
  * engines and cluster sizes.
  *
  * The driver-facing queries emit one row per (vector, dimension) —
  * scalar columns hash exactly; the array-valued forms are the
  * library API.
  */
object Embeddings {

  /** (id, e, nn) via [[Similarity.vecs]] — shared normalize/score
    * plumbing. */
  private def vecs(df: DataFrame, idCol: String, vecCol: String) =
    Similarity.vecs(df, idCol, vecCol)

  /** Library form: adds `e_norm: array<double>` (unit L2 norm) and
    * `l2_norm: double`. Zero vectors pass through unchanged (norm 0,
    * e_norm = e) rather than emitting NaNs. */
  def normalize(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    vecs(df, idCol, vecCol)
      .withColumn("l2_norm", sqrt(col("nn")))
      .withColumn("e_norm",
        when(col("nn") === 0.0, col("e"))
          .otherwise(expr("transform(e, x -> x / sqrt(nn))")))
      .select(col("vec_id"), col("e_norm"), col("l2_norm"))

  /** Driver form: one row per dimension, 1-based `dim_ix` (matching
    * SQL list indexing). Output: (vec_id, dim_ix, val_norm). */
  def normalizeExploded(df: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    vecs(df, idCol, vecCol)
      .select(col("vec_id"), col("nn"),
        posexplode(col("e")).as(Seq("_pos", "_x")))
      .select(
        col("vec_id"),
        (col("_pos") + 1).cast("long").as("dim_ix"),
        when(col("nn") === 0.0, col("_x"))
          .otherwise(col("_x") / sqrt(col("nn"))).as("val_norm"))

  /** Symmetric int8 quantization: q = round(x · 127 / max|x|), scale =
    * max|x| / 127 (so x ≈ q · scale). Driver form, one row per
    * dimension: (vec_id, dim_ix, q_val, scale). The max-abs fold is
    * order-independent (exact), the quantize arithmetic is the same
    * double expression both engines evaluate — hash-exact. */
  def quantizeInt8Exploded(df: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    vecs(df, idCol, vecCol)
      .withColumn("_maxabs",
        aggregate(col("e"), lit(0.0), (acc, x) => greatest(acc, abs(x))))
      .select(col("vec_id"), col("_maxabs"),
        posexplode(col("e")).as(Seq("_pos", "_x")))
      .select(
        col("vec_id"),
        (col("_pos") + 1).cast("long").as("dim_ix"),
        when(col("_maxabs") === 0.0, lit(0L))
          .otherwise(round(col("_x") * 127.0 / col("_maxabs")))
          .cast("long").as("q_val"),
        (col("_maxabs") / 127.0).as("scale"))
}
