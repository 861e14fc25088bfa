package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy identity matching / entity resolution (round-7): find record
  * pairs whose key strings are within edit distance 1 — the
  * patient-identifier-typo / record-linkage check a healthcare
  * lakehouse runs before any merge (the reference's DQ005 duplicate
  * rule catches only EXACT key collisions; one mistyped digit
  * defeats it).
  *
  * Algorithm: SymSpell-style DELETION-NEIGHBORHOOD blocking. Two
  * strings are within edit distance 1 only if their single-deletion
  * neighborhoods intersect (delete ≤1 char from each), so each record
  * explodes into length+1 variants (itself + every one-char
  * deletion), candidates come from a variant equi-join, and exact
  * `levenshtein` verifies the survivors. This is EXACT for distance
  * ≤ 1 — no recall loss — and fully distributed: O(n·len) variant
  * rows, one shuffle on the variant key, never an all-pairs compare
  * and never a degenerate prefix block (the classic ER blocking
  * failure when keys share long common prefixes, which is exactly
  * what id-shaped keys do).
  *
  * Skew: a variant shared by more than `maxBucket` records is dropped
  * from the candidate universe before the join ([[Skew.capBuckets]]),
  * the same stop-key guard as the dedup family — a bucket that size
  * means a degenerate key population, and its O(b²) pairs would
  * dominate the job. The driver oracle applies the same cap.
  */
object Fuzzy {

  /** Self-match: (id_a, id_b, name_a, name_b, distance) for every
    * pair with levenshtein ≤ 1, id_a < id_b. Null/empty names never
    * match. */
  def selfMatch(df: DataFrame, idCol: String, nameCol: String,
      maxBucket: Long = Dedup.DefaultMaxBucket): DataFrame = {
    // deletion-neighborhood explosion is the expensive narrow op —
    // spread a single-split input first (no-op at real parallelism)
    val base = Skew.spread(
      df
        .select(col(idCol).cast("long").as("id"), col(nameCol).as("name"))
        .filter(col("name").isNotNull && length(col("name")) >= 1),
      col("id"))
    val variants = base.select(col("id"), col("name"), explode(expr(
        "array_union(array(name), transform(sequence(1, length(name)), " +
          "i -> concat(substring(name, 1, i - 1), " +
          "substring(name, i + 1, length(name) - i))))")).as("v"))
      .distinct()
    val capped = Skew.capBuckets(variants, Seq(col("v")), maxBucket)
    capped.as("a")
      .join(capped.as("b"),
        col("a.v") === col("b.v") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()
      .withColumn("distance",
        levenshtein(col("name_a"), col("name_b")).cast("int"))
      .filter(col("distance") <= 1)
  }
}
