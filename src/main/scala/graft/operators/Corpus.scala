package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level composition analytics (round-4 addition, SURVEY §2d) —
  * questions about GROUPS of documents (sources, domains, dumps)
  * rather than single docs: how much does source A's content overlap
  * source B's? The exact small-group complement to the KMV sketch
  * (functions/KmvSketch.scala), which answers the same question
  * approximately when the group count or gram sets are too large to
  * join exactly.
  *
  * Scale: the gram self-join is keyed by gram; a gram occurring in k
  * groups contributes k·(k-1)/2 pairs, so the join output is bounded
  * by |distinct grams| · G²/2 where G = number of groups. Sources/
  * domains number in the hundreds on real corpora — G² is tiny; the
  * gram-distinct aggregation (one shuffle) dominates, and that is
  * linear in corpus size with map-side combine. For G in the
  * thousands+, switch to [[graft.functions.KmvSketchAgg]].
  */
object Corpus {

  /** Exact pairwise n-gram Jaccard between every pair of groups.
    * Output: one row per unordered group pair (grp_a < grp_b) with
    * gram-set sizes, intersection, and jaccard — including
    * zero-overlap pairs (the full G×G/2 affinity matrix). */
  def pairwiseJaccard(docs: DataFrame, groupCol: Column, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    // group-level distinct gram sets: doc-level shingles joined back to
    // the group key, then distinct (group, gram)
    val grams = Dedup.shingles(docs, idCol, textCol, n)
      .join(docs.select(col(idCol).cast("long").as("doc_id"),
        groupCol.as("grp")), "doc_id")
      .select(col("grp"), col("s"))
      .distinct()
    val sizes = grams.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_grams"))
    val inter = grams.as("a")
      .join(grams.as("b"),
        col("a.s") === col("b.s") && col("a.grp") < col("b.grp"))
      .groupBy(col("a.grp").as("grp_a"), col("b.grp").as("grp_b"))
      .agg(count(lit(1)).as("n_inter"))
    // full pair matrix: cross of the (tiny) size table, zero-filled
    val pairs = sizes.select(col("grp").as("grp_a"), col("n_grams").as("n_a"))
      .join(sizes.select(col("grp").as("grp_b"), col("n_grams").as("n_b")),
        col("grp_a") < col("grp_b"))
    pairs.join(inter, Seq("grp_a", "grp_b"), "left")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")))
      .select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
        col("n_inter"), col("jaccard"))
  }

  /** Corpus-version diff (round-9): per-doc added / removed / changed /
    * unchanged between two snapshots — the audit a curation pipeline
    * runs after every refresh ("what did this crawl/filter change?"),
    * and the input to incremental downstream work (re-embed/re-dedup
    * only `added ∪ changed`). Content identity is md5 of the raw text
    * (swap in [[Dedup.normalized]] upstream for normalization-
    * insensitive diffs).
    *
    * Scale: each side reduces to (doc_id, hash) in its scan, then ONE
    * co-partitioned full-outer equi-join on doc_id — unique keys, so
    * no skew; nothing wider than (id, 32-byte hash) ever shuffles.
    * Contract: ids must be unique WITHIN each snapshot (true of any
    * id-keyed zone table); duplicated ids would cross-product per key
    * like any equi-join. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).cast("long").as("doc_id"),
      md5(col(textCol)).as("h_old"))
    val n = newSnap.select(col(idCol).cast("long").as("doc_id"),
      md5(col(textCol)).as("h_new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("h_old"), col("h_new"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") === col("h_new"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
