package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Deduplication family (SURVEY.md §2.5) — the LLM-training-data dedup
  * operators on `documents`/`embeddings`. Scale design:
  *
  *  - exact: one hash-partitioned groupBy on the content hash (map-side
  *    partial agg) — the only shuffle.
  *  - n-gram Jaccard / MinHash-LSH: O(n·shingles) explode + equi-join on
  *    the shingle/band key instead of the O(n²) all-pairs compare; at
  *    100 TB the band hash is the shuffle key and oversized buckets
  *    (stop-shingle skew) are the thing to salt/cap.
  *  - SimHash: per-row 64-bit signature via a codegen'd native
  *    expression, then banded hamming candidate pairs.
  *  - embedding cosine: exact all-pairs at verification scale; the
  *    production path is the LSH-bucketed ANN (§2.6 #35).
  */
object DedupQueries {

  /** Whitespace-normalized lowercase content. */
  private def normText: Column =
    lower(regexp_replace(trim(col("text")), "\\s+", " "))

  /** #29 dedup_exact — normalize → md5 → groupBy(hash): one shuffle on
    * the hash key, keeper = min(doc_id) (deterministic survivor). */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), md5(normText).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper_id"))

  /** Distinct word-3-gram shingles per document. Typed flatMap instead
    * of `transform`/`array_distinct` HOFs — the lambda-per-element HOF
    * path evaluates interpreted; a compiled sliding window over the
    * token array is ~3× faster and byte-identical in output. */
  private def shingles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .filter(col("text").isNotNull) // real feeds have nulls; skip, don't NPE
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        // same tokenization as split(lower(trim(text)), ' ') with
        // trailing empties kept (limit -1)
        val w = text.trim.toLowerCase.split(" ", -1)
        if (w.length < 3) Iterator.empty
        else w.sliding(3).map(_.mkString(" "))
          .toArray.distinct.iterator.map(sh => (id, sh))
      }
      .toDF("doc_id", "s")
  }

  /** Exact pairwise Jaccard via shingle self-join: inter from the
    * equi-join on the shingle, sizes joined back, τ filter last. The
    * shingle set feeds three plan branches — materialize once. */
  private def jaccardPairs(s: SparkSession, dir: String, tau: Double)
      : DataFrame = {
    val sh = shingles(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("n_b")), "id_b")
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("n_inter"), col("n_a"),
        col("n_b"), col("jaccard"))
  }

  /** #30 dedup_ngram_jaccard — exact Jaccard ≥ 0.5 candidate pairs. */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame =
    jaccardPairs(s, dir, 0.5)

  private val MinhashK = 16
  private val Bands = 4 // 4 bands × 4 rows

  /** #31 dedup_minhash_lsh — md5-based MinHash signatures (min over the
    * hex string is min over the hash value: fixed-width lowercase hex),
    * banded into 4 bucket keys, bucket equi-join for candidates, then
    * exact-Jaccard verification of candidates only. Deterministic and
    * oracle-expressible (DuckDB computes identical md5 hex). */
  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    // The shingle set feeds three consumers (signatures, sizes, candidate
    // verification); Spark has no common-subplan reuse across branches,
    // so materialize it once. At 100 TB this is a checkpointed
    // intermediate table, not a recompute-per-branch.
    val sh = shingles(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val minhashCols = (0 until MinhashK).map(k =>
      min(substring(md5(concat(lit(s"$k:"), col("s"))), 1, 16)).as(s"h$k"))
    val sig = sh.groupBy(col("doc_id"))
      .agg(minhashCols.head, minhashCols.tail: _*)
    val bandCols = (0 until Bands).map { b =>
      val rows = (0 until MinhashK / Bands)
        .map(r => col(s"h${b * (MinhashK / Bands) + r}"))
      md5(concat(rows: _*)).as(s"band$b")
    }
    val banded = sig.select(col("doc_id") +: bandCols: _*)
    val exploded = banded.select(col("doc_id"), expr(
      s"""stack($Bands, ${(0 until Bands)
        .map(b => s"$b, band$b").mkString(", ")}) as (band, bh)"""))
    val candidates = exploded.as("a")
      .join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // Verify ONLY the candidates: broadcast the (tiny) candidate set and
    // intersect shingles pair-wise — not the all-pairs Jaccard of #30,
    // which is exactly the O(n²)-ish work LSH exists to avoid.
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = broadcast(candidates)
      .join(sh.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sh.as("sb"),
        col("id_b") === col("sb.doc_id") && col("sa.s") === col("sb.s"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    // `inter` is candidate-pair-sized (small) — broadcast IT against the
    // per-doc sizes table, never the reverse.
    val withA = sizes.select(col("doc_id").as("id_a"), col("n").as("n_a"))
      .join(broadcast(inter), "id_a")
    sizes.select(col("doc_id").as("id_b"), col("n").as("n_b"))
      .join(broadcast(withA), "id_b")
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** #32 dedup_simhash (rows-only) — 64-bit SimHash per doc via the
    * native codegen'd expression, banded into 4×16-bit blocks; pairs
    * agreeing on ≥1 block are candidates, verified by hamming ≤ 6. */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val sigs = Tables(s, dir, "documents")
      .select(col("doc_id"),
        expr("simhash64(split(lower(trim(text)), ' '))").as("sig"))
    val blocks = sigs.select(col("doc_id"), col("sig"),
      expr("""stack(4,
        0, CAST(sig & 65535 AS BIGINT),
        1, CAST((sig >> 16) & 65535 AS BIGINT),
        2, CAST((sig >> 32) & 65535 AS BIGINT),
        3, CAST((sig >> 48) & 65535 AS BIGINT)) as (blk, bval)"""))
    blocks.as("a")
      .join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.bval") === col("b.bval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        expr("hamming64(a.sig, b.sig)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 6)
  }

  /** Embedding vectors as double arrays with their exact norm. The dot
    * is the native codegen'd `vec_dot` — a strict left-to-right sum,
    * bit-identical to the HOF fold and the oracle's list_reduce. */
  private def vecs(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Tables(s, dir, "embeddings").select(
      col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      .withColumn("nn", expr("vec_dot(e, e)"))
  }

  private def cosine(a: String, b: String): Column =
    expr(s"vec_dot($a.e, $b.e) / (sqrt($a.nn) * sqrt($b.nn))")

  /** #33 dedup_embedding — cosine ≥ 0.4 near-dup pairs. All-pairs here
    * (verification scale); production uses the §2.6 LSH path. */
  def dedupEmbedding(s: SparkSession, dir: String): DataFrame =
    vecs(s, dir).as("a")
      .join(vecs(s, dir).as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        cosine("a", "b").as("cosine"))
      .filter(col("cosine") >= 0.4)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> dedupExact,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "dedup_minhash_lsh" -> dedupMinhashLsh,
    "dedup_simhash" -> dedupSimhash,
    "dedup_embedding" -> dedupEmbedding)

  private val shingleSql = """
      words AS (
        SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        FROM documents),
      sh AS (
        SELECT DISTINCT doc_id,
          w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        FROM words, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i)
        WHERE len(w) >= 3),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      jac AS (
        SELECT id_a, id_b, n_inter, sa.n AS n_a, sb.n AS n_b,
          CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
        FROM inter
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id)"""

  val oracleSql: Map[String, String] = Map(
    "dedup_exact" -> """
      SELECT content_hash, COUNT(*) AS n_docs, MIN(doc_id) AS keeper_id
      FROM (SELECT doc_id,
              md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
                AS content_hash
            FROM documents)
      GROUP BY content_hash""",
    "dedup_ngram_jaccard" -> s"""
      WITH $shingleSql
      SELECT id_a, id_b, n_inter, n_a, n_b, jaccard
      FROM jac WHERE jaccard >= 0.5""",
    "dedup_minhash_lsh" -> s"""
      WITH $shingleSql,
      sig AS (
        SELECT doc_id,
          ${(0 until MinhashK).map(k =>
            s"MIN(substr(md5('$k:' || s), 1, 16)) AS h$k").mkString(",\n          ")}
        FROM sh GROUP BY doc_id),
      banded AS (
        SELECT doc_id,
          ${(0 until Bands).map { b =>
            val rows = (0 until MinhashK / Bands)
              .map(r => s"h${b * (MinhashK / Bands) + r}").mkString(" || ")
            s"md5($rows) AS band$b"
          }.mkString(",\n          ")}
        FROM sig),
      exploded AS (
        ${(0 until Bands).map(b =>
          s"SELECT doc_id, $b AS band, band$b AS bh FROM banded")
          .mkString("\n        UNION ALL\n        ")}),
      candidates AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM exploded a
        JOIN exploded b ON a.band = b.band AND a.bh = b.bh
          AND a.doc_id < b.doc_id)
      SELECT c.id_a, c.id_b, j.jaccard
      FROM candidates c
      JOIN jac j ON c.id_a = j.id_a AND c.id_b = j.id_b
      WHERE j.jaccard >= 0.5""",
    "dedup_embedding" -> """
      WITH v AS (
        SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings),
      n AS (
        SELECT vec_id, e,
          list_reduce(list_transform(e, x -> x * x), (x, y) -> x + y) AS nn
        FROM v)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        list_reduce(list_transform(range(1, 65), i -> a.e[i] * b.e[i]),
          (x, y) -> x + y) / (sqrt(a.nn) * sqrt(b.nn)) AS cosine
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE list_reduce(list_transform(range(1, 65), i -> a.e[i] * b.e[i]),
          (x, y) -> x + y) / (sqrt(a.nn) * sqrt(b.nn)) >= 0.4""")
}
