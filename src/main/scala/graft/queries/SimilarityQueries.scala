package graft.queries

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings` (SURVEY.md §2.6).
  *
  * #34 brute-force exact cosine top-k: broadcast the (small) query set
  * against all candidates — correct baseline, O(Q·N).
  * #35 random-hyperplane LSH: deterministic md5-seeded hyperplanes →
  * per-band bit-signature buckets → candidates only from matching
  * buckets → top-k. This is the 100 TB path: the bucket join shuffles
  * on the (band, signature) key instead of comparing all pairs, and
  * recall is tuned by bands × bits.
  */
object SimilarityQueries {

  val K = 5
  val NumQueries = 10 // query set = vec_id < 10
  val Dims = 64
  val BandBits = 6
  val NumBands = 4

  private def vecs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    graft.Tables(s, dir, "embeddings").select(
      col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      .withColumn("nn", expr("vec_dot(e, e)"))
  }

  private def cosine(a: String, b: String): Column =
    expr(s"vec_dot($a.e, $b.e) / (sqrt($a.nn) * sqrt($b.nn))")

  /** #34 ann_bruteforce_topk — exact cosine top-k per query; the query
    * side is tiny and broadcast, ranking is one window over (query). */
  def annBruteforceTopk(s: SparkSession, dir: String): DataFrame = {
    val all = vecs(s, dir)
    val queries = all.filter(col("vec_id") < NumQueries)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    broadcast(queries).as("a")
      .join(all.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("cand_id"),
        cosine("a", "b").as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
  }

  /** Deterministic ±1 hyperplane weights: sign of hyperplane p,
    * dimension d = parity of the first hex digit of md5("p:d"). Public
    * trick: any strong hash is a fine pseudo-random sign source, and it
    * reproduces everywhere (no RNG state shipped to executors). */
  def planeSign(p: Int, d: Int): Int = {
    val md = MessageDigest.getInstance("MD5")
    val h = md.digest(s"$p:$d".getBytes(StandardCharsets.UTF_8))
    if ((h(0) & 1) == 0) 1 else -1
  }

  /** Bit-signature column for one band: `bandBits` sign-projections
    * packed into an int. Each projection is a native `vec_dot` against a
    * ±1 plane shipped as a literal array — exact, deterministic, and
    * tiny codegen (vs. inlining 64 terms per bit). `planeOffset` keeps
    * different LSH families (top-k vs dedup) on independent planes. */
  private def bandSignature(band: Int, bandBits: Int = BandBits,
      planeOffset: Int = 0): Column = {
    val bits = (0 until bandBits).map { bit =>
      val p = planeOffset + band * bandBits + bit
      val plane = (0 until Dims).map(d => s"${planeSign(p, d)}.0D")
        .mkString("array(", ", ", ")")
      s"(CASE WHEN vec_dot(e, $plane) >= 0D THEN ${1 << bit} ELSE 0 END)"
    }
    expr(bits.mkString("(", " + ", ")"))
  }

  val DedupBands = 8
  val DedupBandBits = 5 // 32 buckets/band ⇒ recall ≈ 0.57 at cos 0.4

  /** dedup_embedding_lsh (rows-only; recall vs the exact #33 asserted in
    * ScalaTest) — the 100 TB path for embedding near-dup pairs: banded
    * random-hyperplane buckets (8 bands × 4 bits ⇒ ~75% recall at
    * cos 0.4, higher for closer pairs), candidates from the bucket
    * equi-join only, exact-cosine verification. The bucket key is the
    * shuffle key; `Skew.capBuckets` guards pathological buckets. */
  def dedupEmbeddingLsh(s: SparkSession, dir: String): DataFrame = {
    val all = vecs(s, dir)
    val sigCols = (0 until DedupBands).map(b =>
      bandSignature(b, DedupBandBits, planeOffset = 1000).as(s"sig$b"))
    // candidates carry ONLY ids through the bucket join + distinct —
    // never the 64-dim arrays (that shuffle width is what would kill it
    // at scale); vectors are fetched back just for the survivors
    val signed = all.select(col("vec_id") +: col("e") +: col("nn") +:
      sigCols: _*)
    val exploded = signed.select(col("vec_id"), expr(
      s"""stack($DedupBands, ${(0 until DedupBands)
        .map(b => s"$b, sig$b").mkString(", ")}) as (band, sig)"""))
    val candidates = exploded.as("a")
      .join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    candidates
      .join(all.select(col("vec_id").as("id_a"), col("e").as("ea"),
        col("nn").as("nna")), "id_a")
      .join(all.select(col("vec_id").as("id_b"), col("e").as("eb"),
        col("nn").as("nnb")), "id_b")
      .withColumn("cosine",
        expr("vec_dot(ea, eb) / (sqrt(nna) * sqrt(nnb))"))
      .filter(col("cosine") >= 0.4)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** #35 ann_lsh_topk (rows-only; recall vs #34 asserted in ScalaTest) —
    * candidates limited to vectors sharing ≥1 band bucket with the
    * query; exact cosine + window top-k on the candidate set only. */
  def annLshTopk(s: SparkSession, dir: String): DataFrame = {
    val all = vecs(s, dir)
    val sigCols = (0 until NumBands).map(b => bandSignature(b).as(s"sig$b"))
    val signed = all.select(col("vec_id") +: col("e") +: col("nn") +:
      sigCols: _*)
    val exploded = signed.select(col("vec_id"), col("e"), col("nn"), expr(
      s"""stack($NumBands, ${(0 until NumBands)
        .map(b => s"$b, sig$b").mkString(", ")}) as (band, sig)"""))
    val queries = exploded.filter(col("vec_id") < NumQueries)
    val candidates = broadcast(queries).as("a")
      .join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("a.e").as("qe"),
        col("a.nn").as("qnn"), col("b.vec_id").as("cand_id"),
        col("b.e").as("ce"), col("b.nn").as("cnn"))
      .dropDuplicates("query_id", "cand_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    candidates
      .withColumn("cosine",
        expr("vec_dot(qe, ce) / (sqrt(qnn) * sqrt(cnn))"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("cand_id"), col("cosine"), col("rank"))
  }

  val IvfCells = 16
  val IvfProbes = 3

  /** #35b ann_ivf_topk (rows-only; recall vs #34 in ScalaTest) — IVF:
    * a KMeans coarse quantizer assigns every vector to a cell (the
    * inverted lists); each query probes its `IvfProbes` nearest cells
    * and ranks exact cosine over those candidates only. At 100 TB the
    * candidate scan touches probes/cells of the data (~20% here) and
    * the cell id is the shuffle/partition key; centroids are a tiny
    * broadcastable model. Seeded ⇒ deterministic. */
  def annIvfTopk(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val all = vecs(s, dir).withColumn("fv", array_to_vector(col("e")))
    val model = new KMeans().setK(IvfCells).setSeed(42)
      .setMaxIter(5) // a coarse quantizer doesn't need convergence
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(all)
    val assigned = model.transform(all)
      .select(col("vec_id"), col("e"), col("nn"), col("cell"))
    val centers = model.clusterCenters.map(_.toArray)
    // probe list per query: nearest IvfProbes centroids (tiny driver-side
    // math over Q×K pairs — the standard IVF probe step)
    val queries = assigned.filter(col("vec_id") < NumQueries)
      .select(col("vec_id"), col("e")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val probes = queries.flatMap { case (qid, qe) =>
      centers.zipWithIndex.map { case (c, ci) =>
        val d2 = qe.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
        (qid, ci, d2)
      }.sortBy(_._3).take(IvfProbes).map { case (q, ci, _) => (q, ci) }
    }
    import s.implicits._
    val probeDf = probes.toSeq.toDF("query_id", "cell")
    val qside = assigned.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("e").as("qe"),
        col("nn").as("qnn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    broadcast(probeDf.join(qside, "query_id"))
      .join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        expr("vec_dot(qe, e) / (sqrt(qnn) * sqrt(nn))").as("cosine"))
      .dropDuplicates("query_id", "cand_id")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bruteforce_topk" -> annBruteforceTopk,
    "ann_lsh_topk" -> annLshTopk,
    "ann_ivf_topk" -> annIvfTopk,
    "dedup_embedding_lsh" -> dedupEmbeddingLsh)

  val oracleSql: Map[String, String] = Map(
    "ann_bruteforce_topk" -> s"""
      WITH v AS (
        SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings),
      n AS (
        SELECT vec_id, e,
          list_reduce(list_transform(e, x -> x * x), (x, y) -> x + y) AS nn
        FROM v),
      scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
          list_reduce(list_transform(range(1, ${Dims + 1}),
            i -> a.e[i] * b.e[i]), (x, y) -> x + y)
            / (sqrt(a.nn) * sqrt(b.nn)) AS cosine
        FROM n a JOIN n b ON a.vec_id < $NumQueries
          AND a.vec_id <> b.vec_id),
      ranked AS (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, cand_id ASC) AS BIGINT) AS rank
        FROM scored)
      SELECT query_id, cand_id, cosine, rank FROM ranked WHERE rank <= $K""")
}
