package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

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
  val IvfCells = 16
  val IvfProbes = 3
  val DedupBands = 8
  val DedupBandBits = 5 // 32 buckets/band ⇒ recall ≈ 0.57 at cos 0.4

  private def embs(s: SparkSession, dir: String): DataFrame =
    graft.Tables(s, dir, "embeddings")

  /** #34 ann_bruteforce_topk — [[Similarity.bruteforceTopK]]. */
  def annBruteforceTopk(s: SparkSession, dir: String): DataFrame =
    Similarity.bruteforceTopK(embs(s, dir), "vec_id", "embedding",
      isQuery = col("vec_id") < NumQueries, k = K)

  /** #35 ann_lsh_topk (rows-only; recall vs #34 in ScalaTest) —
    * [[Similarity.lshTopK]], the 100 TB path. */
  def annLshTopk(s: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(embs(s, dir), "vec_id", "embedding",
      isQuery = col("vec_id") < NumQueries, k = K,
      bands = NumBands, bandBits = BandBits, dims = Dims)

  /** #35b ann_ivf_topk (rows-only) — [[Similarity.ivfTopK]]: KMeans
    * coarse quantizer, probed inverted lists. */
  def annIvfTopk(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(embs(s, dir), "vec_id", "embedding",
      isQuery = col("vec_id") < NumQueries, k = K,
      cells = IvfCells, nProbes = IvfProbes)

  /** #35c ann_ivf_seeded — [[Similarity.ivfTopKSeeded]]: the IVF
    * plan with DATA-SEEDED centroids (vec_id < cells), fully
    * deterministic and SQL-replayable — the driver gate hash-checks
    * the inverted-list path end to end (assignment, probing, exact
    * rerank), the oracle upgrade ann_ivf_topk's KMeans
    * nondeterminism forbids. */
  def annIvfSeeded(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopKSeeded(embs(s, dir), "vec_id", "embedding",
      isQuery = col("vec_id") < NumQueries, k = K,
      cells = IvfCells, nProbes = IvfProbes)

  /** #35d ann_pq_seeded — [[Similarity.pqTopKSeeded]]: the flat-PQ
    * codes→ADC→rerank plan with DATA-SEEDED codebooks (subvectors of
    * vec_id < codebook) and a pivoted fixed-order ADC sum, fully
    * deterministic and SQL-replayable — the driver gate hash-checks
    * the product-quantization serving shape end to end (codebook
    * build, argmin encode, distance tables, ADC ranking, exact
    * rerank), the oracle upgrade ann_pq_topk's KMeans codebooks
    * forbid. Same config as ann_pq_topk. */
  def annPqSeeded(s: SparkSession, dir: String): DataFrame =
    Similarity.pqTopKSeeded(embs(s, dir), "vec_id", "embedding",
      isQuery = col("vec_id") < NumQueries, k = K,
      subspaces = PqSubspaces, codebook = PqCodebook, rerank = PqRerank)

  /** dedup_embedding_lsh (rows-only) — [[Similarity.dedupEmbeddingLsh]]
    * at cos ≥ 0.4. */
  def dedupEmbeddingLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.dedupEmbeddingLsh(embs(s, dir), "vec_id", "embedding",
      tau = 0.4, bands = DedupBands, bandBits = DedupBandBits, dims = Dims)

  /** kNN-graph LSH family: more, coarser bands than the top-k family
    * (recall over precision — a graph wants edges for every node). */
  val GraphK = 3
  val GraphBands = 8
  val GraphBandBits = 4
  val GraphPlaneOffset = 3000

  /** knn_graph — [[Similarity.knnGraph]]: exact 3-NN for EVERY vector
    * (round-4, §2d; O(n²) verification baseline). */
  def knnGraph(s: SparkSession, dir: String): DataFrame =
    Similarity.knnGraph(embs(s, dir), "vec_id", "embedding", k = GraphK)

  /** knn_graph_lsh — [[Similarity.knnGraphLsh]]: the id-only bucketed
    * scale path for the same graph. */
  def knnGraphLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.knnGraphLsh(embs(s, dir), "vec_id", "embedding",
      k = GraphK, bands = GraphBands, bandBits = GraphBandBits,
      dims = Dims, planeOffset = GraphPlaneOffset)

  val PqSubspaces = 8
  val PqCodebook = 16
  val PqRerank = 10 * K // recall@5 0.22 (approx) -> 0.7 (reranked)

  /** The PQ index is the corpus' standing structure, not the query's:
    * build it once per (session, corpus) and serve every query run
    * from it — the same amortization the persisted dedup index makes
    * explicit. The cache amortizes the KMeans fits; the codes relation
    * stays a lazy scan-speed projection (deliberately not checkpointed
    * — the query mains release checkpoint blocks after consuming each
    * result, which would kill a cached materialization). */
  // keyed by (session, dir), not dir alone: the cached DataFrames are
  // bound to the session that built them, and a test-harness rerun that
  // stops and recreates the session in the same JVM must rebuild rather
  // than serve plans from the dead session (round-9 ADVICE fix)
  private val pqIndexCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Similarity.PqIndex]()

  /** ann_pq_topk (rows-only; recall vs exact L2 in ScalaTest; the
    * serving plan itself is hash-gated via ann_pq_seeded) —
    * [[Similarity.buildPqIndex]] (cached per corpus) +
    * [[Similarity.pqQuery]]: the memory-compression ANN path (vectors
    * become `subspaces` codes; the query scan reads codes, never raw
    * embeddings — only the rerank×queries refinement set does). */
  def annPqTopk(s: SparkSession, dir: String): DataFrame = {
    val index = pqIndexCache.computeIfAbsent((s, dir), { case (sess, d) =>
      Similarity.buildPqIndex(embs(sess, d), "vec_id", "embedding",
        subspaces = PqSubspaces, codebook = PqCodebook)
    })
    Similarity.pqQuery(index, embs(s, dir), "vec_id", "embedding",
      isQuery = col("vec_id") < NumQueries, k = K, rerank = PqRerank)
  }

  /** IVFADC config: more, smaller cells than plain IVF (finer probe
    * targeting), probing 1/4 of them — on this weakly-clustered
    * synthetic corpus that buys a 0.90 probe-coverage ceiling at a
    * ~2.5× candidate shrink; a real embedding corpus clusters harder
    * and runs far smaller probe fractions at the same recall. */
  val IvfPqCells = 64
  val IvfPqProbes = 16

  private val ivfPqIndexCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Similarity.IvfPqIndex]()

  /** ann_ivf_pq_topk (rows-only; recall vs exact + candidate-shrink in
    * ScalaTest) — [[Similarity.buildIvfPqIndex]] (cached per corpus) +
    * [[Similarity.ivfPqQuery]]: the IVFADC composition — coarse cells
    * restrict the candidate set to nProbes/nCells of the corpus,
    * residual-PQ codes ADC-score only those candidates. The big-corpus
    * serving shape: flat PQ still scans every code row per query batch;
    * this scans only the probed cells'. */
  def annIvfPqTopk(s: SparkSession, dir: String): DataFrame = {
    val index = ivfPqIndexCache.computeIfAbsent((s, dir), { case (sess, d) =>
      Similarity.buildIvfPqIndex(embs(sess, d), "vec_id", "embedding",
        cells = IvfPqCells, subspaces = PqSubspaces, codebook = PqCodebook)
    })
    Similarity.ivfPqQuery(index, embs(s, dir), "vec_id", "embedding",
      isQuery = col("vec_id") < NumQueries, k = K, nProbes = IvfPqProbes,
      rerank = PqRerank)
  }

  /** #35e ann_ivfpq_seeded — [[Similarity.ivfPqTopKSeeded]]: the full
    * IVFADC composition (coarse cells → residuals → residual
    * codebooks → probed-cells-only ADC → exact rerank) with every
    * structure data-seeded (cells from vec_id < cells, residual
    * codewords from the next `codebook` vectors) — fully
    * deterministic, so the driver gate hash-checks the FAISS-shaped
    * IVF+PQ serving plan end to end, the oracle upgrade
    * ann_ivf_pq_topk's KMeans fits forbid. Same config as
    * ann_ivf_pq_topk. */
  def annIvfPqSeeded(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfPqTopKSeeded(embs(s, dir), "vec_id", "embedding",
      isQuery = col("vec_id") < NumQueries, k = K, cells = IvfPqCells,
      subspaces = PqSubspaces, codebook = PqCodebook,
      nProbes = IvfPqProbes, rerank = PqRerank)

  /** SemDeDup parameters: the IVF cell count doubles as the cluster
    * granularity; τ = 0.4 matches the embedding-dedup family. */
  val SemCells = IvfCells
  val SemTau = 0.4

  /** semdedup (rows-only; KMeans is not SQL-replayable — ScalaTest
    * verifies cluster-scoped agreement with brute force) —
    * [[Similarity.semDedup]]: keep/drop decision per vector. */
  def semDedup(s: SparkSession, dir: String): DataFrame =
    Similarity.semDedup(embs(s, dir), "vec_id", "embedding",
      tau = SemTau, cells = SemCells)

  /** semdedup_seeded — [[Similarity.semDedupSeeded]]: the SemDeDup
    * decision plan (cluster-scoped pairs → components → min-id
    * representative) with the data-seeded quantizer, hash-checked
    * against a DuckDB replay (seeded assignment + recursive min-reach
    * components). Same config as semdedup. */
  def semDedupSeeded(s: SparkSession, dir: String): DataFrame =
    Similarity.semDedupSeeded(embs(s, dir), "vec_id", "embedding",
      tau = SemTau, cells = SemCells)

  /** ann_recall (round-8) — the retrieval EVALUATION surface: per-query
    * recall@K of the LSH scale path against the exact brute-force
    * baseline, as a standing query (the number an ANN rollout watches,
    * not just a test assertion). Both sides are the already-verified
    * query pipelines; the join is per-(query, candidate) over two
    * K-bounded relations, so the evaluation cost is queries×K rows —
    * independent of corpus size once the top-Ks are computed. */
  def annRecall(s: SparkSession, dir: String): DataFrame = {
    val exact = annBruteforceTopk(s, dir).select(col("query_id"), col("cand_id"))
    val approx = annLshTopk(s, dir).select(col("query_id"), col("cand_id"))
      .withColumn("_hit", lit(1L))
    exact.join(approx, Seq("query_id", "cand_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("_hit"), lit(0L))).as("n_overlap"),
        count(lit(1)).as("k_eval"))
      .select(col("query_id"), col("n_overlap"), col("k_eval"),
        (col("n_overlap").cast("double") / col("k_eval").cast("double"))
          .as("recall"))
  }

  /** curation_diversity config: 64 embedding-space regions, plane
    * family disjoint from the ann (0), dedup (1000), and graph (3000)
    * offsets. */
  val DivBits = 6
  val DivOffset = 5000
  val DivN = 200

  /** #195 curation_diversity — [[Similarity.diversitySample]]:
    * cluster-round-robin selection over LSH buckets, the
    * diversity-balanced subset picker. */
  def curationDiversity(s: SparkSession, dir: String): DataFrame =
    Similarity.diversitySample(embs(s, dir), "vec_id", "embedding",
      n = DivN, bandBits = DivBits, dims = Dims, planeOffset = DivOffset)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "curation_diversity" -> curationDiversity,
    "ann_recall" -> annRecall,
    "ann_pq_topk" -> annPqTopk,
    "ann_ivf_pq_topk" -> annIvfPqTopk,
    "semdedup" -> semDedup,
    "semdedup_seeded" -> semDedupSeeded,
    "knn_graph" -> knnGraph,
    "knn_graph_lsh" -> knnGraphLsh,
    "ann_bruteforce_topk" -> annBruteforceTopk,
    "ann_lsh_topk" -> annLshTopk,
    "ann_ivf_topk" -> annIvfTopk,
    "ann_ivf_seeded" -> annIvfSeeded,
    "ann_pq_seeded" -> annPqSeeded,
    "ann_ivfpq_seeded" -> annIvfPqSeeded,
    "dedup_embedding_lsh" -> dedupEmbeddingLsh)

  /** DuckDB literal for hyperplane `p`: the ±1 weights are deterministic
    * ([[Similarity.planeSign]] md5 parity), so the oracle embeds them as
    * list literals exactly like the Spark side embeds them in the
    * codegen'd expression — both engines then fold the same
    * left-to-right dot product. */
  private def planeList(p: Int): String =
    (0 until Dims).map(d => s"${Similarity.planeSign(p, d)}.0")
      .mkString("[", ", ", "]")

  private def sigExpr(band: Int, bandBits: Int, planeOffset: Int): String =
    (0 until bandBits).map { bit =>
      val p = planeOffset + band * bandBits + bit
      s"(CASE WHEN list_reduce(list_transform(range(1, ${Dims + 1}), " +
        s"i -> e[i] * (${planeList(p)})[i]), (x, y) -> x + y) >= 0 " +
        s"THEN ${1 << bit} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private def sigsCte(bands: Int, bandBits: Int, planeOffset: Int): String =
    (0 until bands).map(b =>
      s"SELECT vec_id, e, nn, $b AS band, " +
        s"${sigExpr(b, bandBits, planeOffset)} AS sig FROM n")
      .mkString("sigs AS (\n        ", "\n        UNION ALL\n        ", ")")

  private val vecCtes: String = """
      v AS (
        SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings),
      n AS (
        SELECT vec_id, e,
          list_reduce(list_transform(e, x -> x * x), (x, y) -> x + y) AS nn
        FROM v)"""

  private val annLshOracle: String = s"""
      WITH $vecCtes,
      ${sigsCte(NumBands, BandBits, 0)},
      cand AS (
        SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS cand_id
        FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig
          AND a.vec_id < $NumQueries AND a.vec_id <> b.vec_id),
      scored AS (
        SELECT c.query_id, c.cand_id,
          list_reduce(list_transform(range(1, ${Dims + 1}),
            i -> q.e[i] * t.e[i]), (x, y) -> x + y)
            / (sqrt(q.nn) * sqrt(t.nn)) AS cosine
        FROM cand c
        JOIN n q ON c.query_id = q.vec_id
        JOIN n t ON c.cand_id = t.vec_id),
      ranked AS (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, cand_id ASC) AS BIGINT) AS rank
        FROM scored)
      SELECT query_id, cand_id, cosine, rank FROM ranked WHERE rank <= $K"""

  private val dedupLshOracle: String = s"""
      WITH $vecCtes,
      ${sigsCte(DedupBands, DedupBandBits, 1000)},
      cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig
          AND a.vec_id < b.vec_id),
      scored AS (
        SELECT c.id_a, c.id_b,
          list_reduce(list_transform(range(1, ${Dims + 1}),
            i -> x.e[i] * y.e[i]), (x, y) -> x + y)
            / (sqrt(x.nn) * sqrt(y.nn)) AS cosine
        FROM cand c
        JOIN n x ON c.id_a = x.vec_id
        JOIN n y ON c.id_b = y.vec_id)
      SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.4"""

  private val knnGraphOracle: String = s"""
      WITH $vecCtes,
      scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
          list_reduce(list_transform(range(1, ${Dims + 1}),
            i -> a.e[i] * b.e[i]), (x, y) -> x + y)
            / (sqrt(a.nn) * sqrt(b.nn)) AS cosine
        FROM n a JOIN n b ON a.vec_id <> b.vec_id),
      ranked AS (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, cand_id ASC) AS BIGINT) AS rank
        FROM scored)
      SELECT query_id, cand_id, cosine, rank FROM ranked
      WHERE rank <= $GraphK"""

  private val knnGraphLshOracle: String = s"""
      WITH $vecCtes,
      ${sigsCte(GraphBands, GraphBandBits, GraphPlaneOffset)},
      cand AS (
        SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS cand_id
        FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig
          AND a.vec_id <> b.vec_id),
      scored AS (
        SELECT c.query_id, c.cand_id,
          list_reduce(list_transform(range(1, ${Dims + 1}),
            i -> q.e[i] * t.e[i]), (x, y) -> x + y)
            / (sqrt(q.nn) * sqrt(t.nn)) AS cosine
        FROM cand c
        JOIN n q ON c.query_id = q.vec_id
        JOIN n t ON c.cand_id = t.vec_id),
      ranked AS (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, cand_id ASC) AS BIGINT) AS rank
        FROM scored)
      SELECT query_id, cand_id, cosine, rank FROM ranked
      WHERE rank <= $GraphK"""

  private val annRecallOracle: String = s"""
      WITH $vecCtes,
      ${sigsCte(NumBands, BandBits, 0)},
      lcand AS (
        SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS cand_id
        FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig
          AND a.vec_id < $NumQueries AND a.vec_id <> b.vec_id),
      lscored AS (
        SELECT c.query_id, c.cand_id,
          list_reduce(list_transform(range(1, ${Dims + 1}),
            i -> q.e[i] * t.e[i]), (x, y) -> x + y)
            / (sqrt(q.nn) * sqrt(t.nn)) AS cosine
        FROM lcand c
        JOIN n q ON c.query_id = q.vec_id
        JOIN n t ON c.cand_id = t.vec_id),
      lsh AS (
        SELECT query_id, cand_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, cand_id ASC) AS rank
          FROM lscored) WHERE rank <= $K),
      bscored AS (
        SELECT q.vec_id AS query_id, t.vec_id AS cand_id,
          list_reduce(list_transform(range(1, ${Dims + 1}),
            i -> q.e[i] * t.e[i]), (x, y) -> x + y)
            / (sqrt(q.nn) * sqrt(t.nn)) AS cosine
        FROM n q JOIN n t
          ON q.vec_id < $NumQueries AND q.vec_id <> t.vec_id),
      exact AS (
        SELECT query_id, cand_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, cand_id ASC) AS rank
          FROM bscored) WHERE rank <= $K),
      j AS (
        SELECT e.query_id,
          CASE WHEN l.cand_id IS NOT NULL THEN 1 ELSE 0 END AS hit
        FROM exact e LEFT JOIN lsh l
          ON e.query_id = l.query_id AND e.cand_id = l.cand_id)
      SELECT query_id, CAST(SUM(hit) AS BIGINT) AS n_overlap,
        CAST(COUNT(*) AS BIGINT) AS k_eval,
        CAST(SUM(hit) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
      FROM j GROUP BY 1"""

  private val curationDiversityOracle: String = s"""
      WITH $vecCtes,
      b AS (
        SELECT vec_id, ${sigExpr(0, DivBits, DivOffset)} AS bucket
        FROM n),
      r AS (
        SELECT vec_id, bucket,
          CAST(row_number() OVER (PARTITION BY bucket
            ORDER BY vec_id) AS BIGINT) AS round
        FROM b)
      SELECT vec_id, bucket, round FROM r
      ORDER BY round, bucket, vec_id LIMIT $DivN"""

  /** ann_pq_seeded oracle: [[Similarity.pqTopKSeeded]] replayed
    * expression-for-expression — seeded codebooks (list_slice of the
    * first-[[PqCodebook]] vectors), argmin encode via the same
    * (d2 asc, code asc) row_number, per-(query, m, code) distance
    * table, pivoted single-value SUMs added left-assoc (the ADC sum),
    * exact-d2 rerank. All float folds are `list_prepend(0.0, …)` +
    * `list_reduce` left folds matching Spark's `aggregate`; 0.0/2.0
    * literals stay exact across DuckDB's decimal parsing. */
  private val annPqSeededOracle: String = {
    val sd = Dims / PqSubspaces
    def d2(vec: String): String =
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(range(1, ${sd + 1}),
            i -> ($vec[cb.m * $sd + i] - cb.ce[i])
               * ($vec[cb.m * $sd + i] - cb.ce[i]))),
          (x, y) -> x + y)"""
    val pivots = (0 until PqSubspaces).map(m =>
      s"SUM(CASE WHEN q.m = $m THEN q.d2 END) AS _d$m").mkString(",\n          ")
    val adcSum = (0 until PqSubspaces).map(m => s"_d$m").mkString(" + ")
    s"""
      WITH v AS MATERIALIZED (
        SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings),
      n AS MATERIALIZED (
        SELECT vec_id, e,
          list_reduce(list_transform(e, x -> x * x), (x, y) -> x + y) AS nn
        FROM v),
      ms AS (SELECT unnest(range(0, $PqSubspaces)) AS m),
      cb AS MATERIALIZED (
        SELECT ms.m, CAST(vec_id AS INT) AS code,
          list_slice(e, ms.m * $sd + 1, ms.m * $sd + $sd) AS ce
        FROM n CROSS JOIN ms WHERE vec_id < $PqCodebook),
      enc AS MATERIALIZED (
        SELECT vec_id, m, code FROM (
          SELECT a.vec_id, cb.m, cb.code,
            row_number() OVER (PARTITION BY a.vec_id, cb.m
              ORDER BY ${d2("a.e")} ASC, cb.code ASC) AS er
          FROM n a CROSS JOIN cb) WHERE er = 1),
      qt AS MATERIALIZED (
        SELECT a.vec_id AS query_id, cb.m, cb.code, ${d2("a.e")} AS d2
        FROM n a CROSS JOIN cb WHERE a.vec_id < $NumQueries),
      ap AS MATERIALIZED (
        SELECT q.query_id, enc.vec_id AS cand_id,
          $pivots
        FROM enc JOIN qt q ON enc.m = q.m AND enc.code = q.code
        WHERE enc.vec_id <> q.query_id
        GROUP BY 1, 2),
      top AS MATERIALIZED (
        SELECT query_id, cand_id,
          row_number() OVER (PARTITION BY query_id
            ORDER BY ($adcSum) ASC, cand_id ASC) AS rank
        FROM ap),
      re AS (
        SELECT s.query_id, s.cand_id,
          q.nn - 2.0 * list_reduce(list_transform(range(1, ${Dims + 1}),
              i -> q.e[i] * c.e[i]), (x, y) -> x + y) + c.nn AS d2
        FROM top s
        JOIN n q ON q.vec_id = s.query_id
        JOIN n c ON c.vec_id = s.cand_id
        WHERE s.rank <= $PqRerank)
      SELECT query_id, cand_id, d2,
        CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY d2 ASC, cand_id ASC) AS BIGINT) AS rank
      FROM re QUALIFY rank <= $K"""
  }

  /** ann_ivfpq_seeded oracle: [[Similarity.ivfPqTopKSeeded]] replayed
    * expression-for-expression — seeded cell assignment (same
    * nn − 2·dot + cnn argmin as the ann_ivf_seeded oracle), residuals
    * as indexed element differences, offset-seeded residual codebooks,
    * argmin encode, probed-cells-only (cell, m, code) ADC join with
    * the pivoted fixed-order sum, exact rerank. */
  private val annIvfPqSeededOracle: String = {
    val sd = Dims / PqSubspaces
    def dot(a: String, b: String): String =
      s"""list_reduce(list_transform(range(1, ${Dims + 1}),
          i -> $a[i] * $b[i]), (x, y) -> x + y)"""
    def subD2(vec: String): String =
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(range(1, ${sd + 1}),
            i -> ($vec[cb.m * $sd + i] - cb.ce[i])
               * ($vec[cb.m * $sd + i] - cb.ce[i]))),
          (x, y) -> x + y)"""
    val pivots = (0 until PqSubspaces).map(m =>
      s"SUM(CASE WHEN q.m = $m THEN q.d2 END) AS _d$m").mkString(",\n          ")
    val adcSum = (0 until PqSubspaces).map(m => s"_d$m").mkString(" + ")
    s"""
      WITH v AS MATERIALIZED (
        SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings),
      n AS MATERIALIZED (
        SELECT vec_id, e,
          list_reduce(list_transform(e, x -> x * x), (x, y) -> x + y) AS nn
        FROM v),
      c AS MATERIALIZED (
        SELECT CAST(vec_id AS INT) AS cell, e AS ce, nn AS cnn
        FROM n WHERE vec_id < $IvfPqCells),
      assigned AS MATERIALIZED (
        SELECT vec_id, e, nn, cell FROM (
          SELECT a.vec_id, a.e, a.nn, c.cell,
            row_number() OVER (PARTITION BY a.vec_id ORDER BY
              a.nn - 2.0 * ${dot("a.e", "c.ce")} + c.cnn ASC,
              c.cell ASC) AS ar
          FROM n a CROSS JOIN c) WHERE ar = 1),
      res AS MATERIALIZED (
        SELECT a.vec_id, a.cell,
          list_transform(range(1, ${Dims + 1}),
            i -> a.e[i] - c.ce[i]) AS r
        FROM assigned a JOIN c ON a.cell = c.cell),
      ms AS (SELECT unnest(range(0, $PqSubspaces)) AS m),
      cb AS MATERIALIZED (
        SELECT ms.m, CAST(vec_id - $IvfPqCells AS INT) AS code,
          list_slice(r, ms.m * $sd + 1, ms.m * $sd + $sd) AS ce
        FROM res CROSS JOIN ms
        WHERE vec_id >= $IvfPqCells
          AND vec_id < ${IvfPqCells + PqCodebook}),
      enc AS MATERIALIZED (
        SELECT vec_id, cell, m, code FROM (
          SELECT t.vec_id, t.cell, cb.m, cb.code,
            row_number() OVER (PARTITION BY t.vec_id, cb.m
              ORDER BY ${subD2("t.r")} ASC, cb.code ASC) AS er
          FROM res t CROSS JOIN cb) WHERE er = 1),
      probes AS MATERIALIZED (
        SELECT query_id, cell, qres FROM (
          SELECT a.vec_id AS query_id, c.cell,
            list_transform(range(1, ${Dims + 1}),
              i -> a.e[i] - c.ce[i]) AS qres,
            row_number() OVER (PARTITION BY a.vec_id ORDER BY
              a.nn - 2.0 * ${dot("a.e", "c.ce")} + c.cnn ASC,
              c.cell ASC) AS pr
          FROM n a CROSS JOIN c WHERE a.vec_id < $NumQueries)
        WHERE pr <= $IvfPqProbes),
      qt AS MATERIALIZED (
        SELECT p.query_id, p.cell, cb.m, cb.code, ${subD2("p.qres")} AS d2
        FROM probes p CROSS JOIN cb),
      ap AS MATERIALIZED (
        SELECT q.query_id, enc.vec_id AS cand_id,
          $pivots
        FROM enc JOIN qt q ON enc.cell = q.cell AND enc.m = q.m
          AND enc.code = q.code
        WHERE enc.vec_id <> q.query_id
        GROUP BY 1, 2),
      top AS MATERIALIZED (
        SELECT query_id, cand_id,
          row_number() OVER (PARTITION BY query_id
            ORDER BY ($adcSum) ASC, cand_id ASC) AS rank
        FROM ap),
      re AS (
        SELECT s.query_id, s.cand_id,
          q.nn - 2.0 * ${dot("q.e", "c.e")} + c.nn AS d2
        FROM top s
        JOIN n q ON q.vec_id = s.query_id
        JOIN n c ON c.vec_id = s.cand_id
        WHERE s.rank <= $PqRerank)
      SELECT query_id, cand_id, d2,
        CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY d2 ASC, cand_id ASC) AS BIGINT) AS rank
      FROM re QUALIFY rank <= $K"""
  }

  /** semdedup_seeded oracle: seeded assignment (ann_ivf_seeded's
    * argmin), cluster-scoped cosine-≥-τ pairs, components via the
    * recursive min-reach CTE ([[TrainingQueries]]' graph_components
    * shape), keep = not-a-loser. */
  private val semDedupSeededOracle: String = {
    def dot(a: String, b: String): String =
      s"""list_reduce(list_transform(range(1, ${Dims + 1}),
          i -> $a[i] * $b[i]), (x, y) -> x + y)"""
    s"""
      WITH RECURSIVE v AS MATERIALIZED (
        SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings),
      n AS MATERIALIZED (
        SELECT vec_id, e,
          list_reduce(list_transform(e, x -> x * x), (x, y) -> x + y) AS nn
        FROM v),
      c AS MATERIALIZED (
        SELECT CAST(vec_id AS INT) AS cell, e AS ce, nn AS cnn
        FROM n WHERE vec_id < $SemCells),
      assigned AS MATERIALIZED (
        SELECT vec_id, e, nn, cell FROM (
          SELECT a.vec_id, a.e, a.nn, c.cell,
            row_number() OVER (PARTITION BY a.vec_id ORDER BY
              a.nn - 2.0 * ${dot("a.e", "c.ce")} + c.cnn ASC,
              c.cell ASC) AS ar
          FROM n a CROSS JOIN c) WHERE ar = 1),
      prs AS MATERIALIZED (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM assigned a JOIN assigned b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE ${dot("a.e", "b.e")} / (sqrt(a.nn) * sqrt(b.nn))
          >= $SemTau),
      edges AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM prs
        UNION SELECT id_b, id_a FROM prs),
      nds AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
      reach AS (
        SELECT node, node AS r FROM nds
        UNION
        SELECT reach.node, e.dst FROM reach JOIN edges e
          ON reach.r = e.src),
      comp AS MATERIALIZED (
        SELECT node, MIN(r) AS component FROM reach GROUP BY node),
      losers AS (SELECT node FROM comp WHERE node <> component)
      SELECT a.vec_id, a.cell,
        CASE WHEN l.node IS NULL THEN 1 ELSE 0 END AS keep
      FROM assigned a LEFT JOIN losers l ON a.vec_id = l.node"""
  }

  val oracleSql: Map[String, String] = Map(
    "ann_pq_seeded" -> annPqSeededOracle,
    "ann_ivfpq_seeded" -> annIvfPqSeededOracle,
    "semdedup_seeded" -> semDedupSeededOracle,
    "curation_diversity" -> curationDiversityOracle,
    "ann_recall" -> annRecallOracle,
    "knn_graph" -> knnGraphOracle,
    "knn_graph_lsh" -> knnGraphLshOracle,
    "ann_lsh_topk" -> annLshOracle,
    "dedup_embedding_lsh" -> dedupLshOracle,
    "ann_ivf_seeded" -> s"""
      WITH v AS (
        SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings),
      n AS (
        SELECT vec_id, e,
          list_reduce(list_transform(e, x -> x * x), (x, y) -> x + y) AS nn
        FROM v),
      c AS (
        SELECT CAST(vec_id AS INT) AS cell, e AS ce, nn AS cnn
        FROM n WHERE vec_id < $IvfCells),
      assigned AS (
        SELECT vec_id, e, nn, cell FROM (
          SELECT a.vec_id, a.e, a.nn, c.cell,
            row_number() OVER (PARTITION BY a.vec_id ORDER BY
              a.nn - 2 * list_reduce(list_transform(range(1, ${Dims + 1}), i -> a.e[i] * c.ce[i]), (x, y) -> x + y) + c.cnn ASC,
              c.cell ASC) AS ar
          FROM n a CROSS JOIN c) WHERE ar = 1),
      q AS (
        SELECT vec_id AS query_id, e AS qe, nn AS qnn
        FROM assigned WHERE vec_id < $NumQueries),
      probes AS (
        SELECT query_id, cell, qe, qnn FROM (
          SELECT q.query_id, c.cell, q.qe, q.qnn,
            row_number() OVER (PARTITION BY q.query_id ORDER BY
              q.qnn - 2 * list_reduce(list_transform(range(1, ${Dims + 1}), i -> q.qe[i] * c.ce[i]), (x, y) -> x + y) + c.cnn ASC,
              c.cell ASC) AS pr
          FROM q CROSS JOIN c) WHERE pr <= $IvfProbes),
      scored AS (
        SELECT DISTINCT p.query_id, a.vec_id AS cand_id,
          list_reduce(list_transform(range(1, ${Dims + 1}), i -> p.qe[i] * a.e[i]), (x, y) -> x + y)
            / (sqrt(p.qnn) * sqrt(a.nn)) AS cosine
        FROM probes p JOIN assigned a
          ON p.cell = a.cell AND a.vec_id <> p.query_id),
      ranked AS (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, cand_id ASC) AS BIGINT) AS rank
        FROM scored)
      SELECT query_id, cand_id, cosine, rank FROM ranked
      WHERE rank <= $K""",
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
