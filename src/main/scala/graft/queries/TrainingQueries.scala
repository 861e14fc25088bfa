package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Chunk, Dedup, Embeddings, Graph, Mixture}

/** Round-4 additions (SURVEY.md §2d, second wave) — the remaining
  * training-pipeline surface: document chunking, embedding-store
  * transforms (normalize / int8 quantize), token-mixture curation,
  * and similarity-graph analytics over the kNN graph. Every binding
  * is DuckDB-oracle-checked — including graph_pagerank since round
  * 17, via [[Graph.pagerankDet]]'s bit-deterministic folds and an
  * iteration-unrolled CTE-chain oracle.
  */
object TrainingQueries {

  /** Chunk window/overlap sized to the ~54-token synthetic docs (3
    * chunks/doc); production values (512/64 etc.) are caller params. */
  val ChunkTokens = 32
  val OverlapTokens = 8
  private val Stride = ChunkTokens - OverlapTokens

  /** Token-mixture targets: a 50/30/20 recipe over three sources. */
  val MixtureTargets: Seq[(String, Long)] =
    Seq("src1" -> 50L, "src2" -> 30L, "src3" -> 20L)

  val PagerankIters = 10
  val PagerankBuckets = 64

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** doc_chunks — [[Chunk.fixedWindows]] over `documents`. */
  def docChunks(s: SparkSession, dir: String): DataFrame =
    Chunk.fixedWindows(docs(s, dir), "doc_id", "text",
      ChunkTokens, OverlapTokens)

  /** emb_normalize — [[Embeddings.normalizeExploded]] (driver form,
    * one row per dimension). */
  def embNormalize(s: SparkSession, dir: String): DataFrame =
    Embeddings.normalizeExploded(Tables(s, dir, "embeddings"),
      "vec_id", "embedding")

  /** emb_quantize — [[Embeddings.quantizeInt8Exploded]]. */
  def embQuantize(s: SparkSession, dir: String): DataFrame =
    Embeddings.quantizeInt8Exploded(Tables(s, dir, "embeddings"),
      "vec_id", "embedding")

  /** mixture_rates — [[Mixture.rates]]: the audit table of the recipe. */
  def mixtureRates(s: SparkSession, dir: String): DataFrame =
    Mixture.rates(docs(s, dir), col("source"), col("n_chars"),
      MixtureTargets)

  /** mixture_sample — [[Mixture.sample]]: the sampled mixture corpus. */
  def mixtureSample(s: SparkSession, dir: String): DataFrame =
    Mixture.sample(docs(s, dir), col("source"), col("doc_id"),
      col("n_chars"), MixtureTargets)
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("keep_thr"))

  /** mixture_temperature — [[Mixture.temperatureRates]]: the α = 0.5
    * temperature recipe, targets derived from the corpus itself. */
  def mixtureTemperature(s: SparkSession, dir: String): DataFrame =
    Mixture.temperatureRates(docs(s, dir), col("source"), col("n_chars"))

  /** The kNN-LSH similarity graph all three graph queries run over. */
  private def knnEdges(s: SparkSession, dir: String): DataFrame =
    SimilarityQueries.knnGraphLsh(s, dir)

  /** graph_degrees — [[Graph.degrees]] of the kNN-LSH graph. */
  def graphDegrees(s: SparkSession, dir: String): DataFrame =
    Graph.degrees(knnEdges(s, dir), "query_id", "cand_id")

  /** graph_components — [[Dedup.components]] (reused as-is) over the
    * kNN-LSH graph: similarity clusters. */
  def graphComponents(s: SparkSession, dir: String): DataFrame =
    Dedup.components(knnEdges(s, dir), "query_id", "cand_id")

  /** graph_pagerank — [[Graph.pagerankDet]] centrality: the
    * bit-deterministic fold form, hash-checked against a DuckDB
    * replay that unrolls the [[PagerankIters]] rounds as a CTE chain
    * (rows-only until round 17; the float-sum [[Graph.pagerank]]
    * stays suite-pinned as the map-side-combining scale form). */
  def graphPagerank(s: SparkSession, dir: String): DataFrame =
    Graph.pagerankDet(knnEdges(s, dir), "query_id", "cand_id",
      iters = PagerankIters, danglingBuckets = PagerankBuckets)

  /** #165 vocab_train_bpe — distributed BPE merge learning
    * ([[graft.operators.Vocab.trainBpe]], Sennrich et al. 2016) on the
    * corpus: ONE corpus scan to the word-frequency relation, then 16
    * merge iterations over that domain-bounded relation (pair counts
    * map-side combined; the argmax is a pair-vocabulary-sized global
    * top-1 with a deterministic tie-break; the merge applies as a
    * catalyst higher-order fold — no UDF). Hash-checked since round
    * 17: the training loop is ALL-INTEGER (pair counts, string
    * argmax), so the whole 16-iteration recursion unrolls into a
    * DuckDB CTE chain ([[bpeOracle]]) where the merge application —
    * Spark's left-to-right non-overlapping fold — is replayed
    * positionally (match runs → run-parity selection → ordered list
    * rebuild). TrainingSpec additionally pins the learned sequence
    * merge-for-merge against a single-node reference trainer, and the
    * learned vocabulary round-trips into the codegen'd `bpe_count`
    * tokenizer (train → tokenize → fertility fully in-engine). */
  def vocabTrainBpe(s: SparkSession, dir: String): DataFrame =
    graft.operators.Vocab.trainBpe(docs(s, dir), "text", numMerges = 16)

  val BpeMerges = 16
  val BpeMinPairFreq = 2L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vocab_train_bpe" -> vocabTrainBpe,
    "doc_chunks" -> docChunks,
    "emb_normalize" -> embNormalize,
    "emb_quantize" -> embQuantize,
    "mixture_rates" -> mixtureRates,
    "mixture_temperature" -> mixtureTemperature,
    "mixture_sample" -> mixtureSample,
    "graph_degrees" -> graphDegrees,
    "graph_components" -> graphComponents,
    "graph_pagerank" -> graphPagerank)

  /** The engine's 60-bit md5 bucket on doc_id ([[Sampling.hashBucket]]),
    * as DuckDB SQL. */
  private val docBucket =
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"

  /** λ + per-group threshold CTE chain shared by both mixture oracles
    * (HUGEINT products mirror the engine's decimal(38) — the `//` grid
    * points are identical). */
  private val mixtureCtes: String = {
    val values = MixtureTargets.map { case (g, t) =>
      s"('$g', CAST($t AS BIGINT))"
    }.mkString(", ")
    s"""
      t(grp, target) AS (VALUES $values),
      mass AS (
        SELECT source AS grp, CAST(SUM(n_chars) AS BIGINT) AS avail
        FROM documents GROUP BY 1),
      j AS (
        SELECT m.grp, m.avail, t.target,
          CAST(m.avail AS HUGEINT) * ${Mixture.Scale}
            // CAST(t.target AS HUGEINT) AS lam_g
        FROM mass m JOIN t USING (grp)),
      l AS (SELECT MIN(lam_g) AS lam FROM j),
      rates AS (
        SELECT grp, avail, target,
          CAST(least(${Mixture.Scale}, CAST(l.lam AS HUGEINT)
            * CAST(target AS HUGEINT) // CAST(avail AS HUGEINT))
            AS BIGINT) AS keep_thr
        FROM j, l)"""
  }

  private val embCtes: String = """
      v AS (
        SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings)"""

  /** graph_pagerank oracle: [[Graph.pagerankDet]]'s fold recipe with
    * the [[PagerankIters]] rounds UNROLLED as a CTE chain (contribs →
    * bucketed dangling → rank per round). Every float reduction
    * replays the engine's exact order: `list_prepend(0.0, …)` +
    * `list_reduce` ≡ Spark's `aggregate(arr, 0.0, (acc, x) -> acc+x)`
    * (left fold seeded at 0.0), `list_sort` over the same struct
    * shapes ≡ `array_sort(collect_list(struct(…)))`, and the bucket
    * key mirrors `pmod`. Bit-identical by construction, so the driver
    * hash-gates the whole 10-round iteration. */
  private def pagerankOracle: String = {
    def fold(list: String) =
      s"list_reduce(list_prepend(0.0, $list), (x, y) -> x + y)"
    val b = PagerankBuckets
    val rounds = (1 to PagerankIters).map { i =>
      val p = s"r${i - 1}"
      s"""
      c$i AS MATERIALIZED (
        SELECT e.dst AS node,
          ${fold("list_transform(list_sort(list({'s': e.src, " +
            "'c': r.rank / r.out_degree})), v -> v.c)")} AS contrib
        FROM edges e JOIN $p r ON e.src = r.node
        GROUP BY e.dst),
      db$i AS MATERIALIZED (
        SELECT ((node % $b) + $b) % $b AS bk,
          ${fold("list_transform(list_sort(list({'n': node, " +
            "'r': rank})), v -> v.r)")} AS bs
        FROM $p WHERE out_degree = 0 GROUP BY 1),
      d$i AS MATERIALIZED (
        SELECT COALESCE(${fold("list_transform(list_sort(list(" +
          "{'b': bk, 's': bs})), v -> v.s)")}, 0.0) AS dang
        FROM db$i),
      r$i AS MATERIALIZED (
        SELECT p.node,
          (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
            + CAST(0.85 AS DOUBLE)
              * (COALESCE(c.contrib, 0.0) + d.dang / nn.n) AS rank,
          p.out_degree
        FROM $p p
        LEFT JOIN c$i c ON p.node = c.node
        CROSS JOIN d$i d CROSS JOIN nn)"""
    }.mkString(",")
    s"""
      WITH g AS MATERIALIZED (${SimilarityQueries.oracleSql("knn_graph_lsh")}),
      edges AS MATERIALIZED (SELECT query_id AS src, cand_id AS dst FROM g),
      nodes AS MATERIALIZED (SELECT src AS node FROM edges
                UNION SELECT dst FROM edges),
      od AS MATERIALIZED (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS out_degree
             FROM edges GROUP BY 1),
      nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
      r0 AS (
        SELECT nd.node, 1.0 / nn.n AS rank,
          COALESCE(od.out_degree, CAST(0 AS BIGINT)) AS out_degree
        FROM nodes nd LEFT JOIN od USING (node) CROSS JOIN nn),
      $rounds
      SELECT node, rank AS pagerank FROM r$PagerankIters"""
  }

  /** vocab_train_bpe oracle: [[graft.operators.Vocab.trainBpe]]'s
    * 16 merge iterations UNROLLED as a CTE chain. All-integer, so no
    * float-order concerns; the parts that need care are exact
    * equivalences with the engine:
    *   - the argmax tie-break is (freq DESC, a ASC, b ASC) with
    *     binary string order on both engines;
    *   - the merge application (Spark's left-to-right non-overlapping
    *     `aggregate` fold) replays POSITIONALLY: match positions →
    *     maximal consecutive runs (the only overlap case is a = b) →
    *     run-parity selection (rn % 2 = 1 ≡ the fold's
    *     last(acc)-check) → ordered `list(...)` rebuild dropping
    *     consumed positions;
    *   - early stop (no pair ≥ minPairFreq) falls out structurally:
    *     an empty m_i LEFT-JOINs as a no-op rewrite and every later
    *     m_j stays empty (frequencies cannot rise on unchanged
    *     words), matching the trainer's permanent stop. */
  private def bpeOracle: String = {
    def iteration(i: Int): String = {
      val p = s"w${i - 1}"
      s"""
      p$i AS MATERIALIZED (
        SELECT t.syms[i] AS a, t.syms[i+1] AS b,
          CAST(SUM(t.cnt) AS BIGINT) AS freq
        FROM $p t, LATERAL (SELECT unnest(range(1, len(t.syms))) AS i)
        GROUP BY 1, 2),
      m$i AS MATERIALIZED (
        SELECT a, b, freq FROM p$i WHERE freq >= $BpeMinPairFreq
        ORDER BY freq DESC, a ASC, b ASC LIMIT 1),
      e$i AS MATERIALIZED (
        SELECT t.wid, t.cnt, u.i, t.syms[u.i] AS s,
          CASE WHEN u.i < len(t.syms) AND t.syms[u.i] = m.a
            AND t.syms[u.i+1] = m.b THEN 1 ELSE 0 END AS mt
        FROM $p t LEFT JOIN m$i m ON TRUE,
          LATERAL (SELECT unnest(range(1, len(t.syms)+1)) AS i) u),
      sel$i AS MATERIALIZED (
        SELECT wid, i FROM (
          SELECT wid, i,
            row_number() OVER (PARTITION BY wid, grp ORDER BY i) AS rn
          FROM (SELECT wid, i,
                  i - row_number() OVER (PARTITION BY wid ORDER BY i) AS grp
                FROM e$i WHERE mt = 1))
        WHERE rn % 2 = 1),
      w$i AS MATERIALIZED (
        SELECT e.wid, MIN(e.cnt) AS cnt,
          list(CASE WHEN s1.i IS NOT NULL THEN (SELECT a || b FROM m$i)
               ELSE e.s END ORDER BY e.i)
            FILTER (WHERE s0.i IS NULL) AS syms
        FROM e$i e
        LEFT JOIN sel$i s1 ON e.wid = s1.wid AND e.i = s1.i
        LEFT JOIN sel$i s0 ON e.wid = s0.wid AND e.i = s0.i + 1
        GROUP BY e.wid)"""
    }
    val unions = (1 to BpeMerges).map(i =>
      s"""SELECT CAST($i AS BIGINT) AS rank, a AS "left", b AS "right",
          a || b AS token, freq FROM m$i""").mkString("\nUNION ALL ")
    s"""
      WITH words AS MATERIALIZED (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
          SELECT unnest(regexp_split_to_array(lower(trim(text)),
            '\\s+')) AS w
          FROM documents) WHERE len(w) > 0 GROUP BY w),
      w0 AS MATERIALIZED (
        SELECT w AS wid, cnt,
          list_transform(range(1, len(w)+1), i -> w[i:i]) AS syms
        FROM words),""" +
      (1 to BpeMerges).map(iteration).mkString(",") +
      s"\nSELECT * FROM ($unions)"
  }

  val oracleSql: Map[String, String] = Map(
    "graph_pagerank" -> pagerankOracle,
    "vocab_train_bpe" -> bpeOracle,
    "mixture_temperature" -> s"""
      WITH mass AS (
        SELECT source AS grp, CAST(SUM(n_chars) AS BIGINT) AS avail
        FROM documents GROUP BY 1),
      j AS (
        SELECT grp, avail,
          CAST(floor(sqrt(CAST(avail AS DOUBLE))) AS BIGINT) AS target,
          CAST(avail AS HUGEINT) * ${Mixture.Scale}
            // CAST(CAST(floor(sqrt(CAST(avail AS DOUBLE))) AS BIGINT)
              AS HUGEINT) AS lam_g
        FROM mass WHERE avail > 0),
      l AS (SELECT MIN(lam_g) AS lam FROM j),
      rates AS (
        SELECT grp, avail, target,
          CAST(least(${Mixture.Scale}, CAST(l.lam AS HUGEINT)
            * CAST(target AS HUGEINT) // CAST(avail AS HUGEINT))
            AS BIGINT) AS keep_thr
        FROM j, l)
      SELECT grp, avail, target, keep_thr FROM rates""",
    "doc_chunks" -> s"""
      WITH toks AS (
        SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        FROM documents),
      c AS (
        SELECT doc_id, w, i AS chunk_ix
        FROM toks, LATERAL (SELECT unnest(range(0,
          ((len(w) - 1) // $Stride) + 1)) AS i))
      SELECT doc_id, CAST(chunk_ix AS BIGINT) AS chunk_ix,
        array_to_string(list_slice(w, chunk_ix * $Stride + 1,
          chunk_ix * $Stride + $ChunkTokens), ' ') AS chunk_text,
        CAST(least($ChunkTokens, len(w) - chunk_ix * $Stride) AS BIGINT)
          AS chunk_tokens
      FROM c""",
    "emb_normalize" -> s"""
      WITH $embCtes,
      n AS (
        SELECT vec_id, e,
          list_reduce(list_transform(e, x -> x * x), (x, y) -> x + y) AS nn
        FROM v)
      SELECT vec_id, CAST(i AS BIGINT) AS dim_ix,
        CASE WHEN nn = 0 THEN e[i] ELSE e[i] / sqrt(nn) END AS val_norm
      FROM n, LATERAL (SELECT unnest(range(1, len(e) + 1)) AS i)""",
    "emb_quantize" -> s"""
      WITH $embCtes,
      m AS (
        SELECT vec_id, e,
          list_reduce(list_transform(e, x -> abs(x)),
            (x, y) -> greatest(x, y)) AS maxabs
        FROM v)
      SELECT vec_id, CAST(i AS BIGINT) AS dim_ix,
        CAST(CASE WHEN maxabs = 0 THEN 0
          ELSE round(e[i] * 127.0 / maxabs) END AS BIGINT) AS q_val,
        maxabs / 127.0 AS scale
      FROM m, LATERAL (SELECT unnest(range(1, len(e) + 1)) AS i)""",
    "mixture_rates" -> s"""
      WITH $mixtureCtes
      SELECT grp, avail, target, keep_thr FROM rates""",
    "mixture_sample" -> s"""
      WITH $mixtureCtes
      SELECT d.doc_id, d.source, d.n_chars, r.keep_thr
      FROM documents d JOIN rates r ON d.source = r.grp
      WHERE $docBucket % ${Mixture.Scale} < r.keep_thr""",
    "graph_degrees" -> s"""
      WITH g AS MATERIALIZED (${SimilarityQueries.oracleSql("knn_graph_lsh")}),
      o AS (SELECT query_id AS node, CAST(COUNT(*) AS BIGINT) AS out_degree
            FROM g GROUP BY 1),
      i AS (SELECT cand_id AS node, CAST(COUNT(*) AS BIGINT) AS in_degree
            FROM g GROUP BY 1)
      SELECT COALESCE(o.node, i.node) AS node,
        COALESCE(o.out_degree, 0) AS out_degree,
        COALESCE(i.in_degree, 0) AS in_degree
      FROM o FULL OUTER JOIN i ON o.node = i.node""",
    "graph_components" -> s"""
      WITH RECURSIVE g AS (${SimilarityQueries.oracleSql("knn_graph_lsh")}),
      edges AS (
        SELECT query_id AS src, cand_id AS dst FROM g
        UNION
        SELECT cand_id, query_id FROM g),
      nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
      reach AS (
        SELECT node, node AS r FROM nodes
        UNION
        SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src)
      SELECT node, MIN(r) AS component FROM reach GROUP BY node""")
}
