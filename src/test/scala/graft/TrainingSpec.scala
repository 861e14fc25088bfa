package graft

import org.apache.spark.sql.functions._

import graft.operators.{Chunk, Embeddings, Graph, Mixture, Sampling}

/** Round-4 training-pipeline operators: chunking, embedding
  * transforms, token-mixture curation, graph analytics. */
class TrainingSpec extends SparkSpec {

  private val s = spark
  import s.implicits._

  // ---------------------------------------------------------------- Chunk

  test("fixedWindows cuts overlapping windows with a short tail") {
    val df = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val rows = Chunk.fixedWindows(df, "doc_id", "text",
      chunkTokens = 3, overlapTokens = 1)
      .orderBy("chunk_ix")
      .select("chunk_ix", "chunk_text", "chunk_tokens")
      .as[(Long, String, Long)].collect.toSeq
    assert(rows === Seq(
      (0L, "a b c", 3L), (1L, "c d e", 3L), (2L, "e f g", 3L),
      (3L, "g", 1L)))
  }

  test("fixedWindows: doc shorter than one window is one chunk") {
    val df = Seq((1L, "x y")).toDF("doc_id", "text")
    val rows = Chunk.fixedWindows(df, "doc_id", "text", 32, 8)
      .select("chunk_ix", "chunk_text", "chunk_tokens")
      .as[(Long, String, Long)].collect.toSeq
    assert(rows === Seq((0L, "x y", 2L)))
  }

  test("fixedWindows with zero overlap partitions the token stream") {
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Chunk.fixedWindows(df, "doc_id", "text", 4, 0)
      .orderBy("chunk_ix").select("chunk_text").as[String].collect
    assert(chunks.mkString(" ").split(" ").toSeq ===
      (1 to 10).map(i => s"t$i"))
  }

  test("sliceStart fails loudly past Int.MaxValue instead of wrapping") {
    // boundary: start == Int.MaxValue still valid
    val ok = s.range(1)
      .select(Chunk.sliceStart(lit(Int.MaxValue.toLong - 1L), 1L).as("p"))
      .head().getInt(0)
    assert(ok == Int.MaxValue)
    // one past: raise_error, never a silent negative wrap
    val ex = intercept[Throwable] {
      s.range(1)
        .select(Chunk.sliceStart(lit(Int.MaxValue.toLong), 1L).as("p"))
        .head()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    assert(msgs(ex).contains("overflows Int"), ex.toString)
  }

  // ----------------------------------------------------------- Embeddings

  test("normalizeExploded yields unit vectors; zero vector unchanged") {
    val df = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Embeddings.normalizeExploded(df, "vec_id", "embedding")
      .orderBy("vec_id", "dim_ix")
      .as[(Long, Long, Double)].collect.toSeq
    assert(out === Seq(
      (1L, 1L, 0.6), (1L, 2L, 0.8), (2L, 1L, 0.0), (2L, 2L, 0.0)))
  }

  test("normalize (library form) keeps arrays, norm recorded") {
    val df = Seq((1L, Array(3.0f, 4.0f))).toDF("vec_id", "embedding")
    val r = Embeddings.normalize(df, "vec_id", "embedding")
      .select("l2_norm", "e_norm").as[(Double, Seq[Double])].head()
    assert(r._1 === 5.0)
    assert(r._2 === Seq(0.6, 0.8))
  }

  test("quantizeInt8Exploded: q in [-127,127], roundtrip within half step") {
    val df = Seq(
      (1L, Array(0.3f, -1.2f, 0.9f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Embeddings.quantizeInt8Exploded(df, "vec_id", "embedding")
      .as[(Long, Long, Long, Double)].collect
    assert(out.forall { case (_, _, q, _) => q >= -127 && q <= 127 })
    // dequantized value within scale/2 of the original
    val orig = Map((1L, 1L) -> 0.3f, (1L, 2L) -> -1.2f, (1L, 3L) -> 0.9f,
      (1L, 4L) -> 0.0f)
    out.filter(_._1 == 1L).foreach { case (v, d, q, s) =>
      assert(math.abs(q * s - orig((v, d))) <= s / 2 + 1e-12)
    }
    assert(out.filter(_._1 == 2L).forall { case (_, _, q, s) =>
      q == 0L && s == 0.0
    })
  }

  // -------------------------------------------------------------- Mixture

  test("mixture rates: binding group saturates, others scale down") {
    // a: avail 200, b: avail 50; equal targets -> b binds (λ = 50·10^6)
    val df = ((1 to 20).map(i => (s"a$i", "a", 10L)) ++
      (1 to 10).map(i => (s"b$i", "b", 5L)))
      .toDF("id", "source", "mass")
    val r = Mixture.rates(df, col("source"), col("mass"),
      Seq("a" -> 1L, "b" -> 1L))
      .orderBy("grp").as[(String, Long, Long, Long)].collect.toSeq
    assert(r === Seq(
      ("a", 200L, 1L, 250000L), // keeps 1/4 of a's mass
      ("b", 50L, 1L, 1000000L))) // binding group keeps everything
  }

  test("mixture sample is deterministic and obeys the threshold rule") {
    val df = ((1 to 200).map(i => (i.toLong, "a", 10L)) ++
      (201 to 250).map(i => (i.toLong, "b", 10L)))
      .toDF("id", "source", "mass")
    val targets = Seq("a" -> 1L, "b" -> 1L)
    val s1 = Mixture.sample(df, col("source"), col("id"), col("mass"),
      targets).select("id").as[Long].collect.toSet
    val s2 = Mixture.sample(df, col("source"), col("id"), col("mass"),
      targets).select("id").as[Long].collect.toSet
    assert(s1 === s2)
    // all of the binding group (b) survives
    assert((201L to 250L).toSet.subsetOf(s1))
    // group a: exactly the rows under the 250000/10^6 hash threshold
    val expectA = df.filter(col("source") === "a")
      .filter(pmod(Sampling.hashBucket(col("id")), lit(1000000L)) <
        250000L).select("id").as[Long].collect.toSet
    assert(s1.filter(_ <= 200L) === expectA)
  }

  test("mixture rates: unavailable group empties the recipe (λ = 0)") {
    val df = Seq(("x1", "x", 100L)).toDF("id", "source", "mass")
    // target group y has no rows -> absent from mass -> inner join
    // drops it; x alone binds on itself
    val r = Mixture.rates(df, col("source"), col("mass"),
      Seq("x" -> 1L, "y" -> 1L))
      .as[(String, Long, Long, Long)].collect.toSeq
    assert(r === Seq(("x", 100L, 1L, 1000000L)))
  }

  test("mixture sample: caller columns named grp survive; keep_thr " +
    "input is rejected loudly") {
    // a caller column literally named `grp` must not collide with the
    // rate-table internals (they join under _graft_ prefixes)
    val df = (1L to 300L)
      .map(i => (i, if (i % 2 == 0) "a" else "b", 10L, "callers_grp"))
      .toDF("id", "source", "mass", "grp")
    val out = Mixture.sample(df, col("source"), col("id"), col("mass"),
      Seq("a" -> 1L, "b" -> 1L))
    assert(out.columns.toSeq ===
      Seq("id", "source", "mass", "grp", "keep_thr"))
    assert(out.select("grp").distinct().as[String].collect.toSeq ===
      Seq("callers_grp"))
    // equal targets, equal mass -> both groups bind -> everything kept
    assert(out.count() === 300L)
    assert(out.select("keep_thr").distinct().as[Long].head === 1000000L)
    // keep_thr is the operator's audit OUTPUT: an input carrying one
    // fails loudly instead of being silently shadowed
    val ex = intercept[IllegalArgumentException] {
      Mixture.sample(df.withColumnRenamed("grp", "keep_thr"),
        col("source"), col("id"), col("mass"), Seq("a" -> 1L))
    }
    assert(ex.getMessage.contains("keep_thr"))
    // the _graft_ internal join names are likewise reserved: colliding
    // input fails with the clear require message, not a join-time
    // AnalysisException (or a silently dropped caller column)
    val ex2 = intercept[IllegalArgumentException] {
      Mixture.sample(df.withColumnRenamed("grp", "_graft_grp"),
        col("source"), col("id"), col("mass"), Seq("a" -> 1L))
    }
    assert(ex2.getMessage.contains("_graft_grp"))
  }

  // ---------------------------------------------------------------- Graph

  test("degrees counts both directions with zero-fill") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val d = Graph.degrees(e, "src", "dst")
      .orderBy("node").as[(Long, Long, Long)].collect.toSeq
    assert(d === Seq((1L, 2L, 0L), (2L, 1L, 1L), (3L, 0L, 2L)))
  }

  test("degrees widens mixed integral id widths; other mismatches loud") {
    // int src vs long dst — routine after joining against a
    // differently-typed dimension; must widen, not fail array(struct)
    // type unification
    val e = Seq((1, 2L), (1, 3L), (2, 3L)).toDF("src", "dst")
    val d = Graph.degrees(e, "src", "dst")
      .orderBy("node").as[(Long, Long, Long)].collect.toSeq
    assert(d === Seq((1L, 2L, 0L), (2L, 1L, 1L), (3L, 0L, 2L)))
    val bad = Seq(("a", 2L)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      Graph.degrees(bad, "src", "dst")
    }
    assert(ex.getMessage.contains("integral"))
  }

  test("pagerank: 3-cycle fixpoint is uniform, mass conserved") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val pr = Graph.pagerank(e, "src", "dst", iters = 5)
      .as[(Long, Double)].collect.toMap
    assert(pr.size === 3)
    pr.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
    assert(math.abs(pr.values.sum - 1.0) < 1e-12)
  }

  test("pagerank: dangling mass redistributed, sink outranks source") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val pr = Graph.pagerank(e, "src", "dst", iters = 20)
      .as[(Long, Double)].collect.toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    assert(pr(2L) > pr(1L))
  }

  test("pagerank: tol stops iteration early once ranks settle") {
    // a 3-cycle is AT the fixpoint from round 0 (uniform in, uniform
    // out) — with tol set it must stop after the first probe, not run
    // the full budget
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    var rounds = 0
    var lastDelta = Double.MaxValue
    val pr = Graph.pagerank(e, "src", "dst", iters = 50, tol = 1e-12,
      onRound = Some((i, d) => { rounds = i + 1; lastDelta = d }))
      .as[(Long, Double)].collect.toMap
    assert(rounds === 1)
    assert(lastDelta < 1e-12)
    pr.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
    // a chain takes several rounds to settle but still stops early,
    // at the same answer as the full fixed budget
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    var chainRounds = 0
    val early = Graph.pagerank(chain, "src", "dst", iters = 100,
      tol = 1e-10, onRound = Some((i, _) => chainRounds = i + 1))
      .as[(Long, Double)].collect.toMap
    val full = Graph.pagerank(chain, "src", "dst", iters = 100)
      .as[(Long, Double)].collect.toMap
    assert(chainRounds < 100)
    early.foreach { case (n, r) => assert(math.abs(r - full(n)) < 1e-8) }
  }

  // ------------------------------------------------------ BPE training

  /** Single-node reference BPE trainer (Sennrich et al. 2016): the
    * exact algorithm on in-memory maps, same deterministic tie-break
    * as [[graft.operators.Vocab.trainBpe]]. */
  private def refBpe(corpus: Seq[String], n: Int, minFreq: Long)
      : Seq[(String, String, Long)] = {
    var words: Map[List[String], Long] = corpus
      .flatMap(_.toLowerCase.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) =>
        w.map(_.toString).toList -> g.size.toLong }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long)]
    var done = false
    (1 to n).foreach { _ =>
      if (!done) {
        val pc = scala.collection.mutable.Map
          .empty[(String, String), Long].withDefaultValue(0L)
        words.foreach { case (syms, c) =>
          syms.zip(syms.tail).foreach(p => pc(p) += c) }
        val cands = pc.toSeq.filter(_._2 >= minFreq)
        if (cands.isEmpty) done = true
        else {
          val ((a, b), f) = cands.minBy { case ((x, y), c) =>
            (-c, x, y) }
          out += ((a, b, f))
          def apply(l: List[String]): List[String] =
            l.foldLeft(List.empty[String]) { (acc, x) =>
              if (acc.nonEmpty && acc.last == a && x == b)
                acc.init :+ (a + b)
              else acc :+ x
            }
          words = words.map { case (s, c) => apply(s) -> c }
        }
      }
    }
    out.toSeq
  }

  test("trainBpe matches the single-node reference trainer merge for merge") {
    // the classic illustration corpus plus repetition to force ties
    val texts = Seq(
      "low low low low low lower lower newest newest",
      "newest newest newest widest widest widest",
      "low lower lowest newest widest the the the the the the")
    val docs = texts.toDF("text")
    val got = graft.operators.Vocab.trainBpe(docs, "text", 12)
      .orderBy("rank")
      .select("left", "right", "freq")
      .as[(String, String, Long)].collect().toSeq
    val want = refBpe(texts, 12, 2L)
    assert(got == want,
      s"distributed merges diverged:\n got=$got\nwant=$want")
    // early stop: no pair reaches minPairFreq on a hapax-only corpus
    val hapax = Seq("ab cd ef").toDF("text")
    assert(graft.operators.Vocab.trainBpe(hapax, "text", 5).count() == 0)
    // and a HUGE minFreq stops immediately even on the rich corpus
    assert(graft.operators.Vocab
      .trainBpe(docs, "text", 5, minPairFreq = 1000L).count() == 0)
  }

  test("trainBpe on real documents: learned vocab shrinks bpe_count monotonically") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text")).limit(200).localCheckpoint()
    val texts = docs.as[String].collect().toSeq
    val merges = graft.operators.Vocab.trainBpe(docs, "text", 25)
    val got = merges.orderBy("rank")
      .select("left", "right", "freq")
      .as[(String, String, Long)].collect().toSeq
    assert(got == refBpe(texts, 25, 2L),
      "corpus-trained merges diverged from the reference")
    // merge tokens compose: every token = left + right
    val toks = merges.orderBy("rank")
      .select("left", "right", "token").as[(String, String, String)]
      .collect()
    assert(toks.forall { case (l, r, t) => l + r == t })
    // the trained vocabulary drives the tokenizer: more merges →
    // no more tokens (longest-match counts shrink monotonically)
    val v10 = graft.operators.Vocab.bpeVocab(merges.filter(col("rank") <= 10))
    val v25 = graft.operators.Vocab.bpeVocab(merges)
    def total(v: Seq[String]): Long = docs
      .select(sum(graft.operators.TextOps.vocabTokens(col("text"), v)))
      .as[Long].head()
    val chars = docs.select(sum(length(regexp_replace(
      lower(trim(col("text"))), "\\s+", "")))).as[Long].head()
    val (t10, t25) = (total(v10), total(v25))
    assert(t25 <= t10 && t10 <= chars,
      s"expected monotone compression: chars=$chars t10=$t10 t25=$t25")
    assert(t25 < chars, "25 merges should compress a real corpus")
  }

  // ---------------------------------------------------- training order

  test("trainingOrder: exact per-shard positions equal the naive window; seed permutes") {
    import graft.operators.Sampling
    import org.apache.spark.sql.expressions.{Window => W}
    val df = (1L to 500L).map(Tuple1(_)).toDF("id")
    val got = Sampling.trainingOrder(df, col("id"), "s1", 4, nBuckets = 8)
      .as[(Long, Long, Long)].collect().toSet
    // the naive form: ONE window per shard (the cliff the operator
    // avoids) — must give identical (key, shard, pos)
    val h = Sampling.hashBucket(
      concat(lit("s1"), lit(":"), col("id").cast("string")))
    val naive = df.select(col("id"), h.as("h"),
      pmod(h, lit(4L)).as("shard"))
      .withColumn("pos", row_number().over(
        W.partitionBy("shard").orderBy(col("h").asc, col("id").asc))
        .cast("long"))
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect().toSet
    assert(got == naive)
    // positions are contiguous 1..n within every shard
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3) == (1L to rows.size).toSet)
    }
    // a different seed is a different permutation
    val got2 = Sampling.trainingOrder(df, col("id"), "s2", 4, nBuckets = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(got2 != got)
  }
}
