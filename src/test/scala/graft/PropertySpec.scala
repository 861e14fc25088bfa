package graft

import scala.util.Random

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextHash

/** Property-style invariants for the native hash kernels, driven by a
  * seeded sampler (deterministic; no extra test frameworks). */
class PropertySpec extends SparkSpec {

  private val rnd = new Random(42)
  private def sampleText(): String = {
    val n = rnd.nextInt(60)
    val chars = "abcdefghijklmnopqrstuvwxyz0123456789 "
    (0 until n).map(_ => chars(rnd.nextInt(chars.length))).mkString
  }
  private def samples(n: Int): Seq[String] = Seq.fill(n)(sampleText())

  test("fnv1a is deterministic and sensitive to any byte change") {
    samples(200).foreach { s =>
      val u = UTF8String.fromString(s)
      assert(TextHash.fnv1a(u) == TextHash.fnv1a(UTF8String.fromString(s)))
      if (s.nonEmpty) {
        val mutated = s.updated(0, if (s(0) == 'x') 'y' else 'x')
        assert(TextHash.fnv1a(u) !=
          TextHash.fnv1a(UTF8String.fromString(mutated)))
      }
    }
  }

  test("simhash of identical token seqs is identical; empty is zero-safe") {
    samples(100).foreach { s =>
      val ts = s.split(" ").toSeq
      def arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        ts.map(t => UTF8String.fromString(t)).toArray[Any])
      assert(TextHash.simhash(arr) == TextHash.simhash(arr))
    }
    val empty = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.empty[Any])
    assert(TextHash.simhash(empty) == 0L)
  }

  test("hamming is a metric on sampled signatures") {
    (0 until 200).foreach { _ =>
      val (a, b, c) = (rnd.nextLong(), rnd.nextLong(), rnd.nextLong())
      assert(TextHash.hamming(a, a) == 0)
      assert(TextHash.hamming(a, b) == TextHash.hamming(b, a))
      assert(TextHash.hamming(a, c) <=
        TextHash.hamming(a, b) + TextHash.hamming(b, c))
    }
  }

  test("winnow output is a subset of all k-gram hashes, size in range") {
    samples(200).foreach { s =>
      val u = UTF8String.fromString(s)
      val fp = TextHash.winnow(u, 4, 3).toLongArray()
      val bytes = s.getBytes("UTF-8")
      if (bytes.length < 4) assert(fp.isEmpty)
      else {
        assert(fp.nonEmpty)
        assert(fp.length <= bytes.length - 4 + 1)
        val all = (0 to bytes.length - 4).map { i =>
          var h = TextHash.FnvOffset
          (0 until 4).foreach { j =>
            h ^= (bytes(i + j) & 0xffL); h *= TextHash.FnvPrime
          }
          h
        }.toSet
        assert(fp.toSet.subsetOf(all))
      }
    }
  }

  test("winnow shared-substring guarantee (k + w - 1 overlap ⇒ shared fp)") {
    val common = "thequickbrownfoxjumpsover" // length ≥ k+w-1 = 6
    samples(100).foreach { pre =>
      val post = sampleText()
      val fpA = TextHash.winnow(
        UTF8String.fromString(pre + common), 4, 3).toLongArray().toSet
      val fpB = TextHash.winnow(
        UTF8String.fromString(common + post), 4, 3).toLongArray().toSet
      assert((fpA & fpB).nonEmpty)
    }
  }

  test("kmv invariants: merge-order independence, bounds, symmetry") {
    import graft.functions.Kmv
    val rnd = new Random(7)
    def sketch(vs: Seq[Long], k: Int): Array[Long] =
      vs.distinct.sortBy(Kmv.uns).take(k).toArray
    (1 to 20).foreach { trial =>
      val n = 50 + rnd.nextInt(5000)
      val k = 64
      val hashes = Seq.fill(n)(rnd.nextLong()).distinct
      val sk = sketch(hashes, k)
      // estimate within loose bounds (stderr ~ 1/sqrt(k) ⇒ 5σ ≈ 60%)
      val est = Kmv.estimate(sk, k)
      assert(est > hashes.size * 0.4 && est < hashes.size * 1.6,
        s"trial $trial: est $est vs ${hashes.size}")
      // sketch of a union == merged sketches (any split point)
      val cut = rnd.nextInt(hashes.size)
      val (l, r) = hashes.splitAt(cut)
      val merged = sketch((sketch(l, k) ++ sketch(r, k)).toSeq, k)
      assert(merged.toSeq == sk.toSeq, s"trial $trial merge mismatch")
      // jaccard symmetric, in [0,1]; self-jaccard == 1
      val other = sketch(Seq.fill(n)(rnd.nextLong()).distinct, k)
      val j1 = Kmv.jaccard(sk, other, k)
      assert(j1 == Kmv.jaccard(other, sk, k))
      assert(j1 >= 0.0 && j1 <= 1.0)
      assert(Kmv.jaccard(sk, sk, k) == 1.0)
    }
  }

  test("dedup invariants: exact dedup is idempotent and non-expanding") {
    val out = graft.queries.DedupQueries.dedupExact(spark, sf)
    val n = Tables(spark, sf, "documents").count()
    assert(out.count() <= n)
    assert(out.agg(org.apache.spark.sql.functions.sum("n_docs"))
      .head().getLong(0) == n)
  }
}

/** The SparkSessionExtensions injection path (`spark.sql.extensions`). */
class ExtensionsSpec extends SparkSpec {
  test("GraftExtensions applies cleanly to a SparkSessionExtensions") {
    // getOrCreate reuses the active test session (configs ignored), so
    // exercise the extensions object directly: it must accept every
    // injection without throwing — same call path spark.sql.extensions
    // uses at session build time.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
  }

  test("registered functions are callable from SQL in a fresh session") {
    val fresh = SparkSpec.spark.newSession() // isolated function registry
    graft.functions.GraftFunctions.register(fresh)
    val out = fresh.sql(
      """SELECT simhash64(array('a', 'b')) AS s,
                hamming64(3L, 1L) AS h,
                vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                size(winnow('abcdefghij', 4, 3)) AS w""").head()
    assert(out.getAs[Int]("h") == 1)
    assert(out.getAs[Double]("d") == 11.0)
    assert(out.getAs[Int]("w") >= 1)
  }
}
