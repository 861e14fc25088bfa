package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-13 additions: 128-bit ExactSubstr window identity (with
  * refusal of pre-round-13 64-bit persisted indexes), DSIR fail-fast
  * on non-integral id columns, skipChangeCommits / ignoreDeletes on
  * the plain streaming source, merge-on-read applyChanges,
  * maxBytesPerTrigger admission, best-fit shard packing, and
  * timestamp-bounded batch change feeds.
  */
class Round13Spec extends SparkSpec {

  private def tmp(prefix: String): Path =
    Files.createTempDirectory(prefix)

  // ---- ExactSubstr 128-bit identity --------------------------------

  test("substr index: persisted format carries hash_bits=128; pre-round-13 index refused") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val dir = tmp("substr128").toString
    val idx = graft.operators.ExactSubstr
      .buildSubstrIndex(corpus, "doc_id", "text", k = 4)
    assert(idx.hashes.columns.toSeq == Seq("_h1", "_h2"))
    graft.operators.ExactSubstr.saveSubstrIndex(idx, "r13es", dir,
      nBuckets = 2)
    val meta = s.read.parquet(s"$dir/meta").head()
    assert(meta.getAs[Int]("hash_bits") == 128)
    val loaded = graft.operators.ExactSubstr
      .loadSubstrIndex(s, "r13es", dir)
    assert(loaded.k == 4)
    assert(loaded.hashes.count() == idx.hashes.count())

    // a pre-round-13 index (single _h column, no hash_bits in meta)
    // must refuse loudly, not silently probe 64-bit identities
    val oldDir = tmp("substr64").toString
    idx.hashes.select(col("_h1").as("_h"))
      .write.parquet(s"$oldDir/substr")
    Seq((4, 2)).toDF("k", "n_buckets")
      .write.parquet(s"$oldDir/meta")
    val e = intercept[IllegalArgumentException] {
      graft.operators.ExactSubstr.loadSubstrIndex(s, "r13es_old", oldDir)
    }
    assert(e.getMessage.contains("128-bit"))
  }

  test("dedupSpans after widening: planted repeat removed, unique text intact") {
    val s = spark
    import s.implicits._
    val boiler = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq(
      (1L, s"p1a p1b p1c $boiler s1a s1b s1c"),
      (2L, s"p2a p2b p2c $boiler s2a s2b s2c"),
      (3L, "entirely unique text with no repeats anywhere at all ok"))
      .toDF("doc_id", "text")
    val out = graft.operators.ExactSubstr
      .dedupSpans(docs, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
    // doc 1 is the first occurrence — keeps everything
    assert(out(0).getAs[Long]("n_removed") == 0L)
    // doc 2 loses the repeated 10-token boilerplate (only windows fully
    // inside it are shared — the distinct prefixes/suffixes keep
    // straddling windows unique)
    assert(out(1).getAs[Long]("n_removed") == 10L)
    assert(out(1).getAs[String]("text_clean") == "p2a p2b p2c s2a s2b s2c")
    // doc 3 untouched
    assert(out(2).getAs[Long]("n_removed") == 0L)
    assert(out(2).getAs[String]("text_clean").startsWith("entirely unique"))
  }

  // ---- DSIR id-type guard ------------------------------------------

  test("DSIR refuses a non-integral id column instead of returning all-zero weights") {
    val s = spark
    import s.implicits._
    val raw = Seq(("a", "some text here"), ("b", "other text there"))
      .toDF("doc_id", "text")
    val target = Seq((1L, "some text here")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Dsir.importanceWeights(raw, target, "doc_id", "text")
    }
    assert(e.getMessage.contains("integral"))
  }
}
