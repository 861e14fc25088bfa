package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.TxLog

/** Column DEFAULT values (Delta's `ALTER COLUMN … SET DEFAULT`): a
  * pure WRITER feature — omitted columns fill at write, supplied
  * values (including NULLs) flow untouched, no reader gate.
  */
class DefaultColSpec extends SparkSpec {

  private def tmp(prefix: String): Path =
    Files.createTempDirectory(prefix)

  private def payload(n: Int, tag: String): DataFrame = {
    val s = spark
    import s.implicits._
    (0 until n).map(i => (i.toLong, s"$tag$i")).toDF("k", "name")
  }

  test("defaults: fill on omit, flow on supply (incl. NULL), no reader gate") {
    val s = spark
    import s.implicits._
    val dir = tmp("defbase").toString
    TxLog.commitOverwrite(spark, dir,
      payload(4, "a").withColumn("status", lit("seed")))
    TxLog.setDefault(spark, dir, "status", "'pending'")
    // a declaration is a writer feature: generation stays put
    assert(TxLog.snapshot(spark, dir).minReader == 1)
    assert(TxLog.snapshot(spark, dir).defaults ==
      Map("status" -> "'pending'"))
    // omitted -> filled
    TxLog.commitAppend(spark, dir, payload(2, "b"))
    assert(TxLog.read(spark, dir)
      .filter(col("status") === "pending").count() == 2)
    // supplied -> untouched, NULL included (SQL DEFAULT semantics)
    TxLog.commitAppend(spark, dir,
      Seq((100L, "x", "done"), (101L, "y", null))
        .toDF("k", "name", "status"))
    assert(TxLog.read(spark, dir)
      .filter(col("status") === "done").count() == 1)
    assert(TxLog.read(spark, dir)
      .filter(col("status").isNull).count() == 1)
    // drop releases: an omitting append is a plain schema mismatch
    TxLog.dropDefault(spark, dir, "status")
    intercept[Exception] {
      TxLog.commitAppend(spark, dir, payload(1, "c"))
    }
  }

  test("defaults: creation-time declaration defines the omitted column") {
    val dir = tmp("defcreate").toString
    TxLog.commitOverwrite(spark, dir, payload(3, "a"),
      defaults = Map("score" -> "CAST(0 AS BIGINT)"))
    val t = TxLog.read(spark, dir)
    assert(t.columns.toSeq == Seq("k", "name", "score"))
    assert(t.filter(col("score") === 0L).count() == 3)
    // the declaration stands for later appends
    TxLog.commitAppend(spark, dir, payload(2, "b"))
    assert(TxLog.read(spark, dir).filter(col("score") === 0L)
      .count() == 5)
  }

  test("defaults: declaration refusals — column refs, identity/generated crossover") {
    val dir = tmp("defref").toString
    TxLog.commitOverwrite(spark, dir,
      payload(3, "a").withColumn("v", col("k") * 2)
        .withColumn("id", col("k") + 1),
      identity = Map("id" -> TxLog.IdentitySpec(1L, 1L, always = false)))
    TxLog.setGenerated(spark, dir, "v", "k * 2")
    val e = intercept[IllegalArgumentException] {
      TxLog.setDefault(spark, dir, "name", "CAST(k AS STRING)")
    }
    assert(e.getMessage.contains("literal-foldable"))
    intercept[IllegalArgumentException] {
      TxLog.setDefault(spark, dir, "id", "5") // identity
    }
    intercept[IllegalArgumentException] {
      TxLog.setDefault(spark, dir, "v", "'x'") // generated
    }
    intercept[IllegalArgumentException] {
      TxLog.setDefault(spark, dir, "nope", "1") // unknown column
    }
    TxLog.setDefault(spark, dir, "name", "'n/a'")
    // the reverse crossovers refuse too
    intercept[IllegalArgumentException] {
      TxLog.setGenerated(spark, dir, "name", "CAST(k AS STRING)")
    }
    intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, dir, "name", "label")
    }
    intercept[IllegalArgumentException] {
      TxLog.dropColumn(spark, dir, "name")
    }
    TxLog.dropDefault(spark, dir, "name")
    TxLog.renameColumn(spark, dir, "name", "label")
    assert(TxLog.read(spark, dir).columns.contains("label"))
  }

  test("defaults: survive checkpoints, restore, and both clone forms") {
    val dir = tmp("defcp").toString
    TxLog.commitOverwrite(spark, dir, payload(3, "a"),
      defaults = Map("name" -> "'anon'"))
    (1 to 12).foreach(i =>
      TxLog.commitAppend(spark, dir, payload(2, s"b$i")))
    assert(TxLog.snapshot(spark, dir).defaults ==
      Map("name" -> "'anon'"))
    TxLog.restore(spark, dir, 3L)
    assert(TxLog.snapshot(spark, dir).defaults.nonEmpty)
    val sh = tmp("defcpsh").toString + "/t"
    val dp = tmp("defcpdp").toString + "/t"
    TxLog.clone(spark, dir, sh)
    TxLog.deepClone(spark, dir, dp)
    val s = spark
    import s.implicits._
    Seq(sh, dp).foreach { c =>
      assert(TxLog.snapshot(spark, c).defaults.nonEmpty)
      TxLog.commitAppend(spark, c,
        Seq((500L)).toDF("k")) // omits name -> default fills
      assert(TxLog.read(spark, c)
        .filter(col("name") === "anon").count() == 1)
    }
  }
}
