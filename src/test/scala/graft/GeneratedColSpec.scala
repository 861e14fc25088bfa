package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.TxLog

/** Generated columns (log generation 4 — Delta's `GENERATED ALWAYS AS
  * (expr)`): computed when omitted, validated when supplied, refused
  * on divergence; UPDATE refuses direct SET and recomputes when a
  * source column changes; declaration/checkpoint/clone carriage.
  */
class GeneratedColSpec extends SparkSpec {

  private def tmp(prefix: String): Path =
    Files.createTempDirectory(prefix)

  private def payload(n: Int, tag: String): DataFrame = {
    val s = spark
    import s.implicits._
    (0 until n).map(i => (i.toLong, i.toLong * 10, s"$tag$i"))
      .toDF("k", "v", "name")
  }

  private def checkAll(dir: String): Unit = {
    val bad = TxLog.read(spark, dir)
      .filter(!(col("v2") <=> expr("v * 2 + 1"))).count()
    assert(bad == 0, "every row must satisfy the expression")
  }

  test("generated: creation-time declaration computes the omitted column") {
    val dir = tmp("gencreate").toString
    TxLog.commitOverwrite(spark, dir, payload(10, "a"),
      generated = Map("v2" -> "v * 2 + 1"))
    val t = TxLog.read(spark, dir)
    assert(t.columns.toSeq == Seq("k", "v", "name", "v2"))
    checkAll(dir)
    assert(TxLog.snapshot(spark, dir).minReader == 4)
    // appends omitting the column keep computing it
    TxLog.commitAppend(spark, dir, payload(5, "b"))
    assert(TxLog.read(spark, dir).count() == 15)
    checkAll(dir)
  }

  test("generated: supplied values validate — matching flows, diverging refuses") {
    val s = spark
    import s.implicits._
    val dir = tmp("genval").toString
    TxLog.commitOverwrite(spark, dir, payload(5, "a"),
      generated = Map("v2" -> "v * 2 + 1"))
    // matching explicit values flow
    TxLog.commitAppend(spark, dir,
      Seq((100L, 7L, "x", 15L)).toDF("k", "v", "name", "v2"))
    assert(TxLog.read(spark, dir).count() == 6)
    // diverging values refuse, nothing lands
    val e = intercept[IllegalArgumentException] {
      TxLog.commitAppend(spark, dir,
        Seq((101L, 7L, "y", 99L)).toDF("k", "v", "name", "v2"))
    }
    assert(e.getMessage.contains("diverge"))
    assert(TxLog.read(spark, dir).count() == 6)
  }

  test("generated: setGenerated validates live data; dropGenerated releases") {
    val s = spark
    import s.implicits._
    val dir = tmp("genset").toString
    TxLog.commitOverwrite(spark, dir,
      payload(5, "a").withColumn("v2", col("v") * 2 + 1))
    TxLog.setGenerated(spark, dir, "v2", "v * 2 + 1")
    assert(TxLog.snapshot(spark, dir).generated ==
      Map("v2" -> "v * 2 + 1"))
    // now an append may omit it
    TxLog.commitAppend(spark, dir, payload(3, "b"))
    checkAll(dir)
    // declaring an expression live data does NOT satisfy refuses
    val e = intercept[IllegalArgumentException] {
      TxLog.setGenerated(spark, dir, "name", "CAST(k AS STRING)")
    }
    assert(e.getMessage.contains("diverge"))
    // drop: the column stays, explicit arbitrary values flow again
    TxLog.dropGenerated(spark, dir, "v2")
    assert(TxLog.snapshot(spark, dir).generated.isEmpty)
    TxLog.commitAppend(spark, dir,
      Seq((200L, 1L, "z", -5L)).toDF("k", "v", "name", "v2"))
    assert(TxLog.read(spark, dir).filter(col("v2") === -5L).count() == 1)
  }

  test("generated: declaration refusals — self/unknown/layered refs, identity cross, rename/drop guards") {
    val s = spark
    import s.implicits._
    val dir = tmp("genref").toString
    TxLog.commitOverwrite(spark, dir,
      payload(4, "a").withColumn("v2", col("v") * 2)
        .withColumn("id", col("k") + 1),
      identity = Map("id" -> TxLog.IdentitySpec(1L, 1L, always = false)))
    intercept[IllegalArgumentException] {
      TxLog.setGenerated(spark, dir, "v2", "v2 + 1") // self
    }
    intercept[IllegalArgumentException] {
      TxLog.setGenerated(spark, dir, "v2", "nope * 2") // unknown
    }
    intercept[IllegalArgumentException] {
      TxLog.setGenerated(spark, dir, "v2", "id * 2") // identity source
    }
    intercept[IllegalArgumentException] {
      TxLog.setGenerated(spark, dir, "id", "k + 1") // identity target
    }
    TxLog.setGenerated(spark, dir, "v2", "v * 2")
    intercept[IllegalArgumentException] {
      TxLog.setGenerated(spark, dir, "name", "CAST(v2 AS STRING)") // gen-on-gen
    }
    intercept[IllegalArgumentException] {
      TxLog.setIdentity(spark, dir, "v2") // identity on generated
    }
    intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, dir, "v", "w") // referenced by v2
    }
    intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, dir, "v2", "w") // is generated
    }
    intercept[IllegalArgumentException] {
      TxLog.dropColumn(spark, dir, "v") // referenced by v2
    }
    // unreferenced columns still rename/drop freely
    TxLog.renameColumn(spark, dir, "name", "label")
    assert(TxLog.read(spark, dir).columns.contains("label"))
  }

  test("generated: UPDATE refuses direct SET and recomputes on source change") {
    val dir = tmp("genupd").toString
    TxLog.commitOverwrite(spark, dir,
      payload(10, "a").repartition(2),
      generated = Map("v2" -> "v * 2 + 1"))
    val e = intercept[IllegalArgumentException] {
      TxLog.update(spark, dir, col("k") === 1L, Map("v2" -> lit(0L)))
    }
    assert(e.getMessage.contains("generated"))
    // updating the source column recomputes the expression — on the
    // updated rows only, copy-on-write
    TxLog.update(spark, dir, col("k") < 3L, Map("v" -> (col("v") + 100L)))
    checkAll(dir)
    assert(TxLog.read(spark, dir)
      .filter(col("k") === 1L).select("v2").head().getLong(0) == 221L)
    // the merge-on-read form recomputes identically
    intercept[IllegalArgumentException] {
      TxLog.updateMor(spark, dir, col("k") === 1L, Map("v2" -> lit(0L)))
    }
    TxLog.updateMor(spark, dir, col("k") >= 8L,
      Map("v" -> (col("v") + 1000L)))
    checkAll(dir)
    assert(TxLog.read(spark, dir)
      .filter(col("k") === 9L).select("v2").head().getLong(0) == 2181L)
  }

  test("generated: merge and applyChanges validate directive payloads") {
    val s = spark
    import s.implicits._
    val dir = tmp("genmerge").toString
    TxLog.commitOverwrite(spark, dir, payload(6, "a"),
      generated = Map("v2" -> "v * 2 + 1"))
    // a matching source flows (replace k=2, insert k=50)
    val good = Seq((2L, 5L, "m", 11L), (50L, 1L, "n", 3L))
      .toDF("k", "v", "name", "v2")
    TxLog.merge(spark, dir, good, keyCols = Seq("k"))
    checkAll(dir)
    assert(TxLog.read(spark, dir).count() == 7)
    // a diverging source refuses before anything lands
    val bad = Seq((3L, 5L, "m", 99L)).toDF("k", "v", "name", "v2")
    intercept[IllegalArgumentException] {
      TxLog.merge(spark, dir, bad, keyCols = Seq("k"))
    }
    intercept[IllegalArgumentException] {
      TxLog.applyChanges(spark, dir,
        bad.withColumn("_del", lit(false)), Seq("k"), "_del")
    }
    intercept[IllegalArgumentException] {
      TxLog.applyChangesMor(spark, dir,
        bad.withColumn("_del", lit(false)), Seq("k"), "_del")
    }
    assert(TxLog.read(spark, dir).count() == 7)
  }

  test("generated: survives checkpoints, restore, and rides both clone forms") {
    val dir = tmp("gencp").toString
    TxLog.commitOverwrite(spark, dir, payload(5, "a"),
      generated = Map("v2" -> "v * 2 + 1"))
    // enough commits to cross a checkpoint boundary
    (1 to 12).foreach(i => TxLog.commitAppend(spark, dir, payload(2, s"b$i")))
    assert(TxLog.snapshot(spark, dir).generated ==
      Map("v2" -> "v * 2 + 1"))
    checkAll(dir)
    // restore keeps the declaration (Delta's RESTORE table-property
    // behavior); later writes still generate
    TxLog.restore(spark, dir, 3L)
    assert(TxLog.snapshot(spark, dir).generated.nonEmpty)
    TxLog.commitAppend(spark, dir, payload(2, "post"))
    checkAll(dir)
    // both clone forms carry the declaration and enforce it
    val sh = tmp("gencpsh").toString + "/t"
    val dp = tmp("gencpdp").toString + "/t"
    TxLog.clone(spark, dir, sh)
    TxLog.deepClone(spark, dir, dp)
    Seq(sh, dp).foreach { c =>
      assert(TxLog.snapshot(spark, c).generated.nonEmpty)
      assert(TxLog.snapshot(spark, c).minReader == 4)
      TxLog.commitAppend(spark, c, payload(2, "c"))
      val badRows = TxLog.read(spark, c)
        .filter(!(col("v2") <=> expr("v * 2 + 1"))).count()
      assert(badRows == 0)
      intercept[IllegalArgumentException] {
        TxLog.commitAppend(spark, c, payload(1, "d")
          .withColumn("v2", lit(0L)))
      }
    }
  }
}
