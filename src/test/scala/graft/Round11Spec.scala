package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.TxLog

/** Round-11: the ACID-table features COMPOSE. Deletion vectors,
  * column mapping, the change feed, and the maintenance policy each
  * have their own pinning tests; this suite runs ONE table through
  * its whole life — ingest appends → DDL rename → merge-on-read DML →
  * maintenance compaction → vacuum — while a DOWNSTREAM FOLLOWER
  * materializes the change feed into its own logged copy and must
  * equal the source at every step. That follower is the 100 TB
  * pattern the features exist for: a derived corpus (re-embedded,
  * re-scored, re-packed) tracking a curated table through deletes and
  * renames by reading ROW DIFFS, never the table.
  */
class Round11Spec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._

  private def stateOf(df: DataFrame): Map[Long, String] = {
    val cols = df.columns
    df.select(col(cols.head).cast("long"), col(cols(1)))
      .as[(Long, String)].collect().toMap
  }

  test("table lifecycle with a change-feed follower: equal at every step") {
    val src = Files.createTempDirectory("r11src").toString
    val dst = Files.createTempDirectory("r11dst").toString

    // the follower: applies (since, head] row diffs to its own logged
    // copy — delete pre-images via MoR (matching by full row), insert
    // post-images via append. Never reads the source table itself.
    var applied = -1L
    def followUp(): Unit = {
      val head = TxLog.snapshot(spark, src).version
      if (head == applied) return
      val feed = TxLog.changeFeed(spark, src, applied, Some(head))
        .localCheckpoint(true)
      val cols = feed.columns.filterNot(_.startsWith("_change"))
        .filterNot(_ == "_commit_version")
      val dels = feed.filter(col("_change_type") === "delete")
        .select(cols.map(col).toSeq: _*)
      val ins = feed.filter(col("_change_type") === "insert")
        .select(cols.map(col).toSeq: _*)
      // the follower's copy may predate a source rename — align its
      // logical schema to the feed's before applying
      if (TxLog.isLogged(spark, dst)) {
        val have = TxLog.read(spark, dst).columns.toSeq
        val want = cols.toSeq
        have.zip(want).filter { case (a, b) => a != b }.foreach {
          case (a, b) => TxLog.renameColumn(spark, dst, a, b)
        }
        dels.collect().foreach { r =>
          val pred = cols.zipWithIndex.map { case (c, i) =>
            col(c) <=> lit(r.get(i)) }.reduce(_ && _)
          TxLog.deleteMor(spark, dst, pred)
          ()
        }
        if (!ins.isEmpty) TxLog.commitAppend(spark, dst, ins)
      } else TxLog.commitOverwrite(spark, dst, ins)
      applied = head
    }
    def assertSynced(): Unit = {
      followUp()
      assert(stateOf(TxLog.read(spark, dst)) ==
        stateOf(TxLog.read(spark, src)),
        "follower diverged from source")
    }

    // 1. ingest: the table is born plus three small appends
    TxLog.commitOverwrite(spark, src,
      (1L to 40L).map(i => (i, s"doc_$i")).toDF("id", "text"),
      statsCols = Seq("id"))
    (1 to 3).foreach { b =>
      TxLog.commitAppend(spark, src,
        Seq((100L + b, s"late_$b")).toDF("id", "text"),
        statsCols = Seq("id"))
      ()
    }
    assertSynced()

    // 2. DDL: rename flows through the feed as schema, not rows
    TxLog.renameColumn(spark, src, "text", "body")
    assertSynced()
    assert(TxLog.read(spark, dst).columns.toSeq == Seq("id", "body"))

    // 3. merge-on-read DML: deletes arrive as row diffs
    TxLog.deleteMor(spark, src, col("id") <= 10)
    TxLog.updateMor(spark, src, col("id") === 20L,
      Map("body" -> lit("edited")))
    assertSynced()
    assert(stateOf(TxLog.read(spark, dst))(20L) == "edited")

    // 4. maintenance: the policy fires on small-file pressure,
    //    no-ops when healthy — and compaction is INVISIBLE to the
    //    follower (rewrites, not rows)
    val m1 = TxLog.maintain(spark, src, maxFiles = 3, targetFiles = 2,
      statsCols = Seq("id"))
    assert(m1.compacted, m1.reason)
    val m2 = TxLog.maintain(spark, src, maxFiles = 3, targetFiles = 2)
    assert(!m2.compacted && m2.version == m1.version)
    assertSynced()

    // 5. dv pressure fires the policy too (fresh small table: 1 of 4
    //    rows vectored > 10%)
    val dv = Files.createTempDirectory("r11dv").toString
    TxLog.commitOverwrite(spark, dv,
      (1L to 4L).map(i => (i, s"d$i")).toDF("id", "text"))
    TxLog.deleteMor(spark, dv, col("id") === 1)
    val m3 = TxLog.maintain(spark, dv, maxFiles = 1000)
    assert(m3.compacted && m3.reason.contains("dv"))
    assert(TxLog.snapshot(spark, dv).files.forall(_.dv.isEmpty))

    // 6. vacuum the source's history; the follower needs nothing from
    //    it (already applied) and stays equal
    assert(TxLog.vacuum(spark, src) > 0)
    assert(stateOf(TxLog.read(spark, dst)) ==
      stateOf(TxLog.read(spark, src)))

    // 7. the whole source state is exactly what the model says
    val want = ((11L to 40L).map(i => i -> s"doc_$i") ++
      (1 to 3).map(b => (100L + b) -> s"late_$b")).toMap
      .updated(20L, "edited")
    assert(stateOf(TxLog.read(spark, src)) == want)
  }
}
