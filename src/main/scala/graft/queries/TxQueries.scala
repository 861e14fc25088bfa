package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.{BloomIndex, TxLog}

/** Driver-checkable queries over the TxLog DML surface (SURVEY §2 /
  * §6): the reference's ETL merge path (etl_manager.py:206 run_job +
  * LoadType.MERGE) covers the QUERY form of an upsert; these entries
  * check the LOG-NATIVE form — DELETE / UPDATE / MERGE INTO as
  * copy-on-write commits — end to end against a relational DuckDB
  * replay of the same mutations.
  */
object TxQueries {

  /** #211 txn_sql_dml — the SQL row-level DML surface driven end to
    * end: the lineitem projection is logged, registered in the session
    * catalog (`CREATE TABLE … USING txlog`), and mutated purely
    * through SQL — `DELETE FROM … WHERE qty >= 48`, `UPDATE … SET
    * pc = pc + 100 WHERE k <= 1000`, and a full `MERGE INTO … WHEN
    * MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *` from a
    * deterministic directive view. UPDATE and MERGE have no native
    * Spark path for this table, so a hash match proves the
    * extension-injected lowering ([[graft.sources.GraftTxLogSqlRule]])
    * ran and produced exactly the relational semantics the oracle
    * replays (per-row in-place update — target multiplicity
    * preserved, unlike the keyed Scala upsert of txn_dml). The entry
    * hard-fails unless the log records exactly the
    * overwrite→delete→update→merge commit sequence — the SQL path
    * must ride the SAME commit machinery as the Scala API.
    *
    * Scale: identical to txn_dml — each statement rewrites only the
    * files whose stats intersect its predicate/envelope; SQL adds a
    * constant-cost analysis step, never a data-path one. */
  def txnSqlDml(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir, "lineitem").select(
      col("l_orderkey").as("k"),
      col("l_linenumber").as("ln"),
      col("l_quantity").cast("int").as("qty"),
      Core.cents(col("l_extendedprice")).as("pc"),
      col("l_returnflag").as("rf"))
    val root = Files.createTempDirectory("graft_sqldml")
    val tbl = s"$root/t"
    TxLog.commitOverwrite(s, tbl,
      t.repartitionByRange(8, col("k")), statsCols = Seq("k"))
    val name = "graft_txn_sql_dml"
    s.sql(s"DROP TABLE IF EXISTS $name")
    s.sql(s"CREATE TABLE $name USING txlog OPTIONS (path '$tbl')")
    try {
      s.sql(s"DELETE FROM $name WHERE qty >= 48")
      s.sql(s"UPDATE $name SET pc = pc + 100 WHERE k <= 1000")
      // unique-keyed directive view (the synthetic lineitem repeats
      // (k, ln); a merge source must be unique on the ON columns)
      val tk = t.groupBy(col("k"), col("ln"))
        .agg(min(col("qty")).as("qty"), min(col("pc")).as("pc"),
          min(col("rf")).as("rf"))
      tk.filter(col("k") % 97 === 0)
        .select(col("k"), col("ln"), col("qty"),
          (-col("pc")).as("pc"), col("rf"))
        .unionByName(tk.filter(col("k") % 89 === 0)
          .select((col("k") + 2000000000L).as("k"), col("ln"),
            lit(1).as("qty"), lit(0L).as("pc"), col("rf")))
        .createOrReplaceTempView("graft_txn_sql_src")
      s.sql(s"""MERGE INTO $name t USING graft_txn_sql_src s
                ON t.k = s.k AND t.ln = s.ln
                WHEN MATCHED THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *""")
      // the SQL statements must have landed as ordinary log commits
      val ops = TxLog.history(s, tbl).orderBy(col("version"))
        .select(col("op")).collect().map(_.getString(0)).toSeq
      require(ops == Seq("overwrite", "delete", "update", "merge"),
        s"SQL DML did not ride the commit machinery: $ops")
      val agg = s.sql(
        s"""SELECT rf AS l_returnflag, count(*) AS n_rows,
              CAST(sum(pc) AS BIGINT) AS sum_pc,
              CAST(sum(qty) AS BIGINT) AS sum_qty
            FROM $name GROUP BY rf""")
      val rows = agg.collect().toSeq
      val schema = agg.schema
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, schema)
    } finally {
      s.sql(s"DROP TABLE IF EXISTS $name")
      s.catalog.dropTempView("graft_txn_sql_src")
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }

  /** #212 txn_sql_ddl — the SQL admin surface driven end to end: the
    * documents projection is logged, then administered purely through
    * path-addressed SQL — `ALTER TXLOG … ADD CONSTRAINT`,
    * `OPTIMIZE … TARGET 2 FILES ZORDER BY (doc_id)`,
    * `DESCRIBE HISTORY` / `DESCRIBE DETAIL`, `RESTORE … VERSION AS
    * OF`, and `VACUUM` (dry run first, then real; the sets must
    * agree). Every statement lowers to the same Scala API the
    * ScalaTest suites pin; the entry hard-fails on the history op
    * sequence, the optimize file count, the detail row count, and
    * the dry-run/actual vacuum parity — and the final per-lang
    * aggregate hash-matches the plain relational answer, proving the
    * whole DDL session was CONTENT-PRESERVING (optimize + restore +
    * vacuum never touch a row).
    *
    * Scale: every statement here is metadata-bounded except OPTIMIZE,
    * which rewrites only its scope — admin cost at 100 TB is the
    * compaction you asked for, nothing else. */
  def txnSqlDdl(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        col("n_chars").cast("long").as("n_chars"))
    val root = Files.createTempDirectory("graft_sqlddl")
    val tbl = s"$root/t"
    TxLog.commitOverwrite(s, tbl, docs.repartition(6),
      statsCols = Seq("doc_id"))
    try {
      s.sql(s"ALTER TXLOG '$tbl' ADD CONSTRAINT chars_ok " +
        "CHECK (n_chars >= 0)")
      s.sql(s"OPTIMIZE '$tbl' TARGET 2 FILES ZORDER BY (doc_id)")
      require(TxLog.snapshot(s, tbl).files.size == 2,
        "OPTIMIZE TARGET 2 FILES must leave two files")
      val ops = s.sql(s"DESCRIBE HISTORY '$tbl'").orderBy(col("version"))
        .select(col("op")).collect().map(_.getString(0)).toSeq
      require(ops == Seq("overwrite", "constraints", "compact"),
        s"DDL history diverged: $ops")
      val det = s.sql(s"DESCRIBE DETAIL '$tbl'").collect().head
      val nDocs = docs.count()
      require(det.getAs[Long]("num_rows") == nDocs &&
        det.getAs[Long]("num_constraints") == 1L,
        "DESCRIBE DETAIL diverged from the live state")
      s.sql(s"RESTORE '$tbl' TO VERSION AS OF 0")
      val dry = s.sql(s"VACUUM '$tbl' DRY RUN").collect()
        .map(_.getString(0)).toSet
      val real = s.sql(s"VACUUM '$tbl'").collect()
        .map(_.getString(0)).toSet
      require(dry == real && dry.nonEmpty,
        s"vacuum dry-run/actual parity broke: ${dry.size} vs ${real.size}")
      val agg = TxLog.read(s, tbl).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
      val rows = agg.collect().toSeq
      require(rows.map(_.getLong(1)).sum == nDocs,
        "the DDL session must be content-preserving")
      val schema = agg.schema
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, schema)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  /** #221 txn_sql_timetravel — the session-catalog access path driven
    * end to end through SQL alone: `CREATE TABLE … USING txlog AS
    * SELECT` (CTAS seeds version 0 through the catalog's writable
    * creation placeholder), one SQL DELETE (version 1), then the SAME
    * registered name is aggregated at `VERSION AS OF 0` and at head
    * in one result — the hash proves catalog resolution, CTAS
    * creation, and time-travel pinning all answer exactly what the
    * relational replay says each version held. Hard-fails unless the
    * log records exactly [overwrite, delete] and the v0 read returns
    * the pre-delete row count.
    *
    * Scale: time travel is a METADATA pin — reading v0 plans v0's
    * file list from the log; no copy, no restore, no extra I/O
    * beyond the snapshot resolution. */
  def txnSqlTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir, "lineitem").select(
      col("l_orderkey").as("k"),
      col("l_quantity").cast("int").as("qty"),
      col("l_returnflag").as("rf"))
    val root = Files.createTempDirectory("graft_sqltt")
    val tbl = s"$root/t"
    val name = "graft_txn_sql_tt"
    s.sql(s"DROP TABLE IF EXISTS $name")
    t.createOrReplaceTempView("graft_txn_sql_tt_src")
    try {
      s.sql(s"CREATE TABLE $name USING txlog OPTIONS (path '$tbl') " +
        "AS SELECT * FROM graft_txn_sql_tt_src")
      require(TxLog.isLogged(s, tbl), "CTAS must create a logged table")
      val n0 = t.count()
      s.sql(s"DELETE FROM $name WHERE qty >= 48")
      val ops = TxLog.history(s, tbl).orderBy(col("version"))
        .select(col("op")).collect().map(_.getString(0)).toSeq
      // CTAS's post-create write lands through the V1 append bridge
      // (version 0 is the creation either way)
      require(ops == Seq("append", "delete") ||
        ops == Seq("overwrite", "delete"),
        s"CTAS+DELETE did not ride the commit machinery: $ops")
      require(s.sql(s"SELECT count(*) FROM $name VERSION AS OF 0")
        .head().getLong(0) == n0,
        "VERSION AS OF 0 must see the pre-delete table")
      val agg = s.sql(
        s"""SELECT 'v0' AS phase, rf, count(*) AS n_rows,
              CAST(sum(qty) AS BIGINT) AS sum_qty
            FROM $name VERSION AS OF 0 GROUP BY rf
            UNION ALL
            SELECT 'head' AS phase, rf, count(*) AS n_rows,
              CAST(sum(qty) AS BIGINT) AS sum_qty
            FROM $name GROUP BY rf""")
      val rows = agg.collect().toSeq
      val schema = agg.schema
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, schema)
    } finally {
      s.sql(s"DROP TABLE IF EXISTS $name")
      s.catalog.dropTempView("graft_txn_sql_tt_src")
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }

  /** #222 txn_sql_changes — the SQL access path to the row-level
    * change feed driven end to end: a UNIQUE-keyed lineitem aggregate
    * is logged, taken through a CoW DELETE (v1) and a stats-pruned
    * UPDATE (v2), and the feed over commits 1..2 is read back pure-SQL
    * through the `txlog_changes` table function (Delta's
    * `table_changes` analog) and aggregated per (change type, flag).
    * The oracle replays the feed RELATIONALLY — the delete commit
    * contributes exactly the deleted rows, the update contributes its
    * pre-image deletes and post-image inserts — so the hash proves
    * the feed's multiset-diff semantics row for row (unique rows make
    * the diff equal the logical row set exactly). Hard-fails unless
    * the feed spans exactly commits {1, 2}.
    *
    * Scale: the feed costs log metadata + scans of only the span's
    * touched files; the TVF is a planning-time lowering, adding no
    * data-path work over the Scala API. */
  def txnSqlChanges(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir, "lineitem").select(
      col("l_orderkey").as("k"),
      col("l_linenumber").as("ln"),
      col("l_quantity").cast("int").as("qty"),
      Core.cents(col("l_extendedprice")).as("pc"),
      col("l_returnflag").as("rf"))
    val tk = t.groupBy(col("k"), col("ln"))
      .agg(min(col("qty")).as("qty"), min(col("pc")).as("pc"),
        min(col("rf")).as("rf"))
    val root = Files.createTempDirectory("graft_sqlcdc")
    val tbl = s"$root/t"
    TxLog.commitOverwrite(s, tbl,
      tk.repartitionByRange(8, col("k")), statsCols = Seq("k"))
    TxLog.delete(s, tbl, col("qty") >= 48)
    TxLog.update(s, tbl, col("k") <= 1000,
      Map("pc" -> (col("pc") + 100)))
    try {
      val vs = s.sql(s"SELECT DISTINCT _commit_version FROM " +
        s"txlog_changes('$tbl', 1, 2)").collect()
        .map(_.getLong(0)).toSet
      require(vs == Set(1L, 2L),
        s"feed must span exactly commits 1..2, got $vs")
      val agg = s.sql(
        s"""SELECT _change_type AS change, rf,
              count(*) AS n_rows,
              CAST(sum(qty) AS BIGINT) AS sum_qty,
              CAST(sum(pc) AS BIGINT) AS sum_pc
            FROM txlog_changes('$tbl', 1, 2) GROUP BY 1, 2""")
      val rows = agg.collect().toSeq
      val schema = agg.schema
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, schema)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  /** #155 txn_dml — a three-statement DML session on a logged lineitem
    * projection, hash-checked against a pure-SQL replay:
    *   1. DELETE WHERE qty >= 48            (row-level delete)
    *   2. UPDATE WHERE k <= 1000 SET pc+100 (stats-pruned: only the
    *      low-key files are rewritten — `k` is the range-layout and
    *      stats column)
    *   3. MERGE INTO: every k % 97 == 0 row replaced with negated
    *      price (when-matched), every k % 89 == 0 row re-keyed past
    *      the table's key range and inserted (when-not-matched)
    * The final table is aggregated per return flag (count + exact
    * cents sums) so the oracle compares a value-complete but tiny
    * relation. The logged table lives in a per-call temp dir; the
    * aggregate is materialized eagerly and the dir deleted before
    * returning, so repeated Verify/Bench passes leak nothing.
    *
    * Scale: each statement rewrites ONLY the files holding affected
    * rows (delete touches every file by design; the update's k-range
    * predicate prunes to the low file via stats-in-log) — table size
    * outside the touched range is irrelevant, the Delta DML cost
    * model. */
  def txnDml(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir, "lineitem").select(
      col("l_orderkey").as("k"),
      col("l_linenumber").as("ln"),
      col("l_quantity").cast("int").as("qty"),
      Core.cents(col("l_extendedprice")).as("pc"),
      col("l_returnflag").as("rf"))
    val root = Files.createTempDirectory("graft_dml")
    val tbl = s"$root/t"
    TxLog.commitOverwrite(s, tbl,
      t.repartitionByRange(8, col("k")), statsCols = Seq("k"))
    TxLog.delete(s, tbl, col("qty") >= 48)
    TxLog.update(s, tbl, col("k") <= 1000, Map("pc" -> (col("pc") + 100)))
    // the synthetic lineitem is NOT unique on (orderkey, linenumber),
    // so derive the source from a deterministically keyed aggregate —
    // a merge source must be unique on its keys
    val tk = t.groupBy(col("k"), col("ln"))
      .agg(min(col("qty")).as("qty"), min(col("pc")).as("pc"),
        min(col("rf")).as("rf"))
    val source = tk.filter(col("k") % 97 === 0)
      .select(col("k"), col("ln"), col("qty"),
        (-col("pc")).as("pc"), col("rf"))
      .unionByName(tk.filter(col("k") % 89 === 0)
        .select((col("k") + 2000000000L).as("k"), col("ln"),
          lit(1).as("qty"), lit(0L).as("pc"), col("rf")))
    TxLog.merge(s, tbl, source, Seq("k", "ln"))
    val agg = TxLog.read(s, tbl)
      .groupBy(col("rf"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("pc")).as("sum_pc"),
        sum(col("qty").cast("long")).as("sum_qty"))
      .withColumnRenamed("rf", "l_returnflag")
    // materialize the (≤ flag-cardinality) result, then drop the
    // temp table — the returned frame must not depend on it
    val rows = agg.collect().toSeq
    val schema = agg.schema
    import scala.jdk.CollectionConverters._
    org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    s.createDataFrame(rows.asJava, schema)
  }

  /** #159 bloom_point_lookup — bloom-filter file skipping driven end
    * to end: the documents projection is HASH-scattered over 16 files
    * (so every file spans the full doc_id range and min/max stats can
    * never prune a point probe), a per-file bloom index is built on
    * doc_id, and three present keys + one absent key are point-looked-
    * up through [[BloomIndex.prunedRead]]. The entry hard-fails unless
    * the index actually pruned (present probes must plan < half the
    * files; the absent probe ≤ 2 — fpp headroom), and the returned
    * rows hash-match a plain relational lookup — bloom pruning is
    * EXACT because false negatives are impossible. */
  def bloomPointLookup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val root = Files.createTempDirectory("graft_bloom")
    val tbl = s"$root/t"
    docs.repartition(16, col("doc_id")).write.parquet(tbl)
    BloomIndex.write(s, tbl, Seq("doc_id"))
    val present = Seq(0L, 1L, 2L) // the generator keys every SF holds
    val probes = present :+ -1L   // plus one impossible key
    val keptCounts = probes.map { v =>
      BloomIndex.prunedFiles(s, tbl, "doc_id", v)
    }
    keptCounts.take(3).foreach { case (kept, total) =>
      require(kept.size * 2 < total,
        s"bloom index failed to prune: ${kept.size} of $total files")
    }
    require(keptCounts.last._1.size <= 2,
      "an absent key should prune nearly everything")
    // read from the kept lists already computed above — probing the
    // index a second time per lookup doubled the plan-time jobs
    val out = probes.zip(keptCounts).map { case (v, (kept, _)) =>
      BloomIndex.readFiles(s, tbl, kept)
        .filter(col("doc_id") === v)
    }.reduce(_.unionByName(_))
    val rows = out.collect().toSeq
    val schema = out.schema
    import scala.jdk.CollectionConverters._
    org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    s.createDataFrame(rows.asJava, schema)
  }

  /** #163 txn_dml_mor — the same delete+update session as [[txnDml]]
    * driven MERGE-ON-READ (deletion vectors), hash-checked against
    * the identical relational replay:
    *   1. deleteMor WHERE qty >= 48  — touches EVERY file, yet no
    *      data file is rewritten: the matches' (file, row) pairs go
    *      to a vector relation that reads subtract
    *   2. updateMor WHERE k <= 1000 SET pc+100 — old positions join
    *      the vector, updated images append as new files
    *   3. compact — materializes the vectors away
    * The entry hard-fails unless (a) every original file survives BY
    * PATH through both DMLs (the no-rewrite guarantee that makes MoR
    * cheap), (b) vectors are present before compact and gone after,
    * and (c) the logged COUNT(*) — a pure metadata read of
    * rows − dvRows — matches the scan count at each step. The final
    * aggregate is read mid-session (vector-subtracted) so the HASH
    * check exercises the MoR read path, not the compacted table.
    *
    * Scale: delete cost = matched rows (vector pairs), not the size
    * of the files that hold them — a point delete in a 1 GB file
    * writes KBs, the Delta deletion-vector cost model. */
  def txnDmlMor(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir, "lineitem").select(
      col("l_orderkey").as("k"),
      col("l_linenumber").as("ln"),
      col("l_quantity").cast("int").as("qty"),
      Core.cents(col("l_extendedprice")).as("pc"),
      col("l_returnflag").as("rf"))
    val root = Files.createTempDirectory("graft_dml_mor")
    val tbl = s"$root/t"
    TxLog.commitOverwrite(s, tbl,
      t.repartitionByRange(8, col("k")), statsCols = Seq("k"))
    val pre = TxLog.snapshot(s, tbl)
    TxLog.deleteMor(s, tbl, col("qty") >= 48)
    TxLog.updateMor(s, tbl, col("k") <= 1000,
      Map("pc" -> (col("pc") + 100)))
    val post = TxLog.snapshot(s, tbl)
    require(pre.files.map(_.path).toSet.subsetOf(
      post.files.map(_.path).toSet),
      "merge-on-read DML rewrote a data file")
    require(post.files.exists(_.dv.isDefined),
      "merge-on-read DML recorded no deletion vector")
    val live = TxLog.read(s, tbl)
    require(TxLog.countWhere(s, tbl, Nil) == live.count(),
      "metadata COUNT(*) diverged from the vector-subtracted scan")
    // aggregate through the MoR read path (vectors subtracting)
    val agg = live
      .groupBy(col("rf"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("pc")).as("sum_pc"),
        sum(col("qty").cast("long")).as("sum_qty"))
      .withColumnRenamed("rf", "l_returnflag")
    val rows = agg.collect().toSeq
    val schema = agg.schema
    // maintenance: compact materializes, vacuum collects the vectors
    TxLog.compact(s, tbl, targetFiles = 4)
    require(TxLog.snapshot(s, tbl).files.forall(_.dv.isEmpty),
      "compact left deletion vectors behind")
    require(TxLog.countWhere(s, tbl, Nil) == rows.map(_.getLong(1)).sum,
      "compacted table diverged from the merge-on-read read")
    import scala.jdk.CollectionConverters._
    org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    s.createDataFrame(rows.asJava, schema)
  }

  /** #193 mv_incremental — an incrementally maintained materialized
    * aggregate ([[graft.sources.MaterializedAgg]]), hash-checked
    * against a relational replay of the same session:
    *   1. CREATE: per-returnflag COUNT / SUM(pc) / MIN,MAX(qty) over
    *      a logged lineitem projection, materialized as its own
    *      logged table
    *   2. source DML the view has NOT seen: DELETE qty >= 48 (retracts
    *      every flag's max — the dirty-key recompute path), UPDATE
    *      k <= 1000 pc+100 (delete+insert pairs in the feed), APPEND
    *      a synthetic 'Z' flag slice (key birth, the insert-only
    *      incremental path)
    *   3. ONE refresh folds the whole multi-commit span from the
    *      change feed through copy-on-write applyChanges
    * The oracle recomputes the aggregate over the mutated relation in
    * pure SQL, so a hash match proves the incremental fold equals the
    * full recompute.
    *
    * Scale: refresh cost = the span's changed files + the view files
    * holding touched keys (+ a dirty-keys-pruned source scan only
    * because MIN/MAX is configured) — never a standing full
    * reaggregation of the corpus. */
  def mvIncremental(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir, "lineitem").select(
      col("l_orderkey").as("k"),
      col("l_linenumber").as("ln"),
      col("l_quantity").cast("int").as("qty"),
      Core.cents(col("l_extendedprice")).as("pc"),
      col("l_returnflag").as("rf"))
    val root = Files.createTempDirectory("graft_mv")
    val src = s"$root/src"
    val mv = s"$root/mv"
    TxLog.commitOverwrite(s, src,
      t.repartitionByRange(8, col("k")), statsCols = Seq("k"))
    graft.sources.MaterializedAgg.create(s, src, mv,
      keys = Seq("rf"), sums = Seq("pc"),
      mins = Seq("qty"), maxs = Seq("qty"))
    TxLog.delete(s, src, col("qty") >= 48)
    TxLog.update(s, src, col("k") <= 1000, Map("pc" -> (col("pc") + 100)))
    TxLog.commitAppend(s, src, t.filter(col("k") % 101 === 0)
      .select((col("k") + 3000000000L).as("k"), col("ln"),
        lit(5).as("qty"), lit(0L).as("pc"), lit("Z").as("rf")))
    graft.sources.MaterializedAgg.refresh(s, mv)
    val agg = TxLog.read(s, mv).withColumnRenamed("rf", "l_returnflag")
    val rows = agg.collect().toSeq
    val schema = agg.schema
    import scala.jdk.CollectionConverters._
    org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    s.createDataFrame(rows.asJava, schema)
  }

  /** #200 mv_general — the materialized view's two round-14 aggregate
    * classes beside [[mvIncremental]]'s fold/retract split: `avgs`
    * (true AVG under nulls — `sum_<c>`/`cnt_<c>` both fold as signed
    * deltas, `avg_<c>` derives once from exact folded state) and
    * `others` (an ARBITRARY SQL aggregate, here COUNT(DISTINCT k %
    * 1000) — nothing folds, so every touched key recomputes from the
    * span-end source snapshot, stats-pruned to the touched-key
    * envelope). The same DML span as mv_incremental (CoW delete,
    * stats-pruned update, append of new keys) is folded by ONE
    * refresh; the oracle recomputes the aggregate over the mutated
    * relation relationally, so the hash checks the maintained state —
    * including the non-foldable distinct count — bit for bit. */
  def mvGeneral(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir, "lineitem").select(
      col("l_orderkey").as("k"),
      col("l_linenumber").as("ln"),
      col("l_quantity").cast("int").as("qty"),
      Core.cents(col("l_extendedprice")).as("pc"),
      col("l_returnflag").as("rf"))
    val root = Files.createTempDirectory("graft_mvg")
    val src = s"$root/src"
    val mv = s"$root/mv"
    TxLog.commitOverwrite(s, src,
      t.repartitionByRange(8, col("k")), statsCols = Seq("k"))
    graft.sources.MaterializedAgg.create(s, src, mv,
      keys = Seq("rf"), sums = Seq("pc"), avgs = Seq("qty"),
      others = Map("distinct_part" -> "count(distinct k % 1000)"))
    TxLog.delete(s, src, col("qty") >= 48)
    TxLog.update(s, src, col("k") <= 1000, Map("pc" -> (col("pc") + 100)))
    TxLog.commitAppend(s, src, t.filter(col("k") % 101 === 0)
      .select((col("k") + 3000000000L).as("k"), col("ln"),
        lit(5).as("qty"), lit(0L).as("pc"), lit("Z").as("rf")))
    graft.sources.MaterializedAgg.refresh(s, mv)
    val agg = TxLog.read(s, mv).withColumnRenamed("rf", "l_returnflag")
    val rows = agg.collect().toSeq
    val schema = agg.schema
    import scala.jdk.CollectionConverters._
    org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    s.createDataFrame(rows.asJava, schema)
  }

  /** #202 txn_scd2_apply — SCD TYPE 2 history maintained from the
    * change feed ([[graft.sources.Scd2]], the `APPLY CHANGES … STORED
    * AS SCD TYPE 2` shape): a logged lineitem projection keyed
    * (k, ln) goes through the same three-commit DML span as
    * [[mvIncremental]] (CoW delete at v1, stats-pruned update at v2,
    * key births at v3), and ONE refresh folds the whole span into
    * validity segments — the deleted rows' segments close at 1, the
    * updated rows' initial segments close at 2 with their post-image
    * segments opening there, untouched rows stay current from 0, and
    * the appended keys open at 3. The result aggregates the history
    * per (return flag, validity interval, currency) so the oracle —
    * which derives each row's interval RELATIONALLY from the same
    * predicates — checks every segment boundary and every payload
    * sum bit for bit.
    *
    * Scale: the refresh reads the span's changed files and the
    * touched keys' history sliver (stats-pruned on (k, ln,
    * valid_from)), never the corpus; closing a current segment
    * rewrites only the files holding it. */
  def txnScd2Apply(s: SparkSession, dir: String): DataFrame = {
    // SCD2 tracks one row per key — collapse the synthetic lineitem
    // (not unique on (k, ln)) to a keyed relation first, the same
    // min-per-key recipe as txn_dml's merge source
    val t = Tables(s, dir, "lineitem").select(
      col("l_orderkey").as("k"),
      col("l_linenumber").as("ln"),
      col("l_quantity").cast("int").as("qty"),
      Core.cents(col("l_extendedprice")).as("pc"),
      col("l_returnflag").as("rf"))
      .groupBy("k", "ln")
      .agg(min(col("qty")).as("qty"), min(col("pc")).as("pc"),
        min(col("rf")).as("rf"))
    val root = Files.createTempDirectory("graft_scd2")
    val src = s"$root/src"
    val scd = s"$root/scd"
    TxLog.commitOverwrite(s, src,
      t.repartitionByRange(8, col("k")), statsCols = Seq("k"))
    graft.sources.Scd2.create(s, src, scd, keys = Seq("k", "ln"))
    TxLog.delete(s, src, col("qty") >= 48)
    TxLog.update(s, src, col("k") <= 1000, Map("pc" -> (col("pc") + 100)))
    TxLog.commitAppend(s, src, t.filter(col("k") % 101 === 0)
      .select((col("k") + 3000000000L).as("k"), col("ln"),
        lit(5).as("qty"), lit(0L).as("pc"), lit("Z").as("rf")))
    graft.sources.Scd2.refresh(s, scd)
    val agg = TxLog.read(s, scd)
      .groupBy(col("rf").as("l_returnflag"), col("valid_from"),
        coalesce(col("valid_to"), lit(-1L)).as("valid_to"),
        col("is_current"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("pc")).cast("long").as("sum_pc"),
        sum(col("qty")).cast("long").as("sum_qty"))
    val rows = agg.collect().toSeq
    val schema = agg.schema
    import scala.jdk.CollectionConverters._
    org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    s.createDataFrame(rows.asJava, schema)
  }

  /** #199 txn_stats_agg — Delta's metadata-only aggregates driven end
    * to end: COUNT(*), a banded count, and per-column MIN/MAX are
    * answered from the transaction log's own per-file metadata
    * ([[TxLog.countWhere]] / [[TxLog.minMax]]) against a logged
    * lineitem projection that has been through copy-on-write AND
    * merge-on-read DML. The entry hard-fails unless the claimed cost
    * shape actually held: COUNT(*) scans nothing even with deletion
    * vectors standing (rows − dvRows is commit-time metadata);
    * extrema under standing vectors scan ONLY the dv-bearing sliver
    * (a vector may have deleted the extremal row, so logged bounds
    * are unsound as answers — the stats-pruned files stay
    * metadata-only); after [[TxLog.compact]] folds the vectors away,
    * extrema scan NOTHING and must equal the sliver-assisted answer
    * bit for bit. The oracle replays the same mutations relationally.
    *
    * Scale: on a 100 TB table this is the difference between a
    * full-corpus aggregate and one KB-sized log read — the
    * OptimizeMetadataOnlyQuery shape, exact (never approximate)
    * because per-file stats are exact extrema and dv cardinalities
    * are exact counts. */
  def txnStatsAgg(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir, "lineitem").select(
      col("l_orderkey").as("k"),
      col("l_quantity").cast("int").as("qty"),
      Core.cents(col("l_extendedprice")).as("pc"))
    val root = Files.createTempDirectory("graft_statsagg")
    val tbl = s"$root/t"
    TxLog.commitOverwrite(s, tbl,
      t.repartitionByRange(8, col("k")),
      statsCols = Seq("k", "qty", "pc"))
    TxLog.delete(s, tbl, col("qty") >= 48) // CoW: rewrites refresh stats
    TxLog.deleteMor(s, tbl, col("k") <= 500) // dv lands on low-k files only
    val (nAll, scannedAll) = TxLog.countWhereDetailed(s, tbl, Nil, None)
    require(scannedAll.isEmpty,
      "COUNT(*) must be a pure metadata read even under vectors")
    val nBand = TxLog.countWhere(s, tbl, Seq(("qty", 10, 20)))
    val total = TxLog.snapshot(s, tbl).files.size
    val (mm1, scanned1) =
      TxLog.minMaxDetailed(s, tbl, Seq("k", "qty", "pc"), None)
    require(scanned1.nonEmpty && scanned1.size < total,
      s"extrema under vectors should scan only the dv sliver " +
        s"(scanned ${scanned1.size} of $total)")
    val r1 = mm1.head()
    TxLog.compact(s, tbl, targetFiles = 4,
      statsCols = Seq("k", "qty", "pc"))
    val (mm2, scanned2) =
      TxLog.minMaxDetailed(s, tbl, Seq("k", "qty", "pc"), None)
    require(scanned2.isEmpty,
      "post-compact extrema must be metadata-only")
    val out = mm2.select(
      lit(nAll).as("n_rows"), lit(nBand).as("n_band"),
      col("min_k"), col("max_k"), col("min_qty"), col("max_qty"),
      col("min_pc"), col("max_pc"))
    val rows = out.collect().toSeq
    require(rows.head.toSeq.drop(2) == r1.toSeq,
      "vector-exact and compacted extrema diverged")
    val schema = out.schema
    import scala.jdk.CollectionConverters._
    org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    s.createDataFrame(rows.asJava, schema)
  }

  /** #204 txn_identity — IDENTITY columns (Delta's `GENERATED { ALWAYS
    * | BY DEFAULT } AS IDENTITY`, log generation 4) driven end to end
    * and hash-checked against a pure-relational replay:
    *   1. CREATE with `id BIGINT GENERATED BY DEFAULT AS IDENTITY
    *      (START 1 STEP 1)` and load phase-1 rows OMITTING the column
    *      → values generate off the watermark
    *   2. APPEND phase-2 rows omitting the column → generation resumes
    *      strictly past the committed watermark
    *   3. APPEND phase-3 rows with EXPLICIT ids (doc_id + 10^7) — the
    *      BY DEFAULT path — and `SYNC IDENTITY`: the watermark absorbs
    *      the explicit extrema from the staged files' own stats
    *   4. APPEND phase-4 rows omitting the column → generation resumes
    *      past the absorbed explicit maximum
    * Each batch is written as ONE partition, which pins the generated
    * values to a contiguous range (`nextBase + step·rowIndex`), so the
    * oracle can derive every phase's exact MIN/MAX/COUNT/DISTINCT-
    * COUNT relationally — a hash match proves cross-commit uniqueness,
    * monotonic watermark movement, explicit-value absorption, and that
    * generation never recycles after SYNC. The entry additionally
    * hard-fails unless ids are globally unique and the log's watermark
    * equals the live maximum.
    *
    * Scale: generation is one projection over the batch (no shuffle,
    * per-task blocks of the monotonic task id at real partition
    * counts); the watermark rides commit metadata and SYNC answers
    * from per-file stats — declaring or repairing identity on a
    * 100 TB table is a KB-sized metadata commit, never a scan. */
  def txnIdentity(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.TxLog.IdentitySpec
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val root = Files.createTempDirectory("graft_ident")
    val tbl = s"$root/t"
    def slice(m: Int, r: Int, phase: Int): DataFrame = docs
      .filter(col("doc_id") % m === r)
      .withColumn("phase", lit(phase))
      .coalesce(1) // one partition ⇒ generated ids are a contiguous range
    TxLog.commitOverwrite(s, tbl, slice(3, 0, 1),
      identity = Map("id" -> IdentitySpec(1L, 1L, always = false)))
    TxLog.commitAppend(s, tbl, slice(3, 1, 2))
    TxLog.commitAppend(s, tbl, slice(3, 2, 3)
      .withColumn("id", col("doc_id") + 10000000L))
    TxLog.syncIdentity(s, tbl) // repair is a no-op here: absorb already ran
    TxLog.commitAppend(s, tbl, slice(5, 0, 4))
    val t = TxLog.read(s, tbl)
    val Array(nAll, nIds, maxId) = t.agg(
      count(lit(1)), countDistinct(col("id")), max(col("id")))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    require(nAll == nIds, s"identity ids collided: $nIds of $nAll unique")
    require(TxLog.snapshot(s, tbl).identity("id").high.contains(maxId),
      "identity watermark diverged from the live maximum")
    val agg = t.groupBy(col("phase"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("id")).as("n_ids"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"),
        sum(col("n_chars").cast("long")).as("sum_chars"))
    val rows = agg.collect().toSeq
    val schema = agg.schema
    import scala.jdk.CollectionConverters._
    org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    s.createDataFrame(rows.asJava, schema)
  }

  /** #205 txn_batch_source — the batch "txlog" DataSource driven end
    * to end: a logged lineitem projection goes through copy-on-write
    * DELETE, a merge-on-read DELETE (deletion vectors left standing),
    * and a column RENAME (live column mapping), then is read back
    * through `spark.read.format("txlog")` with a key-range predicate
    * and aggregated. The entry hard-fails unless the pushed filter
    * actually file-pruned (the planned set must be smaller than the
    * table and must equal [[TxLog.prunedSnapshotFiles]] on the same
    * interval — the readPrunedAll parity the plan audit pins), so a
    * hash match proves the DataSource path end to end: V2 resolution,
    * filter pushdown, vector subtraction, and logical-name projection
    * under mapping, all identical to the Scala API.
    *
    * Scale: the predicate prunes at PLANNING time from commit
    * metadata — a selective probe on a 10⁶-file table plans the
    * intersecting sliver without reading a footer; this is the access
    * path SQL/BI tools get for free once the table is registered
    * (`CREATE TABLE … USING txlog`). */
  def txnBatchSource(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir, "lineitem").select(
      col("l_orderkey").as("k"),
      col("l_quantity").cast("int").as("qty"),
      Core.cents(col("l_extendedprice")).as("pc"),
      col("l_returnflag").as("rf"))
    val root = Files.createTempDirectory("graft_batchsrc")
    val tbl = s"$root/t"
    TxLog.commitOverwrite(s, tbl,
      t.repartitionByRange(8, col("k")), statsCols = Seq("k"))
    TxLog.delete(s, tbl, col("qty") >= 48)
    TxLog.deleteMor(s, tbl, col("k") % 13 === 0)
    TxLog.renameColumn(s, tbl, "rf", "flag")
    // SF-relative cutoff (the oracle derives the same value
    // relationally) so the pruning hard-fail below holds at every SF
    val cutoff = t.agg(max(col("k"))).head().getLong(0) / 4L
    val agg = s.read.format("txlog").load(tbl)
      .filter(col("k") <= cutoff)
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("pc")).as("sum_pc"),
        sum(col("qty").cast("long")).as("sum_qty"))
    val rows = agg.collect().toSeq
    val snap = TxLog.snapshot(s, tbl)
    val planned = graft.sources.TxLogBatch.lastScan.get()
    require(planned.size < snap.files.size,
      s"batch-source pushdown failed to prune: planned " +
        s"${planned.size} of ${snap.files.size} files")
    require(planned.sorted == TxLog.prunedSnapshotFiles(s, snap,
      Seq(("k", None, Some(cutoff)))).map(_.path).sorted,
      "batch-source pruning diverged from readPrunedAll")
    val schema = agg.schema
    import scala.jdk.CollectionConverters._
    org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    s.createDataFrame(rows.asJava, schema)
  }

  /** #207 txn_convert_partitioned — hive-layout registration driven
    * end to end: the documents projection is written as a
    * `lang=…/` partitioned dataset (Spark's own partitionBy layout,
    * task file names repeating across partition dirs), adopted IN
    * PLACE by [[TxLog.convertInPlace]] (no rewrite — the partition
    * values prune from per-file stats and recover from the file path
    * at read), then DML'd (CoW delete of one partition value) and
    * aggregated per lang. The entry hard-fails unless a partition
    * predicate actually file-pruned to exactly the partition's own
    * files. The oracle replays the mutation relationally, so the hash
    * checks path-recovered values, registration stats, and the
    * path-identity DML end to end.
    *
    * Scale: adoption cost = ONE stats scan + a KB commit regardless
    * of layout size — the existing corpus never rewrites; partition
    * predicates prune at planning time from commit metadata. */
  def txnConvertPartitioned(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"), col("lang"))
    val root = Files.createTempDirectory("graft_convpart")
    val tbl = s"$root/t"
    docs.repartition(2).write.partitionBy("lang").parquet(tbl)
    TxLog.convertInPlace(s, tbl, statsCols = Seq("doc_id"))
    val snap = TxLog.snapshot(s, tbl)
    require(snap.partitionCols == Seq("lang"),
      "partitioned registration did not record the partition column")
    val keptEn = TxLog.prunedSnapshotFiles(s, snap,
      Seq(("lang", Some("en"), Some("en"))))
    require(keptEn.nonEmpty && keptEn.size < snap.files.size &&
      keptEn.forall(_.path.startsWith("lang=en/")),
      s"partition predicate failed to prune (${keptEn.size} of " +
        s"${snap.files.size})")
    TxLog.delete(s, tbl, col("lang") === "de")
    val agg = TxLog.read(s, tbl)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("n_chars").cast("long")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
    val rows = agg.collect().toSeq
    val schema = agg.schema
    import scala.jdk.CollectionConverters._
    org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    s.createDataFrame(rows.asJava, schema)
  }

  /** #206 txn_generated — expression-generated columns driven end to
    * end (Delta's `GENERATED ALWAYS AS (expr)`): a logged lineitem
    * projection declares `pc2 = pc * 2 + qty` at creation WITHOUT
    * supplying the column (the expression computes and defines it),
    * appends more rows still omitting it, UPDATEs the source column
    * `qty` under a stats-pruned predicate — the expression RECOMPUTES
    * on exactly the updated rows — and deletes a slice. The final
    * per-flag aggregate of the maintained column is hash-checked
    * against a DuckDB replay that derives pc2 relationally at every
    * step, so the hash proves compute-on-omit, recompute-on-update,
    * and carriage through DML bit for bit.
    *
    * Scale: generation is one projection in the write (no shuffle,
    * no validation scan when the column is omitted); the declaration
    * is a KB metadata commit. */
  def txnGenerated(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir, "lineitem").select(
      col("l_orderkey").as("k"),
      col("l_quantity").cast("int").as("qty"),
      Core.cents(col("l_extendedprice")).as("pc"),
      col("l_returnflag").as("rf"))
    val root = Files.createTempDirectory("graft_gen")
    val tbl = s"$root/t"
    // the batch omits pc2 entirely: the creation-time declaration
    // computes it, and its expression type DEFINES the column
    TxLog.commitOverwrite(s, tbl,
      t.filter(col("k") % 2 === 0).repartitionByRange(8, col("k")),
      statsCols = Seq("k"),
      generated = Map("pc2" -> "pc * 2 + qty"))
    TxLog.commitAppend(s, tbl,
      t.filter(col("k") % 2 === 1).repartition(4))
    TxLog.update(s, tbl, col("k") <= 1000,
      Map("qty" -> (col("qty") + 7)))
    TxLog.delete(s, tbl, col("qty") >= 48)
    val agg = TxLog.read(s, tbl)
      .groupBy(col("rf").as("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("pc2")).as("sum_pc2"),
        sum(col("qty").cast("long")).as("sum_qty"))
    val rows = agg.collect().toSeq
    val schema = agg.schema
    import scala.jdk.CollectionConverters._
    org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    s.createDataFrame(rows.asJava, schema)
  }

  /** #225 txn_sql_copyinto — Delta's COPY INTO driven end to end:
    * the documents table is exported as three parquet batch dirs, an
    * EMPTY logged table ingests them purely through SQL — first two
    * batches, a RERUN of the same statement (must load nothing), the
    * third batch lands on first sight (must load ONLY it). The entry
    * hard-fails on the per-run (files_loaded, files_skipped) shape
    * and on the log recording exactly overwrite→append→append (the
    * no-op rerun must not commit); the final per-lang aggregate
    * hash-matches the plain relational answer over `documents` — a
    * double-loaded file would double the counts, so the hash IS the
    * idempotency gate.
    *
    * Scale: the listing is one driver glob, each run scans only the
    * FRESH files, and the per-file markers are KB-sized commit
    * metadata — retry-safe ingest with no streaming checkpoint. */
  def txnSqlCopyInto(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        col("n_chars").cast("long").as("n_chars"))
    val root = Files.createTempDirectory("graft_copyinto")
    val src = s"$root/src"
    val tbl = s"$root/t"
    try {
      docs.filter(col("doc_id") % 3 === 0).coalesce(2)
        .write.parquet(s"$src/b0")
      docs.filter(col("doc_id") % 3 === 1).coalesce(2)
        .write.parquet(s"$src/b1")
      TxLog.commitOverwrite(s, tbl,
        docs.limit(0), statsCols = Seq("doc_id"))
      def copy(): (Long, Long) = {
        val r = s.sql(s"COPY INTO '$tbl' FROM '$src' " +
          "FILEFORMAT = PARQUET PATTERN = 'b*/part*'").head()
        (r.getLong(0), r.getLong(1))
      }
      val (l1, s1) = copy()
      require(l1 > 0 && s1 == 0, s"first COPY INTO run: $l1/$s1")
      val (l2, s2) = copy()
      require(l2 == 0 && s2 == l1, s"COPY INTO rerun not a no-op: $l2/$s2")
      docs.filter(col("doc_id") % 3 === 2).coalesce(2)
        .write.parquet(s"$src/b2")
      val (l3, s3) = copy()
      require(l3 > 0 && l3 <= 2 && s3 == l1,
        s"COPY INTO new-batch pickup: $l3/$s3")
      val ops = TxLog.history(s, tbl).orderBy(col("version"))
        .select(col("op")).collect().map(_.getString(0)).toSeq
      require(ops == Seq("overwrite", "append", "append"),
        s"the no-op rerun must not commit: $ops")
      val agg = TxLog.read(s, tbl).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
      val rows = agg.collect().toSeq
      val schema = agg.schema
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, schema)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txn_sql_copyinto" -> txnSqlCopyInto,
    "txn_dml" -> txnDml,
    "txn_dml_mor" -> txnDmlMor,
    "mv_incremental" -> mvIncremental,
    "mv_general" -> mvGeneral,
    "txn_stats_agg" -> txnStatsAgg,
    "txn_scd2_apply" -> txnScd2Apply,
    "txn_identity" -> txnIdentity,
    "txn_batch_source" -> txnBatchSource,
    "txn_convert_partitioned" -> txnConvertPartitioned,
    "txn_generated" -> txnGenerated,
    "txn_sql_dml" -> txnSqlDml,
    "txn_sql_ddl" -> txnSqlDdl,
    "txn_sql_timetravel" -> txnSqlTimeTravel,
    "txn_sql_changes" -> txnSqlChanges,
    "bloom_point_lookup" -> bloomPointLookup)

  val oracleSql: Map[String, String] = Map(
    "txn_sql_copyinto" -> """
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY lang""",
    "txn_sql_dml" -> """
      WITH t AS (
        SELECT l_orderkey AS k, l_linenumber AS ln,
          CAST(l_quantity AS INT) AS qty,
          CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
          l_returnflag AS rf
        FROM lineitem),
      d AS (SELECT * FROM t WHERE NOT coalesce(qty >= 48, false)),
      u AS (SELECT k, ln, qty,
              CASE WHEN k <= 1000 THEN pc + 100 ELSE pc END AS pc, rf
            FROM d),
      tk AS (
        SELECT k, ln, MIN(qty) AS qty, MIN(pc) AS pc, MIN(rf) AS rf
        FROM t GROUP BY k, ln),
      src AS (
        SELECT k, ln, qty, -pc AS pc, rf FROM tk WHERE k % 97 = 0
        UNION ALL
        SELECT k + 2000000000 AS k, ln, 1 AS qty, 0 AS pc, rf
        FROM tk WHERE k % 89 = 0),
      upd AS (
        SELECT u.k, u.ln,
          COALESCE(s.qty, u.qty) AS qty,
          COALESCE(s.pc, u.pc) AS pc,
          COALESCE(s.rf, u.rf) AS rf
        FROM u LEFT JOIN src s ON u.k = s.k AND u.ln = s.ln),
      ins AS (
        SELECT s.* FROM src s
        WHERE NOT EXISTS (SELECT 1 FROM u
                          WHERE u.k = s.k AND u.ln = s.ln)),
      m AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
      SELECT rf AS l_returnflag,
        COUNT(*) AS n_rows,
        CAST(SUM(pc) AS BIGINT) AS sum_pc,
        CAST(SUM(qty) AS BIGINT) AS sum_qty
      FROM m GROUP BY 1""",
    "txn_sql_ddl" -> """
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY 1""",
    "txn_sql_changes" -> """
      WITH t0 AS (
        SELECT l_orderkey AS k, l_linenumber AS ln,
          CAST(l_quantity AS INT) AS qty,
          CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
          l_returnflag AS rf
        FROM lineitem),
      tk AS (
        SELECT k, ln, MIN(qty) AS qty, MIN(pc) AS pc, MIN(rf) AS rf
        FROM t0 GROUP BY k, ln),
      del AS (
        SELECT 'delete' AS change, rf, qty, pc FROM tk
        WHERE coalesce(qty >= 48, false)),
      surv AS (
        SELECT * FROM tk WHERE NOT coalesce(qty >= 48, false)),
      upd_pre AS (
        SELECT 'delete' AS change, rf, qty, pc FROM surv
        WHERE k <= 1000),
      upd_post AS (
        SELECT 'insert' AS change, rf, qty, pc + 100 AS pc FROM surv
        WHERE k <= 1000),
      feed AS (
        SELECT * FROM del UNION ALL SELECT * FROM upd_pre
        UNION ALL SELECT * FROM upd_post)
      SELECT change, rf, COUNT(*) AS n_rows,
        CAST(SUM(qty) AS BIGINT) AS sum_qty,
        CAST(SUM(pc) AS BIGINT) AS sum_pc
      FROM feed GROUP BY 1, 2""",
    "txn_sql_timetravel" -> """
      WITH t AS (
        SELECT l_orderkey AS k, CAST(l_quantity AS INT) AS qty,
          l_returnflag AS rf
        FROM lineitem)
      SELECT 'v0' AS phase, rf, COUNT(*) AS n_rows,
        CAST(SUM(qty) AS BIGINT) AS sum_qty
      FROM t GROUP BY rf
      UNION ALL
      SELECT 'head' AS phase, rf, COUNT(*) AS n_rows,
        CAST(SUM(qty) AS BIGINT) AS sum_qty
      FROM t WHERE NOT coalesce(qty >= 48, false) GROUP BY rf""",
    "txn_dml" -> """
      WITH t AS (
        SELECT l_orderkey AS k, l_linenumber AS ln,
          CAST(l_quantity AS INT) AS qty,
          CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
          l_returnflag AS rf
        FROM lineitem),
      d AS (SELECT * FROM t WHERE NOT coalesce(qty >= 48, false)),
      u AS (SELECT k, ln, qty,
              CASE WHEN k <= 1000 THEN pc + 100 ELSE pc END AS pc, rf
            FROM d),
      tk AS (
        SELECT k, ln, MIN(qty) AS qty, MIN(pc) AS pc, MIN(rf) AS rf
        FROM t GROUP BY k, ln),
      src AS (
        SELECT k, ln, qty, -pc AS pc, rf FROM tk WHERE k % 97 = 0
        UNION ALL
        SELECT k + 2000000000 AS k, ln, 1 AS qty, 0 AS pc, rf
        FROM tk WHERE k % 89 = 0),
      kept AS (
        SELECT u.* FROM u
        WHERE NOT EXISTS (SELECT 1 FROM src
                          WHERE src.k = u.k AND src.ln = u.ln)),
      m AS (SELECT * FROM kept UNION ALL SELECT * FROM src)
      SELECT rf AS l_returnflag,
        COUNT(*) AS n_rows,
        CAST(SUM(pc) AS BIGINT) AS sum_pc,
        CAST(SUM(qty) AS BIGINT) AS sum_qty
      FROM m GROUP BY 1""",
    "txn_dml_mor" -> """
      WITH t AS (
        SELECT l_orderkey AS k, l_linenumber AS ln,
          CAST(l_quantity AS INT) AS qty,
          CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
          l_returnflag AS rf
        FROM lineitem),
      d AS (SELECT * FROM t WHERE NOT coalesce(qty >= 48, false)),
      u AS (SELECT k, ln, qty,
              CASE WHEN k <= 1000 THEN pc + 100 ELSE pc END AS pc, rf
            FROM d)
      SELECT rf AS l_returnflag,
        COUNT(*) AS n_rows,
        CAST(SUM(pc) AS BIGINT) AS sum_pc,
        CAST(SUM(qty) AS BIGINT) AS sum_qty
      FROM u GROUP BY 1""",
    "mv_incremental" -> """
      WITH t AS (
        SELECT l_orderkey AS k, l_linenumber AS ln,
          CAST(l_quantity AS INT) AS qty,
          CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
          l_returnflag AS rf
        FROM lineitem),
      d AS (SELECT * FROM t WHERE NOT coalesce(qty >= 48, false)),
      u AS (SELECT k, ln, qty,
              CASE WHEN k <= 1000 THEN pc + 100 ELSE pc END AS pc, rf
            FROM d),
      a AS (SELECT k + 3000000000 AS k, ln, 5 AS qty,
              CAST(0 AS BIGINT) AS pc, 'Z' AS rf
            FROM t WHERE k % 101 = 0),
      m AS (SELECT * FROM u UNION ALL SELECT * FROM a)
      SELECT rf AS l_returnflag,
        COUNT(*) AS n_rows,
        CAST(COALESCE(SUM(pc), 0) AS BIGINT) AS sum_pc,
        MIN(qty) AS min_qty,
        MAX(qty) AS max_qty
      FROM m GROUP BY 1""",
    "mv_general" -> """
      WITH t AS (
        SELECT l_orderkey AS k, l_linenumber AS ln,
          CAST(l_quantity AS INT) AS qty,
          CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
          l_returnflag AS rf
        FROM lineitem),
      d AS (SELECT * FROM t WHERE NOT coalesce(qty >= 48, false)),
      u AS (SELECT k, ln, qty,
              CASE WHEN k <= 1000 THEN pc + 100 ELSE pc END AS pc, rf
            FROM d),
      a AS (SELECT k + 3000000000 AS k, ln, 5 AS qty,
              CAST(0 AS BIGINT) AS pc, 'Z' AS rf
            FROM t WHERE k % 101 = 0),
      m AS (SELECT * FROM u UNION ALL SELECT * FROM a)
      SELECT rf AS l_returnflag,
        COUNT(*) AS n_rows,
        CAST(SUM(pc) AS BIGINT) AS sum_pc,
        CAST(SUM(qty) AS BIGINT) AS sum_qty,
        CAST(COUNT(qty) AS BIGINT) AS cnt_qty,
        CAST(SUM(qty) AS DOUBLE) / COUNT(qty) AS avg_qty,
        CAST(COUNT(DISTINCT k % 1000) AS BIGINT) AS distinct_part
      FROM m GROUP BY 1""",
    "txn_scd2_apply" -> """
      WITH t0 AS (
        SELECT l_orderkey AS k, l_linenumber AS ln,
          CAST(l_quantity AS INT) AS qty,
          CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
          l_returnflag AS rf
        FROM lineitem),
      t AS (
        SELECT k, ln, MIN(qty) AS qty, MIN(pc) AS pc, MIN(rf) AS rf
        FROM t0 GROUP BY k, ln),
      d AS (SELECT * FROM t WHERE NOT coalesce(qty >= 48, false)),
      seg AS (
        -- initial segments: closed at 1 by the delete, at 2 by the
        -- update, otherwise still current
        SELECT rf, qty, pc, CAST(0 AS BIGINT) AS valid_from,
          CAST(CASE WHEN qty >= 48 THEN 1
                    WHEN k <= 1000 THEN 2 END AS BIGINT) AS valid_to
        FROM t
        UNION ALL
        -- post-image segments of the v2 update (survivors only)
        SELECT rf, qty, pc + 100 AS pc, CAST(2 AS BIGINT),
          CAST(NULL AS BIGINT)
        FROM d WHERE k <= 1000
        UNION ALL
        -- keys born at v3
        SELECT 'Z' AS rf, 5 AS qty, CAST(0 AS BIGINT) AS pc,
          CAST(3 AS BIGINT), CAST(NULL AS BIGINT)
        FROM t WHERE k % 101 = 0)
      SELECT rf AS l_returnflag, valid_from,
        coalesce(valid_to, -1) AS valid_to,
        (valid_to IS NULL) AS is_current,
        COUNT(*) AS n_rows,
        CAST(SUM(pc) AS BIGINT) AS sum_pc,
        CAST(SUM(qty) AS BIGINT) AS sum_qty
      FROM seg GROUP BY 1, 2, 3, 4""",
    "txn_stats_agg" -> """
      WITH t AS (
        SELECT l_orderkey AS k,
          CAST(l_quantity AS INT) AS qty,
          CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
        FROM lineitem),
      d1 AS (SELECT * FROM t WHERE NOT coalesce(qty >= 48, false)),
      d2 AS (SELECT * FROM d1 WHERE NOT coalesce(k <= 500, false))
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST((SELECT COUNT(*) FROM d2 WHERE qty BETWEEN 10 AND 20)
          AS BIGINT) AS n_band,
        MIN(k) AS min_k, MAX(k) AS max_k,
        MIN(qty) AS min_qty, MAX(qty) AS max_qty,
        MIN(pc) AS min_pc, MAX(pc) AS max_pc
      FROM d2""",
    "txn_generated" -> """
      WITH t AS (
        SELECT l_orderkey AS k,
          CAST(l_quantity AS INT) AS qty,
          CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
          l_returnflag AS rf
        FROM lineitem),
      u AS (SELECT k,
              CASE WHEN k <= 1000 THEN qty + 7 ELSE qty END AS qty,
              pc, rf
            FROM t),
      d AS (SELECT * FROM u WHERE NOT coalesce(qty >= 48, false)),
      g AS (SELECT *, pc * 2 + qty AS pc2 FROM d)
      SELECT rf AS l_returnflag,
        COUNT(*) AS n_rows,
        CAST(SUM(pc2) AS BIGINT) AS sum_pc2,
        CAST(SUM(qty) AS BIGINT) AS sum_qty
      FROM g GROUP BY 1""",
    "txn_convert_partitioned" -> """
      WITH d AS (SELECT doc_id, n_chars, lang FROM documents),
      kept AS (SELECT * FROM d WHERE NOT coalesce(lang = 'de', false))
      SELECT lang,
        COUNT(*) AS n_rows,
        CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        MIN(doc_id) AS min_doc,
        MAX(doc_id) AS max_doc
      FROM kept GROUP BY 1""",
    "txn_batch_source" -> """
      WITH t AS (
        SELECT l_orderkey AS k,
          CAST(l_quantity AS INT) AS qty,
          CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
          l_returnflag AS rf
        FROM lineitem),
      d1 AS (SELECT * FROM t WHERE NOT coalesce(qty >= 48, false)),
      d2 AS (SELECT * FROM d1 WHERE NOT coalesce(k % 13 = 0, false)),
      f AS (SELECT * FROM d2
            WHERE k <= (SELECT MAX(k) // 4 FROM t))
      SELECT rf AS flag,
        COUNT(*) AS n_rows,
        CAST(SUM(pc) AS BIGINT) AS sum_pc,
        CAST(SUM(qty) AS BIGINT) AS sum_qty
      FROM f GROUP BY 1""",
    "txn_identity" -> """
      WITH d AS (SELECT doc_id, n_chars FROM documents),
      s1 AS (SELECT COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sc
             FROM d WHERE doc_id % 3 = 0),
      s2 AS (SELECT COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sc
             FROM d WHERE doc_id % 3 = 1),
      s3 AS (SELECT COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sc,
               MIN(doc_id) AS lo, MAX(doc_id) AS hi
             FROM d WHERE doc_id % 3 = 2),
      s4 AS (SELECT COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sc
             FROM d WHERE doc_id % 5 = 0)
      -- generated ids are contiguous single-partition ranges; explicit
      -- ids are doc_id + 10^7; phase 4 resumes past the absorbed max
      SELECT CAST(1 AS INT) AS phase, n AS n_rows, n AS n_ids,
        CAST(1 AS BIGINT) AS min_id, CAST(n AS BIGINT) AS max_id,
        sc AS sum_chars FROM s1
      UNION ALL
      SELECT 2, s2.n, s2.n, CAST(s1.n + 1 AS BIGINT),
        CAST(s1.n + s2.n AS BIGINT), s2.sc FROM s1, s2
      UNION ALL
      SELECT 3, n, n, CAST(10000000 + lo AS BIGINT),
        CAST(10000000 + hi AS BIGINT), sc FROM s3
      UNION ALL
      SELECT 4, s4.n, s4.n, CAST(10000000 + s3.hi + 1 AS BIGINT),
        CAST(10000000 + s3.hi + s4.n AS BIGINT), s4.sc FROM s3, s4""",
    "bloom_point_lookup" -> """
      SELECT doc_id, lang, n_chars FROM documents
      WHERE doc_id IN (0, 1, 2)""")
}
