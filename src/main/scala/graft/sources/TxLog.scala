package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

/** A file-level transaction log over plain-parquet datasets — the
  * multi-writer / snapshot-isolation / time-travel slice of the
  * Delta-Iceberg gap (SURVEY §6), emulated with the same primitives
  * Delta uses on HDFS: an ordered log of JSON commit files under
  * `_graft_log/`, each claimed with an atomic create-if-absent, each
  * listing the data files the commit adds and removes (the public
  * protocol shape: delta-io/delta PROTOCOL.md; no Delta code or
  * artifact is used — none exists in this offline container).
  *
  * Semantics:
  *  - **Snapshot isolation**: a read resolves the file list from one
  *    log version; writers never mutate committed files (overwrite =
  *    new files + logical remove), so a long scan is never torn by a
  *    concurrent write — unlike the staging-rename swap in
  *    [[graft.etl.MedallionPipeline]], which has a documented
  *    delete-before-rename crash window this log removes.
  *  - **Optimistic concurrency**: the next version number is claimed
  *    by `fs.create(…, overwrite = false)`; a loser re-reads the log
  *    and REBASES. Appends commute with anything (retry at the next
  *    version). A commit that removes files (compact) conflicts iff a
  *    concurrent commit already removed one of them
  *    (`ConcurrentModificationException`); an overwrite re-targets
  *    whatever files the fresh head holds (write-serializable
  *    last-replace-wins, Delta's default isolation for replaces).
  *  - **Idempotent txn markers**: a commit may carry (appId, batchId);
  *    a batchId ≤ the last recorded for that appId is silently skipped
  *    — exactly-once sinks for Structured Streaming's replayed
  *    micro-batches ([[exactlyOnceSink]]), closing the at-least-once
  *    caveat documented on `MedallionPipeline.ingestStream`.
  *  - **Time travel**: [[read]] with `asOf = Some(v)` replays the log
  *    to version v; files stay on disk until [[vacuum]].
  *  - **Checkpoints**: every [[CheckpointInterval]] commits the full
  *    replayed state is written beside the log, so snapshot resolution
  *    is O(recent commits), and commits older than a checkpoint may be
  *    truncated.
  *
  * At 100 TB the log holds file METADATA only (path + row count): a
  * commit is one tiny JSON write regardless of data size, snapshot
  * resolution reads the latest checkpoint plus a handful of commits,
  * and the data files themselves are immutable parquet — the same
  * scaling story as Delta's log, minus multi-cluster commit services
  * (create-if-absent is the single-filesystem primitive; S3-style
  * stores need a coordinating service, documented as the swap seam).
  *
  * Logged datasets must be read through [[read]] — a plain
  * `spark.read.parquet(dir)` would see removed-but-unvacuumed files.
  */
object TxLog {

  val LogDir = "_graft_log"

  /** Exact row count of one parquet file from its FOOTER, read on the
    * driver — corroborating one staged file must not cost a Spark job
    * (~100 ms of scheduling for a metadata question). */
  private def parquetFooterRows(spark: SparkSession,
      p: Path): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(p, spark.sessionState.newHadoopConf())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  /** Materialize a bounded, multiply-consumed relation ONCE and
    * TRUNCATE its lineage (eager localCheckpoint). The DML surfaces
    * drive several actions over their directive/source relations;
    * `.persist()` alone makes re-EXECUTION cheap but every action
    * still re-PLANS the full analyzed tree — for a change-feed span
    * (one diff pipeline per DML commit, referenced by several
    * branches) that tree reaches hundreds of exchanges and the
    * per-action planning cost dwarfs the data (guide §3.3:
    * materialize to truncate very large plans). After the checkpoint
    * every consumer plans against one flat LogicalRDD. Blocks must be
    * freed with [[releaseCheckpoint]] once consumed — the
    * ContextCleaner only gets to them at some later GC. */
  private[sources] def checkpointed(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = true)

  /** Free the executor storage behind [[checkpointed]] (the
    * [[graft.operators.Dedup.release]] recipe): unpersist every
    * LogicalRDD leaf in the plan. After release the DataFrame is not
    * recomputable — call only once every consumer is done. */
  private[sources] def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Label the Spark jobs `f` launches (guide §1.5) so profilers and
    * the UI attribute commit-machinery phases; restores the caller's
    * description (thread-local) on exit. Zero data-path effect. */
  private[graft] def described[A](spark: SparkSession, label: String)
      (f: => A): A = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(s"txlog:$label")
    try f finally sc.setJobDescription(prev)
  }

  /** Write a full-state checkpoint every this-many commits. */
  val CheckpointInterval = 10
  /** Minimum age before [[vacuum]] may collect an orphaned dot-tmp
    * claim file from the log dir — protects an in-flight writer's
    * temp from a default (minAgeMs = 0) vacuum. */
  val TmpAgeFloorMs: Long = 10L * 60 * 1000

  private val MaxAttempts = 20

  /** The highest log-format feature generation this reader
    * understands (Delta's protocol/minReaderVersion shape): 1 = base
    * log, 2 = deletion vectors + absolute file paths (shallow
    * clone), 3 = column mapping, 4 = identity + generated columns,
    * 5 = path-partitioned registration (hive-layout entries whose
    * partition values live in the file path — an older reader would
    * read those columns as silent NULLs). A commit that first USES a
    * feature
    * records the required generation; [[snapshot]] refuses a table
    * whose recorded requirement exceeds this reader — because an
    * OLDER reader would not refuse: it would parse the commit, drop
    * the fields it doesn't know, and silently read deleted rows as
    * live (dv), resolve absolute paths wrongly (clone), project
    * stale names (mapping), or append ungenerated/colliding ids
    * (identity). A loud version error is the only safe
    * failure mode for forward compatibility. */
  val CurrentReader = 5

  /** Per-column stats a commit may record for a data file: the
    * column's catalog dtype plus min/max as Spark's canonical
    * cast-to-string forms (order-preserving for numerics, strings,
    * dates, timestamps — the [[StatsManifest]] encoding). `None`
    * min/max = all-null column → pruning keeps the file. `nulls` is
    * the column's null count (Delta's nullCount): it makes
    * fully-contained files countable from METADATA in [[countWhere]]
    * (min/max ignore nulls, so rows-in-range ≠ file rows when nulls
    * exist). `None` on commits written before it was recorded —
    * consumers must treat that as unknown, not zero. */
  final case class ColStats(dtype: String, min: Option[String],
      max: Option[String], nulls: Option[Long] = None,
      kmv: Option[String] = None)

  /** One live data file in a snapshot: `path` relative to the dataset
    * dir, plus its row count and optional per-column min/max — all
    * commit-time metadata, so `history`, row-count queries, and
    * [[readPruned]] file skipping never touch the data (Delta's
    * stats-in-log). Commits written before stats existed parse with
    * an empty map (json4s applies the default).
    *
    * `dv` is the file's DELETION VECTOR (Delta's merge-on-read DML):
    * the dir-relative path of a parquet relation of `(file,
    * row_index)` pairs under `_graft_dv/` naming the rows of this
    * file that are logically deleted — the data file itself is
    * byte-identical, reads subtract the vector, [[compact]]
    * materializes it away. `dvRows` counts this file's deleted rows,
    * so `rows - dvRows` is its live count. Several file entries may
    * share one vector relation (a single DML commit writes ONE), and
    * a superseded vector may still carry stale pairs for files whose
    * entry moved on — harmless, the read subtracts by (file, row)
    * identity. Plain files parse with `dv = None` (json4s default).
    *
    * `bytes` is the file's on-disk size, recorded at commit time
    * since round 13 — what stream admission's `maxBytesPerTrigger`
    * budgets against. Entries from older commits parse as `None`;
    * consumers must treat the absence CONSERVATIVELY (like null
    * bounds in [[ColStats]]), never as zero. */
  final case class TxFile(path: String, rows: Long,
      stats: Map[String, ColStats] = Map.empty,
      dv: Option[String] = None, dvRows: Long = 0L,
      bytes: Option[Long] = None)

  /** An IDENTITY column's definition (Delta's `GENERATED … AS
    * IDENTITY`): values generate from `start` by `step` (non-zero;
    * negative counts down); `high` is the generation HIGH WATERMARK —
    * the farthest-from-start value ever committed (None until the
    * first generated/observed value). Generated values are unique
    * and move strictly past the watermark but MAY HAVE GAPS (the
    * Delta contract): each append assigns per-task blocks off the
    * monotonic task id — one pass, no shuffle, no driver loop — and
    * the new watermark is read back from the staged files' own
    * min/max stats (commit metadata, zero extra scans). `always =
    * true` refuses caller-supplied values (GENERATED ALWAYS).
    * DOCUMENTED DIVERGENCE from Delta: an ALL-NULL identity column
    * reads as OMISSION and generates, even for GENERATED ALWAYS —
    * SQL `INSERT (cols…)` arrives with omitted columns engine-filled
    * as NULL, indistinguishable from an explicit NULL column at the
    * commit layer (both the SQL bridge and the Scala API hand the
    * writer a plain DataFrame), so the engine resolves the ambiguity
    * toward the everyday INSERT shape; Delta refuses explicit NULLs.
    * Any batch carrying a REAL value keeps the strict contracts
    * (ALWAYS refuses; BY DEFAULT refuses mixed NULLs);
    * `false` is GENERATED BY DEFAULT — explicit values flow and the
    * watermark absorbs them when they land beyond it. */
  final case class IdentitySpec(start: Long, step: Long,
      high: Option[Long] = None, always: Boolean = true) {
    require(step != 0L, "TxLog: identity step must be non-zero")
    /** The next value generation starts from. */
    def nextBase: Long = high.map(_ + step).getOrElse(start)
    /** Fold an observed committed value into the watermark. */
    def absorb(v: Long): IdentitySpec =
      copy(high = Some(high.fold(v)(h =>
        if (step > 0) math.max(h, v) else math.min(h, v))))
  }

  /** The resolved state of the table at `version`: live files, the
    * schema (Spark StructType JSON), the latest batchId committed
    * per streaming appId, and the active CHECK constraints
    * (name → SQL expression).
    *
    * `mapping` is Delta-style COLUMN MAPPING (LOGICAL name →
    * PHYSICAL parquet column): empty = identity (the pre-mapping
    * fast path — zero read/write overhead). [[renameColumn]] /
    * [[dropColumn]] only ever edit this map and the logical schema —
    * the physical columns inside data files NEVER change, so DDL is
    * a KB commit at any table size. `retired` lists physical names
    * that still exist inside live data files but belong to no
    * logical column (dropped, or freed by a rename) — a later
    * re-add of that logical name must take a FRESH physical name or
    * the old files' values would silently resurrect. */
  final case class TxSnapshot(version: Long, schemaJson: String,
      files: Seq[TxFile], txns: Map[String, Long],
      constraints: Map[String, String] = Map.empty,
      mapping: Map[String, String] = Map.empty,
      retired: Seq[String] = Nil,
      minReader: Int = 1,
      identity: Map[String, IdentitySpec] = Map.empty,
      generated: Map[String, String] = Map.empty,
      partitionCols: Seq[String] = Nil,
      defaults: Map[String, String] = Map.empty,
      properties: Map[String, String] = Map.empty) {
    /** The physical parquet name of a logical column. */
    def phys(logical: String): String = mapping.getOrElse(logical, logical)
    /** Physical names no new column may claim. */
    def reservedPhys: Set[String] = mapping.values.toSet ++ retired
  }

  private implicit val formats: Formats = DefaultFormats

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logPath(dir: String) = new Path(dir, LogDir)

  /** Resolve a file-entry path against the dataset dir. Entries are
    * normally dir-relative; a SHALLOW CLONE registers the source's
    * files by ABSOLUTE path (zero copy), which resolve as themselves. */
  private[graft] def resolveData(dir: String, p: String): String =
    if (p.startsWith("/") || p.contains("://")) p else s"$dir/$p"

  private def resolvePath(dir: String, p: String): Path = {
    val pp = new Path(p)
    if (pp.isAbsolute) pp else new Path(dir, p)
  }

  /** The bare file name of an entry path (what `_metadata.file_name`
    * and deletion vectors key by — names are UUID-unique). */
  private def nameOf(p: String): String = p.split('/').last

  /** The identity [[readFilesTagged]] emits as TagFile for this
    * snapshot's files: base name for flat tables, dir-relative path
    * for path-partitioned registrations (base names may repeat
    * across partition dirs there). Every TagFile consumer matches
    * through this, so the two can never drift. */
  private[graft] def fileKey(snap: TxSnapshot, f: TxFile): String =
    if (snap.partitionCols.isEmpty) nameOf(f.path) else f.path

  private def versionFile(dir: String, v: Long) =
    new Path(logPath(dir), f"$v%020d.json")

  private def checkpointFile(dir: String, v: Long) =
    new Path(logPath(dir), f"$v%020d.checkpoint.json")

  private val CommitName = """(\d{20})\.json""".r
  private val CheckpointName = """(\d{20})\.checkpoint\.json""".r

  /** (commit versions, checkpoint versions), each sorted ascending. */
  private def listLog(spark: SparkSession, dir: String)
      : (Seq[Long], Seq[Long]) = {
    val lp = logPath(dir)
    val f = fs(spark, lp)
    if (!f.exists(lp)) return (Nil, Nil)
    val names = f.listStatus(lp).filter(_.isFile).map(_.getPath.getName)
    val commits = names.collect { case CommitName(v) => v.toLong }
    val cps = names.collect { case CheckpointName(v) => v.toLong }
    (commits.sorted.toSeq, cps.sorted.toSeq)
  }

  def isLogged(spark: SparkSession, dir: String): Boolean =
    listLog(spark, dir)._1.nonEmpty

  private def readText(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Atomic claim of one log slot: create-if-absent (the Delta-on-HDFS
    * commit primitive). False = another writer owns this version.
    *
    * On HDFS `create(…, overwrite = false)` is an atomic namenode op.
    * Hadoop's LOCAL filesystem, however, implements it as
    * check-then-act (exists? then open) — two same-JVM writers can both
    * pass the check and the second SILENTLY truncates the first's
    * commit, losing it. For `file:` URIs claim with O_EXCL
    * (`CREATE_NEW`) through java.nio instead, which is atomic at the
    * syscall level. */
  private def tryWrite(f: FileSystem, p: Path, content: String): Boolean = {
    if (f.exists(p)) return false
    if (f.getUri.getScheme == "file") {
      // two-step claim: write the FULL content to a dot-tmp sibling
      // (invisible to listLog's name filter), then hard-link it into
      // place — link(2) is atomic AND the target appears with its
      // complete content, so a concurrent reader (a live streaming
      // source polling the log) can never observe a half-written
      // commit. A bare CREATE_NEW write makes the file visible EMPTY
      // first — observed as a "No content to map" parse failure under
      // concurrent stream polling.
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      java.nio.file.Files.createDirectories(local.getParent)
      val tmp = local.resolveSibling(
        s".${local.getFileName}.${UUID.randomUUID.toString.take(8)}.tmp")
      java.nio.file.Files.write(tmp, content.getBytes(UTF_8),
        java.nio.file.StandardOpenOption.CREATE_NEW)
      try {
        java.nio.file.Files.createLink(local, tmp)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException |
            _: java.nio.file.FileSystemException =>
          // mount without hard-link support (some NFS/FUSE/exFAT):
          // fall back to the O_EXCL claim — still an atomic
          // create-if-absent, accepting the brief empty-then-content
          // visibility window the link path exists to avoid
          try {
            java.nio.file.Files.write(local, content.getBytes(UTF_8),
              java.nio.file.StandardOpenOption.CREATE_NEW)
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => false
          }
      } finally {
        java.nio.file.Files.deleteIfExists(tmp)
        ()
      }
    } else try {
      val out = f.create(p, false)
      try out.write(content.getBytes(UTF_8)) finally out.close()
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case e: java.io.IOException if f.exists(p) => false
    }
  }

  /** Sketch size for the per-file KMV distinct-count stats recorded
    * alongside min/max: k = 64 → ±1/√(k−1) ≈ 13% NDV error, 512 B of
    * longs per column per file in the log. The k travels INSIDE each
    * encoded sketch, so a future size change merges correctly against
    * history (merging always trims to the smallest k present). */
  private[graft] val KmvStatsK = 64

  /** kmv stat payload: base64(4-byte big-endian k, then the sketch's
    * longs in unsigned order). */
  private[graft] def kmvEncode(k: Int, hs: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * hs.length)
    bb.putInt(k)
    hs.foreach(bb.putLong)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  private[graft] def kmvDecode(s: String): (Int, Array[Long]) = {
    val bb = java.nio.ByteBuffer.wrap(
      java.util.Base64.getDecoder.decode(s))
    val k = bb.getInt
    val n = bb.remaining() / 8
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = bb.getLong; i += 1 }
    (k, hs)
  }

  /** Whether a column's values feed the KMV sketch: atomic types only
    * (xxhash64 refuses maps; nested hulls are meaningless anyway). */
  private def kmvEligible(dtype: String): Boolean =
    !dtype.startsWith("array<") && !dtype.startsWith("map<") &&
      !dtype.startsWith("struct<")

  /** One stats-collection projection per column: min/max in the
    * canonical cast-to-string form, the null count, and (atomic
    * columns) a KMV distinct-count sketch over `xxhash64(col)` —
    * shared by [[stageData]] and [[convertInPlace]] so the recorded
    * stats can never diverge between the two write paths. The sketch
    * is what gives CBO a real NDV for ANY column type (strings —
    * document ids, categories — included; the old range bound only
    * ever covered dense integral keys); [[TxLogStats]] merges the
    * per-file sketches at snapshot load, so restriction re-estimates
    * from exactly the surviving files. */
  private def statAggExprs(statsCols: Seq[String],
      dtypes: Map[String, String] = Map.empty)
      : Seq[org.apache.spark.sql.Column] =
    statsCols.flatMap { c =>
      val base = Seq(
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_nulls_$c"))
      if (!dtypes.get(c).forall(kmvEligible)) base
      else {
        import org.apache.spark.sql.catalyst.expressions.{If, IsNull,
          Literal, XxHash64}
        val e = PlanBridge.expression(col(c))
        // null inputs must not count as a distinct value: the agg
        // skips null children, xxhash64 itself never returns null
        val hashed = If(IsNull(e), Literal(null, LongType),
          new XxHash64(Seq(e)))
        base :+ PlanBridge.column(
          graft.functions.KmvSketchAgg(hashed,
            Literal(KmvStatsK)).toAggregateExpression())
          .as(s"_kmv_$c")
      }
    }

  private def statsOfRow(r: Row, statsCols: Seq[String],
      dtypes: Map[String, String]): Map[String, ColStats] =
    statsCols.map { c =>
      val kmv =
        if (!kmvEligible(dtypes(c))) None
        else scala.util.Try(
          r.getAs[scala.collection.Seq[Long]](s"_kmv_$c"))
          .toOption.filter(_ != null)
          .map(hs => kmvEncode(KmvStatsK, hs.toArray))
      c -> ColStats(dtypes(c),
        Option(r.getAs[String](s"_min_$c")),
        Option(r.getAs[String](s"_max_$c")),
        Some(r.getAs[Long](s"_nulls_$c")),
        kmv = kmv)
    }.toMap

  private def filesJson(files: Seq[TxFile]): JValue =
    files.map { a =>
      val base = ("path" -> a.path) ~ ("rows" -> a.rows)
      val withStats =
        if (a.stats.isEmpty) base
        else base ~ ("stats" -> JObject(a.stats.toList.sortBy(_._1).map {
          case (c, st) => JField(c,
            ("dtype" -> st.dtype) ~ ("min" -> st.min) ~
              ("max" -> st.max) ~ ("nulls" -> st.nulls) ~
              ("kmv" -> st.kmv))
        }))
      val withDv = a.dv.fold(withStats)(d =>
        withStats ~ ("dv" -> d) ~ ("dvRows" -> a.dvRows))
      a.bytes.fold(withDv)(b => withDv ~ ("bytes" -> b))
    }

  private def renderCommit(v: Long, op: String, added: Seq[TxFile],
      removed: Seq[String], schemaJson: Option[String],
      txn: Option[(String, Long)],
      ddl: Option[(Map[String, String], Seq[String])] = None,
      minReader: Option[Int] = None,
      constraints: Option[Map[String, String]] = None,
      identity: Option[Map[String, IdentitySpec]] = None,
      generated: Option[Map[String, String]] = None,
      partitionCols: Option[Seq[String]] = None,
      defaults: Option[Map[String, String]] = None,
      properties: Option[Map[String, String]] = None,
      txnsMulti: Seq[(String, Long)] = Nil,
      ts: Long = System.currentTimeMillis()): String = {
    val base: JObject =
      ("version" -> v) ~ ("op" -> op) ~ ("ts" -> ts) ~
        ("add" -> filesJson(added)) ~ ("remove" -> removed)
    val withSchema = schemaJson.fold(base)(s => base ~ ("schemaJson" -> s))
    val withMr = minReader.fold(withSchema)(m =>
      withSchema ~ ("minReader" -> m))
    val withDdl = ddl.fold(withMr) { case (m, r) =>
      withMr ~ ("mapping" -> m) ~ ("retired" -> r)
    }
    val withCons0 = constraints.fold(withDdl)(cs => withDdl ~ ("constraints" -> cs))
    val withCons1 = identity.fold(withCons0)(im =>
      withCons0 ~ ("identity" -> identityJson(im)))
    val withCons2 = generated.fold(withCons1)(g =>
      withCons1 ~ ("generated" -> g))
    val withCons3 = partitionCols.fold(withCons2)(pc =>
      withCons2 ~ ("partitionCols" -> pc))
    val withCons4 = defaults.fold(withCons3)(d =>
      withCons3 ~ ("defaults" -> d))
    val withCons = properties.fold(withCons4)(p =>
      withCons4 ~ ("properties" -> p))
    val withTxn = txn.fold(withCons) { case (app, b) =>
      withCons ~ ("txn" -> (("appId" -> app) ~ ("batchId" -> b)))
    }
    // COPY INTO's per-source-file idempotency markers: one commit may
    // record MANY (appId, batchId) pairs (sorted for determinism)
    val withMulti =
      if (txnsMulti.isEmpty) withTxn
      else withTxn ~ ("txnMulti" -> txnsMulti.sortBy(_._1).map {
        case (app, b) => ("appId" -> app) ~ ("batchId" -> b)
      })
    JsonMethods.compact(JsonMethods.render(withMulti))
  }

  /** Mutable replay state (driver-side; file-count sized). */
  private final class State {
    var schemaJson: String = ""
    val files = scala.collection.mutable.LinkedHashMap[String, TxFile]()
    val txns = scala.collection.mutable.Map[String, Long]()
    var constraints = Map.empty[String, String]
    var mapping = Map.empty[String, String]
    var retired = Seq.empty[String]
    var minReader = 1
    var identity = Map.empty[String, IdentitySpec]
    var generated = Map.empty[String, String]
    var partitionCols = Seq.empty[String]
    var defaults = Map.empty[String, String]
    var properties = Map.empty[String, String]
    def toSnapshot(v: Long): TxSnapshot =
      TxSnapshot(v, schemaJson, files.values.toSeq.sortBy(_.path),
        txns.toMap, constraints, mapping, retired, minReader, identity,
        generated, partitionCols, defaults, properties)
  }

  /** JSON form of an identity map (sorted for determinism); `high`
    * omits when None, like every other optional log field. */
  private def identityJson(m: Map[String, IdentitySpec]): JObject =
    JObject(m.toList.sortBy(_._1).map { case (k, s) =>
      val base: JObject = ("start" -> s.start) ~ ("step" -> s.step) ~
        ("always" -> s.always)
      JField(k, s.high.fold(base)(h => base ~ ("high" -> h)))
    })

  private def applyCommit(st: State, j: JValue): Unit = {
    (j \ "schemaJson").extractOpt[String].foreach(st.schemaJson = _)
    (j \ "remove").extract[Seq[String]].foreach(st.files.remove)
    (j \ "add").extract[Seq[TxFile]].foreach(a => st.files(a.path) = a)
    // a constraints commit carries the FULL new map (replay-simple).
    // NB: extractOpt[Map] of an ABSENT field yields Some(empty map)
    // in json4s — match on presence, or every ordinary commit would
    // silently reset the constraints
    (j \ "constraints") match {
      case JNothing => ()
      case jv => st.constraints = jv.extract[Map[String, String]]
    }
    // column mapping + retired physical names: same full-state,
    // presence-matched replay as constraints
    (j \ "mapping") match {
      case JNothing => ()
      case jv => st.mapping = jv.extract[Map[String, String]]
    }
    (j \ "retired") match {
      case JNothing => ()
      case jv => st.retired = jv.extract[Seq[String]]
    }
    (j \ "minReader").extractOpt[Int]
      .foreach(m => st.minReader = math.max(st.minReader, m))
    // identity columns: full-map, presence-matched replay like
    // constraints/mapping
    (j \ "identity") match {
      case JNothing => ()
      case jv => st.identity = jv.extract[Map[String, IdentitySpec]]
    }
    // generated columns (name -> SQL expr): same replay shape
    (j \ "generated") match {
      case JNothing => ()
      case jv => st.generated = jv.extract[Map[String, String]]
    }
    // path-encoded partition columns (recorded once at registration)
    (j \ "partitionCols") match {
      case JNothing => ()
      case jv => st.partitionCols = jv.extract[Seq[String]]
    }
    // column DEFAULT expressions: same full-map replay shape
    (j \ "defaults") match {
      case JNothing => ()
      case jv => st.defaults = jv.extract[Map[String, String]]
    }
    // table properties (Delta's TBLPROPERTIES): full-map replay
    (j \ "properties") match {
      case JNothing => ()
      case jv => st.properties = jv.extract[Map[String, String]]
    }
    // `copyintosz:` markers are byte-LENGTH fingerprints, NOT
    // monotonic batch ids — a source file can SHRINK, and max-replay
    // would pin the old larger length forever: upToDate's equality
    // check then never matches again and every COPY INTO rerun
    // re-ingests the file (duplicate rows), while the rebase
    // dup-guard's size comparison reads the stale max too. Replay
    // them last-write-wins (commits apply in version order, so the
    // latest commit's recorded length wins — exactly the fingerprint
    // semantics). Everything else keeps the monotonic-max replay
    // (streaming batch ids; `copyinto:` mtimes gate by `>=`).
    def recordTxn(app: String, b: Long): Unit =
      if (app.startsWith("copyintosz:")) st.txns(app) = b
      else st.txns(app) = math.max(b, st.txns.getOrElse(app, Long.MinValue))
    for {
      app <- (j \ "txn" \ "appId").extractOpt[String]
      b <- (j \ "txn" \ "batchId").extractOpt[Long]
    } recordTxn(app, b)
    (j \ "txnMulti") match {
      case JNothing => ()
      case jv => jv.extract[Seq[JObject]].foreach { o =>
        for {
          app <- (o \ "appId").extractOpt[String]
          b <- (o \ "batchId").extractOpt[Long]
        } recordTxn(app, b)
      }
    }
  }

  /** Resolve the table state at `asOf` (default: head): latest
    * checkpoint ≤ target + the commits after it. Fails if the needed
    * log span was truncated. */
  def snapshot(spark: SparkSession, dir: String,
      asOf: Option[Long] = None): TxSnapshot = {
    val (commits, cps) = listLog(spark, dir)
    require(commits.nonEmpty, s"TxLog: no transaction log under $dir/$LogDir")
    val head = commits.max
    val target = asOf.getOrElse(head)
    require(target >= 0 && target <= head,
      s"TxLog: version $target out of range [0, $head]")
    val f = fs(spark, logPath(dir))
    val cp = cps.filter(_ <= target).lastOption
    val st = new State
    cp.foreach { v =>
      val j = JsonMethods.parse(readText(f, checkpointFile(dir, v)))
      st.schemaJson = (j \ "schemaJson").extract[String]
      (j \ "files").extract[Seq[TxFile]].foreach(a => st.files(a.path) = a)
      (j \ "txns").extract[Map[String, Long]].foreach { case (k, b) =>
        st.txns(k) = b
      }
      (j \ "constraints") match { // same json4s absent-field quirk
        case JNothing => ()
        case jv => st.constraints = jv.extract[Map[String, String]]
      }
      (j \ "mapping") match {
        case JNothing => ()
        case jv => st.mapping = jv.extract[Map[String, String]]
      }
      (j \ "retired") match {
        case JNothing => ()
        case jv => st.retired = jv.extract[Seq[String]]
      }
      (j \ "minReader").extractOpt[Int]
        .foreach(m => st.minReader = math.max(st.minReader, m))
      (j \ "identity") match {
        case JNothing => ()
        case jv => st.identity = jv.extract[Map[String, IdentitySpec]]
      }
      (j \ "generated") match {
        case JNothing => ()
        case jv => st.generated = jv.extract[Map[String, String]]
      }
      (j \ "partitionCols") match {
        case JNothing => ()
        case jv => st.partitionCols = jv.extract[Seq[String]]
      }
      (j \ "defaults") match {
        case JNothing => ()
        case jv => st.defaults = jv.extract[Map[String, String]]
      }
      (j \ "properties") match {
        case JNothing => ()
        case jv => st.properties = jv.extract[Map[String, String]]
      }
    }
    val needed = (cp.getOrElse(-1L) + 1) to target
    val present = commits.toSet
    val missing = needed.filterNot(present)
    require(missing.isEmpty,
      s"TxLog: commits ${missing.take(3).mkString(",")}… truncated below " +
        s"any checkpoint ≤ $target")
    needed.foreach { v =>
      applyCommit(st, JsonMethods.parse(readText(f, versionFile(dir, v))))
    }
    require(st.minReader <= CurrentReader,
      s"TxLog: table at $dir requires log-format generation " +
        s"${st.minReader}, this reader supports $CurrentReader — " +
        "upgrade the library before reading (refusing is the only " +
        "safe behavior: ignoring unknown features would silently " +
        "corrupt the read)")
    st.toSnapshot(target)
  }

  private def writeCheckpoint(spark: SparkSession, dir: String,
      v: Long): Unit = {
    val snap = snapshot(spark, dir, Some(v))
    val base: JObject =
      ("version" -> v) ~ ("schemaJson" -> snap.schemaJson) ~
        ("files" -> filesJson(snap.files)) ~
        ("txns" -> JObject(snap.txns.toList.sortBy(_._1)
          .map { case (k, b) => JField(k, JLong(b)) }))
    val withCons =
      if (snap.constraints.isEmpty) base
      else base ~ ("constraints" -> snap.constraints)
    val withMap =
      if (snap.mapping.isEmpty) withCons
      else withCons ~ ("mapping" -> snap.mapping)
    val withRet =
      if (snap.retired.isEmpty) withMap
      else withMap ~ ("retired" -> snap.retired)
    val withId =
      if (snap.identity.isEmpty) withRet
      else withRet ~ ("identity" -> identityJson(snap.identity))
    val withGen0 =
      if (snap.generated.isEmpty) withId
      else withId ~ ("generated" -> snap.generated)
    val withGen1 =
      if (snap.partitionCols.isEmpty) withGen0
      else withGen0 ~ ("partitionCols" -> snap.partitionCols)
    val withGen =
      if (snap.defaults.isEmpty) withGen1
      else withGen1 ~ ("defaults" -> snap.defaults)
    val withProps =
      if (snap.properties.isEmpty) withGen
      else withGen ~ ("properties" -> snap.properties)
    val j: JObject =
      if (snap.minReader <= 1) withProps
      else withProps ~ ("minReader" -> snap.minReader)
    val p = checkpointFile(dir, v)
    val f = fs(spark, p)
    val content = JsonMethods.compact(JsonMethods.render(j)).getBytes(UTF_8)
    // deterministic content: overwrite is safe if two writers race
    // here — but the file must never be VISIBLE half-written (a live
    // streaming source polls snapshot() concurrently and would parse
    // an empty checkpoint), so land it with write-to-dot-tmp + atomic
    // rename on local filesystems
    if (f.getUri.getScheme == "file") {
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      java.nio.file.Files.createDirectories(local.getParent)
      val tmp = local.resolveSibling(
        s".${local.getFileName}.${UUID.randomUUID.toString.take(8)}.tmp")
      java.nio.file.Files.write(tmp, content)
      java.nio.file.Files.move(tmp, local,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    } else {
      val out = f.create(p, true)
      try out.write(content) finally out.close()
    }
  }

  /** Write `df`'s data into the dataset dir as immutable uniquely-named
    * parquet files WITHOUT touching the log: stage, stat rows (and
    * `statsCols` min/max — the [[readPruned]] skipping metadata) per
    * file in one scan of just the new files, move into place. The
    * files are invisible until a commit references them. */
  private[graft] def stageData(spark: SparkSession, dir: String,
      df: DataFrame, statsCols: Seq[String] = Nil,
      mapping: Map[String, String] = Map.empty,
      partCols: Seq[String] = Nil,
      sortWithinPhys: Seq[Column] = Nil,
      maxRecordsPerFile: Option[Long] = None,
      valueTasks: Map[String, Int] = Map.empty): (Seq[TxFile], String) = {
    // validate BEFORE the expensive distributed write: a statsCols
    // typo must not cost a full staged copy of the batch (LOGICAL
    // names — the caller's view)
    val logicalDtypes = df.schema.fields
      .map(fl => fl.name -> fl.dataType.catalogString).toMap
    statsCols.foreach(c => require(logicalDtypes.contains(c),
      s"TxLog: no column '$c' to stat in commit of $dir"))
    // the recorded table schema is the LOGICAL one; files are written
    // (and stats keyed) under PHYSICAL names — rename/drop then never
    // touch data
    val logicalJson = df.schema.json
    val physDf =
      if (mapping.isEmpty) df
      else df.select(df.schema.fields.map(fl =>
        col(fl.name).as(mapping.getOrElse(fl.name, fl.name))).toSeq: _*)
    val physStats = statsCols.map(c => mapping.getOrElse(c, c))
    val dtypes = physDf.schema.fields
      .map(fl => fl.name -> fl.dataType.catalogString).toMap
    val stageDir = new Path(dir, s"_graft_stage_${UUID.randomUUID()}")
    val f = fs(spark, stageDir)
    // partition-PURE staging only when the batch carries every
    // partition column (a schema-mismatched batch refuses downstream
    // as usual — never here, where the error would name staging).
    // Resolution is MAPPING-AWARE and PHYSICAL-FIRST: `partCols`
    // holds registration-time PHYSICAL names (never renamed). An
    // entry that IS some batch column's physical name resolves to
    // itself; only otherwise is it tried as a current logical name.
    // Physical-first matters under rename chains that reuse a former
    // partition column's name (b→c then a→b): logical-first would
    // stage by the renamed a instead of the registered b, silently
    // impurifying the layout. Unresolvable entries degrade to flat
    // staging (correct, just un-pruned until OPTIMIZE), never an
    // error here.
    val physOfBatch = df.columns.map(l => mapping.getOrElse(l, l)).toSet
    val physParts0 = partCols.map(c =>
      if (physOfBatch.contains(c)) c
      else if (df.columns.contains(c)) mapping.getOrElse(c, c)
      else c)
    val physParts =
      if (physParts0.forall(physOfBatch.contains)) physParts0 else Nil
    try {
      val (added, _) =
        stageBody(spark, dir, physDf, physStats, stageDir, f, dtypes,
          physParts, sortWithinPhys, maxRecordsPerFile, valueTasks)
      (added, logicalJson)
    } catch { case e: Throwable =>
      // a failed stage (write error, stats scan error, rename race)
      // must not leak the staged copy: vacuum never touches `_` dirs
      f.delete(stageDir, true)
      throw e
    }
  }

  private def stageBody(spark: SparkSession, dir: String, df: DataFrame,
      statsCols: Seq[String], stageDir: Path, f: FileSystem,
      dtypes: Map[String, String],
      partCols: Seq[String] = Nil,
      sortWithinPhys: Seq[Column] = Nil,
      maxRecordsPerFile: Option[Long] = None,
      valueTasks: Map[String, Int] = Map.empty): (Seq[TxFile], String) = {
    if (partCols.nonEmpty)
      return stageBodyPartitioned(spark, dir, df, statsCols, stageDir,
        f, dtypes, partCols, sortWithinPhys, maxRecordsPerFile,
        valueTasks)
    described(spark, "stage-write") {
      df.write.mode(SaveMode.Overwrite).parquet(stageDir.toString)
    }
    val parts = f.listStatus(stageDir)
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
    val byName: Map[String, (Long, Map[String, ColStats])] =
      if (parts.isEmpty) Map.empty
      else described(spark, "stage-stats") {
        spark.read.parquet(stageDir.toString)
          .groupBy(input_file_name().as("f"))
          .agg(count(lit(1)).as("n"), statAggExprs(statsCols, dtypes): _*)
          .collect()
      }
        .map { r =>
          r.getString(0).split('/').last ->
            (r.getLong(1), statsOfRow(r, statsCols, dtypes))
        }.toMap
    val uuid = UUID.randomUUID().toString.take(8)
    val added = parts.zipWithIndex.map { case (st, i) =>
      val name = f"$uuid-p$i%05d.parquet"
      // a staged file ABSENT from the stats aggregation is only
      // legitimate when it genuinely holds zero rows (static writes
      // DO emit empty part files for empty tasks — no rows, no
      // group). Corroborate before accepting rows = 0: registering a
      // live file with zeroed stats would silently mis-prune its
      // rows on every later filtered read. Cost: one single-file
      // footer read, miss path only.
      val (rows, stats) =
        byName.get(st.getPath.getName).getOrElse {
          // corroborate from the FOOTER on the driver (one metadata
          // read) — a Spark count() job here cost ~100 ms of pure
          // scheduling per empty part file
          val n = parquetFooterRows(spark, st.getPath)
          if (n != 0L) throw new IllegalStateException(
            s"TxLog: staged file ${st.getPath} holds $n rows but " +
              "matched no stats row — file-name keying drifted; " +
              "refusing to register it with empty stats")
          (0L, Map.empty[String, ColStats])
        }
      if (!f.rename(st.getPath, new Path(dir, name)))
        throw new IllegalStateException(
          s"TxLog: staging move failed for ${st.getPath}")
      TxFile(name, rows, stats, bytes = Some(st.getLen))
    }.toSeq
    f.delete(stageDir, true)
    (added, df.schema.json)
  }

  /** Partition-PURE staging for PARTITIONED tables (round-18): the
    * batch writes `partitionBy(partCols)` into the stage dir — every
    * staged file holds exactly ONE partition-value tuple — and the
    * files register under their dir-relative `key=value/…` paths,
    * the same nested form [[convertInPlace]] adopts (readers,
    * deletion vectors and the change feed already key those by
    * relative path). Why: a flat append mixing partition values
    * records min ≠ max on the partition columns, which silently
    * demotes the WHOLE table off the [[TxFileIndex]] partitioned
    * presentation — losing static+dynamic partition pruning for
    * every read after the first mixed append. With purity, the
    * per-file stats keep min = max = the value and the planner
    * presentation survives appends.
    *
    * Shape: one `repartition(partCols)` shuffle puts each value in
    * one task, so a V-value batch stages ~V files (per-value sizing
    * is OPTIMIZE's job, as with any small-file pattern). Base names
    * may repeat across partition dirs within one stage (same task
    * number, different dir), so the stats scan matches files by
    * their last `depth + 1` URI-decoded path segments — exactly
    * [[convertInPlace]]'s relKey. */
  /** The U+0001-joined canonical (cast-to-string) form of a row's
    * partition values — the key [[stageBodyPartitioned]]'s per-value
    * fan-out maps look up. Mirrors the per-file stat strings, so a
    * map built from commit metadata binds the same rows. */
  private def valueKeyExpr(partCols: Seq[String]): Column =
    concat_ws("\u0001", partCols.map(c =>
      coalesce(col(c).cast("string"), lit("\u0000null"))): _*)

  private def stageBodyPartitioned(spark: SparkSession, dir: String,
      df: DataFrame, statsCols: Seq[String], stageDir: Path,
      f: FileSystem, dtypes: Map[String, String],
      partCols: Seq[String],
      sortWithinPhys: Seq[Column] = Nil,
      maxRecordsPerFile: Option[Long] = None,
      valueTasks: Map[String, Int] = Map.empty): (Seq[TxFile], String) = {
    // `sortWithinPhys` (physical-name expressions) clusters rows
    // inside each partition's task before the write — the purify-
    // compaction leg of OPTIMIZE … ZORDER BY: per-file min/max
    // envelopes tighten on the clustering key WITHIN each partition
    // value. `maxRecordsPerFile` bounds file size so one giant
    // partition value splits into several (still partition-pure)
    // files instead of a single monolith.
    //
    // WRITE PARALLELISM: repartition(partCols) puts each value in ONE
    // task — correct and minimal-file-count, but a skewed ingest
    // batch (one 500 GB partition value) then writes on one core.
    // Three fan-out forms, most explicit wins:
    //  1. `valueTasks` (caller-supplied, per-value task counts keyed
    //     by [[valueKeyExpr]] strings — purify derives it from the
    //     scoped files' RECORDED BYTES, zero extra passes);
    //  2. `spark.graft.write.tasksPerValue = n` — a constant n-way
    //     salt per value (the session knob);
    //  3. `spark.graft.write.autoSalt` (default on): ONE narrow
    //     count per partition value over the batch, then each value
    //     gets ceil(its rows / the mean value's rows) tasks — a 90/10
    //     skewed batch fans its hot value out and leaves cold values
    //     single-file, with nothing configured. Costs one extra pass
    //     over the batch, so it only runs when the batch's PLAN-TIME
    //     size estimate clears `spark.graft.write.autoSaltMinBytes`
    //     (default 256 MiB — plan statistics are free; a batch below
    //     it writes fast enough on one core per value that the
    //     histogram pass would cost more than the skew).
    // All forms stay partition-PURE — the salt never crosses values;
    // per-value sizing remains OPTIMIZE's job for ingest, and purify
    // folds extra files away.
    val tasksPerValue = spark.conf
      .get("spark.graft.write.tasksPerValue", "1").toInt
    require(tasksPerValue >= 1,
      "TxLog: spark.graft.write.tasksPerValue must be >= 1")
    val autoSalt = spark.conf
      .get("spark.graft.write.autoSalt", "true").toBoolean
    // the salted forms pin the shuffle partition count: an
    // AQE-coalesced tiny shuffle would merge the salt slices back
    // into one task, silently defeating the requested parallelism —
    // the caller asked for write spread, so the advisory-size
    // coalesce must not apply.
    //
    // The salt hashes only HASHABLE columns: Spark's hash() rejects
    // MapType (anywhere in the type tree), so a map-bearing table
    // must not fail at analysis just because write spread was asked
    // for. No hashable non-partition column at all → fall back to
    // spark_partition_id() (deterministic given the incoming
    // partitioning; still partition-PURE — the salt never crosses
    // values). Caveat (documented): fully DUPLICATE rows hash to one
    // salt bucket by construction — content-identical skew keeps its
    // single writer; only value-skew with distinct rows fans out.
    lazy val saltCols = {
      def hashable(dt: DataType): Boolean = dt match {
        case _: org.apache.spark.sql.types.MapType => false
        case s: StructType => s.fields.forall(f => hashable(f.dataType))
        case a: org.apache.spark.sql.types.ArrayType =>
          hashable(a.elementType)
        case _ => true
      }
      df.schema.fields.filter(f => hashable(f.dataType)).map(_.name)
    }
    lazy val saltBase: Column =
      if (saltCols.isEmpty) spark_partition_id()
      else hash(saltCols.map(col).toSeq: _*)
    val maxFan = spark.sessionState.conf.numShufflePartitions
    // auto-salt histogram: rows per partition value, one narrow agg
    // (map-side combined) — each value's fan-out is its share of the
    // mean, so only genuinely hot values split
    def histTasks(): Map[String, Int] =
      scala.util.Try {
        val counts = df.groupBy(valueKeyExpr(partCols).as("__vk"))
          .agg(count(lit(1)).as("__n")).collect()
          .map(r => r.getString(0) -> r.getLong(1))
        if (counts.isEmpty || counts.length > 10000) Map.empty[String, Int]
        else {
          val mean = math.max(1.0,
            counts.map(_._2).sum.toDouble / counts.length)
          counts.collect { case (k, n) if n > mean * 1.5 =>
            k -> math.min(maxFan,
              math.ceil(n.toDouble / mean).toInt)
          }.toMap
        }
      }.getOrElse(Map.empty)
    // PER-VALUE fan-out (valueTasks / auto-salt): every mapped value
    // gets its own DENSE task-id range (offset + salt-in-[0,n)), and
    // the shuffle partition count is CHOSEN so Spark's own
    // HashPartitioning (pmod(murmur3(pid), P) — replicated on the
    // driver for int keys) is INJECTIVE over those ids: two task ids
    // landing in one reducer would merge their output into a single
    // double-size file, silently breaking the byte-sizing contract
    // purify derives the map from. Unmapped values ride a separate id
    // range hashed by value (collisions there only merge SMALL
    // values — harmless, even helpful). The search is a driver loop
    // over candidate P; on the rare failure it degrades to plain
    // hashing (a stray 2× file, never wrong data).
    def murmurPid(v: Int, p: Int): Int = {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(v, 42)
      val m = h % p
      if (m < 0) m + p else m
    }
    def choosePartitions(hot: Range, cold: Range): Int = {
      def ok(p: Int): Boolean = {
        val buckets = hot.map(murmurPid(_, p))
        buckets.distinct.size == buckets.size && {
          val hs = buckets.toSet
          cold.forall(v => !hs.contains(murmurPid(v, p)))
        }
      }
      val limit = math.max(maxFan, 16 * (hot.size + cold.size) + 64)
      var p = math.max(hot.size + 1, maxFan)
      while (p < limit && !ok(p)) p += 1
      if (ok(p)) p else maxFan
    }
    def mapPid(tasks: Map[String, Int]): (Column, Int) = {
      val keys = tasks.keys.toSeq.sorted
      val offsets = keys.scanLeft(0)((acc, k) => acc + tasks(k)).init
      val offMap = keys.zip(offsets).toMap
      val total = tasks.values.sum
      val p = choosePartitions(0 until total,
        total until total + maxFan)
      val key = valueKeyExpr(partCols)
      val off = element_at(typedLit(offMap), key)
      val n = element_at(typedLit(tasks), key)
      val pid = when(off.isNotNull, off + pmod(saltBase, n))
        .otherwise(lit(total) +
          pmod(hash(partCols.map(col).toSeq: _*), lit(maxFan)))
      (pid.cast("int"), p)
    }
    lazy val bigEnough = {
      val minBytes = spark.conf
        .get("spark.graft.write.autoSaltMinBytes", "268435456").toLong
      scala.util.Try(df.queryExecution.optimizedPlan.stats.sizeInBytes)
        .toOption.exists(_ >= BigInt(minBytes))
    }
    def pidShuffle(tasks: Map[String, Int]): DataFrame = {
      // dense-pid form: the pid ALONE is the shuffle key (it already
      // embeds the partition value), P chosen injective over the
      // mapped ids
      val (pid, p) = mapPid(tasks)
      df.repartition(p, pid)
    }
    val shuffled =
      if (sortWithinPhys.nonEmpty)
        // SORTED stage (zordered purify): a hash salt would scatter
        // the sorted run and void the stat envelopes — but ONE task
        // per value serializes a giant partition's rewrite. RANGE
        // partition on (partition value, clustering key) instead:
        // each range task holds a CONTIGUOUS sorted slice of one (or
        // two adjacent) values, so per-file envelopes stay tight,
        // files stay partition-pure (partitionBy splits by value at
        // write), and a giant zordered partition rewrites in
        // parallel. maxRecordsPerFile still cuts the sorted stream
        // into bounded consecutive chunks within each task.
        df.repartitionByRange(maxFan,
          partCols.map(col) ++ sortWithinPhys: _*)
      else if (valueTasks.exists(_._2 > 1)) pidShuffle(valueTasks)
      else if (tasksPerValue > 1)
        // constant tasksPerValue: throughput knob, not a sizing
        // contract — value+salt hashing is fine
        df.repartition(maxFan, partCols.map(col) :+
          pmod(saltBase, lit(tasksPerValue)): _*)
      else {
        val h =
          if (autoSalt && valueTasks.isEmpty && bigEnough) histTasks()
          else Map.empty[String, Int]
        if (h.exists(_._2 > 1)) pidShuffle(h)
        else df.repartition(partCols.map(col): _*)
      }
    val laid =
      if (sortWithinPhys.isEmpty) shuffled
      else shuffled.sortWithinPartitions(
        partCols.map(col) ++ sortWithinPhys: _*)
    val writer0 = laid.write.mode(SaveMode.Overwrite)
    val writer = maxRecordsPerFile.fold(writer0)(n =>
      writer0.option("maxRecordsPerFile", n.toString))
    writer.partitionBy(partCols: _*).parquet(stageDir.toString)
    val stageAbs = f.makeQualified(stageDir).toString
    val parts = {
      val out = scala.collection.mutable.ArrayBuffer.empty[
        org.apache.hadoop.fs.FileStatus]
      val it = f.listFiles(stageDir, true)
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.startsWith("part-"))
          out += st
      }
      out.sortBy(st => f.makeQualified(st.getPath).toString).toSeq
    }
    def relOf(p: Path): String = {
      val abs = f.makeQualified(p).toString
      require(abs.startsWith(stageAbs + "/"),
        s"TxLog: staged file $abs escapes the stage dir")
      abs.drop(stageAbs.length + 1)
    }
    // keying contract: `input_file_name()` returns the URI-ENCODED
    // path (a literal '%' in a partition dir arrives as "%25"), so
    // the stats side decodes EXACTLY ONCE; the FileStatus side
    // ([[relOf]]) is already the raw on-disk relative path and must
    // never be decoded — running it through the decoder too would
    // double-decode any value whose escaped form survives decoding
    // (e.g. "100%" → dir "lang=100%25" → "lang=100%"), silently
    // mismatching the two sides.
    val depth = partCols.size + 1
    def relKey(fullPath: String): String = {
      val path = try new java.net.URI(fullPath).getPath
      catch { case _: java.net.URISyntaxException => fullPath }
      path.split('/').takeRight(depth).mkString("/")
    }
    // the scan carries the caller's DECLARED types for the
    // path-encoded partition columns (inference could narrow them —
    // '01' parsing as 1 would corrupt the recorded stat strings)
    val byKey: Map[String, (Long, Map[String, ColStats])] =
      if (parts.isEmpty) Map.empty
      else spark.read.schema(df.schema).parquet(stageDir.toString)
        .groupBy(input_file_name().as("f"))
        .agg(count(lit(1)).as("n"), statAggExprs(statsCols, dtypes): _*)
        .collect()
        .map { r =>
          relKey(r.getString(0)) ->
            (r.getLong(1), statsOfRow(r, statsCols, dtypes))
        }.toMap
    val uuid = UUID.randomUUID().toString.take(8)
    val added = parts.zipWithIndex.map { case (st, i) =>
      val rel = relOf(st.getPath)
      val partDir = rel.split('/').dropRight(1).mkString("/")
      val name = f"$uuid-p$i%05d.parquet"
      val relOut = if (partDir.isEmpty) name else s"$partDir/$name"
      // every staged file MUST appear in the aggregation here: the
      // partitionBy write only materializes files that received rows,
      // so a byKey miss means the relKey derivation drifted from
      // input_file_name's URI form (e.g. a partition value whose
      // encoded path decodes differently) — and silently recording
      // rows = 0 would make TxFileIndex.build map the file to an
      // all-NULL partition value: `WHERE p = v` then silently prunes
      // live rows away. Corroborate a genuine empty before accepting.
      val (rows, stats) =
        byKey.get(rel.split('/').takeRight(depth).mkString("/"))
          .getOrElse {
            // footer metadata on the driver — same corroboration,
            // no per-file Spark job
            val n = parquetFooterRows(spark, st.getPath)
            if (n != 0L) throw new IllegalStateException(
              s"TxLog: staged file ${st.getPath} holds $n rows but " +
                "matched no stats row (relKey drift) — refusing to " +
                "register it with empty stats")
            (0L, Map.empty[String, ColStats])
          }
      val target = new Path(dir, relOut)
      f.mkdirs(target.getParent)
      if (!f.rename(st.getPath, target))
        throw new IllegalStateException(
          s"TxLog: staging move failed for ${st.getPath}")
      TxFile(relOut, rows, stats, bytes = Some(st.getLen))
    }
    f.delete(stageDir, true)
    (added, df.schema.json)
  }

  private def deleteStaged(spark: SparkSession, dir: String,
      added: Seq[TxFile]): Unit = {
    val f = fs(spark, new Path(dir))
    added.foreach(a => f.delete(new Path(dir, a.path), false))
  }

  private def schemaKey(schemaJson: String): Seq[(String, DataType)] =
    DataType.fromJson(schemaJson).asInstanceOf[StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq

  /** The optimistic-commit loop over already-staged files. Exposed
    * private[graft] so tests can interleave writers deterministically.
    * `removeAll = true` → overwrite semantics (re-resolves the remove
    * set against the fresh head on every attempt); explicit `remove` →
    * compact semantics (conflicts if a concurrent commit removed any). */
  private[graft] def commitStaged(spark: SparkSession, dir: String,
      op: String, added: Seq[TxFile], remove: Seq[String],
      removeAll: Boolean, schemaJson: String,
      txn: Option[(String, Long)],
      mergeSchema: Boolean = false,
      ownsAdded: Boolean = true,
      expectDv: Map[String, Option[String]] = Map.empty,
      ddlState: Option[(Map[String, String], Seq[String])] = None,
      freshPhys: Map[String, String] = Map.empty,
      stagedFields: Option[Set[String]] = None,
      minReader: Option[Int] = None,
      identityOut: Option[Map[String, IdentitySpec]] = None,
      expectIdentity: Map[String, Option[Long]] = Map.empty,
      generatedOut: Option[Map[String, String]] = None,
      defaultsOut: Option[Map[String, String]] = None,
      constraintsOut: Option[Map[String, String]] = None,
      conflictIfAdded: Option[Seq[TxFile] => Seq[String]] = None,
      txnsMulti: Seq[(String, Long)] = Nil): Long = {
    // `ownsAdded = false`: the added files are PRE-EXISTING table data
    // ([[restore]] re-registers an old snapshot's files) — abort paths
    // must never delete them
    def abortCleanup(): Unit =
      if (ownsAdded) deleteStaged(spark, dir, added)
    // test-only interleave point: lets a suite commit CONCURRENT work
    // deterministically between a DML's read phase and its claim
    // (cleared before it runs, so the hook's own commits never
    // recurse). Production cost: one thread-local read.
    locally {
      val h = testBeforeClaim.get()
      if (h.isDefined) { testBeforeClaim.set(None); h.get.apply() }
    }
    val f = fs(spark, logPath(dir))
    var attempt = 0
    while (true) {
      val base =
        if (isLogged(spark, dir)) Some(snapshot(spark, dir)) else None
      for ((app, b) <- txn; bs <- base)
        if (bs.txns.get(app).exists(_ >= b)) {
          abortCleanup() // replayed batch: no-op
          return bs.version
        }
      // COPY INTO marker conflict: a CONCURRENT commit already
      // recorded one of this batch's source files — committing would
      // duplicate its rows. Refuse loudly; a rerun re-filters against
      // the fresh markers and picks up only the remainder. (Checked
      // against the fresh head on every rebase attempt.)
      for (bs <- base if txnsMulti.nonEmpty) {
        // `copyintosz:` markers carry byte LENGTHS (an equality
        // fingerprint, not a monotonic batch id) — they never gate by
        // `>=`. A `copyinto:` marker whose mtime did not advance is
        // still a LEGITIMATE re-ingest when both sides' size markers
        // prove the bytes changed (same-tick rewrite); only an
        // identical (mtime, length) pair is a true concurrent copy.
        val mine = txnsMulti.toMap
        def sz(app: String): String =
          "copyintosz:" + app.stripPrefix("copyinto:")
        val dup = txnsMulti.collect {
          case (app, b) if !app.startsWith("copyintosz:") &&
              bs.txns.get(app).exists(_ >= b) &&
              !(app.startsWith("copyinto:") &&
                (for { m <- mine.get(sz(app)); h <- bs.txns.get(sz(app)) }
                  yield m != h).getOrElse(false)) => app
        }
        if (dup.nonEmpty) {
          abortCleanup()
          throw new java.util.ConcurrentModificationException(
            "TxLog: source file(s) already copied by a concurrent " +
              s"commit: ${dup.take(3).mkString(", ")} — rerun COPY " +
              "INTO to ingest the remainder")
        }
      }
      // write-serializable read-predicate guard (Delta's
      // ConcurrentAppendException): a predicate-driven rewrite read
      // the table at some version — files ADDED since whose stats
      // intersect that predicate mean the serial order
      // (append -> this op) would have changed this op's outcome;
      // committing anyway silently un-deletes / co-mingles the racer's
      // rows. Checked against the fresh head on every rebase attempt.
      for (fn <- conflictIfAdded; bs <- base) {
        val hit = fn(bs.files)
        if (hit.nonEmpty) {
          abortCleanup()
          throw new java.util.ConcurrentModificationException(
            "TxLog: file(s) intersecting this operation's read " +
              "predicate were added by a concurrent commit: " +
              hit.take(3).mkString(", ") + " — re-read and retry")
        }
      }
      // an append must fit the table schema; with mergeSchema it may
      // WIDEN it (new columns append; shared names must keep their
      // type — Delta's mergeSchema contract), recomputed against the
      // fresh head on every rebase attempt
      var evolvedSchema: Option[String] = None
      var evolvedMapping: Option[Map[String, String]] = None
      if (op == "append") base.foreach { bs =>
        if (schemaKey(bs.schemaJson) != schemaKey(schemaJson)) {
          if (!mergeSchema) {
            abortCleanup()
            throw new IllegalArgumentException(
              s"TxLog: append schema does not match table schema at $dir" +
                " (pass mergeSchema = true to widen)")
          }
          val baseT = DataType.fromJson(bs.schemaJson)
            .asInstanceOf[StructType]
          val newT = DataType.fromJson(schemaJson).asInstanceOf[StructType]
          val baseM = baseT.fields.map(fl => fl.name -> fl.dataType).toMap
          val conflicts = newT.fields.filter(fl =>
            baseM.get(fl.name).exists(_ != fl.dataType))
          if (conflicts.nonEmpty) {
            abortCleanup()
            throw new IllegalArgumentException(
              s"TxLog: mergeSchema cannot change column types: " +
                conflicts.map(_.name).mkString(", "))
          }
          val newFields = newT.fields.filterNot(fl => baseM.contains(fl.name))
          // column-mapping safety across the stage→commit window: a
          // field that is new NOW but existed when the caller STAGED
          // means a concurrent DROP — our files carry its old
          // physical column, and widening it back would resurrect
          // the dropped data in every old file. Conflict, don't merge.
          stagedFields.foreach { sf =>
            val dropped = newFields.filter(fl => sf.contains(fl.name))
            if (dropped.nonEmpty) {
              abortCleanup()
              throw new java.util.ConcurrentModificationException(
                s"TxLog: column(s) ${dropped.map(_.name).mkString(", ")} " +
                  "dropped by a concurrent commit")
            }
          }
          // a new field whose physical name the head has since
          // reserved (concurrent rename/drop) cannot land as staged
          val reserved = bs.reservedPhys
          val clash = newFields.filter { fl =>
            val phys = freshPhys.getOrElse(fl.name, fl.name)
            reserved.contains(phys) && !freshPhys.contains(fl.name)
          }
          if (clash.nonEmpty) {
            abortCleanup()
            throw new java.util.ConcurrentModificationException(
              s"TxLog: physical name(s) ${clash.map(_.name).mkString(", ")} " +
                "reserved by a concurrent schema change")
          }
          val widened = StructType(baseT.fields ++ newFields)
          evolvedSchema = Some(widened.json)
          val addMap = newFields.flatMap(fl =>
            freshPhys.get(fl.name).map(fl.name -> _)).toMap
          if (addMap.nonEmpty || bs.mapping.nonEmpty)
            evolvedMapping = Some(bs.mapping ++ addMap)
        }
      }
      val removeNow =
        if (removeAll) base.map(_.files.map(_.path)).getOrElse(Nil)
        else remove
      if (!removeAll && remove.nonEmpty) {
        val live = base.map(_.files.map(_.path).toSet).getOrElse(Set.empty)
        val gone = remove.filterNot(live)
        if (gone.nonEmpty) {
          abortCleanup()
          throw new java.util.ConcurrentModificationException(
            s"TxLog: files removed by a concurrent commit: " +
              gone.take(3).mkString(", "))
        }
      }
      // merge-on-read DML re-adds the SAME path, so path liveness
      // alone cannot see a concurrent vector change on a touched
      // file — a lost-update window CoW never has (its removes fail
      // the liveness check). The caller pins the vector pointer it
      // computed from; a head whose pointer moved conflicts.
      if (expectDv.nonEmpty) {
        val cur = base.map(_.files.map(fl => fl.path -> fl.dv).toMap)
          .getOrElse(Map.empty)
        val moved = expectDv.collect {
          case (p, d) if cur.get(p).exists(_ != d) => p
        }
        if (moved.nonEmpty) {
          abortCleanup()
          throw new java.util.ConcurrentModificationException(
            s"TxLog: deletion vector changed by a concurrent commit " +
              s"on: ${moved.take(3).mkString(", ")}")
        }
      }
      // identity watermark race: the caller BAKED generated values
      // into the staged files off the watermark it read — if a
      // concurrent commit moved it, those values may collide with
      // the other writer's. Conflict loudly (the caller re-reads,
      // re-generates and retries); a plain metadata rebase cannot
      // repair data already written.
      if (expectIdentity.nonEmpty) {
        val cur = base.map(_.identity).getOrElse(Map.empty)
        // a column not yet declared at the head compares as an empty
        // watermark — a concurrent DECLARATION with generated values
        // lands as Some(high) and still conflicts
        val moved = expectIdentity.collect {
          case (c, h) if cur.get(c).flatMap(_.high) != h => c
        }
        if (moved.nonEmpty) {
          abortCleanup()
          throw new java.util.ConcurrentModificationException(
            s"TxLog: identity watermark for ${moved.mkString(", ")} " +
              "moved by a concurrent commit — regenerate and retry")
        }
      }
      val v = base.map(_.version + 1).getOrElse(0L)
      // schema is recorded when it (re)defines the table; appends
      // inherit, except a widening merge which records the new union
      val schemaOut =
        if (removeAll || base.isEmpty) Some(schemaJson) else evolvedSchema
      // column-mapping state rides the commit when the caller set it
      // (rename/drop/restore/overwrite-reset) or a widening merge
      // assigned fresh physical names
      val ddlOut: Option[(Map[String, String], Seq[String])] =
        ddlState.orElse(evolvedMapping.map(m =>
          (m, base.map(_.retired).getOrElse(Nil))))
      // declaring/advancing identity or generated columns requires
      // generation 4 readers
      val mrOut =
        if (identityOut.exists(_.nonEmpty) ||
            generatedOut.exists(_.nonEmpty))
          Some(math.max(4, minReader.getOrElse(1)))
        else minReader
      if (tryWrite(f, versionFile(dir, v),
          renderCommit(v, op, added, removeNow, schemaOut, txn, ddlOut,
            mrOut, constraints = constraintsOut,
            identity = identityOut, generated = generatedOut,
            defaults = defaultsOut, txnsMulti = txnsMulti,
            ts = nextCommitTs(f, dir, v)))) {
        if (v > 0 && v % CheckpointInterval == 0)
          writeCheckpoint(spark, dir, v)
        return v
      }
      attempt += 1 // lost the slot: rebase on the new head and retry
      if (attempt >= MaxAttempts) {
        abortCleanup()
        throw new java.io.IOException(
          s"TxLog: gave up after $MaxAttempts contended commit attempts")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Register a pre-existing PLAIN-parquet dataset's files in a new
    * log IN PLACE (Delta's CONVERT TO DELTA): list the data files,
    * stat rows (and `statsCols` min/max) in one scan, commit them as
    * version 0 — no data is rewritten, and from then on logged
    * commits/vacuum treat the historical files as live table state.
    * The missing-migration failure mode this prevents: claiming v0
    * with only a new batch's files would make logged reads drop the
    * pre-existing rows and vacuum DELETE them as non-live. No-op
    * (returns current head) if the dir is already logged. FLAT
    * layouts only: a directory-partitioned plain dataset (nested
    * part files) refuses loudly ("nothing to convert") rather than
    * registering a partial file set — repartition it flat, or
    * overwrite through the log, to migrate. */
  def convertInPlace(spark: SparkSession, dir: String,
      statsCols: Seq[String] = Nil): Long = {
    if (isLogged(spark, dir)) return snapshot(spark, dir).version
    val root = new Path(dir)
    val f = fs(spark, root)
    // enumerate the WHOLE tree: a flat dataset registers its
    // top-level files; a hive-partitioned (key=value) layout
    // registers every nested file by its dir-relative path, with the
    // partition values recovered at read time from the path
    // (generation-5 readers) and recorded as per-file stats so
    // partition predicates prune from the log
    val rootAbs = f.makeQualified(root).toString
    def relOfAbs(abs: String): String = {
      require(abs.startsWith(rootAbs + "/"),
        s"TxLog: $abs escapes the dataset root $rootAbs")
      abs.drop(rootAbs.length + 1)
    }
    def relOf(p: Path): String = relOfAbs(f.makeQualified(p).toString)
    // the LISTING is the only step whose cost scales with layout
    // shape rather than data size: one driver-side recursive iterator
    // over a 10⁶-file hive tree on object storage is hours. Past a
    // top-level-directory threshold the walk DISTRIBUTES — one task
    // per partition directory (the Delta CONVERT design); below it
    // the single driver iterator is cheaper than a job launch.
    val all = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long)] // (relative path, bytes)
    val top = f.listStatus(root)
    val subdirs = top.filter(_.isDirectory).map(_.getPath)
      .filterNot { p =>
        p.getName.startsWith("_") || p.getName.startsWith(".") }
    if (subdirs.length <= ConvertListDirsThreshold) {
      val it = f.listFiles(root, true)
      while (it.hasNext) {
        val st = it.next()
        val rel = relOf(st.getPath)
        val segs = rel.split('/')
        val hidden = segs.exists(sg =>
          sg.startsWith("_") || sg.startsWith("."))
        if (st.isFile && !hidden) all += ((rel, st.getLen))
      }
    } else {
      // root-level files still list on the driver (one page)
      top.filter(_.isFile).foreach { st =>
        val n = st.getPath.getName
        if (!n.startsWith("_") && !n.startsWith("."))
          all += ((relOf(st.getPath), st.getLen))
      }
      val hconf = spark.sessionState.newHadoopConf()
      val confMap = {
        val it = hconf.iterator()
        val b = scala.collection.mutable.ArrayBuffer
          .empty[(String, String)]
        while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue)) }
        b.toSeq
      }
      val dirStrs = subdirs.map(d => f.makeQualified(d).toString).toSeq
      val listed = spark.sparkContext
        .parallelize(dirStrs, math.min(dirStrs.length, 256))
        .flatMap { d =>
          val conf = new org.apache.hadoop.conf.Configuration(false)
          confMap.foreach { case (k, v) => conf.set(k, v) }
          val p = new Path(d)
          val fsx = p.getFileSystem(conf)
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(String, Long)] // (absolute path, bytes)
          val it = fsx.listFiles(p, true)
          while (it.hasNext) {
            val st = it.next()
            if (st.isFile)
              out += ((fsx.makeQualified(st.getPath).toString,
                st.getLen))
          }
          out
        }.collect()
      listed.foreach { case (abs, len) =>
        val rel = relOfAbs(abs)
        val hidden = rel.split('/').exists(sg =>
          sg.startsWith("_") || sg.startsWith("."))
        if (!hidden) all += ((rel, len))
      }
    }
    val dataFiles = all.map(_._1).sorted.toSeq
    val lenOf = all.toMap
    require(dataFiles.nonEmpty, s"TxLog: nothing to convert under $dir")
    // partition column sequence from the directory segments — must be
    // CONSISTENT across every file (a mixed flat/partitioned or
    // ragged layout cannot be registered faithfully)
    def partsOf(rel: String): Seq[String] =
      rel.split('/').dropRight(1).toSeq.map { sg =>
        val i = sg.indexOf('=')
        require(i > 0,
          s"TxLog: $dir nests data under non-hive directory '$sg' — " +
            "only key=value layouts register in place; rewrite flat " +
            "first")
        sg.take(i)
      }
    val pcols = partsOf(dataFiles.head)
    val ragged = dataFiles.filter(p => partsOf(p) != pcols)
    require(ragged.isEmpty,
      s"TxLog: inconsistent partition layout under $dir (" +
        s"${ragged.take(2).mkString(", ")}…) — every file must sit " +
        s"under the same ${pcols.mkString("/")} structure")
    // base names may repeat across partition dirs (Spark's own
    // partitionBy writes do) — a registered table therefore keys its
    // files by dir-relative PATH, not base name ([[fileKey]]), and
    // the stats scan below matches files by their last
    // pcols.size + 1 path segments (URI-decoded: input_file_name
    // percent-escapes what the directory listing returns raw)
    val df = spark.read.parquet(dir)
    val dtypes = df.schema.fields
      .map(fl => fl.name -> fl.dataType.catalogString).toMap
    statsCols.foreach(c => require(dtypes.contains(c),
      s"TxLog: no column '$c' to stat in convert of $dir"))
    pcols.foreach(c => require(dtypes.contains(c),
      s"TxLog: partition dir '$c=' is not a column of $dir"))
    // one scan stats data AND partition columns (a partition value is
    // constant per file, so its min = max = the path value)
    val statAll = (statsCols ++ pcols).distinct
    val depth = pcols.size + 1
    def relKey(fullPath: String): String = {
      val path = try new java.net.URI(fullPath).getPath
      catch { case _: java.net.URISyntaxException => fullPath }
      path.split('/').takeRight(depth).mkString("/")
    }
    val byName = df.groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("n"), statAggExprs(statAll, dtypes): _*)
      .collect()
      .map { r =>
        relKey(r.getString(0)) ->
          (r.getLong(1), statsOfRow(r, statAll, dtypes))
      }.toMap
    val added = dataFiles.map { p =>
      // same contract as staging: a file absent from the stats scan
      // must be a GENUINE empty (0-row parquet), corroborated by a
      // direct count — silently registering rows = 0 would map a live
      // file to an all-NULL partition value and mis-prune its rows
      val (rows, stats) =
        byName.get(p).getOrElse {
          val n = spark.read.schema(df.schema)
            .parquet(s"$dir/$p").count()
          if (n != 0L) throw new IllegalStateException(
            s"TxLog: convert of $dir: file $p holds $n rows but " +
              "matched no stats row (relKey drift) — refusing to " +
              "register it with empty stats")
          (0L, Map.empty[String, ColStats])
        }
      TxFile(p, rows, stats, bytes = lenOf.get(p))
    }.toSeq
    // claim version 0 directly (NOT via commitStaged: its contention
    // cleanup deletes `added`, which here are the REAL data files). A
    // lost claim means another writer logged the dir first — theirs is
    // the table now.
    val lf = fs(spark, logPath(dir))
    if (tryWrite(lf, versionFile(dir, 0L),
        renderCommit(0L, "overwrite", added, Nil, Some(df.schema.json),
          None,
          minReader = Some(5).filter(_ => pcols.nonEmpty),
          partitionCols = Some(pcols).filter(_.nonEmpty))))
      0L
    else snapshot(spark, dir).version
  }

  /** Transactionally replace the table contents with `df`. Creates the
    * table (version 0) if no log exists. May change the schema.
    * `statsCols` records per-file min/max in the commit for
    * [[readPruned]] file skipping. */
  def commitOverwrite(spark: SparkSession, dir: String,
      df: DataFrame, statsCols: Seq[String] = Nil,
      txn: Option[(String, Long)] = None,
      identity: Map[String, IdentitySpec] = Map.empty,
      generated: Map[String, String] = Map.empty,
      defaults: Map[String, String] = Map.empty,
      columnOrder: Option[Seq[String]] = None): Long = {
    // fast path: skip staging entirely for an already-seen batch
    // (Complete-mode streaming sinks replay overwrites too)
    val snap0 = if (isLogged(spark, dir)) Some(snapshot(spark, dir)) else None
    for (s0 <- snap0; (app, b) <- txn)
      if (s0.txns.get(app).exists(_ >= b)) return s0.version
    // `identity` DECLARES identity columns with the new table
    // definition (Delta's create-time form); a standing declaration
    // carries through an overwrite with its watermark intact (an
    // overwrite replaces ROWS — generated ids never recycle).
    // Redeclaring a standing identity column is refused: watermark
    // semantics would be ambiguous — dropIdentity first.
    val standing = snap0.map(_.identity).getOrElse(Map.empty)
    val redeclared = identity.keys.filter(standing.contains)
    require(redeclared.isEmpty,
      s"TxLog: column(s) ${redeclared.mkString(", ")} already carry " +
        "an identity declaration — dropIdentity first")
    val idMap = standing ++ identity
    // `generated` DECLARES expression-generated columns with the new
    // table definition; standing declarations carry like identity.
    // A declared column ABSENT from df is computed here (the
    // expression defines it); present columns validate.
    val standingGen = snap0.map(_.generated).getOrElse(Map.empty)
    val regen = generated.keys.filter(standingGen.contains)
    require(regen.isEmpty,
      s"TxLog: column(s) ${regen.mkString(", ")} already carry a " +
        "generation expression — dropGenerated first")
    val genMap = standingGen ++ generated
    generated.foreach { case (c, e) =>
      validateGeneratedDecl(spark, df.columns.toSet ++ generated.keys,
        c, e, genMap - c, idMap.keySet)
    }
    // `defaults` declares creation-time column DEFAULTs; standing
    // declarations carry. A declared column absent from df fills here
    val standingDef = snap0.map(_.defaults).getOrElse(Map.empty)
    val defMap = standingDef ++ defaults
    defaults.foreach { case (c, e) =>
      require(!genMap.contains(c) && !idMap.contains(c),
        s"TxLog: '$c' cannot carry a DEFAULT and a generation rule")
      val refs = exprRefs(spark, e)
      require(refs.isEmpty,
        s"TxLog: DEFAULT for '$c' references column(s) " +
          s"${refs.mkString(", ")} — defaults must be literal-foldable")
    }
    val dfDef =
      if (defMap.isEmpty) df else applyDefaultCols(df, defMap, None)
    // one probe job covers every writer-defined column the batch
    // carries (defaults only ADD columns, so counts taken here hold
    // for the generated step's output too)
    val probe = supplyProbe(dfDef, genMap, idMap)
    val dfGen =
      if (genMap.isEmpty) dfDef
      else applyGeneratedCols(dfDef, genMap, None, probe)
    val (dfId0, expectId) =
      if (idMap.isEmpty) (dfGen, Map.empty[String, Option[Long]])
      else applyIdentityCols(dfGen, idMap, probe)
    // `columnOrder` pins the committed schema's column order (the
    // catalog's inline-spec create: writer-defined identity/generated
    // columns land wherever the user DECLARED them, not appended)
    val dfId = columnOrder.fold(dfId0) { order =>
      require(order.sorted == dfId0.columns.toSeq.sorted,
        s"TxLog: columnOrder ${order.mkString(",")} must name exactly " +
          s"the written columns ${dfId0.columns.mkString(",")}")
      dfId0.select(order.map(col): _*)
    }
    enforceConstraints(spark, dir, dfId)
    val (added, schemaJson) =
      stageData(spark, dir, dfId, (statsCols ++ idMap.keys).distinct,
        // partitionCols survive an overwrite (only registration sets
        // them), so the replacement data stays partition-pure too
        partCols = snap0.map(_.partitionCols).getOrElse(Nil))
    // an overwrite REDEFINES the table: the new files are written
    // under identity physical names, so any column mapping (and its
    // retired-name reservations) resets with the schema
    commitStaged(spark, dir, "overwrite", added, Nil, removeAll = true,
      schemaJson, txn, ddlState = Some((Map.empty, Nil)),
      identityOut = if (idMap.isEmpty) None
        else Some(identityAfter(idMap, added, c => c)),
      expectIdentity = expectId,
      generatedOut = Some(genMap).filter(_.nonEmpty),
      defaultsOut = Some(defMap).filter(_.nonEmpty))
  }

  /** Transactionally append `df`. Schema must match the table's —
    * or, with `mergeSchema = true`, may WIDEN it: new columns join
    * the table schema (older files read them as null), shared names
    * must keep their type (Delta's mergeSchema contract). `txn =
    * Some((appId, batchId))` makes the append idempotent: a batchId
    * already recorded for appId is skipped (replay-safe). */
  def commitAppend(spark: SparkSession, dir: String, df: DataFrame,
      txn: Option[(String, Long)] = None,
      statsCols: Seq[String] = Nil,
      mergeSchema: Boolean = false,
      txnsMulti: Seq[(String, Long)] = Nil): Long = {
    val snap0 = if (isLogged(spark, dir)) Some(snapshot(spark, dir)) else None
    // fast path: skip staging entirely for an already-seen batch
    for (s0 <- snap0; (app, b) <- txn)
      if (s0.txns.get(app).exists(_ >= b)) return s0.version
    // generated + identity columns: compute/validate what the batch
    // omits/supplies, align the filled frame back to the table's
    // column order (the append schema check is order-sensitive)
    val idMap = snap0.map(_.identity).getOrElse(Map.empty)
    val genMap = snap0.map(_.generated).getOrElse(Map.empty)
    val defMap = snap0.map(_.defaults).getOrElse(Map.empty)
    val declared0 = snap0.map(s0 => DataType.fromJson(s0.schemaJson)
      .asInstanceOf[StructType])
    val dfDef =
      if (defMap.isEmpty) df
      else applyDefaultCols(df, defMap, declared0)
    val probe = supplyProbe(dfDef, genMap, idMap)
    val dfGen =
      if (genMap.isEmpty) dfDef
      else applyGeneratedCols(dfDef, genMap, declared0, probe)
    val (dfFilled, expectId) =
      if (idMap.isEmpty) (dfGen, Map.empty[String, Option[Long]])
      else applyIdentityCols(dfGen, idMap, probe)
    val dfId = snap0 match {
      case Some(s0)
        if idMap.nonEmpty || genMap.nonEmpty || defMap.nonEmpty =>
        val order = DataType.fromJson(s0.schemaJson)
          .asInstanceOf[StructType].fieldNames
          .filter(dfFilled.columns.contains) ++
          dfFilled.columns.filterNot(
            DataType.fromJson(s0.schemaJson).asInstanceOf[StructType]
              .fieldNames.contains)
        dfFilled.select(order.map(col).toSeq: _*)
      case _ => dfFilled
    }
    enforceConstraints(spark, dir, dfId)
    // stage under the table's column mapping; brand-new columns
    // (mergeSchema) claim their own name unless a dropped/renamed
    // column retired it — then a FRESH physical name, or old files'
    // orphaned data would resurrect into the re-added column
    val mapping = snap0.map(_.mapping).getOrElse(Map.empty)
    val baseFields = snap0.map(s0 => DataType.fromJson(s0.schemaJson)
      .asInstanceOf[StructType].fieldNames.toSet)
    val reserved = snap0.map(_.reservedPhys).getOrElse(Set.empty)
    val freshPhys = baseFields match {
      case None => Map.empty[String, String]
      case Some(bf) => dfId.schema.fieldNames
        .filterNot(bf).filter(reserved.contains)
        .map(n => n -> s"${n}_${UUID.randomUUID().toString.take(8)}")
        .toMap
    }
    // stats continuity: every append ALSO records min/max for the
    // columns the table already tracks, even when this writer passed
    // no statsCols — otherwise one stats-less append (a) degrades
    // file pruning forever and (b) turns the write-serializable
    // conflict guard maximally conservative, refusing EVERY concurrent
    // predicate DML against the fresh file (spurious-refusal livelock
    // on a busy table)
    val statsAll = snap0.map(s0 =>
      inheritStatsFor(dfId, s0.files, statsCols, s0))
      .getOrElse(statsCols)
    val (added, schemaJson) =
      stageData(spark, dir, dfId, (statsAll ++ idMap.keys).distinct,
        mapping ++ freshPhys,
        // partition-PURE staging keeps the planner's partitioned
        // presentation (static+dynamic pruning) alive across appends
        partCols = snap0.map(_.partitionCols).getOrElse(Nil))
    commitStaged(spark, dir, "append", added, Nil, removeAll = false,
      schemaJson, txn, mergeSchema,
      freshPhys = freshPhys, stagedFields = baseFields,
      identityOut = if (idMap.isEmpty) None
        else Some(identityAfter(idMap, added,
          c => (mapping ++ freshPhys).getOrElse(c, c))),
      expectIdentity = expectId,
      txnsMulti = txnsMulti)
  }

  /** [[copyInto]]'s outcome: how many source files loaded / were
    * already ingested, the row count landed, and the commit version
    * (unchanged head when nothing was fresh). */
  final case class CopyIntoResult(filesLoaded: Long, filesSkipped: Long,
      rowsInserted: Long, version: Long)

  /** COPY INTO (Delta's idempotent batch file ingest): append the
    * source files matching `src`/`pattern` to a logged table,
    * recording each ingested file as (`copyinto:<path>` → mtime,
    * `copyintosz:<path>` → length) markers in the SAME commit — so a
    * RERUN of the statement skips everything already loaded and
    * picks up only new files. Retry-safe ingest without a streaming
    * checkpoint: the marker set and the rows are one atomic commit,
    * so a crashed run never half-counts a file. A source file
    * REWRITTEN since its ingest loads again — detected by mtime
    * advance OR byte-length change, so a rewrite inside the same
    * filesystem timestamp tick (coarse-mtime stores) still
    * re-ingests when its size moved; `force` reloads every match
    * (Delta's force copy option — duplicates by design). Concurrent
    * COPY INTO over intersecting file sets cannot double-load: the
    * commit refuses when a fresh marker already exists at the head
    * (rerun ingests the remainder). Markers from before the length
    * field compare by mtime alone (never a spurious reload).
    *
    * CSV/JSON parse under the table's declared column types
    * (writer-defined identity/generated columns excluded — they
    * generate at append); parquet reads natively and casts by name.
    * Source columns outside the table schema refuse loudly; table
    * columns ABSENT from the source fill with their declared DEFAULT
    * when one exists, else typed NULL (the Delta COPY INTO shape) —
    * a missing NON-nullable column without a default refuses with a
    * COPY INTO error naming it, not the append-schema error.
    *
    * Scale: the listing is one driver glob (metadata-sized), the read
    * is a plain distributed scan of ONLY the fresh files, and the
    * marker state is KB per file in the log — the same shape as the
    * streaming sink's txn markers. */
  def copyInto(spark: SparkSession, dir: String, src: String,
      format: String = "parquet", pattern: Option[String] = None,
      options: Map[String, String] = Map.empty,
      force: Boolean = false): CopyIntoResult = {
    require(isLogged(spark, dir),
      s"TxLog: COPY INTO target $dir is not a logged txlog table")
    val snap = snapshot(spark, dir)
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val glob = new org.apache.hadoop.fs.Path(src, pattern.getOrElse("*"))
    val fsys = glob.getFileSystem(spark.sessionState.newHadoopConf())
    val listed = Option(fsys.globStatus(glob)).getOrElse(Array.empty)
      .filter(st => st.isFile && {
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
      .map(st => (st.getPath.toString, st.getModificationTime,
        st.getLen))
      .sortBy(_._1).toSeq
    def upToDate(p: String, mt: Long, len: Long): Boolean =
      snap.txns.get(s"copyinto:$p").exists(_ >= mt) &&
        snap.txns.get(s"copyintosz:$p").forall(_ == len)
    val fresh =
      if (force) listed
      else listed.filterNot { case (p, mt, len) => upToDate(p, mt, len) }
    if (fresh.isEmpty)
      return CopyIntoResult(0L, listed.length.toLong, 0L, snap.version)
    val readSchema = StructType(schema.fields.filterNot(f =>
      snap.identity.contains(f.name) || snap.generated.contains(f.name)))
    // CSV with an explicit schema maps POSITIONALLY — a source file
    // carrying extra columns (e.g. the table's writer-defined
    // identity column) would silently shift every value one slot.
    // With a header, enforceSchema=false makes Spark VALIDATE the
    // header names against the schema instead (loud mismatch);
    // headerless CSV is positional by definition and stays so.
    val opts =
      if (format.equalsIgnoreCase("csv") &&
          options.get("header").exists(_.equalsIgnoreCase("true")) &&
          !options.contains("enforceSchema"))
        options + ("enforceSchema" -> "false")
      else options
    val reader = spark.read.format(format).options(opts)
    val df0 =
      if (format.equalsIgnoreCase("parquet")) reader.load(fresh.map(_._1): _*)
      else reader.schema(readSchema).load(fresh.map(_._1): _*)
    val extra = df0.columns.filterNot(schema.fieldNames.contains)
    require(extra.isEmpty,
      s"TxLog: COPY INTO source column(s) ${extra.mkString(", ")} are " +
        s"not columns of $dir")
    // absent table columns fill with their declared DEFAULT (else
    // typed NULL); identity/generated stay excluded — they generate
    // at append. A missing NON-nullable column without a default
    // refuses HERE, by name — the generic append-schema error advises
    // mergeSchema, which the COPY INTO SQL surface cannot express.
    val missingHard = schema.fields.filterNot(f =>
      df0.columns.contains(f.name) || snap.identity.contains(f.name) ||
        snap.generated.contains(f.name) || f.nullable ||
        snap.defaults.contains(f.name))
    require(missingHard.isEmpty,
      s"TxLog: COPY INTO source is missing non-nullable column(s) " +
        s"${missingHard.map(_.name).mkString(", ")} of $dir " +
        "(no declared default to fill them)")
    val casted = df0.select(schema.fields.toSeq
      .filter(f => df0.columns.contains(f.name) ||
        (!snap.identity.contains(f.name) &&
          !snap.generated.contains(f.name)))
      .map { f =>
        if (df0.columns.contains(f.name))
          col(f.name).cast(f.dataType).as(f.name)
        else snap.defaults.get(f.name)
          .map(d => expr(d).cast(f.dataType).as(f.name))
          .getOrElse(lit(null).cast(f.dataType).as(f.name))
      }: _*)
    // markers only for files not already recorded at this
    // (mtime, length): a FORCE reload of an already-marked unchanged
    // file re-appends its rows but must not re-commit the marker
    // (the dup check would read it as a concurrent copy); genuinely
    // new/updated files mark as usual
    val markers = fresh.collect {
      case (p, mt, len) if !upToDate(p, mt, len) =>
        Seq((s"copyinto:$p", mt), (s"copyintosz:$p", len))
    }.flatten
    val v = commitAppend(spark, dir, casted, txnsMulti = markers)
    val prev = snapshot(spark, dir, Some(v - 1)).files.map(_.path).toSet
    val rows = snapshot(spark, dir, Some(v)).files
      .filterNot(f => prev.contains(f.path)).map(_.rows).sum
    CopyIntoResult(fresh.length.toLong,
      (listed.length - fresh.length).toLong, rows, v)
  }

  /** Rewrite the current live files into `targetFiles` files (small-file
    * compaction) as one commit: remove exactly the files read, add the
    * rewrite. Concurrent appends commute (their files survive the
    * rebase); a concurrent commit that removed one of the same files
    * raises ConcurrentModificationException.
    *
    * `zorderBy` makes this the OPTIMIZE-with-clustering maintenance
    * form (Delta's `OPTIMIZE … ZORDER BY`): the rewrite is laid out
    * by the clustering key before the write, so each new file covers
    * a tight min/max envelope on the key column(s) and
    * [[readPruned]]'s stats-in-log skipping improves after
    * maintenance — the same data, the same commit shape, better
    * pruning. One column range-partitions + sorts on it; two columns
    * interleave through [[graft.operators.ZOrder.layoutByZ]] (Morton
    * order — files get tight boxes in BOTH dimensions, so predicates
    * on EITHER column prune). Clustering columns are always recorded
    * in the per-file stats (unioned into `statsCols`) — an OPTIMIZE
    * whose layout the reader can't see would be maintenance theater.
    * Cost: one range-partitioned shuffle of the LIVE data (the same
    * cost every compaction already pays) — log metadata stays
    * KB-sized regardless of table size. */
  def compact(spark: SparkSession, dir: String, targetFiles: Int,
      statsCols: Seq[String] = Nil,
      zorderBy: Seq[String] = Nil,
      where: Option[org.apache.spark.sql.Column] = None,
      purify: Boolean = false): Long = {
    val snap = snapshot(spark, dir)
    // `where` is Delta's `OPTIMIZE … WHERE`: compact ONLY the files
    // whose recorded stats can intersect the predicate (whole files —
    // file granularity is the unit of maintenance). On a 100 TB
    // table this turns "optimize yesterday's ingest" from a corpus
    // rewrite into a partition-sized one.
    val scope = where match {
      case None => snap.files
      case Some(pred) =>
        val schema =
          DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
        pruneForPredicate(spark, schema, snap.files, pred, snap.mapping)
    }
    // a scoped OPTIMIZE whose predicate matches no files is a no-op —
    // never an empty commit. (An UNscoped compact always rewrites:
    // it is an explicit relayout command, and a single-file rewrite
    // still has work to do — folding vectors, flattening a
    // registered partition layout, applying zorder.)
    if (where.isDefined && scope.isEmpty) return snap.version
    val base = readSnapshot(spark, dir, snap.copy(files = scope))
    // PURIFY mode (`OPTIMIZE` that keeps the planner presentation):
    // on a partitioned table, the flat rewrite below merges files
    // ACROSS partition values — min ≠ max on the partition columns,
    // so routine maintenance used to silently demote the table off
    // the [[TxFileIndex]] partitioned presentation, costing every
    // later read its static AND dynamic partition pruning. Purify
    // compacts WITHIN partition values instead: the rewrite stages
    // through the same partition-pure form as appends
    // ([[stageBodyPartitioned]]), `targetFiles` becomes a
    // max-records-per-file bound (total live rows / targetFiles) so
    // one giant partition splits into several pure files, and
    // `zorderBy` clusters rows inside each partition (single column:
    // plain sort; multi: Morton interleave) — per-file stat
    // envelopes tighten on the key without ever mixing partition
    // values. The FLAT form stays the default: it is the
    // clone-enabling contract (one file set, no layout) and the
    // right shape for unpartitioned tables, where purify degrades to
    // it harmlessly.
    val doPurify = purify && snap.partitionCols.nonEmpty
    val df =
      if (doPurify) base
      else zorderBy match {
        case Nil => base.repartition(targetFiles)
        case Seq(c) =>
          base.repartitionByRange(targetFiles, col(c))
            .sortWithinPartitions(col(c))
        case more =>
          // N-column Morton layout; narrower bit budgets for wider keys
          // so the interleave still fits a long
          graft.operators.ZOrder
            .layoutByZN(base, more.map(col), targetFiles,
              bits = math.min(16, 63 / more.size))
            .drop("zv")
      }
    val sortPhys =
      if (!doPurify) Nil
      else zorderBy match {
        case Nil => Nil
        case Seq(c) => Seq(col(snap.phys(c)))
        case more => Seq(graft.operators.ZOrder.zValueN(
          more.map(c => col(snap.phys(c))),
          bits = math.min(16, 63 / more.size)))
      }
    // PURIFY file sizing — BYTES, not rows (the Delta binpack shape):
    // the implied byte target is scope live bytes / targetFiles, and
    // each partition value gets round(its live bytes / target) write
    // tasks via the staged per-value fan-out — a partition of
    // 10×-wider rows splits into 10× more files of the SAME byte
    // size, where the old global rows bound made its files 10×
    // bigger. Per-file live bytes are dv-scaled commit metadata
    // (zero extra passes). Falls back to the rows bound when any
    // scoped file lacks recorded bytes or a recoverable value
    // (legacy entries; repairing a previously-flattened layout).
    def liveB(f2: TxFile): Option[Long] = f2.bytes.map { b =>
      if (f2.dvRows > 0L && f2.rows > 0L)
        math.max(1L, (b.toDouble *
          math.max(0L, f2.rows - f2.dvRows) / f2.rows).toLong)
      else b
    }
    // the same canonical key [[valueKeyExpr]] computes per row
    def valueKeyOf(f2: TxFile): Option[String] = {
      val parts = snap.partitionCols.map { pc =>
        f2.stats.get(pc) match {
          case _ if f2.rows == 0L => Some("\u0000null")
          case Some(st) if st.nulls.contains(f2.rows) =>
            Some("\u0000null")
          case Some(st) if st.min.isDefined && st.min == st.max &&
              st.nulls.contains(0L) => st.min
          case _ => None
        }
      }
      if (parts.exists(_.isEmpty)) None
      else Some(parts.map(_.get).mkString("\u0001"))
    }
    // ZORDER purify keeps the ROWS-bound form (maxRecordsPerFile over
    // the range-partitioned sorted stage — stageBodyPartitioned
    // repartitionByRange's the clustering key, so parallel tasks still
    // produce consecutive, tight-envelope chunks): the per-value hash
    // salt of the byte path would scatter the sorted run across tasks
    // — every file's min/max envelope then spans the whole key range
    // and the clustering buys nothing. (Byte-sizing a zordered purify
    // would need per-value range bucketing on the key — a quantile
    // pass; rows stay the honest proxy there.)
    val (valueTasks, maxRec) =
      if (!doPurify || sortPhys.nonEmpty) (Map.empty[String, Int],
        if (!doPurify) None
        else {
          val live = scope.map(f => math.max(0L, f.rows - f.dvRows)).sum
          Some(math.max(1L, math.ceil(
            live.toDouble / math.max(1, targetFiles)).toLong))
        })
      else {
        val keyed = scope.map(f2 => (valueKeyOf(f2), liveB(f2)))
        if (scope.nonEmpty &&
            keyed.forall(t => t._1.isDefined && t._2.isDefined)) {
          val total = keyed.flatMap(_._2).sum
          val target = math.max(1L, total / math.max(1, targetFiles))
          // n_v ≤ round(total/target) = targetFiles by construction —
          // the dense-pid shuffle sizes its OWN partition count, so
          // no numShufflePartitions cap applies here
          val m = keyed.groupBy(_._1.get).map { case (k, fs) =>
            val b = fs.flatMap(_._2).sum
            k -> math.max(1, math.round(b.toDouble / target).toInt)
          }
          (m, None)
        } else {
          val live = scope.map(f => math.max(0L, f.rows - f.dvRows)).sum
          (Map.empty[String, Int], Some(math.max(1L,
            math.ceil(live.toDouble / math.max(1, targetFiles)).toLong)))
        }
      }
    // carry the scoped files' skip-stats through the rewrite (plus
    // whatever the caller asked for) — an OPTIMIZE that silently
    // dropped the table's pruning metadata would degrade every later
    // readPruned
    val (added, schemaJson) =
      stageData(spark, dir, df,
        inheritStats(scope, (statsCols ++ zorderBy).distinct, snap),
        snap.mapping,
        partCols = if (doPurify) snap.partitionCols else Nil,
        sortWithinPhys = sortPhys, maxRecordsPerFile = maxRec,
        valueTasks = valueTasks)
    // a compaction reads its whole scope — pin every scoped vector
    // pointer, or a concurrent merge-on-read DML (same paths stay
    // live) would be silently materialized away
    commitStaged(spark, dir, "compact", added, scope.map(_.path),
      removeAll = false, schemaJson, None,
      expectDv = scope.map(f => f.path -> f.dv).toMap)
  }

  // ---- CHECK constraints -------------------------------------------

  /** Add a table-level CHECK constraint (Delta's `ALTER TABLE … ADD
    * CONSTRAINT`): `exprStr` is a SQL boolean expression over the
    * table's columns; SQL CHECK semantics — a row violates only when
    * the expression is FALSE (null passes). EXISTING rows are
    * validated first (one scan; refused loudly if any violate —
    * Delta's contract), then the full constraint map is recorded in
    * the log as its own commit, so constraints time-travel, survive
    * checkpoints, and bind every later writer. Every subsequent
    * append / overwrite / update / merge validates its batch (one
    * batch-sized scan) and refuses naming the violated constraint —
    * nothing is staged or committed on refusal. */
  def addCheckConstraint(spark: SparkSession, dir: String,
      name: String, exprStr: String): Long = {
    require(name.nonEmpty, "TxLog: constraint needs a name")
    val snap = snapshot(spark, dir)
    val bad = read(spark, dir)
      .filter(expr(exprStr).eqNullSafe(false)).limit(1).count()
    require(bad == 0,
      s"TxLog: cannot add constraint '$name' ($exprStr) — existing " +
        "rows violate it")
    commitConstraints(spark, dir, snap.constraints + (name -> exprStr))
  }

  /** Drop a CHECK constraint by name (unknown names refuse — a typo'd
    * drop that silently "succeeds" leaves the constraint enforcing). */
  def dropCheckConstraint(spark: SparkSession, dir: String,
      name: String): Long = {
    val snap = snapshot(spark, dir)
    require(snap.constraints.contains(name),
      s"TxLog: no constraint '$name' on $dir " +
        s"(active: ${snap.constraints.keys.toSeq.sorted.mkString(", ")})")
    commitConstraints(spark, dir, snap.constraints - name)
  }

  /** Validate `df` against the table's active constraints — ONE scan
    * for the happy path (any-violation check); only on refusal does a
    * second pass name the culprit. No-op on unlogged dirs and
    * constraint-free tables. */
  private def enforceConstraints(spark: SparkSession, dir: String,
      df: DataFrame): Unit = {
    if (!isLogged(spark, dir)) return
    val cs = snapshot(spark, dir).constraints
    if (cs.isEmpty) return
    val anyBad = cs.values.map(e => expr(e).eqNullSafe(false))
      .reduce(_ || _)
    if (df.filter(anyBad).limit(1).count() == 0) return
    val culprit = cs.toSeq.sortBy(_._1).find { case (_, e) =>
      df.filter(expr(e).eqNullSafe(false)).limit(1).count() > 0
    }.map(_._1).getOrElse(cs.keys.head)
    throw new IllegalArgumentException(
      s"TxLog: CHECK constraint '$culprit' (${cs(culprit)}) violated " +
        s"by the batch — nothing was written to $dir")
  }

  /** The constraints commit: no files move, the full new map rides in
    * its own log slot (lost claims rebase like any commit). */
  private def commitConstraints(spark: SparkSession, dir: String,
      all: Map[String, String]): Long = {
    val f = fs(spark, logPath(dir))
    var attempt = 0
    while (attempt < MaxAttempts) {
      val base = snapshot(spark, dir)
      val v = base.version + 1
      val j: JObject =
        ("version" -> v) ~ ("op" -> "constraints") ~
          ("add" -> JArray(Nil)) ~ ("remove" -> JArray(Nil)) ~
          ("constraints" -> all)
      if (tryWrite(f, versionFile(dir, v),
          JsonMethods.compact(JsonMethods.render(j)))) {
        if (v > 0 && v % CheckpointInterval == 0)
          writeCheckpoint(spark, dir, v)
        return v
      }
      attempt += 1
    }
    throw new java.io.IOException(
      s"TxLog: gave up after $MaxAttempts contended constraint commits")
  }

  // ---- identity columns --------------------------------------------

  /** Declare an EXISTING bigint column as an IDENTITY column
    * (`ALTER TABLE … GENERATED { ALWAYS | BY DEFAULT } AS IDENTITY`):
    * from now on, batches that OMIT the column get values generated
    * from the high watermark, which seeds here from the column's
    * CURRENT extrema — answered from per-file stats where they
    * cover ([[minMax]] — a stats-covered table seeds without data
    * I/O). One KB metadata commit; requires generation-4 readers.
    * Delta only allows identity at CREATE; declaring on live data is
    * this form's convenience — [[commitOverwrite]]'s `identity`
    * parameter is the creation-time dual. */
  def setIdentity(spark: SparkSession, dir: String, name: String,
      start: Long = 1L, step: Long = 1L, always: Boolean = true): Long = {
    val snap = snapshot(spark, dir)
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    require(schema.fieldNames.contains(name),
      s"TxLog: identity column '$name' is not a table column")
    require(schema(name).dataType ==
      org.apache.spark.sql.types.LongType,
      s"TxLog: identity column '$name' must be BIGINT, is " +
        schema(name).dataType.simpleString)
    require(!snap.identity.contains(name),
      s"TxLog: '$name' is already an identity column — dropIdentity " +
        "first to redeclare")
    require(!snap.generated.contains(name),
      s"TxLog: '$name' is expression-generated — a column cannot be " +
        "both identity and generated")
    require(!snap.defaults.contains(name),
      s"TxLog: '$name' carries a DEFAULT — a column cannot be both " +
        "identity and defaulted")
    val mm = minMax(spark, dir, Seq(name)).head()
    val hi =
      if (step > 0) Option(mm.getAs[Any](s"max_$name"))
      else Option(mm.getAs[Any](s"min_$name"))
    commitIdentity(spark, dir, snap.identity +
      (name -> IdentitySpec(start, step,
        hi.map(_.asInstanceOf[Long]), always)))
  }

  /** Remove a column's identity property (the data column stays). */
  def dropIdentity(spark: SparkSession, dir: String,
      name: String): Long = {
    val snap = snapshot(spark, dir)
    require(snap.identity.contains(name),
      s"TxLog: '$name' is not an identity column")
    commitIdentity(spark, dir, snap.identity - name)
  }

  /** Recompute every identity watermark from the LIVE data (Delta's
    * `SYNC IDENTITY`) — the repair after GENERATED BY DEFAULT writes
    * landed explicit values through a path that didn't record stats
    * for the column. Extrema come from [[minMax]] (metadata-only
    * where stats cover) and ABSORB into the standing watermark
    * (never backwards — deleted rows don't free their ids). */
  def syncIdentity(spark: SparkSession, dir: String): Long = {
    val snap = snapshot(spark, dir)
    require(snap.identity.nonEmpty,
      s"TxLog: no identity columns declared on $dir")
    val cols = snap.identity.keys.toSeq.sorted
    val mm = minMax(spark, dir, cols).head()
    commitIdentity(spark, dir, snap.identity.map { case (c, s) =>
      val obs =
        if (s.step > 0) Option(mm.getAs[Any](s"max_$c"))
        else Option(mm.getAs[Any](s"min_$c"))
      c -> obs.fold(s)(v => s.absorb(v.asInstanceOf[Long]))
    })
  }

  /** Metadata commit carrying the FULL new identity map (replay-
    * simple, like constraints commits). */
  private def commitIdentity(spark: SparkSession, dir: String,
      all: Map[String, IdentitySpec]): Long = {
    val f = fs(spark, logPath(dir))
    var attempt = 0
    while (attempt < MaxAttempts) {
      val base = snapshot(spark, dir)
      val v = base.version + 1
      val j: JObject =
        ("version" -> v) ~ ("op" -> "identity") ~
          ("ts" -> nextCommitTs(f, dir, v)) ~
          ("add" -> JArray(Nil)) ~ ("remove" -> JArray(Nil)) ~
          ("identity" -> identityJson(all)) ~ ("minReader" -> 4)
      if (tryWrite(f, versionFile(dir, v),
          JsonMethods.compact(JsonMethods.render(j)))) {
        if (v > 0 && v % CheckpointInterval == 0)
          writeCheckpoint(spark, dir, v)
        return v
      }
      attempt += 1
    }
    throw new java.io.IOException(
      s"TxLog: gave up after $MaxAttempts contended identity commits")
  }

  /** Metadata-only commit advancing a txn marker: the "this span was
    * read and netted to NOTHING" stamp. Without it a follower whose
    * feed span holds only compaction / no-op commits would never move
    * its watermark and re-read the same span on every refresh forever
    * (correct results, unbounded repeated work). No files move; lost
    * claims re-check the marker and skip if a racer advanced it. */
  private[graft] def commitTxnAdvance(spark: SparkSession, dir: String,
      txn: (String, Long)): Long = {
    val f = fs(spark, logPath(dir))
    var attempt = 0
    while (attempt < MaxAttempts) {
      val base = snapshot(spark, dir)
      if (base.txns.get(txn._1).exists(_ >= txn._2)) return base.version
      val v = base.version + 1
      if (tryWrite(f, versionFile(dir, v),
          renderCommit(v, "txn", Nil, Nil, None, Some(txn),
            ts = nextCommitTs(f, dir, v)))) {
        if (v > 0 && v % CheckpointInterval == 0)
          writeCheckpoint(spark, dir, v)
        return v
      }
      attempt += 1
    }
    throw new java.io.IOException(
      s"TxLog: gave up after $MaxAttempts contended marker commits")
  }

  // ---- column DEFAULT values ----------------------------------------

  /** Declare a column DEFAULT (Delta's `ALTER TABLE … ALTER COLUMN …
    * SET DEFAULT expr`): a batch that OMITS the column gets it filled
    * with the (literal-foldable) expression at write; a batch that
    * SUPPLIES it — including NULLs — flows untouched (SQL DEFAULT
    * semantics: it applies only when the column is absent). Purely a
    * WRITER feature: data files always carry the column, so no reader
    * generation bump. The expression must not reference columns
    * (Delta's foldability rule) and must cast to the column's type. */
  def setDefault(spark: SparkSession, dir: String, name: String,
      exprStr: String): Long = {
    val snap = snapshot(spark, dir)
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    require(schema.fieldNames.contains(name),
      s"TxLog: default column '$name' is not a table column")
    require(!snap.identity.contains(name),
      s"TxLog: '$name' is an identity column — its values generate")
    require(!snap.generated.contains(name),
      s"TxLog: '$name' is expression-generated — its values compute")
    val refs = exprRefs(spark, exprStr)
    require(refs.isEmpty,
      s"TxLog: DEFAULT for '$name' references column(s) " +
        s"${refs.mkString(", ")} — defaults must be literal-foldable " +
        "(use a GENERATED column for derived values)")
    // the expression must evaluate and cast to the declared type
    val probe = spark.range(1)
      .select(expr(exprStr).cast(schema(name).dataType)).head()
    val _ = probe // any failure above refuses the declaration
    commitDefaults(spark, dir, snap.defaults + (name -> exprStr))
  }

  /** Remove a column's DEFAULT (the column stays). */
  def dropDefault(spark: SparkSession, dir: String,
      name: String): Long = {
    val snap = snapshot(spark, dir)
    require(snap.defaults.contains(name),
      s"TxLog: '$name' carries no DEFAULT")
    commitDefaults(spark, dir, snap.defaults - name)
  }

  /** Set (upsert) table PROPERTIES — Delta's `ALTER TABLE … SET
    * TBLPROPERTIES`: free-form (key → value) metadata carried in the
    * log (NOT the session catalog), so `SHOW TBLPROPERTIES` answers
    * from the snapshot and time travel shows historical values. One
    * KB-sized commit; full-map replay like constraints/defaults.
    * Keys must be non-empty; values are arbitrary strings. */
  def setTblProperties(spark: SparkSession, dir: String,
      props: Map[String, String]): Long = {
    require(props.nonEmpty, "TxLog: SET TBLPROPERTIES needs at least " +
      "one key = value pair")
    require(props.keys.forall(_.trim.nonEmpty),
      "TxLog: TBLPROPERTIES keys must be non-empty")
    val snap = snapshot(spark, dir)
    commitProperties(spark, dir, snap.properties ++ props)
  }

  /** Remove table properties by key (Delta's `UNSET TBLPROPERTIES`).
    * Unknown keys refuse loudly — a typo'd unset that silently
    * no-ops leaves the caller believing the property is gone. */
  def unsetTblProperties(spark: SparkSession, dir: String,
      keys: Seq[String]): Long = {
    require(keys.nonEmpty, "TxLog: UNSET TBLPROPERTIES needs keys")
    val snap = snapshot(spark, dir)
    val missing = keys.filterNot(snap.properties.contains)
    require(missing.isEmpty,
      s"TxLog: table $dir has no propert${
        if (missing.size == 1) "y" else "ies"} ${missing.mkString(", ")}")
    commitProperties(spark, dir, snap.properties -- keys)
  }

  private def commitProperties(spark: SparkSession, dir: String,
      all: Map[String, String]): Long = {
    val f = fs(spark, logPath(dir))
    var attempt = 0
    while (attempt < MaxAttempts) {
      val base = snapshot(spark, dir)
      val v = base.version + 1
      val j: JObject =
        ("version" -> v) ~ ("op" -> "properties") ~
          ("ts" -> nextCommitTs(f, dir, v)) ~
          ("add" -> JArray(Nil)) ~ ("remove" -> JArray(Nil)) ~
          ("properties" -> all)
      if (tryWrite(f, versionFile(dir, v),
          JsonMethods.compact(JsonMethods.render(j)))) {
        if (v > 0 && v % CheckpointInterval == 0)
          writeCheckpoint(spark, dir, v)
        return v
      }
      attempt += 1
    }
    throw new java.io.IOException(
      s"TxLog: gave up after $MaxAttempts contended commit attempts")
  }

  private def commitDefaults(spark: SparkSession, dir: String,
      all: Map[String, String]): Long = {
    val f = fs(spark, logPath(dir))
    var attempt = 0
    while (attempt < MaxAttempts) {
      val base = snapshot(spark, dir)
      val v = base.version + 1
      val j: JObject =
        ("version" -> v) ~ ("op" -> "defaults") ~
          ("ts" -> nextCommitTs(f, dir, v)) ~
          ("add" -> JArray(Nil)) ~ ("remove" -> JArray(Nil)) ~
          ("defaults" -> all)
      if (tryWrite(f, versionFile(dir, v),
          JsonMethods.compact(JsonMethods.render(j)))) {
        if (v > 0 && v % CheckpointInterval == 0)
          writeCheckpoint(spark, dir, v)
        return v
      }
      attempt += 1
    }
    throw new java.io.IOException(
      s"TxLog: gave up after $MaxAttempts contended defaults commits")
  }

  /** Fill declared DEFAULTs for columns the batch omits (supplied
    * columns flow untouched — SQL DEFAULT semantics). */
  private def applyDefaultCols(df: DataFrame,
      defaults: Map[String, String],
      declared: Option[StructType]): DataFrame =
    defaults.toSeq.sortBy(_._1).foldLeft(df) { case (out, (c, e)) =>
      if (out.columns.contains(c)) out
      else {
        val target = declared.flatMap(_.fields.find(_.name == c))
        out.withColumn(c,
          target.fold(expr(e))(fl => expr(e).cast(fl.dataType)))
      }
    }

  // ---- generated columns -------------------------------------------

  private def validateGeneratedDecl(spark: SparkSession,
      fields: Set[String], name: String,
      e: String, gens: Map[String, String],
      idents: Set[String]): Unit = {
    require(fields.contains(name),
      s"TxLog: generated column '$name' is not a table column")
    require(!gens.contains(name),
      s"TxLog: '$name' already carries a generation expression — " +
        "dropGenerated first to redeclare")
    require(!idents.contains(name),
      s"TxLog: '$name' is an identity column — a column cannot be " +
        "both identity and expression-generated")
    val refs = exprRefs(spark, e)
    val unknown = refs.filterNot(fields.contains)
    require(unknown.isEmpty,
      s"TxLog: generated column '$name' references unknown " +
        s"column(s): ${unknown.mkString(", ")}")
    require(!refs.contains(name),
      s"TxLog: generated column '$name' cannot reference itself")
    val layered = refs.filter(c => gens.contains(c) || idents.contains(c))
    require(layered.isEmpty,
      s"TxLog: generated column '$name' references generated/identity " +
        s"column(s) ${layered.mkString(", ")} — generation must derive " +
        "from plain data columns (the Delta contract)")
  }

  /** Declare an EXISTING column as GENERATED ALWAYS AS (`exprStr`)
    * (Delta's generated columns): from now on, batches that OMIT the
    * column get it computed from the expression; batches that SUPPLY
    * it are validated row-by-row against it (null-safe equality — the
    * Delta write contract) and refused on divergence; UPDATE refuses
    * to SET it directly and recomputes it when a referenced source
    * column changes. Declaring on live data validates the standing
    * rows first (one scan, like adding a CHECK constraint); the
    * declaration itself is a KB metadata commit requiring
    * generation-4 readers. [[commitOverwrite]]'s `generated`
    * parameter is the creation-time dual (there the expression
    * DEFINES the column). */
  def setGenerated(spark: SparkSession, dir: String, name: String,
      exprStr: String): Long = {
    val snap = snapshot(spark, dir)
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    validateGeneratedDecl(spark, schema.fieldNames.toSet, name,
      exprStr, snap.generated, snap.identity.keySet)
    require(!snap.defaults.contains(name),
      s"TxLog: '$name' carries a DEFAULT — dropDefault first " +
        "(a column cannot be both defaulted and generated)")
    val bad = read(spark, dir)
      .filter(!(col(name) <=> expr(exprStr))).limit(1).count()
    require(bad == 0L,
      s"TxLog: cannot declare '$name' GENERATED AS ($exprStr) — " +
        "existing rows diverge from the expression")
    commitGenerated(spark, dir, snap.generated + (name -> exprStr))
  }

  /** Remove a column's generation expression (the column stays). */
  def dropGenerated(spark: SparkSession, dir: String,
      name: String): Long = {
    val snap = snapshot(spark, dir)
    require(snap.generated.contains(name),
      s"TxLog: '$name' is not a generated column")
    commitGenerated(spark, dir, snap.generated - name)
  }

  /** Metadata commit carrying the FULL new generated map (replay-
    * simple, like constraints/identity commits). */
  private def commitGenerated(spark: SparkSession, dir: String,
      all: Map[String, String]): Long = {
    val f = fs(spark, logPath(dir))
    var attempt = 0
    while (attempt < MaxAttempts) {
      val base = snapshot(spark, dir)
      val v = base.version + 1
      val j: JObject =
        ("version" -> v) ~ ("op" -> "generated") ~
          ("ts" -> nextCommitTs(f, dir, v)) ~
          ("add" -> JArray(Nil)) ~ ("remove" -> JArray(Nil)) ~
          ("generated" -> all) ~ ("minReader" -> 4)
      if (tryWrite(f, versionFile(dir, v),
          JsonMethods.compact(JsonMethods.render(j)))) {
        if (v > 0 && v % CheckpointInterval == 0)
          writeCheckpoint(spark, dir, v)
        return v
      }
      attempt += 1
    }
    throw new java.io.IOException(
      s"TxLog: gave up after $MaxAttempts contended generated commits")
  }

  /** Apply generated-column semantics to a write batch: an ABSENT
    * generated column is COMPUTED here from its expression (cast to
    * the declared type when the table already defines one — at
    * creation the expression's own type defines the column); a
    * PRESENT column is VALIDATED — every row must equal the
    * expression null-safely, refused otherwise (the Delta write
    * contract; computing is one projection, validating is one
    * LIMIT-1 probe per supplied column). */
  /** ONE job answering, for every writer-defined column the batch
    * carries, "did the caller supply anything?" and "are there
    * NULLs?" — (non-null count, total count) per column. The
    * apply*Cols helpers previously probed with per-column
    * filter-counts, executing an expensive source plan once or twice
    * per spec'd column before staging. */
  private def supplyCounts(df: DataFrame,
      cols: Seq[String]): Map[String, (Long, Long)] =
    if (cols.isEmpty) Map.empty
    else {
      val aggs = cols.map(c => count(col(c)))
      val row = df.agg(count(lit(1)), aggs: _*).head()
      val tot = row.getLong(0)
      cols.zipWithIndex.map { case (c, i) =>
        c -> ((row.getLong(i + 1), tot))
      }.toMap
    }

  /** The supply probe for one commit: every generated or identity
    * column the batch carries. */
  private def supplyProbe(df: DataFrame, genMap: Map[String, String],
      idMap: Map[String, IdentitySpec]): Map[String, (Long, Long)] =
    supplyCounts(df, (genMap.keys ++ idMap.keys)
      .filter(df.columns.contains).toSeq.distinct)

  private def applyGeneratedCols(df: DataFrame,
      gens: Map[String, String],
      declared: Option[StructType],
      counts: Map[String, (Long, Long)]): DataFrame = {
    var out = df
    gens.toSeq.sortBy(_._1).foreach { case (c, e) =>
      def compute(base: DataFrame): DataFrame = {
        val target = declared.flatMap(_.fields.find(_.name == c))
        base.withColumn(c,
          target.fold(expr(e))(fl => expr(e).cast(fl.dataType)))
      }
      if (df.columns.contains(c)) {
        // SQL INSERT with a column list fills an omitted generated
        // column with NULLs — if NOTHING real was supplied, compute
        // instead of failing the divergence check (a genuinely
        // supplied column still validates value-for-value)
        if (counts(c)._1 == 0L) out = compute(out.drop(c))
        else enforceGeneratedOn(df, c, e)
      } else out = compute(out)
    }
    out
  }

  /** Validate one supplied generated column against its expression. */
  private def enforceGeneratedOn(df: DataFrame, c: String,
      e: String): Unit = {
    val bad = df.filter(!(col(c) <=> expr(e))).limit(1).count()
    require(bad == 0L,
      s"TxLog: generated column '$c' = ($e) — supplied values diverge " +
        "from the expression; omit the column (it generates) or " +
        "supply matching values")
  }

  /** Validate every generated column a relation supplies (the keyed-
    * rewrite paths: merge/applyChanges sources carry the full table
    * schema, so generated columns are always present there). */
  private def enforceGenerated(snap: TxSnapshot, df: DataFrame): Unit =
    snap.generated.toSeq.sortBy(_._1).foreach { case (c, e) =>
      if (df.columns.contains(c)) enforceGeneratedOn(df, c, e)
    }

  /** Apply identity semantics to a write batch: GENERATED ALWAYS
    * columns must be ABSENT (values generate here off the watermark
    * — per-task blocks of the monotonic task id: one pass, no
    * shuffle, gaps allowed per the Delta contract); BY DEFAULT
    * columns flow when present (NULLs refused — identity implies NOT
    * NULL). Returns the filled frame and the watermark each
    * generation assumed, which [[commitStaged]] re-checks at claim
    * time (a concurrent bump means our baked values could collide —
    * conflict, regenerate). */
  private def applyIdentityCols(df: DataFrame,
      idMap: Map[String, IdentitySpec],
      counts: Map[String, (Long, Long)])
      : (DataFrame, Map[String, Option[Long]]) = {
    var out = df
    idMap.toSeq.sortBy(_._1).foreach { case (c, spec) =>
      def gen = lit(spec.nextBase) +
        lit(spec.step) * monotonically_increasing_id()
      if (df.columns.contains(c)) {
        // SQL INSERT with a column list arrives with the omitted
        // identity column PRESENT but engine-filled with NULLs —
        // indistinguishable from omission at this layer. An ALL-NULL
        // column therefore reads as omission and generates (both
        // ALWAYS and BY DEFAULT — Delta's omission semantics). Any
        // real value keeps the standing contracts: ALWAYS refuses,
        // BY DEFAULT absorbs values but refuses a MIXED batch's
        // NULLs (identity is conceptually NOT NULL; a half-supplied
        // batch is a caller bug, not an engine fill).
        val (nonNull, tot) = counts(c)
        if (nonNull == 0L) {
          out = out.drop(c).withColumn(c, gen)
        } else {
          require(!spec.always,
            s"TxLog: '$c' is GENERATED ALWAYS AS IDENTITY — writes " +
              "must not supply it (declare BY DEFAULT to allow " +
              "explicit values)")
          require(nonNull == tot,
            s"TxLog: identity column '$c' cannot take NULL values " +
              "in a batch that also supplies values")
        }
      } else {
        out = out.withColumn(c, gen)
      }
    }
    (out, idMap.map { case (c, s) => c -> s.high })
  }

  /** The identity map AFTER a staged write: each watermark absorbs
    * the staged files' recorded extrema for its column — commit
    * metadata, no extra scan (the caller forced the column into
    * `statsCols`). Absorbing both bounds keeps BY-DEFAULT explicit
    * values in range regardless of step sign. */
  private def identityAfter(idMap: Map[String, IdentitySpec],
      added: Seq[TxFile], phys: String => String)
      : Map[String, IdentitySpec] =
    idMap.map { case (c, s) =>
      val vals = added.flatMap(_.stats.get(phys(c)))
        .flatMap(st => st.min.toSeq ++ st.max.toSeq).map(_.toLong)
      c -> vals.foldLeft(s)((acc, v) => acc.absorb(v))
    }

  /** Refuse keyed-rewrite DML on tables with a GENERATED ALWAYS
    * identity column: those paths re-stage matched rows from the
    * CALLER's relation, which must then carry the generated values —
    * the contract ALWAYS forbids. BY DEFAULT identity flows. */
  private def refuseAlwaysIdentity(snap: TxSnapshot, op: String): Unit = {
    val always = snap.identity.collect {
      case (c, s) if s.always => c
    }
    require(always.isEmpty,
      s"TxLog: $op on a table with GENERATED ALWAYS identity " +
        s"column(s) ${always.mkString(", ")} — the source relation " +
        "would have to supply generated values; route inserts " +
        "through commitAppend, or declare the column BY DEFAULT")
  }

  // ---- shallow clone -----------------------------------------------

  /** SHALLOW CLONE (Delta's `CREATE TABLE … SHALLOW CLONE src`): a new
    * logged table whose version 0 registers the SOURCE snapshot's
    * files (and deletion vectors) by ABSOLUTE path — no byte of data
    * is copied, so cloning a 100 TB table costs one KB metadata
    * commit. The clone then evolves INDEPENDENTLY: its appends, DML
    * and compactions write into its own dir (new entries are
    * dir-relative as usual) and remove source files only LOGICALLY
    * (from the clone's file list — [[vacuum]] on the clone never
    * deletes a file outside its own dir, because reaping is keyed by
    * the clone-root listing). Schema, column mapping, retired names
    * and CHECK constraints carry over; txn markers do NOT (the clone
    * is a new sink). The documented Delta caveat applies equally:
    * VACUUM on the SOURCE can reap files the clone still references —
    * retain source history while clones live, or [[compact]] the
    * clone to make it self-contained. `asOf` clones a historical
    * version (time-travel clone). */
  def clone(spark: SparkSession, sourceDir: String, targetDir: String,
      asOf: Option[Long] = None): Long = {
    require(!isLogged(spark, targetDir),
      s"TxLog: clone target $targetDir is already a logged table")
    val snap = snapshot(spark, sourceDir, asOf)
    require(snap.partitionCols.isEmpty ||
      snap.files.forall(!_.path.contains('/')),
      s"TxLog: $sourceDir still references path-partitioned files — " +
        "their values live in paths relative to THAT dir and cannot " +
        "be re-anchored; compact first (flattens the layout), then " +
        "clone")
    val abs = new java.io.File(sourceDir).getAbsolutePath
    // like restore: a snapshot whose files were already vacuumed
    // cannot be cloned — refuse NOW, not as a scan-time path error
    // on the clone's first read
    val fsrc = fs(spark, new Path(sourceDir))
    val gone = (snap.files.map(_.path) ++ snap.files.flatMap(_.dv))
      .filterNot(p => fsrc.exists(resolvePath(sourceDir, p)))
    require(gone.isEmpty,
      s"TxLog: cannot clone $sourceDir@${snap.version} — ${gone.size} " +
        s"of its files were vacuumed (first: ${gone.take(2)
          .mkString(", ")})")
    val entries = snap.files.map(f => f.copy(
      path = resolveData(abs, f.path),
      dv = f.dv.map(d => resolveData(abs, d))))
    // claim version 0 DIRECTLY (like convertInPlace), with the source's
    // CHECK constraints riding in the same commit. Two bugs a
    // commitStaged clone had: (a) its contention rebase would silently
    // CLOBBER a table created concurrently at the target (logically
    // removing its files) instead of refusing; (b) constraints landed
    // as a SECOND commit, so a writer slipping between v0 and v1 could
    // append data the source's constraints would have refused.
    val lf = fs(spark, logPath(targetDir))
    if (!tryWrite(lf, versionFile(targetDir, 0L),
        renderCommit(0L, "clone", entries, Nil, Some(snap.schemaJson),
          None, ddl = Some((snap.mapping, snap.retired)),
          minReader = Some(math.max(2, snap.minReader)),
          constraints = Some(snap.constraints).filter(_.nonEmpty),
          identity = Some(snap.identity).filter(_.nonEmpty),
          generated = Some(snap.generated).filter(_.nonEmpty),
          defaults = Some(snap.defaults).filter(_.nonEmpty),
          properties = Some(snap.properties).filter(_.nonEmpty))))
      throw new java.util.ConcurrentModificationException(
        s"TxLog: clone target $targetDir was concurrently created — " +
          "refusing to clobber it")
    0L
  }

  /** DEEP CLONE (Delta's `CREATE TABLE … CLONE src`): like [[clone]]
    * but SELF-CONTAINED — every referenced data file (and deletion
    * vector) is COPIED into the target directory by a distributed
    * copy job (one task per file, the DistCp shape) and registered
    * dir-relative, so vacuuming, truncating or outright deleting the
    * source can never break the clone (the shallow form's documented
    * caveat). Schema, per-file stats, column mapping, retired names
    * and CHECK constraints carry over unchanged; txn markers do not.
    * A clone-of-clone chain flattens: absolute references copy like
    * any other file, so the deep clone of a shallow clone detaches
    * from BOTH ancestors. Cost: the data copy itself (definitional),
    * parallelized one-file-per-task across the cluster; the commit
    * is one metadata write. The copy lands before the log claim, so
    * a concurrent creation of the target refuses AFTER copying —
    * the copied files are then unreferenced by the winner's log and
    * its vacuum reaps them. */
  def deepClone(spark: SparkSession, sourceDir: String,
      targetDir: String, asOf: Option[Long] = None): Long = {
    require(!isLogged(spark, targetDir),
      s"TxLog: clone target $targetDir is already a logged table")
    val snap = snapshot(spark, sourceDir, asOf)
    // the copy flattens to base names, which would strip the
    // path-encoded partition values of a hive-layout registration
    require(snap.partitionCols.isEmpty ||
      snap.files.forall(!_.path.contains('/')),
      s"TxLog: $sourceDir still references path-partitioned files — " +
        "the flat copy would lose their path-encoded values; compact " +
        "first (materializes them as data), then clone")
    val fsrc = fs(spark, new Path(sourceDir))
    // qualify through the Hadoop filesystem (never java.io.File):
    // source and target may live on any configured store
    val abs = fsrc.makeQualified(new Path(sourceDir)).toString
    val gone = (snap.files.map(_.path) ++ snap.files.flatMap(_.dv))
      .filterNot(p => fsrc.exists(resolvePath(sourceDir, p)))
    require(gone.isEmpty,
      s"TxLog: cannot clone $sourceDir@${snap.version} — ${gone.size} " +
        s"of its files were vacuumed (first: ${gone.take(2)
          .mkString(", ")})")
    val all = snap.files.map(_.path) ++ snap.files.flatMap(_.dv)
    val names = all.map(nameOf)
    require(names.distinct.size == names.size,
      "TxLog: deep clone source references files with colliding " +
        "base names (clone-of-clone chain?) — compact it first")
    val ftgt = fs(spark, new Path(targetDir))
    val tgtAbs = ftgt.makeQualified(new Path(targetDir)).toString
    ftgt.mkdirs(new Path(tgtAbs))
    val pairs = all.map(p =>
      (resolvePath(abs, p).toString, nameOf(p)))
    if (pairs.nonEmpty) {
      val slices = math.max(1, math.min(pairs.size,
        spark.sparkContext.defaultParallelism))
      // the session's filesystem config must travel with the tasks —
      // a fresh Configuration() would drop credentials / s3a / abfs
      // settings and break any non-default store
      val bconf = spark.sparkContext.broadcast(
        new org.apache.spark.util.SerializableConfiguration(
          spark.sparkContext.hadoopConfiguration))
      spark.sparkContext.parallelize(pairs, slices).foreach {
        case (srcP, name) =>
          val conf = bconf.value.value
          val sp = new Path(srcP)
          val tp = new Path(s"$tgtAbs/$name")
          org.apache.hadoop.fs.FileUtil.copy(sp.getFileSystem(conf),
            sp, tp.getFileSystem(conf), tp, false, true, conf)
          ()
      }
    }
    val entries = snap.files.map(f => f.copy(
      path = nameOf(f.path), dv = f.dv.map(nameOf)))
    val lf = fs(spark, logPath(targetDir))
    if (!tryWrite(lf, versionFile(targetDir, 0L),
        renderCommit(0L, "clone", entries, Nil, Some(snap.schemaJson),
          None, ddl = Some((snap.mapping, snap.retired)),
          minReader = Seq(
            if (entries.exists(_.dv.isDefined)) 2 else 1,
            if (snap.mapping.nonEmpty || snap.retired.nonEmpty) 3 else 1,
            if (snap.identity.nonEmpty ||
              snap.generated.nonEmpty) 4 else 1)
            .max match { case 1 => None; case m => Some(m) },
          constraints = Some(snap.constraints).filter(_.nonEmpty),
          identity = Some(snap.identity).filter(_.nonEmpty),
          generated = Some(snap.generated).filter(_.nonEmpty),
          defaults = Some(snap.defaults).filter(_.nonEmpty),
          properties = Some(snap.properties).filter(_.nonEmpty))))
      throw new java.util.ConcurrentModificationException(
        s"TxLog: clone target $targetDir was concurrently created — " +
          "refusing to clobber it")
    0L
  }

  /** DESCRIBE DETAIL (the Delta shape): ONE row of table-level
    * operational facts, answered from log metadata plus one root
    * listing for bytes — version, file/row/deleted-row counts, bytes
    * on disk vs live bytes referenced, feature state (vectors,
    * mapping, constraints, required reader generation). What an
    * operator checks before deciding to [[maintain]], [[vacuum]] or
    * upgrade. */
  def describeDetail(spark: SparkSession, dir: String): DataFrame = {
    val snap = snapshot(spark, dir)
    val f = fs(spark, new Path(dir))
    val liveBytes = snap.files.map(a =>
      try f.getFileStatus(resolvePath(dir, a.path)).getLen
      catch { case _: java.io.FileNotFoundException => 0L }).sum
    // top-level data files plus (for registered hive layouts) the
    // nested key=value tree — same scope vacuum reaps over
    val top = f.listStatus(new Path(dir)).filter { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    val onDisk = top.filter(_.isFile).map(_.getLen).sum +
      top.filter(st => st.isDirectory && st.getPath.getName.contains('='))
        .map { d0 =>
          val it = f.listFiles(d0.getPath, true)
          var b = 0L
          while (it.hasNext) {
            val st = it.next()
            if (st.isFile && !st.getPath.getName.startsWith("_") &&
              !st.getPath.getName.startsWith(".")) b += st.getLen
          }
          b
        }.sum
    val schema = StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("num_files", LongType, nullable = false),
      StructField("num_rows", LongType, nullable = false),
      StructField("num_deleted_rows", LongType, nullable = false),
      StructField("live_bytes", LongType, nullable = false),
      StructField("bytes_in_dir", LongType, nullable = false),
      StructField("num_dv_files", LongType, nullable = false),
      StructField("num_constraints", LongType, nullable = false),
      StructField("column_mapping", org.apache.spark.sql.types
        .BooleanType, nullable = false),
      StructField("min_reader", LongType, nullable = false)))
    spark.createDataFrame(java.util.Collections.singletonList(Row(
      snap.version, snap.files.size.toLong,
      snap.files.map(a => a.rows - a.dvRows).sum,
      snap.files.map(_.dvRows).sum,
      liveBytes, onDisk,
      snap.files.flatMap(_.dv).distinct.size.toLong,
      snap.constraints.size.toLong,
      snap.mapping.nonEmpty,
      snap.minReader.toLong)), schema)
  }

  // ---- maintenance policy ------------------------------------------

  /** What [[maintain]] decided and did. */
  final case class Maintenance(compacted: Boolean, reason: String,
      version: Long)

  /** The OPTIMIZE-when-needed policy (Delta's auto-compaction shape):
    * compact IFF the table accumulated debt — more than `maxFiles`
    * live files (small-file pressure from streaming/incremental
    * appends) or deletion vectors covering more than `maxDvFraction`
    * of the logged rows (merge-on-read read overhead) — otherwise do
    * NOTHING (no empty commits, no needless rewrite of a healthy
    * table). Both triggers are answered from log METADATA alone; the
    * compaction itself is the one data-sized cost and only runs when
    * the policy fires. Vacuum is deliberately NOT bundled: deleting
    * history is a retention decision, not a performance one. Schedule
    * this after ingest batches; at 100 TB the no-op path costs one
    * snapshot resolution. */
  def maintain(spark: SparkSession, dir: String,
      maxFiles: Int = 64, maxDvFraction: Double = 0.10,
      targetFiles: Int = 16, statsCols: Seq[String] = Nil,
      zorderBy: Seq[String] = Nil): Maintenance = {
    require(maxFiles > 0 && targetFiles > 0,
      "maintain thresholds must be positive")
    val snap = snapshot(spark, dir)
    val rows = snap.files.map(_.rows).sum
    val dvRows = snap.files.map(_.dvRows).sum
    val tooManyFiles = snap.files.size > maxFiles
    val dvHeavy = rows > 0 &&
      dvRows.toDouble / rows.toDouble > maxDvFraction
    if (!tooManyFiles && !dvHeavy)
      Maintenance(compacted = false,
        s"healthy: ${snap.files.size} files, $dvRows/$rows dv rows",
        snap.version)
    else {
      val why =
        (if (tooManyFiles) Seq(s"${snap.files.size} files > $maxFiles")
         else Nil) ++
          (if (dvHeavy) Seq(f"dv ${dvRows.toDouble / rows}%.2f > " +
            f"$maxDvFraction%.2f") else Nil)
      // AUTOMATED maintenance must never demote the table: purify
      // keeps a partitioned table on its planner presentation (and
      // still folds vectors away — the rewrite reads through the
      // vector-subtracting path); on unpartitioned tables purify
      // degrades to the flat rewrite. The explicit flat form stays
      // available through compact() directly.
      val v = compact(spark, dir, targetFiles, statsCols, zorderBy,
        purify = true)
      Maintenance(compacted = true, why.mkString("; "), v)
    }
  }

  // ---- Column mapping DDL (rename / drop without rewrite) ----------

  /** The unresolved column names a SQL expression references — used
    * to refuse DDL that would orphan a CHECK constraint. */
  private def exprRefs(spark: SparkSession, exprStr: String): Set[String] =
    spark.sessionState.sqlParser.parseExpression(exprStr).collect {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        a.name
    }.toSet

  /** One metadata-only DDL commit: new logical schema + full mapping
    * and retired list. Rebases like any commit; no files move. */
  private def commitSchemaChange(spark: SparkSession, dir: String,
      op: String, schemaJson: String, mapping: Map[String, String],
      retired: Seq[String], expectVersion: Long,
      minReader: Int = 3): Long = {
    val f = fs(spark, logPath(dir))
    val v = expectVersion + 1
    val j: JObject =
      ("version" -> v) ~ ("op" -> op) ~
        ("add" -> JArray(Nil)) ~ ("remove" -> JArray(Nil)) ~
        ("schemaJson" -> schemaJson) ~
        ("mapping" -> mapping) ~ ("retired" -> retired) ~
        ("minReader" -> minReader)
    if (!tryWrite(f, versionFile(dir, v),
        JsonMethods.compact(JsonMethods.render(j))))
      // schema DDL races are rare and the state it was computed from
      // is stale — refuse rather than silently rebase a schema edit
      throw new java.util.ConcurrentModificationException(
        s"TxLog: concurrent commit while altering schema of $dir — retry")
    if (v > 0 && v % CheckpointInterval == 0)
      writeCheckpoint(spark, dir, v)
    v
  }

  /** ADD COLUMN without touching a single data file (Delta's
    * `ALTER TABLE … ADD COLUMN`): the logical schema widens in ONE
    * KB-sized metadata commit — files written before the change
    * simply lack the physical column and read as NULL (Spark's
    * missing-column semantics), so at 100 TB this costs the same as
    * at 100 KB. The new column is always NULLABLE (only a value-free
    * widen is metadata-only). If the chosen name's physical form is
    * RESERVED (a dropped/renamed predecessor — its old data must
    * never resurrect), the column gets a fresh physical name through
    * the standing column-mapping machinery; otherwise the commit
    * stays readable by generation-1 readers. Also reachable through
    * SQL `ALTER TABLE t ADD COLUMN c TYPE` ([[GraftCatalog]]). */
  def addColumn(spark: SparkSession, dir: String, name: String,
      dtypeDdl: String): Long = {
    val snap = snapshot(spark, dir)
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    require(!schema.fieldNames.contains(name),
      s"TxLog: column '$name' already exists in $dir")
    require(name != TagFile && name != TagIdx && name != "_graft_upd",
      s"TxLog: '$name' is a reserved internal name")
    val dt = DataType.fromDDL(dtypeDdl)
    val fresh =
      if (snap.reservedPhys.contains(name))
        Map(name -> s"${name}_${UUID.randomUUID().toString.take(8)}")
      else Map.empty[String, String]
    val newSchema = StructType(schema.fields :+
      StructField(name, dt, nullable = true))
    val newMapping = snap.mapping ++ fresh
    commitSchemaChange(spark, dir, "add-column", newSchema.json,
      newMapping, snap.retired, snap.version,
      minReader = if (newMapping.nonEmpty) 3 else 1)
  }

  /** RENAME COLUMN without touching a single data file (Delta's
    * column-mapping rename): the logical schema and the logical→
    * physical mapping change in ONE KB-sized metadata commit — the
    * physical parquet column keeps its name forever, so at 100 TB
    * this costs the same as at 100 KB. The old logical name's
    * physical stays reserved: a later column named `oldName` gets a
    * fresh physical name instead of resurrecting old data. Refuses
    * when a CHECK constraint references the column (Delta's rule —
    * drop the constraint first), when `oldName` is absent, or when
    * `newName` already exists. Time travel is schema-faithful:
    * reads at pre-rename versions show the old name. */
  def renameColumn(spark: SparkSession, dir: String,
      oldName: String, newName: String): Long = {
    val snap = snapshot(spark, dir)
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    require(schema.fieldNames.contains(oldName),
      s"TxLog: no column '$oldName' to rename in $dir")
    require(!schema.fieldNames.contains(newName),
      s"TxLog: column '$newName' already exists in $dir")
    val bound = snap.constraints.filter { case (_, e) =>
      exprRefs(spark, e).contains(oldName) }
    require(bound.isEmpty,
      s"TxLog: CHECK constraint(s) ${bound.keys.mkString(", ")} " +
        s"reference '$oldName' — drop them before renaming")
    require(!snap.identity.contains(oldName),
      s"TxLog: '$oldName' is an identity column — dropIdentity " +
        "before renaming")
    require(!snap.generated.contains(oldName),
      s"TxLog: '$oldName' is a generated column — dropGenerated " +
        "before renaming")
    require(!snap.defaults.contains(oldName),
      s"TxLog: '$oldName' carries a DEFAULT — dropDefault " +
        "before renaming")
    val genBound = snap.generated.filter { case (_, e) =>
      exprRefs(spark, e).contains(oldName) }
    require(genBound.isEmpty,
      s"TxLog: generated column(s) ${genBound.keys.mkString(", ")} " +
        s"reference '$oldName' — dropGenerated before renaming")
    val newSchema = StructType(schema.fields.map(fl =>
      if (fl.name == oldName) fl.copy(name = newName) else fl))
    val newMapping = (snap.mapping - oldName) +
      (newName -> snap.phys(oldName))
    commitSchemaChange(spark, dir, "rename", newSchema.json,
      newMapping, snap.retired, snap.version)
  }

  /** DROP COLUMN without touching a single data file: the column
    * leaves the logical schema and its physical name joins the
    * RETIRED list (still present inside old files, claimable by no
    * future column — re-adding the name via mergeSchema gets a fresh
    * physical, so the dropped values can never resurrect). Refuses
    * when a CHECK constraint references the column or when it is the
    * table's last column. */
  def dropColumn(spark: SparkSession, dir: String, name: String): Long = {
    val snap = snapshot(spark, dir)
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    require(schema.fieldNames.contains(name),
      s"TxLog: no column '$name' to drop in $dir")
    require(schema.fields.length > 1,
      s"TxLog: cannot drop the last column of $dir")
    val bound = snap.constraints.filter { case (_, e) =>
      exprRefs(spark, e).contains(name) }
    require(bound.isEmpty,
      s"TxLog: CHECK constraint(s) ${bound.keys.mkString(", ")} " +
        s"reference '$name' — drop them before dropping the column")
    require(!snap.identity.contains(name),
      s"TxLog: '$name' is an identity column — dropIdentity " +
        "before dropping it")
    require(!snap.generated.contains(name),
      s"TxLog: '$name' is a generated column — dropGenerated " +
        "before dropping it")
    require(!snap.defaults.contains(name),
      s"TxLog: '$name' carries a DEFAULT — dropDefault " +
        "before dropping it")
    val genBound = snap.generated.filter { case (_, e) =>
      exprRefs(spark, e).contains(name) }
    require(genBound.isEmpty,
      s"TxLog: generated column(s) ${genBound.keys.mkString(", ")} " +
        s"reference '$name' — dropGenerated before dropping the column")
    val newSchema = StructType(schema.fields.filterNot(_.name == name))
    val newMapping = snap.mapping - name
    val newRetired = (snap.retired :+ snap.phys(name)).distinct
    commitSchemaChange(spark, dir, "drop", newSchema.json,
      newMapping, newRetired, snap.version)
  }

  // ---- Row-level mutations (copy-on-write) -------------------------
  //
  // The Delta DML surface (DELETE / UPDATE / MERGE INTO) on the same
  // commit protocol: find the files that actually hold affected rows
  // (stats-in-log pruning first, then an exact match scan), rewrite
  // ONLY those files, and commit (remove = touched, add = rewrites) —
  // untouched files survive by path, so a predicate that hits one
  // day's files rewrites one day's files no matter how large the
  // table is. Isolation is write-serializable (Delta's default): a
  // concurrent commit that removed one of the touched files conflicts
  // (ConcurrentModificationException → caller retries on the new
  // snapshot); a concurrent APPEND commutes, so rows appended while a
  // DELETE runs are not deleted even if they match its predicate.

  /** Conservative per-column [lo, hi] constraints implied by a
    * predicate, for stats-in-log file skipping: the predicate is
    * ANALYZED against the table schema (the DSL builds lazy column
    * nodes, and analysis is also what folds `lit(50)` into the
    * column's type), then conjunctions of comparisons between a bare
    * column and a foldable value contribute bounds; anything else
    * (OR, casts on the COLUMN side, column-vs-column) contributes
    * nothing — the file scan stays exact, skipping is only ever an
    * optimization. Returned per column as (Option[lo], Option[hi])
    * with None = unbounded on that side. */
  private[graft] def skippingBounds(spark: SparkSession,
      schema: StructType, pred: org.apache.spark.sql.Column)
      : Map[String, (Option[Any], Option[Any])] = {
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    import org.apache.spark.sql.catalyst.expressions._
    val analyzed = spark.createDataFrame(
        java.util.Collections.emptyList[Row](), schema)
      .filter(pred).queryExecution.analyzed
    val cond = analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition
    }
    def attr(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    // a foldable side (literal, or the implicit cast analysis wraps
    // one in) evaluates to its external value; null → no constraint
    def value(e: Expression): Option[Any] =
      if (e.foldable)
        Option(CatalystTypeConverters.convertToScala(e.eval(), e.dataType))
      else None
    def leaf(e: Expression): Seq[(String, Option[Any], Option[Any])] =
      e match {
        case EqualTo(a, v) if attr(a).isDefined && value(v).isDefined =>
          Seq((attr(a).get, value(v), value(v)))
        case EqualTo(v, a) if attr(a).isDefined && value(v).isDefined =>
          Seq((attr(a).get, value(v), value(v)))
        case EqualNullSafe(a, v)
            if attr(a).isDefined && value(v).isDefined =>
          Seq((attr(a).get, value(v), value(v)))
        case GreaterThan(a, v)
            if attr(a).isDefined && value(v).isDefined =>
          Seq((attr(a).get, value(v), None))
        case GreaterThanOrEqual(a, v)
            if attr(a).isDefined && value(v).isDefined =>
          Seq((attr(a).get, value(v), None))
        case LessThan(a, v) if attr(a).isDefined && value(v).isDefined =>
          Seq((attr(a).get, None, value(v)))
        case LessThanOrEqual(a, v)
            if attr(a).isDefined && value(v).isDefined =>
          Seq((attr(a).get, None, value(v)))
        case GreaterThan(v, a)
            if attr(a).isDefined && value(v).isDefined =>
          Seq((attr(a).get, None, value(v)))
        case GreaterThanOrEqual(v, a)
            if attr(a).isDefined && value(v).isDefined =>
          Seq((attr(a).get, None, value(v)))
        case LessThan(v, a) if attr(a).isDefined && value(v).isDefined =>
          Seq((attr(a).get, value(v), None))
        case LessThanOrEqual(v, a)
            if attr(a).isDefined && value(v).isDefined =>
          Seq((attr(a).get, value(v), None))
        case And(l, r) => leaf(l) ++ leaf(r)
        case _ => Nil
      }
    cond.map(leaf).getOrElse(Nil).groupBy(_._1).map { case (c, cs) =>
      // any single constraint on a column is a NECESSARY condition,
      // so pruning with one lo and one hi from the set is sound
      // (conservative when several constraints overlap)
      c -> ((cs.flatMap(_._2).headOption, cs.flatMap(_._3).headOption))
    }
  }

  /** `files` restricted to those whose recorded stats can hold a row
    * matching `pred` (via [[skippingBounds]]); files without stats for
    * a constrained column always pass. */
  private def pruneForPredicate(spark: SparkSession, schema: StructType,
      files: Seq[TxFile],
      pred: org.apache.spark.sql.Column,
      mapping: Map[String, String] = Map.empty): Seq[TxFile] =
    skippingBounds(spark, schema, pred)
      .map { case (c, b) => (mapping.getOrElse(c, c), b) } // stats: phys
      .foldLeft(files) { case (kept, (c, (lo, hi))) =>
      kept.flatMap(_.stats.get(c)).headOption.map(_.dtype) match {
        case None => kept
        case Some(dt) =>
          def side(v: Any): String = spark.range(1)
            .select(lit(v).cast(dt).cast("string")).head().getString(0)
          val loS = lo.map(side)
          val hiS = hi.map(side)
          if (loS.exists(_ == null) || hiS.exists(_ == null)) kept
          else kept.filter(_.stats.get(c).forall(st =>
            StatsManifest.intersects(st.dtype, st.min.orNull, st.max.orNull,
              loS.getOrElse(st.min.orNull), hiS.getOrElse(st.max.orNull))))
      }
    }

  /** Conflict-guard closure for [[commitStaged]]'s `conflictIfAdded`:
    * given the head's files at claim time, the dir-relative paths of
    * files this operation's read missed (not in its snapshot) whose
    * recorded stats can intersect `pred` — files without stats stay
    * conservatively conflicting. Driver-side, metadata-only. */
  private def addedMatchGuard(spark: SparkSession, snap: TxSnapshot,
      schema: StructType, pred: org.apache.spark.sql.Column)
      : Seq[TxFile] => Seq[String] = {
    val seen = snap.files.map(_.path).toSet
    files => {
      val fresh = files.filterNot(f => seen.contains(f.path))
      if (fresh.isEmpty) Nil
      else pruneForPredicate(spark, schema, fresh, pred, snap.mapping)
        .map(_.path)
    }
  }

  /** The candidate files that actually contain rows matching `pred`:
    * stats-prune first, then one scan of just the candidates keeping
    * `input_file_name` — exact, file-count-sized on the driver. */
  private def touchedFiles(spark: SparkSession, dir: String,
      snap: TxSnapshot, pred: org.apache.spark.sql.Column): Seq[String] = {
    val schema =
      DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val cands =
      pruneForPredicate(spark, schema, snap.files, pred, snap.mapping)
    if (cands.isEmpty) return Nil
    // tagged read: already-deleted (dv'd) rows can't re-touch a file,
    // and the file identity comes from `_metadata`, which survives
    // the dv anti-join (input_file_name would not)
    val touched = described(spark, "touched-probe") {
      readSnapshotTagged(spark, dir, snap.copy(files = cands))
        .filter(pred)
        .select(col(TagFile)).distinct().collect()
    }.map(_.getString(0))
    touched.toSeq.sorted
  }

  /** Inherit skip-stats across a rewrite: the union of columns any
    * rewritten file recorded, plus what the caller asked for — an
    * OPTIMIZE/DML that silently dropped the table's pruning metadata
    * would degrade every later readPruned. */
  private def inheritStats(files: Seq[TxFile],
      statsCols: Seq[String],
      snap: TxSnapshot): Seq[String] = {
    // file stats are keyed by PHYSICAL name; stageData wants LOGICAL.
    // Stats of dropped columns (physical name with no logical owner)
    // cannot be carried forward — their column is gone from the view.
    val reverse = snap.mapping.map(_.swap)
    val logical = DataType.fromJson(snap.schemaJson)
      .asInstanceOf[StructType].fieldNames.toSet
    val fromFiles = files.flatMap(_.stats.keys)
      .map(p => reverse.getOrElse(p, p)).filter(logical)
    (statsCols ++ fromFiles).distinct
  }

  /** [[inheritStats]] restricted to columns the BATCH carries — a
    * narrower mergeSchema append must not fail stageData's
    * column-exists check over a tracked column it legitimately omits
    * (the table reads it as NULL; its stats resume on batches that
    * carry it). Caller-passed statsCols stay unfiltered: naming a
    * column the batch lacks is a caller bug and should stay loud. */
  private def inheritStatsFor(df: DataFrame, files: Seq[TxFile],
      statsCols: Seq[String], snap: TxSnapshot): Seq[String] = {
    val present = df.columns.toSet
    (statsCols ++ inheritStats(files, Nil, snap).filter(present)).distinct
  }

  /** Row-level DELETE (Delta's `DELETE FROM t WHERE …`): remove the
    * rows where `pred` is TRUE (null- and false-rows survive, SQL
    * semantics) by rewriting only the files that hold matching rows.
    * Returns the committed version — or the CURRENT version unchanged
    * when nothing matched (no empty commit). */
  def delete(spark: SparkSession, dir: String,
      pred: org.apache.spark.sql.Column,
      statsCols: Seq[String] = Nil): Long = {
    val snap = snapshot(spark, dir)
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val touched = touchedFiles(spark, dir, snap, pred)
    if (touched.isEmpty) return snap.version
    val tSet = touched.toSet
    val keepFiles = snap.files.filter(f => tSet.contains(fileKey(snap, f)))
    val kept = readSnapshot(spark, dir, snap.copy(files = keepFiles))
      .filter(!pred.eqNullSafe(true))
    val (added, _) = stageData(spark, dir, kept,
      inheritStats(keepFiles, statsCols, snap), snap.mapping,
      partCols = snap.partitionCols)
    // pin the touched files' vector pointers: a concurrent
    // merge-on-read DML keeps the path LIVE while changing its rows —
    // liveness alone would let this rewrite silently undo it
    commitStaged(spark, dir, "delete", added, keepFiles.map(_.path),
      removeAll = false, snap.schemaJson, None,
      expectDv = keepFiles.map(f => f.path -> f.dv).toMap,
      conflictIfAdded = Some(addedMatchGuard(spark, snap, schema, pred)))
  }

  /** Atomic partial overwrite (Delta's `replaceWhere`): ONE commit
    * that deletes every row matching `pred` and inserts `df` in its
    * place — the idempotent re-load of a partition/date slice
    * ("rewrite yesterday") without ever exposing a state where the
    * slice is missing or doubled. Every incoming row must satisfy
    * `pred` (Delta's constraint — rows outside the slice would make
    * the operation non-idempotent and silently co-mingle), validated
    * BEFORE anything stages. Cost: the files actually holding
    * matching rows rewrite (stats-pruned + exact-scan, like DELETE)
    * plus the new batch stages; untouched files survive by path.
    * Also reachable through the DataSource:
    * `df.write.format("txlog").mode("overwrite")
    * .option("replaceWhere", "<sql>")`. */
  def replaceWhere(spark: SparkSession, dir: String, df: DataFrame,
      pred: org.apache.spark.sql.Column,
      statsCols: Seq[String] = Nil): Long = {
    val snap = snapshot(spark, dir)
    refuseAlwaysIdentity(snap, "replaceWhere")
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val srcTypes = df.schema.fields.map(fl => fl.name -> fl.dataType).toMap
    val missing = schema.fields.filterNot(fl =>
      srcTypes.get(fl.name).contains(fl.dataType))
    require(missing.isEmpty,
      s"TxLog: replaceWhere batch must carry the table schema; " +
        s"missing or mistyped: ${missing.map(_.name).mkString(", ")}")
    val src = df.select(schema.fieldNames.map(col).toSeq: _*)
    val outside = src.filter(!pred.eqNullSafe(true)).limit(1).count()
    require(outside == 0L,
      "TxLog: replaceWhere batch contains row(s) NOT matching the " +
        "predicate — the replaced slice must contain its replacement")
    enforceConstraints(spark, dir, src)
    enforceGenerated(snap, src)
    val touched = touchedFiles(spark, dir, snap, pred)
    val tSet = touched.toSet
    val keepFiles = snap.files.filter(f => tSet.contains(fileKey(snap, f)))
    val survivors =
      if (keepFiles.isEmpty) src
      else readSnapshot(spark, dir, snap.copy(files = keepFiles))
        .filter(!pred.eqNullSafe(true))
        .unionByName(src)
    val (added, _) = stageData(spark, dir, survivors,
      (inheritStats(keepFiles, statsCols, snap) ++
        snap.identity.keys).distinct, snap.mapping,
      partCols = snap.partitionCols)
    commitStaged(spark, dir, "merge", added, keepFiles.map(_.path),
      removeAll = false, snap.schemaJson, None,
      expectDv = keepFiles.map(f => f.path -> f.dv).toMap,
      identityOut = if (snap.identity.isEmpty) None
        else Some(identityAfter(snap.identity, added, snap.phys)),
      expectIdentity = snap.identity.map { case (c, s) => c -> s.high },
      conflictIfAdded = Some(addedMatchGuard(spark, snap, schema, pred)))
  }

  /** Row-level UPDATE (Delta's `UPDATE t SET … WHERE …`): rows where
    * `pred` is TRUE get each `set` expression (cast back to the
    * column's declared type — an UPDATE never mutates the schema);
    * all other rows and all untouched files survive byte-identical.
    * Returns the committed version, or the current version when
    * nothing matched. */
  def update(spark: SparkSession, dir: String,
      pred: org.apache.spark.sql.Column,
      set: Map[String, org.apache.spark.sql.Column],
      statsCols: Seq[String] = Nil): Long = {
    val snap = snapshot(spark, dir)
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    // the rewrite threads its row marker as a column — a table column
    // by that name would be silently clobbered and then dropped (same
    // reserved-name contract as TagFile/TagIdx)
    require(!schema.fieldNames.contains("_graft_upd"),
      "TxLog: table columns collide with reserved name _graft_upd")
    val known = schema.fieldNames.toSet
    val unknown = set.keys.filterNot(known)
    require(unknown.isEmpty,
      s"TxLog: update sets unknown column(s): ${unknown.mkString(", ")}")
    val idSet = set.keys.filter(snap.identity.contains)
    require(idSet.isEmpty,
      s"TxLog: UPDATE cannot set identity column(s) " +
        s"${idSet.mkString(", ")} (Delta's identity contract)")
    val genSet = set.keys.filter(snap.generated.contains)
    require(genSet.isEmpty,
      s"TxLog: UPDATE cannot set generated column(s) " +
        s"${genSet.mkString(", ")} directly — update their source " +
        "columns and the expression recomputes")
    // generated columns whose source columns this UPDATE touches
    // recompute on the updated rows (the Delta contract)
    val regen = snap.generated.filter { case (_, e) =>
      exprRefs(spark, e).exists(set.contains) }
    val touched = touchedFiles(spark, dir, snap, pred)
    if (touched.isEmpty) return snap.version
    val tSet = touched.toSet
    val keepFiles = snap.files.filter(f => tSet.contains(fileKey(snap, f)))
    val marked = readSnapshot(spark, dir, snap.copy(files = keepFiles))
      .withColumn("_graft_upd", pred.eqNullSafe(true))
    val updated = marked.select((schema.fields.map { fl =>
      set.get(fl.name) match {
        case Some(e) =>
          when(col("_graft_upd"), e.cast(fl.dataType))
            .otherwise(col(fl.name)).as(fl.name)
        case None => col(fl.name)
      }
    } :+ col("_graft_upd")).toSeq: _*)
    val rewritten = regen.toSeq.sortBy(_._1).foldLeft(updated) {
      case (d, (c, e)) =>
        val dt = schema(c).dataType
        d.withColumn(c, when(col("_graft_upd"),
          expr(e).cast(dt)).otherwise(col(c)))
    }.drop("_graft_upd")
    enforceConstraints(spark, dir, rewritten)
    val (added, _) = stageData(spark, dir, rewritten,
      inheritStats(keepFiles, statsCols, snap), snap.mapping,
      partCols = snap.partitionCols)
    commitStaged(spark, dir, "update", added, keepFiles.map(_.path),
      removeAll = false, snap.schemaJson, None,
      expectDv = keepFiles.map(f => f.path -> f.dv).toMap,
      conflictIfAdded = Some(addedMatchGuard(spark, snap, schema, pred)))
  }

  // ---- merge-on-read DML (deletion vectors) ------------------------

  /** Where a table's deletion vectors live (dir-relative). */
  val DvDir = "_graft_dv"

  /** Stage ONE vector relation covering this DML's matches merged
    * with the touched files' existing vectors, and build the updated
    * file entries. `matched` must be `(TagFile, TagIdx)` pairs of
    * LIVE rows (already-deleted rows excluded by the tagged read).
    * Returns None when nothing matched; otherwise (vector path, the
    * re-added entries, the dv pointers to pin at commit). */
  private def stageDv(spark: SparkSession, dir: String, snap: TxSnapshot,
      matched: DataFrame)
      : Option[(String, Seq[TxFile], Map[String, Option[String]])] = {
    val counts = matched.groupBy(TagFile).count().collect()
    if (counts.isEmpty) return None
    val newCnt = counts.map(r => r.getString(0) -> r.getLong(1)).toMap
    val byPath = snap.files.map(f => fileKey(snap, f) -> f).toMap
    val touched = newCnt.keys.toSeq.sorted
    val pairs = matched.select(col(TagFile).as("file"),
      col(TagIdx).as("row_index"))
    val oldDvs = touched.flatMap(p => byPath(p).dv).distinct
    val merged =
      if (oldDvs.isEmpty) pairs
      else pairs.unionByName(
        spark.read.parquet(oldDvs.map(p => resolveData(dir, p)): _*)
          .filter(col("file").isInCollection(touched)))
    // metadata-known output size → file count; one file until vectors
    // grow to millions of pairs
    val total = newCnt.values.sum +
      touched.map(p => byPath(p).dvRows).sum
    val parts = math.min(32L, total / DvBroadcastRows + 1).toInt
    val dvPath = s"$DvDir/${UUID.randomUUID().toString.take(12)}"
    merged.repartition(parts).write.parquet(s"$dir/$dvPath")
    val entries = touched.map { p =>
      val f = byPath(p)
      f.copy(dv = Some(dvPath), dvRows = f.dvRows + newCnt(p))
    }
    // pin by ENTRY PATH (what commitStaged compares against the head);
    // `touched` holds bare names, which differ for cloned entries
    Some((dvPath, entries,
      touched.map(p => byPath(p).path -> byPath(p).dv).toMap))
  }

  /** Merge-on-read DELETE (Delta's deletion-vector delete): the
    * matched rows' (file, row position) pairs are recorded in a
    * vector relation and SUBTRACTED on read — no data file is
    * rewritten, so delete cost scales with the MATCHED ROWS, not the
    * size of the files that hold them (CoW [[delete]] rewrites a
    * whole file to drop one row; at 1 GB files and point deletes
    * that is a 10⁹× write amplification this path removes). The
    * commit re-adds each touched file entry with the new vector
    * pointer; stats stay as written (now upper bounds — pruning
    * remains conservative, and [[countWhere]] scans dv-bearing
    * files instead of trusting their logged row count). [[compact]]
    * materializes vectors away; [[vacuum]] collects superseded
    * vector relations. Concurrency: write-serializable — the commit
    * pins each touched file's vector pointer, so two merge-on-read
    * DMLs racing on the same FILE conflict (CoW's liveness check
    * cannot see same-path vector moves), while DMLs on disjoint
    * files and appends commute. */
  def deleteMor(spark: SparkSession, dir: String,
      pred: org.apache.spark.sql.Column): Long = {
    val snap = snapshot(spark, dir)
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val cands =
      pruneForPredicate(spark, schema, snap.files, pred, snap.mapping)
    if (cands.isEmpty) return snap.version
    val matched = readSnapshotTagged(spark, dir, snap.copy(files = cands))
      .filter(pred)
      .select(col(TagFile), col(TagIdx))
    stageDv(spark, dir, snap, matched) match {
      case None => snap.version
      case Some((dvPath, entries, expect)) =>
        try commitStaged(spark, dir, "delete-dv", entries,
          entries.map(_.path), removeAll = false, snap.schemaJson, None,
          ownsAdded = false, expectDv = expect, minReader = Some(2),
          conflictIfAdded =
            Some(addedMatchGuard(spark, snap, schema, pred)))
        catch { case e: Throwable =>
          fs(spark, new Path(dir)).delete(new Path(dir, dvPath), true)
          throw e
        }
    }
  }

  /** Merge-on-read UPDATE: the matched rows' positions join the
    * touched files' deletion vectors and their UPDATED images are
    * appended as new files — one commit, no touched file rewritten
    * (Delta's DV update shape). Write cost scales with the matched
    * rows (vector pairs + updated images), not the touched files'
    * size. CHECK constraints validate the updated images before
    * anything is staged. */
  def updateMor(spark: SparkSession, dir: String,
      pred: org.apache.spark.sql.Column,
      set: Map[String, org.apache.spark.sql.Column],
      statsCols: Seq[String] = Nil): Long = {
    val snap = snapshot(spark, dir)
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val known = schema.fieldNames.toSet
    val unknown = set.keys.filterNot(known)
    require(unknown.isEmpty,
      s"TxLog: update sets unknown column(s): ${unknown.mkString(", ")}")
    val idSet = set.keys.filter(snap.identity.contains)
    require(idSet.isEmpty,
      s"TxLog: UPDATE cannot set identity column(s) " +
        s"${idSet.mkString(", ")} (Delta's identity contract)")
    val genSet = set.keys.filter(snap.generated.contains)
    require(genSet.isEmpty,
      s"TxLog: UPDATE cannot set generated column(s) " +
        s"${genSet.mkString(", ")} directly — update their source " +
        "columns and the expression recomputes")
    val regen = snap.generated.filter { case (_, e) =>
      exprRefs(spark, e).exists(set.contains) }
    val cands =
      pruneForPredicate(spark, schema, snap.files, pred, snap.mapping)
    if (cands.isEmpty) return snap.version
    val matchedRows = readSnapshotTagged(spark, dir,
      snap.copy(files = cands)).filter(pred).cache()
    try {
      val updated0 = matchedRows.select(schema.fields.map { fl =>
        set.get(fl.name) match {
          case Some(e) => e.cast(fl.dataType).as(fl.name)
          case None => col(fl.name)
        }
      }.toSeq: _*)
      // every image row IS an updated row: recompute touched
      // expressions unconditionally
      val updated = regen.toSeq.sortBy(_._1).foldLeft(updated0) {
        case (d, (c, e)) =>
          d.withColumn(c, expr(e).cast(schema(c).dataType))
      }
      enforceConstraints(spark, dir, updated)
      stageDv(spark, dir, snap,
        matchedRows.select(col(TagFile), col(TagIdx))) match {
        case None => snap.version
        case Some((dvPath, entries, expect)) =>
          val touchedEntries = entries
          val (added, _) = stageData(spark, dir, updated,
            inheritStats(touchedEntries, statsCols, snap), snap.mapping,
            partCols = snap.partitionCols)
          try commitStaged(spark, dir, "update-dv",
            touchedEntries ++ added, touchedEntries.map(_.path),
            removeAll = false, snap.schemaJson, None,
            ownsAdded = false, expectDv = expect, minReader = Some(2),
            conflictIfAdded =
              Some(addedMatchGuard(spark, snap, schema, pred)))
          catch { case e: Throwable =>
            fs(spark, new Path(dir)).delete(new Path(dir, dvPath), true)
            deleteStaged(spark, dir, added)
            throw e
          }
      }
    } finally matchedRows.unpersist()
  }

  /** Stats-prune a snapshot's files to those whose per-file key
    * bounds intersect the source's key envelope — one tiny agg over
    * the (directive-sized) source, no table scan. Shared by [[merge]]
    * / [[applyChanges]] / [[applyChangesMor]]. */
  private[graft] def keyBoundsOf(src: DataFrame,
      keyCols: Seq[String]): Row =
    described(src.sparkSession, "key-envelope") {
      src.select(keyCols.flatMap(k =>
        Seq(min(col(k)).as(s"_lo_$k"), max(col(k)).as(s"_hi_$k"))): _*)
        .head()
    }

  private def pruneByKeyBounds(spark: SparkSession, snap: TxSnapshot,
      files: Seq[TxFile], keyCols: Seq[String], keyBounds: Row)
      : Seq[TxFile] = {
    keyCols.foldLeft(files) { case (kept, k) =>
      val pk = snap.phys(k) // stats are keyed by physical name
      val lo = keyBounds.getAs[Any](s"_lo_$k")
      val hi = keyBounds.getAs[Any](s"_hi_$k")
      if (lo == null || hi == null) kept
      else kept.flatMap(_.stats.get(pk)).headOption.map(_.dtype) match {
        case None => kept
        case Some(dt) =>
          val (loS, hiS) = StatsManifest.canonicalBounds(spark, dt, lo, hi)
          kept.filter(_.stats.get(pk).forall(st =>
            StatsManifest.intersects(st.dtype, st.min.orNull,
              st.max.orNull, loS, hiS)))
      }
    }
  }

  /** MERGE INTO (upsert): for each source row, the target row with
    * the same `keyCols` is REPLACED by it (when-matched update-all);
    * source rows matching nothing are INSERTED (when-not-matched
    * insert-all) — Delta's canonical merge. The source must be unique
    * on the keys (two source rows claiming one target row is
    * ambiguous — refused, Delta's multiple-matches error) and must
    * carry the table's schema. A table that is itself NOT unique on
    * the keys collapses on merge: every target row matching a source
    * key is replaced by that ONE source row (primary-key upsert
    * semantics — the table is expected to be keyed). Only files holding matched keys are
    * rewritten; inserts ride in the same staged write, so the whole
    * upsert is ONE commit. Cost at scale: a stats-pruned semi-join to
    * find touched files + one shuffle-join of (touched files ∪
    * source) — the table outside the key range is never read. */
  def merge(spark: SparkSession, dir: String, source: DataFrame,
      keyCols: Seq[String], statsCols: Seq[String] = Nil,
      txn: Option[(String, Long)] = None): Long = {
    require(keyCols.nonEmpty, "TxLog: merge needs at least one key column")
    val snap = snapshot(spark, dir)
    refuseAlwaysIdentity(snap, "merge")
    // idempotent upsert: a replayed (appId, batchId) short-circuits
    // before any staging work — the streaming-sink contract
    for ((app, b) <- txn)
      if (snap.txns.get(app).exists(_ >= b)) return snap.version
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val srcTypes = source.schema.fields
      .map(fl => fl.name -> fl.dataType).toMap
    val missing = schema.fields.filterNot(fl =>
      srcTypes.get(fl.name).contains(fl.dataType))
    require(missing.isEmpty,
      s"TxLog: merge source must carry the table schema; missing or " +
        s"mistyped: ${missing.map(_.name).mkString(", ")}")
    keyCols.foreach(k => require(schema.fieldNames.contains(k),
      s"TxLog: merge key '$k' is not a table column"))
    // the source feeds FIVE actions (duplicate guard, key envelope,
    // touched-file semi-join, survivors write, constraint check) —
    // materialize it once with lineage truncated (Delta's
    // materialize-source precedent; batch-sized by the keyed-upsert
    // contract)
    val src = checkpointed(
      source.select(schema.fieldNames.map(col).toSeq: _*))
    try {
    enforceGenerated(snap, src)
    val dupKeys = src.groupBy(keyCols.map(col): _*)
      .count().filter(col("count") > 1).limit(1).count()
    require(dupKeys == 0,
      "TxLog: merge source has duplicate keys — each target row " +
        "would match multiple source rows (ambiguous, refused)")

    // stats-prune candidates by the source's key envelope (one tiny
    // agg over the source), then exact-match via a semi-join; the
    // same envelope guards the commit against concurrently-appended
    // files whose keys it could have matched
    val keyBounds = keyBoundsOf(src, keyCols)
    val cands = pruneByKeyBounds(spark, snap, snap.files, keyCols,
      keyBounds)
    val seenPaths = snap.files.map(_.path).toSet
    val mergeGuard: Seq[TxFile] => Seq[String] = files =>
      pruneByKeyBounds(spark, snap,
        files.filterNot(f => seenPaths.contains(f.path)), keyCols,
        keyBounds).map(_.path)
    val srcKeys = src.select(keyCols.map(col): _*).distinct()
    val touched: Seq[String] =
      if (cands.isEmpty) Nil
      else readSnapshotTagged(spark, dir, snap.copy(files = cands))
        .select((col(TagFile) +: keyCols.map(col)).toSeq: _*)
        .join(srcKeys, keyCols, "left_semi")
        .select(TagFile).distinct().collect()
        .map(_.getString(0)).toSeq.sorted
    val tSet = touched.toSet
    val keepFiles = snap.files.filter(f => tSet.contains(fileKey(snap, f)))
    val survivors =
      if (keepFiles.isEmpty) src
      else readSnapshot(spark, dir, snap.copy(files = keepFiles))
        .join(srcKeys, keyCols, "left_anti")
        .unionByName(src)
    // validating just the SOURCE suffices (survivor rows from touched
    // files were already valid under the standing constraints)
    enforceConstraints(spark, dir, src)
    val (added, _) = stageData(spark, dir, survivors,
      (inheritStats(keepFiles, statsCols, snap) ++
        snap.identity.keys).distinct, snap.mapping,
      partCols = snap.partitionCols)
    commitStaged(spark, dir, "merge", added, keepFiles.map(_.path),
      removeAll = false, snap.schemaJson, txn,
      expectDv = keepFiles.map(f => f.path -> f.dv).toMap,
      // BY DEFAULT identity (ALWAYS was refused above): the staged
      // stats absorb any explicit ids the source carried past the
      // watermark
      identityOut = if (snap.identity.isEmpty) None
        else Some(identityAfter(snap.identity, added, snap.phys)),
      expectIdentity = snap.identity.map { case (c, s) => c -> s.high },
      conflictIfAdded = Some(mergeGuard))
    } finally releaseCheckpoint(src)
  }

  /** CDC APPLY (the Delta-DLT `APPLY CHANGES INTO` shape): one
    * copy-on-write commit applying a batch of keyed change directives.
    * `changes` carries the table columns plus boolean `deleteCol`: a
    * matched target key is REPLACED (flag false) or DROPPED (flag
    * true); an unmatched flag-false row inserts; an unmatched delete
    * is a no-op (the row is already gone — the at-least-once replay
    * case). At most one directive per key (ambiguity refused, like
    * [[merge]]); `txn` gives exactly-once under streaming replay.
    *
    * Same cost shape as merge: candidates stats-prune by the
    * directive keys' envelope, only files actually holding a directive
    * key rewrite, survivors anti-join on the (directive-sized) key
    * relation. CHECK constraints validate the INSERTED rows only
    * (survivors were already valid; deletes add nothing). */
  def applyChanges(spark: SparkSession, dir: String, changes: DataFrame,
      keyCols: Seq[String], deleteCol: String,
      statsCols: Seq[String] = Nil,
      txn: Option[(String, Long)] = None): Long =
    applyCowChanges(spark, dir, changes, keyCols, deleteCol, statsCols,
      txn, group = false)

  // ---- general MERGE (arbitrary ON, clause lists) ------------------

  /** One WHEN clause of [[mergeInto]]. Conditions and values are
    * Columns over the two sides of the merge, referenced through the
    * fixed aliases `t` (target) and `s` (source) — `col("t.k") ===
    * col("s.k")`; bare names resolve when unambiguous. */
  sealed trait MergeClause
  /** WHEN MATCHED [AND cond] THEN UPDATE SET — `set` maps target
    * column names to value expressions (cast to the column's declared
    * type). */
  final case class MergeMatchedUpdate(set: Map[String, Column],
      cond: Option[Column] = None) extends MergeClause
  /** WHEN MATCHED [AND cond] THEN DELETE. */
  final case class MergeMatchedDelete(cond: Option[Column] = None)
      extends MergeClause
  /** WHEN NOT MATCHED [AND cond] THEN INSERT — `values` must cover
    * every target column that is neither GENERATED (recomputed) nor
    * DEFAULTed (filled); identity columns take the values given
    * (BY DEFAULT only — ALWAYS tables refuse keyed-rewrite DML). */
  final case class MergeInsert(values: Map[String, Column],
      cond: Option[Column] = None) extends MergeClause
  /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET — the
    * condition and values may reference TARGET columns only. */
  final case class MergeNotMatchedBySourceUpdate(
      set: Map[String, Column], cond: Option[Column] = None)
      extends MergeClause
  /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE. */
  final case class MergeNotMatchedBySourceDelete(
      cond: Option[Column] = None) extends MergeClause

  /** Top-level directory count above which [[convertInPlace]] lists
    * the tree in a distributed job instead of one driver iterator.
    * Mutable for stress parity tests only. */
  private[graft] var ConvertListDirsThreshold = 64

  /** TEST-ONLY deterministic interleave hook — see commitStaged. */
  private[graft] val testBeforeClaim =
    new ThreadLocal[Option[() => Unit]] {
      override def initialValue(): Option[() => Unit] = None
    }

  private val MergeAct = "__graft_act"
  private val MergeNv = "__graft_nv_"

  /** Equality conjuncts `t.c = <source-only expr>` of a merge ON
    * condition — the stats-prunable shape. Bare names count only when
    * they name exactly one side. */
  private def mergeEqPairs(cond: Column, schema: StructType,
      srcCols: Set[String]): Seq[(String, Column)] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd,
      EqualTo => CEq, Expression}
    val tcols = schema.fieldNames.map(c => c.toLowerCase -> c).toMap
    val scolsL = srcCols.map(_.toLowerCase)
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    def asTargetCol(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => a.nameParts.toList match {
        case q :: c :: Nil if q.equalsIgnoreCase("t") =>
          tcols.get(c.toLowerCase)
        case c :: Nil if !scolsL.contains(c.toLowerCase) =>
          tcols.get(c.toLowerCase)
        case _ => None
      }
      case _ => None
    }
    def sourceOnly(e: Expression): Boolean = {
      val attrs = e.collect { case a: UnresolvedAttribute => a }
      attrs.nonEmpty && attrs.forall(_.nameParts.toList match {
        case q :: _ :: Nil => q.equalsIgnoreCase("s")
        case c :: Nil => scolsL.contains(c.toLowerCase) &&
          !tcols.contains(c.toLowerCase)
        case _ => false
      })
    }
    conjuncts(PlanBridge.expression(cond)).flatMap {
      case CEq(l, r) =>
        asTargetCol(l).filter(_ => sourceOnly(r))
          .map(c => (c, PlanBridge.column(r))).orElse(
            asTargetCol(r).filter(_ => sourceOnly(l))
              .map(c => (c, PlanBridge.column(l)))).toSeq
      case _ => Nil
    }
  }

  /** General row-level MERGE (Delta's full `MERGE INTO` statement —
    * the SQL rule lowers to this, and it is the Scala API for merges
    * the keyed [[merge]] cannot express): an arbitrary ON condition
    * joins `source` against the table; WHEN MATCHED clauses update or
    * delete the matching target rows, WHEN NOT MATCHED clauses insert
    * unmatched SOURCE rows, WHEN NOT MATCHED BY SOURCE clauses update
    * or delete unmatched TARGET rows. Clauses of a family apply
    * first-match-wins in declaration order; a row firing no clause
    * survives unchanged. A target row matching MORE than one source
    * row refuses when any MATCHED clause exists (the Delta
    * cardinality contract — attributing the update would be
    * ambiguous). All in ONE commit: copy-on-write of exactly the
    * files holding rows that change; untouched files survive by path.
    *
    * Scale: candidate files prune by the source's envelope on every
    * `t.c = <source expr>` equality conjunct of ON (one tiny agg over
    * the source, driver-side interval check from commit metadata) —
    * an ON with no such conjunct scans every file (unavoidable: any
    * row could match). The source relation is joined, never
    * collected; NOT MATCHED BY SOURCE forces a full-candidate scan by
    * definition. Reference analog: the ETL manager's UPSERT load type
    * (etl_manager.py:240-259) generalized to the full SQL statement
    * shape. */
  def mergeInto(spark: SparkSession, dir: String, source: DataFrame,
      cond: Column, clauses: Seq[MergeClause],
      statsCols: Seq[String] = Nil, op: String = "merge"): Long = {
    require(clauses.nonEmpty, "TxLog: mergeInto needs at least one WHEN clause")
    val snap = snapshot(spark, dir)
    // ALWAYS identity only forbids what would SUPPLY generated values:
    // an INSERT clause (new rows need ids the caller cannot mint).
    // UPDATE clauses cannot assign identity (checkSet refuses) and
    // re-staged matched/NMBS rows keep the TARGET's own ids, so
    // update/delete-only merges — including the subquery-DML
    // lowerings — are safe on ALWAYS tables.
    if (clauses.exists(_.isInstanceOf[MergeInsert]))
      refuseAlwaysIdentity(snap, op)
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val fieldType = schema.fields.map(fl => fl.name -> fl.dataType).toMap
    require(!source.columns.contains(MergeAct) &&
      !source.columns.exists(_.startsWith(MergeNv)),
      s"TxLog: source columns collide with reserved names $MergeAct/$MergeNv*")

    val matched = clauses.collect {
      case c: MergeMatchedUpdate => c: MergeClause
      case c: MergeMatchedDelete => c: MergeClause
    }
    val inserts = clauses.collect { case c: MergeInsert => c }
    val nmbs = clauses.collect {
      case c: MergeNotMatchedBySourceUpdate => c: MergeClause
      case c: MergeNotMatchedBySourceDelete => c: MergeClause
    }

    // assignment validation: known columns, never generated/identity
    def checkSet(set: Map[String, Column], what: String): Unit = {
      val unknown = set.keys.filterNot(fieldType.contains)
      require(unknown.isEmpty,
        s"TxLog: merge $what sets unknown column(s): ${unknown.mkString(", ")}")
      val gen = set.keys.filter(snap.generated.contains)
      require(gen.isEmpty,
        s"TxLog: merge $what cannot set generated column(s) " +
          s"${gen.mkString(", ")} — they recompute from their sources")
      val ident = set.keys.filter(snap.identity.contains)
      require(what == "INSERT" || ident.isEmpty,
        s"TxLog: merge $what cannot set identity column(s) " +
          s"${ident.mkString(", ")} (Delta's identity contract)")
    }
    matched.foreach {
      case MergeMatchedUpdate(set, _) => checkSet(set, "UPDATE")
      case _ => ()
    }
    nmbs.foreach {
      case MergeNotMatchedBySourceUpdate(set, _) => checkSet(set, "UPDATE")
      case _ => ()
    }
    inserts.foreach { ins =>
      checkSet(ins.values, "INSERT")
      val missing = schema.fieldNames.filterNot(c =>
        ins.values.contains(c) || snap.generated.contains(c) ||
          snap.defaults.contains(c))
      require(missing.isEmpty,
        s"TxLog: merge INSERT must provide column(s) " +
          s"${missing.mkString(", ")} (or declare a DEFAULT; " +
          "identity values must be explicit in MERGE)")
    }

    // the source feeds up to five actions below (envelope agg,
    // cardinality stats, NMBS probe, firing pairs, inserts) —
    // materialize it once with lineage truncated (Delta's
    // materialize-source precedent)
    val srcData = checkpointed(source)
    try {
    // candidate files: the source envelope on every `t.c = s-expr`
    // equality conjunct prunes from commit metadata — unless NOT
    // MATCHED BY SOURCE is present, which reads every row by meaning
    val eqPairs = mergeEqPairs(cond, schema, source.columns.toSet)
    val seenPaths = snap.files.map(_.path).toSet
    val (cands, addedGuard): (Seq[TxFile], Seq[TxFile] => Seq[String]) =
      if (nmbs.nonEmpty || eqPairs.isEmpty)
        // the merge READS every row (no prunable envelope, or NOT
        // MATCHED BY SOURCE) — any concurrently-added file conflicts
        (snap.files,
          files => files.filterNot(f => seenPaths.contains(f.path))
            .map(_.path))
      else {
        val aggs = eqPairs.zipWithIndex.flatMap { case ((_, e), i) =>
          Seq(min(e).as(s"_lo$i"), max(e).as(s"_hi$i")) }
        val row = srcData.alias("s").agg(aggs.head, aggs.tail: _*).head()
        val preds = eqPairs.zipWithIndex.flatMap { case ((c, _), i) =>
          val (lo, hi) = (row.get(2 * i), row.get(2 * i + 1))
          if (lo == null || hi == null) Nil
          else Seq((c, Option[Any](lo), Option[Any](hi)))
        }
        (prunedSnapshotFiles(spark, snap, preds),
          files => prunedSnapshotFiles(spark, snap.copy(files =
            files.filterNot(f => seenPaths.contains(f.path))), preds)
            .map(_.path))
      }

    def orConds(cs: Seq[Option[Column]]): Column =
      cs.map(_.getOrElse(lit(true))).reduceOption(_ || _)
        .getOrElse(lit(false))
    // first-match-wins action index: fold right so earlier clauses win
    def firstFire(cs: Seq[Option[Column]]): Column =
      cs.zipWithIndex.foldRight(lit(-1): Column) { case ((c, i), rest) =>
        when(c.getOrElse(lit(true)), lit(i)).otherwise(rest)
      }

    val srcMarked = srcData.alias("s")
    val tgtCands = readSnapshotTagged(spark, dir,
      snap.copy(files = cands)).alias("t")

    val matchedConds = matched.map {
      case MergeMatchedUpdate(_, c) => c
      case MergeMatchedDelete(c) => c
      case _ => None
    }
    val anyMatchedFires = orConds(matchedConds)

    // ---- pass 1: touched files + cardinality, aggregate-sized ------
    val (touchedMatch, multiMatch): (Seq[String], Long) =
      if (matched.isEmpty || cands.isEmpty) (Nil, 0L)
      else {
        val stats = tgtCands.join(srcMarked, cond, "inner")
          .groupBy(col(TagFile), col(TagIdx))
          .agg(count(lit(1)).as("__m"),
            max(when(anyMatchedFires, 1).otherwise(0)).as("__f"))
        val multi = stats.filter(col("__m") > 1 && col("__f") === 1)
          .limit(1).count()
        val files =
          if (multi > 0) Nil
          else stats.filter(col("__f") === 1).select(TagFile)
            .distinct().collect().map(_.getString(0)).toSeq
        (files, multi)
      }
    require(multiMatch == 0L,
      "TxLog: merge source has multiple rows matching one target row " +
        "where a MATCHED clause applies — ambiguous, refused " +
        "(the Delta cardinality contract)")

    val nmbsConds = nmbs.map {
      case MergeNotMatchedBySourceUpdate(_, c) => c
      case MergeNotMatchedBySourceDelete(c) => c
      case _ => None
    }
    val touchedNmbs: Seq[String] =
      if (nmbs.isEmpty || cands.isEmpty) Nil
      else tgtCands.join(srcMarked, cond, "left_anti")
        .filter(orConds(nmbsConds))
        .select(TagFile).distinct().collect().map(_.getString(0)).toSeq

    val touched = (touchedMatch ++ touchedNmbs).distinct.sorted
    val tSet = touched.toSet
    val keepFiles = snap.files.filter(f => tSet.contains(fileKey(snap, f)))

    // ---- pass 2: firing pairs -> per-row new values ----------------
    // cardinality holds, so firing pairs are UNIQUE per target row --
    // the left join below can never multiply survivors
    val matchedAct = firstFire(matchedConds)
    val tgtKeep = readSnapshotTagged(spark, dir,
      snap.copy(files = keepFiles)).alias("t")
    val pairCols = Seq(col(TagFile), col(TagIdx),
      matchedAct.as(MergeAct)) ++ schema.fields.map { fl =>
      matched.zipWithIndex.foldLeft(col("t." + fl.name)) {
        case (acc, (MergeMatchedUpdate(set, _), i))
            if set.contains(fl.name) =>
          when(matchedAct === i, set(fl.name).cast(fl.dataType))
            .otherwise(acc)
        case (acc, _) => acc
      }.as(MergeNv + fl.name)
    }
    // When NOT MATCHED BY SOURCE clauses exist, the NMBS chain must be
    // gated on true matched-ness, not on a firing MATCHED pair: a
    // target row that matches the source but fires no MATCHED clause
    // must still be exempt from NMBS. Include non-firing pairs with
    // act = -1 (a no-op carrying the original values); the cardinality
    // gate above guarantees a target row with a firing pair has
    // exactly one pair, and multi-match rows are ALL non-firing with
    // identical projected values, so the per-row dedupe is value-safe.
    val needMatchFlag = nmbs.nonEmpty
    val pairs =
      if ((matched.isEmpty && !needMatchFlag) || keepFiles.isEmpty) None
      else {
        val joined = tgtKeep.join(srcMarked, cond, "inner")
        val scoped =
          if (needMatchFlag) joined else joined.filter(anyMatchedFires)
        val sel = scoped.select(pairCols: _*)
        Some(if (needMatchFlag) sel.dropDuplicates(TagFile, TagIdx)
             else sel)
      }

    val deleteActs = matched.zipWithIndex.collect {
      case (MergeMatchedDelete(_), i) => i }.toSet
    val nmbsDeleteActs = nmbs.zipWithIndex.collect {
      case (MergeNotMatchedBySourceDelete(_), i) => i }.toSet
    val nmbsAct = firstFire(nmbsConds)

    def notIn(c: Column, acts: Set[Int]): Column =
      if (acts.isEmpty) lit(true)
      else !c.isInCollection(acts.toSeq)

    val survivors: Option[DataFrame] =
      if (keepFiles.isEmpty) None
      else {
        val base = pairs match {
          case Some(p) =>
            tgtKeep.join(p, Seq(TagFile, TagIdx), "left_outer")
          case None => tgtKeep.withColumn(MergeAct,
            lit(null).cast("int"))
        }
        // matched rows take their precomputed values; unmatched rows
        // run the NOT-MATCHED-BY-SOURCE chain (target columns only)
        val withNmbs = base.withColumn("__graft_nact",
          when(col(MergeAct).isNotNull, lit(-1)).otherwise(nmbsAct))
        val kept = withNmbs.filter(
          (col(MergeAct).isNull || notIn(col(MergeAct), deleteActs)) &&
            notIn(col("__graft_nact"), nmbsDeleteActs))
        val projected = kept.select(schema.fields.map { fl =>
          val nmbsVal = nmbs.zipWithIndex.foldLeft(col("t." + fl.name)) {
            case (acc, (MergeNotMatchedBySourceUpdate(set, _), i))
                if set.contains(fl.name) =>
              when(col("__graft_nact") === i,
                set(fl.name).cast(fl.dataType)).otherwise(acc)
            case (acc, _) => acc
          }
          (pairs match {
            case Some(_) =>
              when(col(MergeAct).isNotNull, col(MergeNv + fl.name))
                .otherwise(nmbsVal)
            case None => nmbsVal
          }).as(fl.name)
        } :+ (coalesce(col(MergeAct), lit(-1)) >= 0 ||
          col("__graft_nact") >= 0).as("__graft_updated"): _*)
        // generated columns recompute on every row an UPDATE touched
        val regen = snap.generated.toSeq.sortBy(_._1)
          .foldLeft(projected) { case (d, (c, g)) =>
            d.withColumn(c, when(col("__graft_updated"),
              expr(g).cast(fieldType(c))).otherwise(col(c)))
          }
        Some(regen.drop("__graft_updated"))
      }

    // ---- inserts: source rows matching NO target row ---------------
    val insertRows: Option[DataFrame] =
      if (inserts.isEmpty) None
      else {
        val insertConds = inserts.map(_.cond)
        val unmatchedSrc = srcMarked.join(tgtCands, cond, "left_anti")
          .withColumn(MergeAct, firstFire(insertConds))
          .filter(col(MergeAct) >= 0)
        val projected = unmatchedSrc.select(schema.fields.map { fl =>
          inserts.zipWithIndex.foldLeft(
            snap.defaults.get(fl.name).map(d => expr(d))
              .getOrElse(lit(null)).cast(fl.dataType)) {
            case (acc, (ins, i)) if ins.values.contains(fl.name) =>
              when(col(MergeAct) === i,
                ins.values(fl.name).cast(fl.dataType)).otherwise(acc)
            case (acc, _) => acc
          }.as(fl.name)
        }: _*)
        val withGen = snap.generated.toSeq.sortBy(_._1)
          .foldLeft(projected) { case (d, (c, g)) =>
            d.withColumn(c, expr(g).cast(fieldType(c)))
          }
        Some(withGen)
      }

    val stagedDf = (survivors, insertRows) match {
      case (Some(a), Some(b)) => Some(a.unionByName(b))
      case (a, b) => a.orElse(b)
    }
    stagedDf match {
      case None => snap.version
      case Some(df) =>
        enforceConstraints(spark, dir, df)
        val (added, _) = stageData(spark, dir, df,
          (inheritStats(keepFiles, statsCols, snap) ++
            snap.identity.keys).distinct, snap.mapping,
          partCols = snap.partitionCols)
        commitStaged(spark, dir, op, added, keepFiles.map(_.path),
          removeAll = false, snap.schemaJson, None,
          expectDv = keepFiles.map(f => f.path -> f.dv).toMap,
          identityOut = if (snap.identity.isEmpty) None
            else Some(identityAfter(snap.identity, added, snap.phys)),
          expectIdentity = snap.identity.map { case (c, s) => c -> s.high },
          conflictIfAdded = Some(addedGuard))
    }
    } finally releaseCheckpoint(srcData)
  }

  /** [[applyChanges]] with GROUP semantics: the target may hold — and
    * a directive batch may insert — SEVERAL rows per key, and an
    * upsert replaces the key's whole row GROUP (the survivors
    * anti-join already removes every target row of a directive key;
    * this form merely lifts the one-directive-per-key guard). The
    * shape a derived follower needs when one source row fans out to
    * N derived rows (chunks of a document, signatures of an
    * embedding): re-derive the group, apply — stale members vanish
    * with the group. Still refused: a key carrying BOTH delete and
    * insert directives (ambiguous — is the group dead or replaced?). */
  def applyGroupChanges(spark: SparkSession, dir: String,
      changes: DataFrame, keyCols: Seq[String], deleteCol: String,
      statsCols: Seq[String] = Nil,
      txn: Option[(String, Long)] = None): Long =
    applyCowChanges(spark, dir, changes, keyCols, deleteCol, statsCols,
      txn, group = true)

  private def applyCowChanges(spark: SparkSession, dir: String,
      changes: DataFrame, keyCols: Seq[String], deleteCol: String,
      statsCols: Seq[String], txn: Option[(String, Long)],
      group: Boolean): Long = {
    require(keyCols.nonEmpty, "TxLog: applyChanges needs at least one key column")
    val snap = snapshot(spark, dir)
    refuseAlwaysIdentity(snap, "applyChanges")
    for ((app, b) <- txn)
      if (snap.txns.get(app).exists(_ >= b)) return snap.version
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    require(changes.columns.contains(deleteCol),
      s"TxLog: applyChanges needs the delete flag column '$deleteCol'")
    val srcTypes = changes.schema.fields
      .map(fl => fl.name -> fl.dataType).toMap
    val missing = schema.fields.filterNot(fl =>
      srcTypes.get(fl.name).contains(fl.dataType))
    require(missing.isEmpty,
      s"TxLog: applyChanges source must carry the table schema; " +
        s"missing or mistyped: ${missing.map(_.name).mkString(", ")}")
    keyCols.foreach(k => require(schema.fieldNames.contains(k),
      s"TxLog: applyChanges key '$k' is not a table column"))
    // the directive relation feeds FIVE actions below (empty probe,
    // duplicate guard, key envelope, touched-file semi-join, the
    // survivors write) — materialized ONCE with lineage truncated
    // ([[checkpointed]]): a persist alone leaves every action
    // re-planning the caller's whole directive tree (for Scd2: the
    // span's change-feed diff legs + the history closures — hundreds
    // of plan nodes per action). Touched-key-sized by the
    // applyChanges contract, so materializing is bounded (guide §5).
    val src = checkpointed(changes.select((schema.fieldNames.map(col) :+
      col(deleteCol).cast("boolean").as(deleteCol)).toSeq: _*))
    try {
    // ONE directive-sized pass answers every metadata question the
    // apply needs — empty-batch, the per-key ambiguity guard, and the
    // key envelope that stats-prunes the candidate files — where
    // three separate actions (isEmpty probe, dup-check aggregate,
    // envelope aggregate) each re-scanned the directives (guide §1.2:
    // don't compute things twice)
    val shape = described(spark, "apply-shape") {
      val aggs = Seq(count(lit(1)).as("_graft_nkeys"),
        max(col("_graft_n")).as("_graft_maxn"),
        max(col("_graft_forms")).as("_graft_maxforms")) ++
        keyCols.flatMap(k =>
          Seq(min(col(k)).as(s"_lo_$k"), max(col(k)).as(s"_hi_$k")))
      src.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("_graft_n"),
          countDistinct(col(deleteCol)).as("_graft_forms"))
        .agg(aggs.head, aggs.tail: _*)
        .head()
    }
    // an empty directive batch (e.g. a compaction-only feed span) is
    // a no-op for the DATA — but a supplied marker still advances
    // (metadata-only), or the caller's watermark would never move
    // past the span and every later refresh would re-read it
    if (shape.getAs[Long]("_graft_nkeys") == 0L)
      return txn.fold(snap.version)(commitTxnAdvance(spark, dir, _))
    if (group)
      // several inserts per key are the point; a key that is BOTH
      // deleted and inserted in one batch is still ambiguous
      require(shape.getAs[Long]("_graft_maxforms") <= 1L,
        "TxLog: applyGroupChanges has both delete and insert " +
          "directives for one key (ambiguous, refused) — a replaced " +
          "group needs only its insert rows")
    else
      require(shape.getAs[Long]("_graft_maxn") <= 1L,
        "TxLog: applyChanges has several directives for one key " +
          "(ambiguous, refused) — collapse to the last change per key first")

    val cands = pruneByKeyBounds(spark, snap, snap.files, keyCols, shape)
    val srcKeys = src.select(keyCols.map(col): _*).distinct()
    val touched: Seq[String] =
      if (cands.isEmpty) Nil
      else described(spark, "apply-touched-probe") {
        readSnapshotTagged(spark, dir, snap.copy(files = cands))
          .select((col(TagFile) +: keyCols.map(col)).toSeq: _*)
          .join(srcKeys, keyCols, "left_semi")
          .select(TagFile).distinct().collect()
      }.map(_.getString(0)).toSeq.sorted
    val tSet = touched.toSet
    val keepFiles = snap.files.filter(f => tSet.contains(fileKey(snap, f)))
    val inserts = src.filter(!col(deleteCol))
      .select(schema.fieldNames.map(col).toSeq: _*)
    enforceGenerated(snap, inserts)
    val survivors =
      if (keepFiles.isEmpty) inserts
      else readSnapshot(spark, dir, snap.copy(files = keepFiles))
        .join(srcKeys, keyCols, "left_anti")
        .unionByName(inserts)
    enforceConstraints(spark, dir, inserts)
    val (added, _) = stageData(spark, dir, survivors,
      (inheritStats(keepFiles, statsCols, snap) ++
        snap.identity.keys).distinct, snap.mapping,
      partCols = snap.partitionCols)
    commitStaged(spark, dir, "merge", added, keepFiles.map(_.path),
      removeAll = false, snap.schemaJson, txn,
      expectDv = keepFiles.map(f => f.path -> f.dv).toMap,
      identityOut = if (snap.identity.isEmpty) None
        else Some(identityAfter(snap.identity, added, snap.phys)),
      expectIdentity = snap.identity.map { case (c, s) => c -> s.high })
    } finally releaseCheckpoint(src)
  }

  /** Merge-on-read CDC APPLY: same directive semantics as
    * [[applyChanges]], but matched target rows are retired through a
    * DELETION VECTOR instead of rewriting every touched file — the
    * directives' replacement images and inserts append as new files,
    * one `update-dv` commit. With scattered keys at scale this is the
    * difference between write cost ∝ matched rows (vector pairs +
    * images) and write cost ∝ touched-file bytes per batch — a
    * follower applying a trickle of updates against a 100 TB table
    * must not rewrite a file per touched key per micro-batch.
    * [[compact]] materializes the vectors away on schedule; the same
    * pin-by-vector-pointer concurrency contract as [[deleteMor]] /
    * [[updateMor]] applies. A batch that matches nothing commits as
    * an insert-only merge (no vector, no minReader bump). */
  def applyChangesMor(spark: SparkSession, dir: String, changes: DataFrame,
      keyCols: Seq[String], deleteCol: String,
      statsCols: Seq[String] = Nil,
      txn: Option[(String, Long)] = None): Long = {
    require(keyCols.nonEmpty,
      "TxLog: applyChangesMor needs at least one key column")
    val snap = snapshot(spark, dir)
    refuseAlwaysIdentity(snap, "applyChangesMor")
    for ((app, b) <- txn)
      if (snap.txns.get(app).exists(_ >= b)) return snap.version
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    require(changes.columns.contains(deleteCol),
      s"TxLog: applyChangesMor needs the delete flag column '$deleteCol'")
    val srcTypes = changes.schema.fields
      .map(fl => fl.name -> fl.dataType).toMap
    val missing = schema.fields.filterNot(fl =>
      srcTypes.get(fl.name).contains(fl.dataType))
    require(missing.isEmpty,
      s"TxLog: applyChangesMor source must carry the table schema; " +
        s"missing or mistyped: ${missing.map(_.name).mkString(", ")}")
    keyCols.foreach(k => require(schema.fieldNames.contains(k),
      s"TxLog: applyChangesMor key '$k' is not a table column"))
    // materialized once, lineage truncated, for the same reason as
    // applyCowChanges: the shape agg, dup guard, key envelope, matched
    // semi-join and image staging all consume (and would otherwise
    // each re-plan) the touched-key-sized directive relation
    val src = checkpointed(changes.select((schema.fieldNames.map(col) :+
      col(deleteCol).cast("boolean").as(deleteCol)).toSeq: _*))
    try {
    // one directive-sized pass answers empty-batch, insert count (the
    // image staging is PARTITIONED BY IT below — a 1k-directive
    // follower batch must write one image file, not one per shuffle
    // partition, or continuous trickle batches become small-files
    // debt), the ambiguity check, AND the key envelope that
    // stats-prunes the candidates (formerly three separate actions)
    val shape = described(spark, "apply-shape") {
      val aggs = Seq(count(lit(1)).as("_graft_nkeys"),
        max(col("_graft_n")).as("_graft_maxn"),
        sum(col("_graft_ins")).as("nIns")) ++
        keyCols.flatMap(k =>
          Seq(min(col(k)).as(s"_lo_$k"), max(col(k)).as(s"_hi_$k")))
      src.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("_graft_n"),
          sum(when(col(deleteCol), 0L).otherwise(1L)).as("_graft_ins"))
        .agg(aggs.head, aggs.tail: _*)
        .head()
    }
    if (shape.getAs[Long]("_graft_nkeys") == 0L)
      return txn.fold(snap.version)(commitTxnAdvance(spark, dir, _))
    val nIns = Option(shape.getAs[Long]("nIns")).getOrElse(0L)
    require(shape.getAs[Long]("_graft_maxn") <= 1L,
      "TxLog: applyChangesMor has several directives for one key " +
        "(ambiguous, refused) — collapse to the last change per key first")

    val cands = pruneByKeyBounds(spark, snap, snap.files, keyCols, shape)
    val srcKeys = src.select(keyCols.map(col): _*).distinct()
    val imageParts = math.min(32L, nIns / ImageFileRows + 1).toInt
    val inserts = src.filter(!col(deleteCol))
      .select(schema.fieldNames.map(col).toSeq: _*)
      .repartition(imageParts)
    enforceConstraints(spark, dir, inserts)
    enforceGenerated(snap, inserts)
    // matched LIVE rows' physical positions (readSnapshotTagged has
    // already subtracted standing vectors, so a replayed or repeated
    // key never double-counts into the new vector)
    val matched =
      if (cands.isEmpty) None
      else Some(readSnapshotTagged(spark, dir, snap.copy(files = cands))
        .join(srcKeys, keyCols, "left_semi")
        .select(col(TagFile), col(TagIdx)))
    matched.flatMap(stageDv(spark, dir, snap, _)) match {
      case None =>
        // nothing matched: a pure-insert batch (or an all-no-op
        // delete batch). Stage inserts only; no vector, no touched
        // files — an insert-only merge commit. An all-no-op delete
        // batch still advances a supplied marker (metadata-only)
        if (nIns == 0L)
          return txn.fold(snap.version)(commitTxnAdvance(spark, dir, _))
        val (added, _) = stageData(spark, dir, inserts,
          (inheritStats(Nil, statsCols, snap) ++
            snap.identity.keys).distinct, snap.mapping,
          partCols = snap.partitionCols)
        commitStaged(spark, dir, "merge", added, Nil,
          removeAll = false, snap.schemaJson, txn,
          identityOut = if (snap.identity.isEmpty) None
            else Some(identityAfter(snap.identity, added, snap.phys)),
          expectIdentity =
            snap.identity.map { case (c, s) => c -> s.high })
      case Some((dvPath, entries, expect)) =>
        val (added, _) =
          if (nIns == 0L) (Seq.empty[TxFile], 0L)
          else stageData(spark, dir, inserts,
            (inheritStats(entries, statsCols, snap) ++
              snap.identity.keys).distinct, snap.mapping,
            partCols = snap.partitionCols)
        try commitStaged(spark, dir, "update-dv",
          entries ++ added, entries.map(_.path),
          removeAll = false, snap.schemaJson, txn,
          ownsAdded = false, expectDv = expect, minReader = Some(2),
          identityOut = if (snap.identity.isEmpty) None
            else Some(identityAfter(snap.identity, added, snap.phys)),
          expectIdentity =
            snap.identity.map { case (c, s) => c -> s.high })
        catch { case e: Throwable =>
          fs(spark, new Path(dir)).delete(new Path(dir, dvPath), true)
          if (added.nonEmpty) deleteStaged(spark, dir, added)
          throw e
        }
    }
    } finally releaseCheckpoint(src)
  }

  /** Exactly-once CDC-APPLY sink: materialize a FOLLOWER table from a
    * change-feed stream (`readStream.format("txlog")
    * .option("readChangeFeed", true)`) in ONE call — the derived-copy
    * pattern (re-embed/re-score tables, downstream mirrors) that
    * otherwise needs a hand-written foreachBatch. Each micro-batch
    * collapses to its net directive per key — the LAST leg in
    * (_commit_version, insert-over-delete) order wins, so a
    * same-version delete+insert pair (an update's images) nets to the
    * post-image — then lands through [[applyChanges]] under the
    * (appId, batchId) txn marker. The first batch CREATES the
    * follower (the feed's initial load is insert-only). `mor = true`
    * routes established-table batches through [[applyChangesMor]] —
    * matched keys retire into a deletion vector instead of rewriting
    * each touched file, the write-amplification fix for a follower
    * applying scattered-key trickle updates at scale (schedule
    * [[compact]] on the follower to fold vectors away). */
  def changeFeedApplySink(feed: DataFrame, dir: String,
      keyCols: Seq[String], appId: String, checkpointDir: String,
      statsCols: Seq[String] = Nil, mor: Boolean = false,
      transform: Option[DataFrame => DataFrame] = None,
      group: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(!(mor && group),
      "TxLog: group-semantics followers are copy-on-write only " +
        "(a replaced group has no per-row position identity for a " +
        "deletion vector to retire)")
    require(transform.isDefined || !group,
      "TxLog: group = true only makes sense with a transform " +
        "(a verbatim feed is one row per key)")
    feed.writeStream.outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sp = batch.sparkSession
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*)
          .orderBy(col("_commit_version").desc,
            when(col("_change_type") === "insert", 1).otherwise(0).desc)
        val last = batch.withColumn("_graft_rn", row_number().over(w))
          .filter(col("_graft_rn") === 1)
        val srcRaw = last
          .withColumn("_graft_del", col("_change_type") === "delete")
          .drop("_change_type", "_commit_version", "_graft_rn")
        // a DERIVED follower maintains f(source row) per key: f runs
        // on the batch's net upserts only (delete directives carry
        // only their keys forward, reshaped to f's schema), so the
        // expensive derivation — an embedding, a chunking, an index
        // signature — costs the DELTA, never the corpus. A key whose
        // derivation comes back EMPTY (f dropped the row/group)
        // becomes a delete: its stale derived rows must not outlive
        // the source row that produced them.
        val src = transform match {
          case None => srcRaw
          case Some(f) =>
            val ups = f(srcRaw.filter(!col("_graft_del"))
              .drop("_graft_del"))
            keyCols.foreach(k => require(ups.columns.contains(k),
              s"TxLog: derived follower transform must preserve key " +
                s"column '$k'"))
            val upKeys = srcRaw.filter(!col("_graft_del"))
              .select(keyCols.map(col): _*).distinct()
            val vanished = upKeys.join(
              ups.select(keyCols.map(col): _*).distinct(),
              keyCols, "left_anti")
            val delKeys = srcRaw.filter(col("_graft_del"))
              .select(keyCols.map(col): _*).distinct()
              .unionByName(vanished)
            val dels = delKeys.select(ups.schema.fields.map(fl =>
              if (keyCols.contains(fl.name)) col(fl.name)
              else lit(null).cast(fl.dataType).as(fl.name)).toSeq: _*)
            ups.withColumn("_graft_del", lit(false))
              .unionByName(dels.withColumn("_graft_del", lit(true)))
        }
        if (!isLogged(sp, dir)) {
          // a CREATING batch: on the FIRST batch of a fresh
          // checkpoint an uncapped feed read can span the source's
          // whole DML history, so a key whose net state in the span
          // is 'deleted' legitimately yields a delete directive — its
          // net state in a table being created is simply absence, so
          // drop it. On a LATER batch (batchId > 0) deletes into a
          // missing table mean the follower vanished under an
          // established checkpoint — refuse rather than silently
          // recreate a partial table
          require(batchId == 0L ||
            src.filter(col("_graft_del")).isEmpty,
            s"TxLog: change-feed apply into $dir found DELETE " +
              "directives while creating the follower — the target " +
              "table is missing for an established feed; restore it " +
              "or restart the follower from a fresh checkpoint")
          val inserts = src.filter(!col("_graft_del")).drop("_graft_del")
          commitOverwrite(sp, dir, inserts, statsCols,
            txn = Some((appId, batchId)))
        } else if (mor)
          applyChangesMor(sp, dir, src, keyCols, "_graft_del", statsCols,
            txn = Some((appId, batchId)))
        else if (group)
          applyGroupChanges(sp, dir, src, keyCols, "_graft_del",
            statsCols, txn = Some((appId, batchId)))
        else
          applyChanges(sp, dir, src, keyCols, "_graft_del", statsCols,
            txn = Some((appId, batchId)))
        ()
      }.start()
  }

  /** Name of the hidden column carrying `_metadata.file_name` in
    * tagged reads; collision with a real column is refused. */
  private[graft] val TagFile = "__graft_file"
  private[graft] val TagIdx = "__graft_ridx"

  /** Broadcast the deletion-vector relation into the anti-join below
    * this many deleted rows; past it, fall back to a shuffled
    * anti-join (and schedule a [[compact]] — a vector this large has
    * outlived merge-on-read). */
  private val DvBroadcastRows = 4L * 1000 * 1000

  /** Target rows per staged image file in [[applyChangesMor]] — the
    * insert relation repartitions to `ceil(inserts / this)` (capped
    * at 32) so a trickle follower batch writes ONE image file. */
  private val ImageFileRows = 4L * 1000 * 1000

  /** The logical schema with every field renamed to its physical
    * parquet column (identity when the mapping is empty). */
  private[graft] def physSchema(schema: StructType,
      mapping: Map[String, String]): StructType =
    if (mapping.isEmpty) schema
    else StructType(schema.fields.map(fl =>
      fl.copy(name = mapping.getOrElse(fl.name, fl.name))))

  /** Raw tagged scan of explicit file paths: the table columns plus
    * `(TagFile, TagIdx)` = (file name, row position in the file) from
    * the parquet `_metadata` struct — the row's PHYSICAL identity,
    * which is what deletion vectors address. No vector is applied.
    * Scans under PHYSICAL column names, returns LOGICAL ones. */
  /** Percent-decode a fragment of `_metadata.file_path` back to the
    * RAW on-disk name (what directory listings — and therefore the
    * log — record). `url_decode` alone would also turn a literal '+'
    * into a space (form-encoding semantics); URI path encoding leaves
    * '+' untouched, so pre-escape it and the decode restores it. */
  private def pathDecode(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    url_decode(regexp_replace(c, "\\+", "%2B"))

  /** The value of a path-encoded (hive-layout) partition column,
    * recovered from `_metadata.file_path` — one codegen'd expression,
    * no extra scan. TWO decode layers stack on the raw segment: the
    * scanner URI-encodes the on-disk name ([[pathDecode]] undoes
    * that), and the on-disk name itself is HIVE-escaped (partitionBy
    * percent-escapes ':', '/', '%', '=', '#', control chars … in the
    * dir name — `ExternalCatalogUtils.escapePathName` semantics), so
    * a second percent-decode recovers the true value. Hive does not
    * escape '+', so the same plus-preserving decode applies (a bare
    * `url_decode` would corrupt it to a space). Without the second
    * layer a value like `00:00:00` read back as `00%3A00%3A00` —
    * pruning right (stats recorded the true value at registration)
    * but every returned row wrong/NULL. The null sentinel applies
    * before any decode. */
  private def pathPartValue(physName: String,
      dt: DataType): org.apache.spark.sql.Column = {
    val seg = regexp_extract(col("_metadata.file_path"),
      "/" + java.util.regex.Pattern.quote(physName) + "=([^/]+)/", 1)
    when(seg === "" || seg === "__HIVE_DEFAULT_PARTITION__",
      lit(null)).otherwise(pathDecode(pathDecode(seg))).cast(dt)
  }

  /** Read snapshot files under the LOGICAL schema, injecting
    * path-encoded partition values for hive-layout entries
    * ([[convertInPlace]] on a partitioned dataset). Nested entries
    * (path contains a directory) read WITHOUT the partition columns
    * and recover them from the file path; flat entries — every
    * post-registration write — carry them as ordinary data. One scan
    * per leg, a no-op for unpartitioned tables. */
  private def readFilesTagged(spark: SparkSession, dir: String,
      schema: StructType, paths: Seq[String],
      mapping: Map[String, String] = Map.empty,
      partCols: Seq[String] = Nil): DataFrame = {
    require(!schema.fieldNames.contains(TagFile) &&
      !schema.fieldNames.contains(TagIdx),
      s"TxLog: table columns collide with reserved names $TagFile/$TagIdx")
    val tagged = StructType(schema.fields ++ Seq(
      StructField(TagFile, StringType, nullable = true),
      StructField(TagIdx, LongType, nullable = true)))
    if (paths.isEmpty)
      return spark.createDataFrame(
        java.util.Collections.emptyList[Row](), tagged)
    // file identity: flat tables key by BASE name (unique — staged
    // writes name by UUID); a path-partitioned registration may
    // legitimately repeat base names across partition dirs, so those
    // tables key by DIR-RELATIVE path instead (flat files' relative
    // path IS their base name, so the two identities coincide there).
    // The relative path is the file's LAST depth+1 segments —
    // anchored from the right, so URI-scheme normalization
    // differences between the driver's view of `dir` and the
    // scanner's `_metadata.file_path` can never shift it
    def leg(ps: Seq[String], inject: Seq[String]): DataFrame = {
      val physS = physSchema(schema, mapping)
      val readS = StructType(physS.fields.filterNot(f =>
        inject.contains(f.name)))
      val raw = spark.read.schema(readS)
        .parquet(ps.map(p => resolveData(dir, p)): _*)
      val withParts = inject.foldLeft(raw)((d, pp) =>
        d.withColumn(pp, pathPartValue(pp, physS(pp).dataType)))
      val tagExpr =
        if (inject.isEmpty) col("_metadata.file_name")
        else pathDecode(regexp_extract(col("_metadata.file_path"),
          "/((?:[^/]+/){" + inject.size + "}[^/]+)$", 1))
      withParts.select(schema.fields.map(fl =>
        col(mapping.getOrElse(fl.name, fl.name)).as(fl.name)).toSeq ++
        Seq(tagExpr.as(TagFile),
          col("_metadata.row_index").as(TagIdx)): _*)
    }
    if (partCols.isEmpty) leg(paths, Nil)
    else {
      val (nested, flat) = paths.partition(_.contains('/'))
      val legs = Seq(
        if (nested.nonEmpty) Some(leg(nested, partCols)) else None,
        if (flat.nonEmpty) Some(leg(flat, Nil)) else None).flatten
      legs.reduce(_.unionByName(_))
    }
  }

  /** The union of the snapshot's referenced deletion vectors as a
    * `(file, row_index)` relation — deleted-row-count sized, NOT
    * table sized. */
  private def dvRelation(spark: SparkSession, dir: String,
      files: Seq[TxFile]): Option[DataFrame] = {
    val dvs = files.flatMap(_.dv).distinct
    if (dvs.isEmpty) None
    else Some(spark.read.parquet(dvs.map(p => resolveData(dir, p)): _*))
  }

  /** Snapshot read with physical row identity: table columns +
    * `(TagFile, TagIdx)`, deletion vectors ALREADY SUBTRACTED. Files
    * without a vector scan clean (no join on that branch); only the
    * dv-bearing sliver pays the anti-join, against a broadcast of the
    * (deleted-rows-sized) vector relation. */
  private def readSnapshotTagged(spark: SparkSession, dir: String,
      snap: TxSnapshot): DataFrame = {
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val (dvFiles, clean) = snap.files.partition(_.dv.isDefined)
    val cleanDf =
      readFilesTagged(spark, dir, schema, clean.map(_.path), snap.mapping,
        snap.partitionCols)
    if (dvFiles.isEmpty) return cleanDf
    val dvDf0 = dvRelation(spark, dir, dvFiles).get
    val dvDf =
      if (dvFiles.map(_.dvRows).sum <= DvBroadcastRows) broadcast(dvDf0)
      else dvDf0
    val scanned =
      readFilesTagged(spark, dir, schema, dvFiles.map(_.path), snap.mapping,
        snap.partitionCols)
    val live = scanned.join(dvDf,
      scanned(TagFile) === dvDf("file") &&
        scanned(TagIdx) === dvDf("row_index"), "left_anti")
    cleanDf.unionByName(live)
  }

  private[graft] def readSnapshot(spark: SparkSession, dir: String,
      snap: TxSnapshot): DataFrame = {
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    // planner-visible presentation first: an eligible snapshot (no
    // deletion vectors, recorded bytes, recoverable partition values)
    // reads through [[TxFileIndex]] — exact sizeInBytes for static
    // broadcast planning, stats-in-log file skipping applied to
    // pushed filters at scan time, native (dynamic) partition
    // pruning, vectorized parquet under whole-stage codegen. The
    // branches below remain the fallback plan (vectors need the
    // anti-join subtraction; legacy entries may lack bytes).
    val viaIndex =
      if (snap.files.isEmpty) None
      else TxFileRelation.planFor(spark, dir, snap)
    if (viaIndex.isDefined)
      return org.apache.spark.sql.graft.PlanBridge.fromPlan(
        spark, viaIndex.get)
    if (snap.files.isEmpty)
      spark.createDataFrame(
        java.util.Collections.emptyList[Row](), schema)
    else if (snap.files.forall(_.dv.isEmpty) &&
        snap.partitionCols.isEmpty) {
      val raw = spark.read.schema(physSchema(schema, snap.mapping))
        .parquet(snap.files.map(a => resolveData(dir, a.path)): _*)
      if (snap.mapping.isEmpty) raw
      else raw.select(schema.fields.map(fl =>
        col(snap.phys(fl.name)).as(fl.name)).toSeq: _*)
    } else if (snap.files.forall(_.dv.isEmpty))
      readFilesTagged(spark, dir, schema, snap.files.map(_.path),
        snap.mapping, snap.partitionCols).drop(TagFile, TagIdx)
    else
      readSnapshotTagged(spark, dir, snap).drop(TagFile, TagIdx)
  }

  /** Snapshot-isolated read at `asOf` (default: head). The file list
    * and schema come from one log version — concurrent commits cannot
    * tear the scan. */
  def read(spark: SparkSession, dir: String,
      asOf: Option[Long] = None): DataFrame =
    readSnapshot(spark, dir, snapshot(spark, dir, asOf))

  /** Stats-in-log data skipping: the snapshot restricted to files
    * whose recorded [min, max] for `colName` can intersect [lo, hi] —
    * answered from commit METADATA alone, no footer reads (the Delta
    * `stats` recipe; [[StatsManifest]] is the rename-managed
    * equivalent). Conservative: a file without stats for the column
    * (older commit, different writer) is always kept, and when NO
    * live file has them this is exactly [[read]]. The predicate is
    * NOT applied — callers filter as usual, and parquet row-group
    * pushdown still applies inside kept files. At 10⁶ files this
    * turns a selective scan's planning input from the dataset into
    * the intersecting sliver, resolved in one driver pass over the
    * snapshot list. */
  def readPruned(spark: SparkSession, dir: String, colName: String,
      lo: Any, hi: Any, asOf: Option[Long] = None): DataFrame =
    readPrunedAll(spark, dir, Seq((colName, lo, hi)), asOf)

  /** Compound data skipping (Delta's conjunction shape): a file is
    * kept only when EVERY `(col, lo, hi)` interval can intersect its
    * recorded range — `date BETWEEN … AND region = …` prunes on BOTH
    * columns, not whichever one the caller picked. Each predicate is
    * independently conservative (a file without stats for that column
    * passes it); an empty `preds` is exactly [[read]]. An equality is
    * the degenerate interval `(col, v, v)`. */
  def readPrunedAll(spark: SparkSession, dir: String,
      preds: Seq[(String, Any, Any)], asOf: Option[Long] = None)
      : DataFrame = {
    val snap = snapshot(spark, dir, asOf)
    val kept = prunedSnapshotFiles(spark, snap,
      preds.map { case (c, lo, hi) => (c, Option(lo), Option(hi)) })
    readSnapshot(spark, dir, snap.copy(files = kept))
  }

  /** The pruning core shared by [[readPrunedAll]] and the batch
    * "txlog" DataSource's filter pushdown: the snapshot's files
    * restricted to those whose recorded range can intersect every
    * interval. A missing side is unbounded (`col >= lo` is
    * `(c, Some(lo), None)`). Driver-side, metadata-only. */
  private[graft] def prunedSnapshotFiles(spark: SparkSession,
      snap: TxSnapshot, preds: Seq[(String, Option[Any], Option[Any])],
      nullPreds: Seq[(String, Boolean)] = Nil): Seq[TxFile] = {
    val ranged = preds.foldLeft(snap.files) { case (files, (c0, lo, hi)) =>
      val c = snap.phys(c0) // stats are keyed by physical name
      files.flatMap(_.stats.get(c)).headOption.map(_.dtype) match {
        case None => files // no live file carries stats for this column
        case Some(dt) =>
          // canonicalize each present side through the same cast the
          // stats took; an absent side never excludes
          def canon(v: Option[Any]): Option[String] = v.map { x =>
            StatsManifest.canonicalBounds(spark, dt, x, x)._1
          }
          val (loS, hiS) = (canon(lo), canon(hi))
          files.filter(f => f.stats.get(c).forall { st =>
            (st.min.orNull, st.max.orNull) match {
              case (null, _) | (_, null) => true // conservative
              case (mn, mx) =>
                loS.forall(l => StatsManifest.cmpStat(st.dtype, mx, l) >= 0) &&
                  hiS.forall(h => StatsManifest.cmpStat(st.dtype, mn, h) <= 0)
            }
          })
      }
    }
    // null-membership pruning from recorded per-file null counts:
    // `IS NULL` drops files recording ZERO nulls; `IS NOT NULL` drops
    // all-null files. Both stay sound under deletion vectors: a
    // vector removes rows, which can neither add a null to a
    // zero-null file nor add a value to an all-null one.
    nullPreds.foldLeft(ranged) { case (files, (c0, wantNull)) =>
      val c = snap.phys(c0)
      files.filter(f => f.stats.get(c).forall { st =>
        if (wantNull) !st.nulls.contains(0L)
        else {
          val allNull = st.nulls.contains(f.rows) ||
            (st.min.isEmpty && st.max.isEmpty && st.nulls.exists(_ > 0))
          !allNull
        }
      })
    }
  }

  /** Metadata-first COUNT (the Delta metadata-only-aggregate shape):
    * the exact number of rows satisfying every `(col, lo, hi)`
    * interval, scanning as little as possible. Per file, from the
    * log alone: a file whose recorded range cannot intersect some
    * interval contributes ZERO; a file FULLY CONTAINED in every
    * interval with zero recorded nulls on every probed column
    * contributes its logged row count; only the boundary sliver —
    * files straddling an interval edge, carrying nulls, or missing
    * stats — is actually scanned, with the predicate applied. Empty
    * `preds` is the table's row count straight from the log (no scan
    * at all — the `SELECT COUNT(*)` that costs one metadata read at
    * any table size). */
  def countWhere(spark: SparkSession, dir: String,
      preds: Seq[(String, Any, Any)] = Nil,
      asOf: Option[Long] = None): Long =
    countWhereDetailed(spark, dir, preds, asOf)._1

  /** [[countWhere]] plus the names of the files it had to scan —
    * exposed private[graft] so tests can pin the metadata-only
    * claim, not just the answer. */
  private[graft] def countWhereDetailed(spark: SparkSession, dir: String,
      preds: Seq[(String, Any, Any)], asOf: Option[Long])
      : (Long, Seq[String]) = {
    val snap = snapshot(spark, dir, asOf)
    // rows − dvRows is EXACT per file (the vector's pair count is
    // commit-time metadata), so COUNT(*) stays a pure metadata read
    // even after merge-on-read DML
    if (preds.isEmpty)
      return (snap.files.map(f => f.rows - f.dvRows).sum, Nil)
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val fields = schema.fields.map(f => f.name -> f.dataType).toMap
    preds.foreach { case (c, _, _) => require(fields.contains(c),
      s"TxLog: countWhere on unknown column '$c'") }
    val bounds = preds.map { case (c, lo, hi) =>
      val dt = fields(c).catalogString
      val (loS, hiS) = StatsManifest.canonicalBounds(spark, dt, lo, hi)
      (snap.phys(c), dt, loS, hiS) // stats are keyed by physical name
    }
    sealed trait Verdict
    case object Excluded extends Verdict
    case object Contained extends Verdict
    case object Boundary extends Verdict
    def judge(f: TxFile): Verdict = {
      // a deletion vector makes the logged row count an OVERcount and
      // the stats upper bounds: exclusion stays sound (removing rows
      // can't add values), but a "contained" file must scan
      var contained = f.dv.isEmpty
      bounds.foreach { case (c, dt, loS, hiS) =>
        f.stats.get(c) match {
          case Some(st) if st.min.isDefined && st.max.isDefined =>
            if (!StatsManifest.intersects(dt, st.min.get, st.max.get,
                loS, hiS))
              return Excluded
            if (!(StatsManifest.cmpStat(dt, st.min.get, loS) >= 0 &&
                StatsManifest.cmpStat(dt, st.max.get, hiS) <= 0 &&
                st.nulls.contains(0L)))
              contained = false
          case Some(st) if st.min.isEmpty && st.max.isEmpty =>
            // all-null column: no row satisfies a range predicate
            return Excluded
          case _ => contained = false // no stats: must scan
        }
      }
      if (contained) Contained else Boundary
    }
    val verdicts = snap.files.map(f => f -> judge(f))
    val metaCount = verdicts
      .collect { case (f, Contained) => f.rows }.sum
    val toScan = verdicts.collect { case (f, Boundary) => f }
    val scanned =
      if (toScan.isEmpty) 0L
      else {
        val pred = preds.map { case (c, lo, hi) =>
          col(c).between(lit(lo).cast(fields(c)), lit(hi).cast(fields(c)))
        }.reduce(_ && _)
        readSnapshot(spark, dir, snap.copy(files = toScan))
          .filter(pred).count()
      }
    (metaCount + scanned, toScan.map(_.path))
  }

  /** Metadata-first MIN/MAX (the other Delta metadata-only aggregate
    * beside [[countWhere]], the OptimizeMetadataOnlyQuery shape):
    * exact per-column extrema of the live rows, reading as little
    * data as possible. A file with recorded stats and no deletion
    * vector contributes its logged min/max — per-file stats are exact
    * extrema computed from the data at write time, so folding them
    * across files IS the global answer, zero data I/O at any table
    * size. Only files whose logged extrema cannot be trusted are
    * scanned, column-pruned, in ONE pass: a deletion vector may have
    * removed the extremal row (the logged bound becomes an
    * overstatement — sound for pruning, unsound for an answer), and
    * missing stats say nothing. All-null columns contribute nothing
    * (SQL MIN/MAX ignore nulls); a column null in every live row
    * yields null — the SQL answer. Returns one row with
    * `min_c`/`max_c` per requested column in the column's own type.
    * [[compact]] folds vectors away and refreshes stats, restoring
    * the pure-metadata path after merge-on-read DML. */
  def minMax(spark: SparkSession, dir: String, cols: Seq[String],
      asOf: Option[Long] = None): DataFrame =
    minMaxDetailed(spark, dir, cols, asOf)._1

  /** [[minMax]] plus the names of the files it had to scan — exposed
    * private[graft] so tests pin the metadata-only claim, not just
    * the answer (mirrors [[countWhereDetailed]]). */
  private[graft] def minMaxDetailed(spark: SparkSession, dir: String,
      cols: Seq[String], asOf: Option[Long])
      : (DataFrame, Seq[String]) = {
    require(cols.nonEmpty, "TxLog: minMax needs at least one column")
    val snap = snapshot(spark, dir, asOf)
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val fields = schema.fields.map(f => f.name -> f.dataType).toMap
    cols.foreach(c => require(fields.contains(c),
      s"TxLog: minMax on unknown column '$c'"))
    val dtypes = cols.map(c => c -> fields(c).catalogString).toMap
    // stats cover a column when both bounds are recorded, or when the
    // recorded state is "all null" (min and max both absent) — the
    // file then contributes nothing, which is exact
    def covered(f: TxFile, c: String): Boolean =
      f.stats.get(snap.phys(c)).exists(st =>
        (st.min.isDefined && st.max.isDefined) ||
          (st.min.isEmpty && st.max.isEmpty))
    val (meta, toScan) = snap.files.partition(f =>
      f.dv.isEmpty && cols.forall(c => covered(f, c)))
    def better(dt: String, takeMin: Boolean)(a: String, b: String) =
      if ((StatsManifest.cmpStat(dt, a, b) <= 0) == takeMin) a else b
    val metaBounds: Map[String, (Option[String], Option[String])] =
      cols.map { c =>
        val sts = meta.flatMap(_.stats.get(snap.phys(c)))
        c -> (sts.flatMap(_.min)
            .reduceOption(better(dtypes(c), takeMin = true)),
          sts.flatMap(_.max)
            .reduceOption(better(dtypes(c), takeMin = false)))
      }.toMap
    // one column-pruned pass over the sliver; extrema come back in
    // the SAME canonical cast-to-string forms the stats use, so the
    // two sources fold under one comparator
    val scanned: Map[String, (Option[String], Option[String])] =
      if (toScan.isEmpty) Map.empty
      else {
        val row = readSnapshot(spark, dir, snap.copy(files = toScan))
          .select(cols.flatMap(c => Seq(
            min(col(c)).cast("string").as(s"_min_$c"),
            max(col(c)).cast("string").as(s"_max_$c"))): _*)
          .head()
        cols.map(c => c -> (Option(row.getAs[String](s"_min_$c")),
          Option(row.getAs[String](s"_max_$c")))).toMap
      }
    val out = cols.flatMap { c =>
      def pick(takeMin: Boolean): Option[String] =
        Seq(metaBounds(c), scanned.getOrElse(c, (None, None)))
          .map(b => if (takeMin) b._1 else b._2)
          .flatten.reduceOption(better(dtypes(c), takeMin))
      def asCol(v: Option[String]): org.apache.spark.sql.Column =
        v.map(s => lit(s).cast(fields(c))).getOrElse(lit(null).cast(fields(c)))
      Seq(asCol(pick(takeMin = true)).as(s"min_$c"),
        asCol(pick(takeMin = false)).as(s"max_$c"))
    }
    (spark.range(1).select(out: _*), toScan.map(_.path))
  }

  /** Incremental consumption: the rows ADDED by commits in
    * `(sinceVersion, untilVersion]` — the Delta-streaming-source /
    * CDC-read shape that lets downstream work (re-embed, re-dedup,
    * re-score) process only what arrived instead of the table. A
    * consumer remembers the version it read through ([[snapshot]]
    * `.version`) and passes it back as `sinceVersion`; `-1` reads
    * from the table's creation.
    *
    * Append commits contribute their added files; compactions
    * contribute NOTHING (their additions are rewrites of removed
    * rows, not new data); an overwrite inside the span throws — its
    * retractions are not expressible as additions (same contract as
    * Delta's streaming source without ignoreChanges) — except the
    * table-creating commit when reading from `-1`, which is the
    * initial load. Cost: log metadata + a scan of ONLY the delta
    * files.
    *
    * The refusal has Delta's two documented escape hatches for
    * appends-only consumers that accept missing corrections:
    * `ignoreDeletes` skips DELETE commits entirely (a CoW delete's
    * adds are rewrites of surviving, already-consumed rows — like a
    * compaction — and a MoR delete adds nothing, so skipping the
    * commit neither duplicates nor resurrects); `skipChangeCommits`
    * additionally skips UPDATE / row-rewriting MERGE / mid-span
    * OVERWRITE commits wholesale — the consumer then silently misses
    * the changed rows, which is the option's documented contract.
    * Without either flag ONE DML commit on a curated table would
    * permanently brick every appends-only downstream. */
  def changesSince(spark: SparkSession, dir: String, sinceVersion: Long,
      untilVersion: Option[Long] = None,
      skipChangeCommits: Boolean = false,
      ignoreDeletes: Boolean = false): DataFrame = {
    val (added, snap) = changedFilesDetail(spark, dir, sinceVersion,
      untilVersion, skipChangeCommits, ignoreDeletes)
    readAdded(spark, dir, added,
      DataType.fromJson(snap.schemaJson).asInstanceOf[StructType],
      snap.mapping, snap.partitionCols)
  }

  /** Materialize a [[changedFiles]] result under LOGICAL names — the
    * ONE place both incremental consumption forms ([[changesSince]]
    * and the streaming source) turn file entries into rows, so path
    * resolution (dir-relative entries vs a clone's absolute v0
    * entries) can never fork between them. */
  private[sources] def readAdded(spark: SparkSession, dir: String,
      added: Seq[TxFile], schema: StructType,
      mapping: Map[String, String],
      partCols: Seq[String] = Nil): DataFrame =
    if (added.isEmpty)
      spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)
    else if (partCols.isEmpty) {
      val raw = spark.read.schema(physSchema(schema, mapping))
        .parquet(added.map(a => resolveData(dir, a.path)): _*)
      if (mapping.isEmpty) raw
      else raw.select(schema.fields.map(fl =>
        col(mapping.getOrElse(fl.name, fl.name)).as(fl.name)).toSeq: _*)
    } else
      readFilesTagged(spark, dir, schema, added.map(_.path), mapping,
        partCols).drop(TagFile, TagIdx)

  /** The ONE policy predicate behind `skipChangeCommits` /
    * `ignoreDeletes`: does this commit get skipped WHOLESALE from an
    * appends-only span? Shared by [[changedFiles]] (what the span
    * emits) and [[commitAddCost]] (what admission budgets) — the two
    * MUST agree, or a zero-budget commit could emit rows past the cap
    * (or a skipped one stall a capped stream a whole trigger).
    * Insert-only merges (no removes) and the v0 table-creating
    * overwrite are never skipped — they are the initial load and
    * plain additions. */
  private def dmlSkipped(op: String, v: Long, removesNonEmpty: Boolean,
      skipChangeCommits: Boolean, ignoreDeletes: Boolean): Boolean =
    (Seq("delete", "delete-dv").contains(op) &&
      (skipChangeCommits || ignoreDeletes)) ||
    (skipChangeCommits && Seq("update", "update-dv").contains(op)) ||
    (skipChangeCommits && op == "overwrite" && v > 0) ||
    (skipChangeCommits && op == "merge" && removesNonEmpty)

  /** The core of [[changesSince]], shared with the streaming source
    * ([[TxLogStreamProvider]]): the files the commits in
    * `(sinceVersion, untilVersion]` ADDED, plus the span-end schema —
    * with every refusal (truncated span, overwrite inside the span,
    * vacuumed delta files) applied here so both consumption forms get
    * identical contracts. */
  def changedFiles(spark: SparkSession, dir: String, sinceVersion: Long,
      untilVersion: Option[Long] = None,
      skipChangeCommits: Boolean = false,
      ignoreDeletes: Boolean = false)
      : (Seq[TxFile], StructType, Map[String, String]) = {
    val (added, snap) = changedFilesDetail(spark, dir, sinceVersion,
      untilVersion, skipChangeCommits, ignoreDeletes)
    (added,
      DataType.fromJson(snap.schemaJson).asInstanceOf[StructType],
      snap.mapping)
  }

  /** [[changedFiles]] plus the resolved until-snapshot itself — the
    * streaming source needs `retired` for its dropped-column guard,
    * and re-replaying the log for it would double the per-trigger
    * driver cost. */
  private[sources] def changedFilesDetail(spark: SparkSession,
      dir: String, sinceVersion: Long,
      untilVersion: Option[Long] = None,
      skipChangeCommits: Boolean = false,
      ignoreDeletes: Boolean = false): (Seq[TxFile], TxSnapshot) = {
    val (commits, _) = listLog(spark, dir)
    require(commits.nonEmpty, s"TxLog: no transaction log under $dir/$LogDir")
    val head = commits.max
    val until = untilVersion.getOrElse(head)
    require(until <= head, s"TxLog: until $until beyond head $head")
    require(sinceVersion <= until,
      s"TxLog: since $sinceVersion beyond until $until")
    val span = (sinceVersion + 1) to until
    val present = commits.toSet
    val missing = span.filterNot(present)
    require(missing.isEmpty,
      s"TxLog: commits ${missing.take(3).mkString(",")}… truncated; " +
        "incremental read from this version is no longer possible")
    val f = fs(spark, logPath(dir))
    val added = span.flatMap { v =>
      val j = JsonMethods.parse(readText(f, versionFile(dir, v)))
      (j \ "op").extract[String] match {
        case "append" => (j \ "add").extract[Seq[TxFile]]
        case "compact" => Nil // rewrites, not new rows
        case "overwrite" | "clone" if v == 0 && sinceVersion < 0 =>
          // initial load — but a CLONE's v0 may register the source's
          // files WITH their deletion vectors, and reading those files
          // raw would resurrect source-deleted rows as live inserts.
          // Same contract as a dv commit inside the span: a vector
          // removes rows, so the delta is not expressible as
          // additions — refuse and re-seed from the snapshot.
          val entries = (j \ "add").extract[Seq[TxFile]]
          val withDv = entries.count(_.dv.isDefined)
          require(withDv == 0,
            s"TxLog: commit $v registers $withDv file(s) with deletion " +
              "vectors (a vector removes rows) — the span's delta is " +
              "not expressible as additions; re-read the full snapshot")
          entries
        case "merge" if (j \ "remove").extract[Seq[String]].isEmpty =>
          // an insert-only merge removed nothing: its adds ARE the
          // delta; a merge that rewrote files falls through to refuse
          (j \ "add").extract[Seq[TxFile]]
        case "constraints" | "rename" | "drop" =>
          Nil // metadata only, no rows
        case op if dmlSkipped(op, v,
            (j \ "remove").extract[Seq[String]].nonEmpty,
            skipChangeCommits, ignoreDeletes) =>
          // skipped wholesale (the ONE policy predicate admission
          // control also budgets by): a CoW delete's adds are
          // rewrites of surviving rows the consumer already has, a
          // MoR delete's re-register files under a vector — emitting
          // either would duplicate, skipping loses only the change,
          // exactly what the flag opts into. Insert-only merges and
          // the v0 initial load matched ABOVE and still flow
          Nil
        case op => throw new IllegalArgumentException(
          s"TxLog: commit $v is '$op' — the span's delta is not " +
            "expressible as additions; re-read the full snapshot, " +
            "stream with readChangeFeed, or opt in to skipping DML " +
            "commits (skipChangeCommits / ignoreDeletes)")
      }
    }
    // an appended file later compacted away AND vacuumed is gone from
    // disk even though its commit survives — refuse with the same
    // clear contract as log truncation instead of a scan-time
    // path-not-found (one driver listing, not one RPC per file)
    if (added.nonEmpty) {
      val live = fs(spark, new Path(dir)).listStatus(new Path(dir))
        .filter(_.isFile).map(_.getPath.getName).toSet
      val f2 = fs(spark, new Path(dir))
      val gone = added.filterNot(a =>
        if (a.path.contains("/")) f2.exists(resolvePath(dir, a.path))
        else live.contains(a.path))
      require(gone.isEmpty,
        s"TxLog: ${gone.size} delta file(s) in ($sinceVersion, $until] " +
          s"were vacuumed (first: ${gone.take(2).map(_.path)
            .mkString(", ")}); incremental read from this version is " +
          "no longer possible; re-read the full snapshot")
    }
    (added, snapshot(spark, dir, Some(until)))
  }

  /** The (files, rows, bytes) a commit's stream-visible additions
    * cost — answered from log metadata only; what the streaming
    * source's admission control budgets against. Compactions cost
    * zero (their adds are rewrites [[changedFiles]] skips, so
    * admitting them against the cap would stall real data behind
    * maintenance). `bytes` is `None` when any added entry predates
    * byte recording — the byte budget must then treat the commit
    * CONSERVATIVELY (assume over-budget), never as free. */
  private[sources] def commitAddCost(spark: SparkSession, dir: String,
      v: Long, skipChangeCommits: Boolean = false,
      ignoreDeletes: Boolean = false): (Long, Long, Option[Long]) = {
    val f = fs(spark, logPath(dir))
    val j = JsonMethods.parse(readText(f, versionFile(dir, v)))
    val op = (j \ "op").extract[String]
    val skipped = op == "compact" ||
      dmlSkipped(op, v, (j \ "remove").extract[Seq[String]].nonEmpty,
        skipChangeCommits, ignoreDeletes)
    if (skipped) (0L, 0L, Some(0L)) // no stream rows — budget-free
    else {
      val adds = (j \ "add").extract[Seq[TxFile]]
      val bytes =
        if (adds.forall(_.bytes.isDefined)) Some(adds.flatMap(_.bytes).sum)
        else None
      (adds.size.toLong, adds.map(_.rows).sum, bytes)
    }
  }

  // ---- time travel by timestamp ------------------------------------

  /** IN-COMMIT timestamp for the commit being written (Delta 3.x's
    * inCommitTimestamps): `max(clock, ts(v−1) + 1)` — recorded inside
    * the commit json so the time-travel axis survives file copies,
    * backups, and mtime-less object stores, and is strictly
    * increasing at the WRITE side (two same-millisecond commits get
    * distinct timestamps). The previous commit's file may predate
    * timestamp recording (fall back to its mtime) or be truncated
    * away (v0 of the available history — fall back to the clock). */
  private def nextCommitTs(f: FileSystem, dir: String, v: Long): Long = {
    val now = System.currentTimeMillis()
    if (v == 0) now
    else try {
      val pf = versionFile(dir, v - 1)
      val prev = (JsonMethods.parse(readText(f, pf)) \ "ts")
        .extractOpt[Long]
        .getOrElse(f.getFileStatus(pf).getModificationTime)
      math.max(now, prev + 1)
    } catch { case _: java.io.IOException => now }
  }

  /** Every present commit's (version, timestamp): the RECORDED
    * in-commit timestamp when the commit carries one, the commit
    * file's modification time for commits that predate timestamp
    * recording, with Delta's monotonicity adjustment
    * (`ts(v) = max(t(v), ts(v−1) + 1)`) over the merged axis — a
    * clock that jumped backwards between commits (or a copied log
    * whose mtimes scrambled around recorded timestamps) must not make
    * a later version resolve before an earlier one. Driver-side, one
    * small json read per commit. */
  private def commitTimestamps(spark: SparkSession, dir: String)
      : Seq[(Long, Long)] = {
    val (commits, _) = listLog(spark, dir)
    require(commits.nonEmpty, s"TxLog: no transaction log under $dir/$LogDir")
    val f = fs(spark, logPath(dir))
    var prev = Long.MinValue
    commits.map { v =>
      val p = versionFile(dir, v)
      val t = (JsonMethods.parse(readText(f, p)) \ "ts").extractOpt[Long]
        .getOrElse(f.getFileStatus(p).getModificationTime)
      val adj = if (prev == Long.MinValue) t else math.max(t, prev + 1)
      prev = adj
      (v, adj)
    }
  }

  /** TIMESTAMP AS OF resolution (Delta's rule): the latest version
    * whose commit timestamp is ≤ `ts`. Operators think in times ("the
    * table as of yesterday 18:00"); this maps a time onto the version
    * axis every other time-travel entry point ([[read]], [[clone]],
    * [[restore]]) already speaks. Refuses a `ts` before the first
    * AVAILABLE commit — which is also the [[truncateLog]] parity:
    * once old commit files are dropped their timestamps are gone, so
    * times in that range refuse exactly like the versions do. */
  def versionAt(spark: SparkSession, dir: String, ts: Long): Long = {
    val tss = commitTimestamps(spark, dir)
    val (v0, t0) = tss.head
    require(ts >= t0,
      s"TxLog: timestamp $ts is before the first available commit " +
        s"(version $v0 at $t0) of $dir" +
        (if (v0 > 0) " — older history was truncated" else ""))
    tss.takeWhile(_._2 <= ts).last._1
  }

  /** Snapshot-isolated read of the table as of wall-clock `ts`
    * (Delta's `TIMESTAMP AS OF`): [[versionAt]] then [[read]]. */
  def readAt(spark: SparkSession, dir: String, ts: Long): DataFrame =
    read(spark, dir, Some(versionAt(spark, dir, ts)))

  /** The dual of [[versionAt]]: the EARLIEST version committed
    * at-or-after `ts` — what a streaming consumer's
    * `startingTimestamp` resolves through (Delta's rule). Refuses a
    * `ts` beyond the last commit (nothing starts there — use
    * `startingVersion=latest` to tail only new commits). */
  def versionAtOrAfter(spark: SparkSession, dir: String, ts: Long): Long = {
    val tss = commitTimestamps(spark, dir)
    tss.find(_._2 >= ts).map(_._1).getOrElse(
      throw new IllegalArgumentException(
        s"TxLog: no commit of $dir at or after timestamp $ts (last is " +
          s"${tss.last._2}) — use startingVersion=latest to consume " +
          "only future commits"))
  }

  /** [[clone]] of the table as it stood at wall-clock `ts`. */
  def cloneAt(spark: SparkSession, sourceDir: String, targetDir: String,
      ts: Long): Long =
    clone(spark, sourceDir, targetDir,
      Some(versionAt(spark, sourceDir, ts)))

  /** Resolve a wall-clock window to the commit span `(since, until]`
    * the batch feed readers consume: commits whose (monotonicity-
    * adjusted) timestamp falls in `[sinceTs, untilTs]` — `sinceTs`
    * resolves through [[versionAtOrAfter]] (Delta's startingTimestamp
    * rule, same as the stream), `untilTs` through [[versionAt]]
    * (at-or-before; None = head). A window that starts after the last
    * commit, or ends before the first, refuses with the same
    * truncation-aware messages as the version forms. */
  private def timeSpan(spark: SparkSession, dir: String, sinceTs: Long,
      untilTs: Option[Long]): (Long, Option[Long]) = {
    val since = versionAtOrAfter(spark, dir, sinceTs) - 1
    val until = untilTs.map(versionAt(spark, dir, _))
    // an empty window resolves to since == until (the first commit
    // at-or-after the start lies beyond the end) — refuse loudly
    // rather than return a vacuously empty feed for what is almost
    // certainly a caller mistake
    until.foreach(u => require(since < u,
      s"TxLog: time window [$sinceTs, ${untilTs.get}] contains no " +
        s"commits of $dir"))
    (since, until)
  }

  /** [[changesSince]] bounded by wall-clock timestamps instead of
    * versions (Delta's `table_changes(…, startingTimestamp,
    * endingTimestamp)` shape): the rows ADDED by commits whose
    * timestamp is in `[sinceTs, untilTs]`. Same refusal contracts,
    * including truncation. */
  def changesSinceTimestamp(spark: SparkSession, dir: String,
      sinceTs: Long, untilTs: Option[Long] = None,
      skipChangeCommits: Boolean = false,
      ignoreDeletes: Boolean = false): DataFrame = {
    val (since, until) = timeSpan(spark, dir, sinceTs, untilTs)
    changesSince(spark, dir, since, until, skipChangeCommits,
      ignoreDeletes)
  }

  /** [[changeFeed]] bounded by wall-clock timestamps instead of
    * versions: the row-level diff of commits whose timestamp is in
    * `[sinceTs, untilTs]`. */
  def changeFeedByTimestamp(spark: SparkSession, dir: String,
      sinceTs: Long, untilTs: Option[Long] = None): DataFrame = {
    val (since, until) = timeSpan(spark, dir, sinceTs, untilTs)
    changeFeed(spark, dir, since, until)
  }

  /** Row-level CHANGE DATA FEED over `(sinceVersion, untilVersion]`
    * (the Delta CDF shape, computed post-hoc from the log): one row
    * per changed row, stamped `_change_type` (`insert` / `delete`)
    * and `_commit_version`, such that applying the feed in version
    * order — delete pre-rows, add insert-rows, multiset semantics —
    * transforms snapshot(since) into snapshot(until). This is what
    * lets a downstream copy follow a table THROUGH deletes, updates
    * and merges, which [[changesSince]] (additions only) refuses.
    *
    * Per commit: appends contribute their rows as inserts;
    * compactions contribute nothing; DML commits contribute the
    * multiset diff of JUST their touched files (pre \ post = delete,
    * post \ pre = insert — an UPDATE's pre/post image pair appears as
    * one delete + one insert); a mid-span overwrite still refuses
    * (its retraction is the whole prior table, not a delta) — except
    * the table-creating commit when reading from `-1`. Cost: log
    * metadata + scans of only the span's added/removed files, plus
    * one delta-sized exceptAll shuffle per DML commit; the v−1
    * pre-image state is replayed ONCE and advanced incrementally
    * across the span (a DML-heavy span costs one log replay, not one
    * per DML commit). Like [[changesSince]], refuses when a needed
    * file was vacuumed. */
  def changeFeed(spark: SparkSession, dir: String, sinceVersion: Long,
      untilVersion: Option[Long] = None): DataFrame = {
    val (commits, _) = listLog(spark, dir)
    require(commits.nonEmpty, s"TxLog: no transaction log under $dir/$LogDir")
    val head = commits.max
    val until = untilVersion.getOrElse(head)
    require(until <= head, s"TxLog: until $until beyond head $head")
    require(sinceVersion <= until,
      s"TxLog: since $sinceVersion beyond until $until")
    val span = (sinceVersion + 1) to until
    val present = commits.toSet
    val missing = span.filterNot(present)
    require(missing.isEmpty,
      s"TxLog: commits ${missing.take(3).mkString(",")}… truncated; " +
        "change feed from this version is no longer possible")
    val f = fs(spark, logPath(dir))
    val untilSnap = snapshot(spark, dir, Some(until))
    val schema =
      DataType.fromJson(untilSnap.schemaJson).asInstanceOf[StructType]
    val mapping = untilSnap.mapping
    val live = fs(spark, new Path(dir)).listStatus(new Path(dir))
      .filter(_.isFile).map(_.getPath.getName).toSet
    def readFiles(paths: Seq[String], v: Long): DataFrame = {
      val gone = paths.filterNot(p =>
        if (p.contains("/")) fs(spark, new Path(dir))
          .exists(resolvePath(dir, p))
        else live.contains(p))
      require(gone.isEmpty,
        s"TxLog: commit $v's file(s) ${gone.take(2).mkString(", ")} " +
          "were vacuumed; change feed from this version is no longer " +
          "possible; re-read the full snapshot")
      readFilesTagged(spark, dir, schema, paths, mapping,
        untilSnap.partitionCols).drop(TagFile, TagIdx)
    }
    def stamp(df: DataFrame, tpe: String, v: Long): DataFrame =
      df.withColumn("_change_type", lit(tpe))
        .withColumn("_commit_version", lit(v))
    // v−1 file state for DML pre-images, maintained INCREMENTALLY:
    // seeded lazily by ONE snapshot at the first commit that needs a
    // pre-image, then advanced per commit through the same applyCommit
    // replay the snapshot reader uses — a long span over a
    // copy-on-write table costs zero extra log replays, and a
    // DML-heavy span costs one, not one per DML commit
    var prevState: State = null
    def prevFiles(v: Long): Map[String, TxFile] = {
      if (prevState == null) {
        prevState = new State
        if (v > 0)
          snapshot(spark, dir, Some(v - 1)).files
            .foreach(fl => prevState.files(fl.path) = fl)
      }
      prevState.files.toMap
    }
    val legs = span.flatMap { v =>
      val j = JsonMethods.parse(readText(f, versionFile(dir, v)))
      val adds = (j \ "add").extract[Seq[TxFile]].map(_.path)
      val removes = (j \ "remove").extract[Seq[String]]
      val out: Seq[DataFrame] = (j \ "op").extract[String] match {
        case "append" => Seq(stamp(readFiles(adds, v), "insert", v))
        case "compact" | "constraints" | "rename" | "drop" => Nil
        case "overwrite" | "clone" if v == 0 && sinceVersion < 0 =>
          val entries = (j \ "add").extract[Seq[TxFile]]
          if (entries.forall(_.dv.isEmpty))
            Seq(stamp(readFiles(adds, v), "insert", v))
          else {
            // a clone's v0 carries the SOURCE's deletion vectors: the
            // initial load is adds MINUS vectors (exactly read() of
            // that snapshot) — raw files would resurrect deleted rows
            val fd = fs(spark, new Path(dir))
            val gone = adds.filterNot(p =>
              if (p.contains("/")) fd.exists(resolvePath(dir, p))
              else live.contains(p))
            require(gone.isEmpty,
              s"TxLog: commit $v's file(s) ${gone.take(2).mkString(", ")} " +
                "were vacuumed; change feed from this version is no " +
                "longer possible; re-read the full snapshot")
            val goneDv = entries.flatMap(_.dv).distinct
              .filterNot(p => fd.exists(resolvePath(dir, p)))
            require(goneDv.isEmpty,
              s"TxLog: commit $v's deletion vector(s) " +
                s"${goneDv.take(2).mkString(", ")} were vacuumed; change " +
                "feed from this version is no longer possible; re-read " +
                "the full snapshot")
            val liveRows = readSnapshotTagged(spark, dir,
              TxSnapshot(v, untilSnap.schemaJson, entries, Map.empty,
                mapping = mapping,
                partitionCols = untilSnap.partitionCols))
              .drop(TagFile, TagIdx)
            Seq(stamp(liveRows, "insert", v))
          }
        case "delete" | "update" | "merge" =>
          // the pre-image must be the rows LIVE at v−1, not the raw
          // removed files: a CoW rewrite touching a file that carries
          // a deletion vector (MoR delete followed by CoW DML) would
          // otherwise resurrect the vector's rows as spurious feed
          // deletes — the same class as the clone-v0 hole, at the
          // CoW-after-MoR intersection (caught by the randomized
          // feed-follower model check)
          val prevEntries = prevFiles(v)
          val removedEntries = removes.map(p =>
            prevEntries.getOrElse(p, TxFile(p, 0L)))
          val pre =
            if (removedEntries.forall(_.dv.isEmpty)) readFiles(removes, v)
            else {
              val fd = fs(spark, new Path(dir))
              val gone = removes.filterNot(p =>
                if (p.contains("/")) fd.exists(resolvePath(dir, p))
                else live.contains(p))
              require(gone.isEmpty,
                s"TxLog: commit $v's file(s) ${gone.take(2).mkString(", ")} " +
                  "were vacuumed; change feed from this version is no " +
                  "longer possible; re-read the full snapshot")
              val goneDv = removedEntries.flatMap(_.dv).distinct
                .filterNot(p => fd.exists(resolvePath(dir, p)))
              require(goneDv.isEmpty,
                s"TxLog: commit $v's deletion vector(s) " +
                  s"${goneDv.take(2).mkString(", ")} were vacuumed; " +
                  "change feed from this version is no longer " +
                  "possible; re-read the full snapshot")
              readSnapshotTagged(spark, dir,
                TxSnapshot(v - 1, untilSnap.schemaJson, removedEntries,
                  Map.empty, mapping = mapping,
                  partitionCols = untilSnap.partitionCols))
                .drop(TagFile, TagIdx)
            }
          val post = readFiles(adds, v)
          // both diff directions in ONE pass: Spark rewrites each
          // exceptAll into union → count-aggregate → replicate, so the
          // two legs separately would scan pre AND post twice and pay
          // two aggregate shuffles. Tagging pre +1 / post −1 and
          // aggregating once yields the identical multisets — rows
          // with positive excess are pre-only copies (deletes),
          // negative excess post-only copies (inserts) — at half the
          // scans and half the shuffles (guide §2.3/§2.4). Grouping
          // semantics (null-safe equality, NaN/-0.0 normalization)
          // match exceptAll's by construction: ExceptAll lowers to the
          // same Aggregate.
          val cols = pre.columns.toSeq
          val diff = pre.withColumn("_graft_w", lit(1L))
            .unionByName(post.withColumn("_graft_w", lit(-1L)))
            .groupBy(cols.map(col): _*)
            .agg(sum(col("_graft_w")).as("_graft_d"))
            .filter(col("_graft_d") =!= 0L)
          Seq(diff
            .select(cols.map(col) :+
              when(col("_graft_d") > 0, lit("delete"))
                .otherwise(lit("insert")).as("_change_type") :+
              abs(col("_graft_d")).cast("int").as("_graft_copies"): _*)
            .withColumn("_graft_rep",
              explode(array_repeat(lit(true), col("_graft_copies"))))
            .drop("_graft_copies", "_graft_rep")
            .withColumn("_commit_version", lit(v)))
        case "delete-dv" | "update-dv" =>
          // deletes = the rows this commit's vectors cover BEYOND the
          // touched files' vectors at v−1 (pair-identity diff — both
          // relations are deleted-rows sized); inserts = the commit's
          // genuinely new files (an update's post-images)
          val entries = (j \ "add").extract[Seq[TxFile]]
          val prevAt = prevFiles(v)
          val (reAdds, newFiles) =
            entries.partition(e => prevAt.contains(e.path))
          val touchedPaths = reAdds.map(_.path)
          val goneData = touchedPaths.filterNot(p =>
            if (p.contains("/")) fs(spark, new Path(dir))
              .exists(resolvePath(dir, p))
            else live.contains(p))
          require(goneData.isEmpty,
            s"TxLog: commit $v's file(s) ${goneData.take(2).mkString(", ")} " +
              "were vacuumed; change feed from this version is no " +
              "longer possible; re-read the full snapshot")
          val dvPaths = (reAdds.flatMap(_.dv) ++
            touchedPaths.flatMap(p => prevAt(p).dv)).distinct
          val goneDv = dvPaths.filterNot(p =>
            f.exists(resolvePath(dir, p)))
          require(goneDv.isEmpty,
            s"TxLog: commit $v's deletion vector(s) " +
              s"${goneDv.take(2).mkString(", ")} were vacuumed; change " +
              "feed from this version is no longer possible; re-read " +
              "the full snapshot")
          // vectors key rows by the table's file identity: bare NAME
          // for flat tables (a cloned entry's PATH is absolute, so
          // filtering by path would silently drop its deletes),
          // dir-relative PATH for path-partitioned registrations
          val touchedNames =
            if (untilSnap.partitionCols.isEmpty) touchedPaths.map(nameOf)
            else touchedPaths
          def dvRel(paths: Seq[String]): Option[DataFrame] =
            if (paths.isEmpty) None
            else Some(spark.read
              .parquet(paths.map(p => resolveData(dir, p)): _*)
              .filter(col("file").isInCollection(touchedNames)))
          val newRel = dvRel(reAdds.flatMap(_.dv).distinct).get
          val fresh = dvRel(touchedPaths.flatMap(p => prevAt(p).dv)
            .distinct).fold(newRel)(old => newRel.except(old))
          val raw =
            readFilesTagged(spark, dir, schema, touchedPaths, mapping,
              untilSnap.partitionCols)
          val pre = raw.join(broadcast(fresh),
            raw(TagFile) === fresh("file") &&
              raw(TagIdx) === fresh("row_index"), "left_semi")
            .drop(TagFile, TagIdx)
          Seq(stamp(pre, "delete", v)) ++
            (if (newFiles.isEmpty) Nil
             else Seq(stamp(readFiles(newFiles.map(_.path), v),
               "insert", v)))
        case op => throw new IllegalArgumentException(
          s"TxLog: commit $v is '$op' — its retraction is the whole " +
            "prior table, not a delta; re-read the full snapshot")
      }
      if (prevState != null) applyCommit(prevState, j)
      out
    }
    legs.reduceOption(_.unionByName(_)).getOrElse {
      val empty = spark.createDataFrame(
        java.util.Collections.emptyList[Row](), schema)
      stamp(empty, "insert", until).limit(0)
    }
  }

  /** Restore the table to the state of `version` as a NEW commit
    * (Delta's RESTORE): re-register that snapshot's files as the
    * current state — no data is copied, history is preserved (the
    * restore is itself an overwrite commit; the undone versions stay
    * addressable). Fails loudly if any of the target version's files
    * were already vacuumed — like Delta, restore cannot reach past
    * [[vacuum]]'s retention. */
  def restore(spark: SparkSession, dir: String, version: Long): Long = {
    val snap = snapshot(spark, dir, Some(version))
    val f = fs(spark, new Path(dir))
    val gone = snap.files.filterNot(a =>
      f.exists(resolvePath(dir, a.path)))
    require(gone.isEmpty,
      s"TxLog: cannot restore to $version — ${gone.size} of its files " +
        s"were vacuumed (first: ${gone.take(2).map(_.path).mkString(", ")})")
    val goneDv = snap.files.flatMap(_.dv).distinct
      .filterNot(d => f.exists(resolvePath(dir, d)))
    require(goneDv.isEmpty,
      s"TxLog: cannot restore to $version — its deletion vector(s) " +
        s"${goneDv.take(2).mkString(", ")} were vacuumed")
    // metadata replay is full-state last-write-wins, so the restore
    // commit must CARRY the target snapshot's identity / generated /
    // defaults / constraints explicitly (possibly-empty maps RESET) —
    // otherwise restoring past an addColumn+setGenerated would leave
    // a generation expression for a column absent from the restored
    // schema, and every later append would compute the phantom column
    // and fail the schema check. One exception stays monotonic: an
    // identity column present in BOTH states keeps the HIGHER
    // watermark (ids issued after the target version must never be
    // re-minted — restore removes their rows, not their issuance).
    val head = snapshot(spark, dir)
    val identityBack = snap.identity.map { case (c, s) =>
      val headHigh = head.identity.get(c).flatMap(_.high)
      c -> s.copy(high = (s.high.toSeq ++ headHigh.toSeq)
        .reduceOption((a: Long, b: Long) => math.max(a, b)))
    }
    commitStaged(spark, dir, "overwrite", snap.files, Nil,
      removeAll = true, snap.schemaJson, None, ownsAdded = false,
      ddlState = Some((snap.mapping, snap.retired)),
      identityOut = Some(identityBack),
      // a concurrent append advancing a watermark between the head
      // read above and the claim must conflict (the carried high
      // would silently regress below the racer's issued ids)
      expectIdentity = head.identity.map { case (c, s) => c -> s.high },
      generatedOut = Some(snap.generated),
      defaultsOut = Some(snap.defaults),
      constraintsOut = Some(snap.constraints))
  }

  /** [[restore]] by TIMESTAMP (Delta's `RESTORE … TIMESTAMP AS OF`):
    * the table as it stood at `ts`, re-registered as a new commit —
    * the timestamp dual [[cloneAt]]/[[readAt]] already have. */
  def restoreAt(spark: SparkSession, dir: String, ts: Long): Long =
    restore(spark, dir, versionAt(spark, dir, ts))

  /** The commit history as a relation: one row per version with the
    * op, file/row deltas, and any txn marker — answered purely from
    * log metadata (no data scan). */
  def history(spark: SparkSession, dir: String): DataFrame = {
    val (commits, _) = listLog(spark, dir)
    require(commits.nonEmpty, s"TxLog: no transaction log under $dir/$LogDir")
    val f = fs(spark, logPath(dir))
    val tsOf = commitTimestamps(spark, dir).toMap
    val rows = commits.map { v =>
      val j = JsonMethods.parse(readText(f, versionFile(dir, v)))
      val added = (j \ "add").extract[Seq[TxFile]]
      Row(v, tsOf(v), (j \ "op").extract[String],
        added.size, (j \ "remove").extract[Seq[String]].size,
        added.map(_.rows).sum,
        (j \ "txn" \ "appId").extractOpt[String].orNull,
        (j \ "txn" \ "batchId").extractOpt[Long]
          .map(Long.box).orNull)
    }
    val schema = StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("timestamp", LongType, nullable = false),
      StructField("op", StringType, nullable = false),
      StructField("n_added", org.apache.spark.sql.types.IntegerType,
        nullable = false),
      StructField("n_removed", org.apache.spark.sql.types.IntegerType,
        nullable = false),
      StructField("rows_added", LongType, nullable = false),
      StructField("app_id", StringType, nullable = true),
      StructField("batch_id", LongType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Delete data files referenced by NO version in
    * [head − retainVersions, head] and older than `minAgeMs` (the age
    * guard keeps just-staged files of in-flight commits safe; size it
    * above the longest expected commit latency in production). Time
    * travel older than the retained span dies with the files. Returns
    * the number of files deleted. */
  def vacuum(spark: SparkSession, dir: String, retainVersions: Int = 0,
      minAgeMs: Long = 0L): Int =
    vacuumList(spark, dir, retainVersions, minAgeMs,
      dryRun = false).size

  /** [[vacuum]], returning the dir-relative paths it actually
    * deleted — ONE reachability walk, so SQL `VACUUM` never races a
    * separate dry-run pre-pass against concurrent commits. */
  def vacuumAndList(spark: SparkSession, dir: String,
      retainVersions: Int = 0, minAgeMs: Long = 0L): Seq[String] =
    vacuumList(spark, dir, retainVersions, minAgeMs, dryRun = false)

  /** `vacuum` DRY RUN (Delta's `VACUUM … DRY RUN`): the dir-relative
    * paths the same retention/age policy WOULD delete, touching
    * nothing — audit the blast radius (and whether a needed
    * time-travel version would die) before committing to it. */
  def vacuumDryRun(spark: SparkSession, dir: String,
      retainVersions: Int = 0, minAgeMs: Long = 0L): Seq[String] =
    vacuumList(spark, dir, retainVersions, minAgeMs, dryRun = true)

  private def vacuumList(spark: SparkSession, dir: String,
      retainVersions: Int, minAgeMs: Long, dryRun: Boolean)
      : Seq[String] = {
    val (commits, _) = listLog(spark, dir)
    require(commits.nonEmpty, s"TxLog: no transaction log under $dir/$LogDir")
    val head = commits.max
    val keep = commits.filter(_ >= head - retainVersions)
    val keptSnaps = keep.map(v => snapshot(spark, dir, Some(v)))
    val live = keptSnaps.flatMap(_.files.map(_.path)).toSet
    val liveDv = keptSnaps.flatMap(_.files.flatMap(_.dv)).toSet
    val root = new Path(dir)
    val f = fs(spark, root)
    val now = System.currentTimeMillis()
    val stale = f.listStatus(root).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".") &&
        !live.contains(n) && (now - st.getModificationTime) >= minAgeMs
    }
    if (!dryRun) stale.foreach(st => f.delete(st.getPath, false))
    // registered hive layouts (key=value subdirs): their entries are
    // RELATIVE paths — a CoW rewrite of a nested file retires it from
    // the log, and reaping must walk the partition dirs to find it
    // (live matching by relative path, same retention/age policy)
    val rootAbs = f.makeQualified(root).toString
    val nestedDirs = f.listStatus(root).filter { st =>
      val n = st.getPath.getName
      st.isDirectory && !n.startsWith("_") && !n.startsWith(".") &&
        n.contains('=')
    }
    val staleNested = nestedDirs.flatMap { d0 =>
      val it = f.listFiles(d0.getPath, true)
      val out = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val st = it.next()
        val rel = f.makeQualified(st.getPath).toString
          .drop(rootAbs.length + 1)
        val hidden = rel.split('/').exists(sg =>
          sg.startsWith("_") || sg.startsWith("."))
        if (st.isFile && !hidden && !live.contains(rel) &&
          (now - st.getModificationTime) >= minAgeMs) out += st
      }
      out
    }
    if (!dryRun) staleNested.foreach(st => f.delete(st.getPath, false))
    // superseded deletion vectors: a vector relation referenced by no
    // retained version (each DML writes a fresh merged one, compaction
    // drops the pointers) — same retention and age guard as data files
    val dvRoot = new Path(dir, DvDir)
    val staleDv =
      if (!f.exists(dvRoot)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else f.listStatus(dvRoot).filter { st =>
        !liveDv.contains(s"$DvDir/${st.getPath.getName}") &&
          (now - st.getModificationTime) >= minAgeMs
      }
    if (!dryRun) staleDv.foreach(st => f.delete(st.getPath, true))
    // orphaned claim temps: a writer that crashed between staging its
    // commit/checkpoint content to a dot-tmp sibling and linking it
    // into place leaves the temp behind (the normal path deletes it).
    // Invisible to listLog (name filter) but debt on disk — collect
    // them under an age guard with a FLOOR independent of the
    // caller's minAgeMs: a default vacuum(dir) runs with minAgeMs=0,
    // and deleting a temp a concurrent writer staged milliseconds ago
    // would fail that writer's createLink/move spuriously. Ten
    // minutes is far beyond any write-to-link window
    val tmpAge = math.max(minAgeMs, TmpAgeFloorMs)
    val lp = logPath(dir)
    val lf = fs(spark, lp)
    val staleTmp =
      if (!lf.exists(lp)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else lf.listStatus(lp).filter { st =>
        val n = st.getPath.getName
        st.isFile && n.startsWith(".") && n.endsWith(".tmp") &&
          (now - st.getModificationTime) >= tmpAge
      }
    if (!dryRun) staleTmp.foreach(st => lf.delete(st.getPath, false))
    (stale.map(_.getPath.getName) ++
      staleNested.map(st => f.makeQualified(st.getPath).toString
        .drop(rootAbs.length + 1)) ++
      staleDv.map(st => s"$DvDir/${st.getPath.getName}") ++
      staleTmp.map(st => s"$LogDir/${st.getPath.getName}")).toSeq.sorted
  }

  /** Drop commit files strictly below the latest checkpoint ≤ head −
    * retainVersions (snapshot resolution never needs them again).
    * Returns the number of log files removed. */
  def truncateLog(spark: SparkSession, dir: String,
      retainVersions: Int = 0): Int = {
    val (commits, cps) = listLog(spark, dir)
    require(commits.nonEmpty, s"TxLog: no transaction log under $dir/$LogDir")
    val head = commits.max
    val cut = cps.filter(_ <= head - retainVersions).lastOption
      .getOrElse(return 0)
    val f = fs(spark, logPath(dir))
    val drop = commits.filter(_ < cut)
    drop.foreach(v => f.delete(versionFile(dir, v), false))
    drop.size
  }

  /** Exactly-once streaming UPSERT sink (the CDC-apply shape): each
    * micro-batch MERGEs into the logged table under txn marker
    * (appId, batchId) — replayed batches short-circuit, so a stream
    * of keyed changes lands exactly once even though foreachBatch is
    * at-least-once. When `orderCol` is given, a batch holding several
    * rows per key keeps the one with the greatest (orderCol, then
    * key-hash) — the per-batch last-writer-wins a CDC feed needs;
    * without it the source must be unique per key per batch (merge's
    * ambiguity refusal applies). */
  def exactlyOnceUpsertSink(stream: DataFrame, dir: String,
      keyCols: Seq[String], appId: String, checkpointDir: String,
      statsCols: Seq[String] = Nil,
      orderCol: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val src = orderCol match {
          case None => batch
          case Some(oc) =>
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(keyCols.map(col): _*)
              .orderBy(col(oc).desc,
                xxhash64(keyCols.map(col): _*).desc)
            batch.withColumn("_graft_rn", row_number().over(w))
              .filter(col("_graft_rn") === 1).drop("_graft_rn")
        }
        merge(batch.sparkSession, dir, src, keyCols, statsCols,
          txn = Some((appId, batchId)))
        ()
      }.start()

  /** Exactly-once streaming append sink: each micro-batch commits with
    * txn marker (appId, batchId), so a batch replayed after a failure
    * (foreachBatch is at-least-once) is skipped by the log instead of
    * duplicating rows. */
  def exactlyOnceSink(stream: DataFrame, dir: String, appId: String,
      checkpointDir: String, statsCols: Seq[String] = Nil)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitAppend(batch.sparkSession, dir, batch, Some((appId, batchId)),
          statsCols)
        ()
      }.start()
}
