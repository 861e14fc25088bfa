package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SQLContext, SparkSession}

/** Structured-Streaming SOURCE over a [[TxLog]] table — the Delta
  * streaming-source analog that completes the incremental story:
  * [[TxLog.changesSince]] is the batch pull, this is the continuous
  * push. `spark.readStream.format("txlog").load(dir)` turns a logged
  * table into an unbounded stream of its APPENDS; offsets ARE log
  * versions, so a micro-batch is exactly the span
  * `(lastCommittedVersion, head]` and replay after restart re-reads
  * precisely the uncommitted span (pair with a sink txn marker —
  * [[graft.etl.MedallionPipeline.promoteStream]] — for exactly-once
  * end to end). Reference analog: the ETL manager's incremental load
  * path (etl_manager.py:206 run_job + LoadType.INCREMENTAL), which a
  * user must SCHEDULE; this is its continuous form.
  *
  * ADMISSION CONTROL (Delta's maxFilesPerTrigger shape):
  * `.option("maxFilesPerTrigger", n)` / `.option("maxRowsPerTrigger",
  * n)` bound how much of a backlog one micro-batch admits — without
  * them, the first trigger after seeding (or any catch-up after
  * downtime) would process the ENTIRE backlog as one batch, which at
  * 100 TB is one giant batch or nothing. `getOffset` walks commit
  * METADATA from the last admitted version, admitting whole commits
  * until the next would exceed either budget (always ≥ 1 commit, so a
  * single oversized commit still makes progress; both caps may be
  * combined — the tighter one binds). The reference analog stays
  * batch-bounded by construction (etl_manager.py:468-475); this keeps
  * the continuous form bounded too.
  *
  * The admitted frontier is persisted in the source's own slice of
  * the checkpoint (`metadataPath`, the [[FileStreamSource]] pattern):
  * one empty marker file whose NAME is the offset, written BEFORE the
  * offset is returned to the engine. Recovery takes the max marker,
  * so a crash between our marker and the engine's offset log at worst
  * widens one batch to two budgets — never skips or repeats rows
  * (exactly-once rides the engine's own offset/commit log).
  *
  * Contracts inherited from [[TxLog.changedFiles]]: compactions inside
  * a span contribute nothing (rewrites, not new rows — and cost zero
  * admission budget); an overwrite inside a span fails the stream (not
  * expressible as additions — same as Delta's source without
  * ignoreChanges); a truncated/vacuumed span, or a clone-v0 carrying
  * deletion vectors, refuses with the re-seed message. A dv-FREE
  * clone streams fine: its absolute v0 entries resolve through the
  * same [[TxLog.readAdded]] helper `changesSince` uses. Cost per
  * micro-batch: log metadata + a scan of only the delta files.
  */
class TxLogStreamProvider extends StreamSourceProvider
  with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "txlog"

  private def dir(parameters: Map[String, String]): String =
    parameters.get("path").orElse(parameters.get("load")).getOrElse(
      throw new IllegalArgumentException(
        "txlog source needs a table directory: .load(<dir>) or " +
          ".option(\"path\", <dir>)"))

  private def cap(parameters: Map[String, String], name: String)
      : Option[Long] =
    parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase(name) => v.toLong
    }.map { n =>
      require(n > 0, s"txlog source: $name must be positive, got $n")
      n
    }

  private def flag(parameters: Map[String, String], name: String): Boolean =
    parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase(name) => v.toBoolean
    }.getOrElse(false)

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val d = dir(parameters)
    require(TxLog.isLogged(sqlContext.sparkSession, d),
      s"txlog source: no transaction log under $d — create the table " +
        "first (commitOverwrite / a logged MedallionPipeline write)")
    val table = DataType.fromJson(TxLog.snapshot(sqlContext.sparkSession, d)
      .schemaJson).asInstanceOf[StructType]
    val out =
      if (flag(parameters, "readChangeFeed")) TxLogSource.cdcSchema(table)
      else table
    ("txlog", schema.getOrElse(out))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new TxLogSource(sqlContext.sparkSession, dir(parameters), metadataPath,
      cap(parameters, "maxFilesPerTrigger"),
      cap(parameters, "maxRowsPerTrigger"),
      cdc = flag(parameters, "readChangeFeed"))

  /** `.writeStream.format("txlog")`: the native logged SINK — each
    * micro-batch commits under an (appId, batchId) txn marker, so
    * at-least-once replays land exactly once without the caller
    * writing a foreachBatch body. Append mode commits appends;
    * Complete mode overwrites the table each batch (replays
    * recognized through the same marker). `appId` defaults to the
    * query's checkpoint location — stable across restarts, distinct
    * across queries — and may be set explicitly when several
    * checkpoints should share one idempotence scope. `statsCols`
    * (comma-separated) records per-file min/max for pruning. */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val d = dir(parameters)
    require(partitionColumns.isEmpty,
      "txlog sink does not partitionBy: the log prunes by per-file " +
        "column stats instead (statsCols)")
    require(outputMode == OutputMode.Append() ||
      outputMode == OutputMode.Complete(),
      s"txlog sink supports Append and Complete output modes, got $outputMode")
    val appId = parameters.get("appId")
      .orElse(parameters.get("checkpointLocation")).getOrElse(
        throw new IllegalArgumentException(
          "txlog sink needs an idempotence scope: set " +
            ".option(\"checkpointLocation\", …) (usual) or an explicit " +
            ".option(\"appId\", …)"))
    val statsCols = parameters.get("statsCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    new TxLogSink(sqlContext.sparkSession, d, appId, statsCols, outputMode,
      mergeSchema = flag(parameters, "mergeSchema"))
  }
}

/** The v1 streaming SINK over a [[TxLog]] table: addBatch = one
  * txn-marked commit. The micro-batch Dataset arrives
  * streaming-planned (batch writes refuse on it), so it is re-rooted
  * on the batch RDD first — the ForeachBatchSink recipe
  * ([[PlanBridge.asBatch]]). CHECK constraints gate every batch like
  * any other write path; a violating batch fails the QUERY loudly
  * with nothing staged. */
class TxLogSink(spark: SparkSession, dir: String, appId: String,
    statsCols: Seq[String], outputMode: OutputMode,
    mergeSchema: Boolean = false) extends Sink {

  override def addBatch(batchId: Long, data: Dataset[Row]): Unit = {
    val batch = PlanBridge.asBatch(data.toDF())
    if (outputMode == OutputMode.Complete())
      TxLog.commitOverwrite(spark, dir, batch, statsCols,
        txn = Some((appId, batchId)))
    else
      TxLog.commitAppend(spark, dir, batch, Some((appId, batchId)),
        statsCols, mergeSchema = mergeSchema)
    ()
  }

  override def toString: String = s"TxLogSink[$dir]"
}

object TxLogSource {
  /** The change-feed schema: the table's columns plus the CDC stamp
    * pair (Delta's readChangeFeed shape). */
  def cdcSchema(table: StructType): StructType =
    StructType(table.fields ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", LongType, nullable = false)))
}

class TxLogSource(spark: SparkSession, dir: String,
    metadataPath: String, maxFiles: Option[Long], maxRows: Option[Long],
    cdc: Boolean = false)
  extends Source {

  private val tableSchema: StructType =
    DataType.fromJson(TxLog.snapshot(spark, dir).schemaJson)
      .asInstanceOf[StructType]

  override val schema: StructType =
    if (cdc) TxLogSource.cdcSchema(tableSchema) else tableSchema

  private def version(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.trim.toLong
  }

  // ---- admitted-frontier persistence (FileStreamSource pattern) ----

  private val markerDir = new Path(metadataPath, "graft-admitted")
  private val mfs = markerDir.getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  /** The highest version ever RETURNED from getOffset (admitted to
    * the engine), restored from the checkpoint on restart; −1 = fresh
    * query. Admission budgets are measured from here, so a restart
    * mid-backlog resumes capping where it left off instead of
    * re-granting the whole backlog.
    *
    * When the markers are MISSING but the engine's own offset log is
    * not (a checkpoint written before admission control existed, or a
    * hand-deleted marker dir), the frontier recovers from the newest
    * engine offset instead of −1 — a −1 restart under caps could
    * compute an offset BELOW the engine's committed one, wedging the
    * query in a crash loop. Parsing is defensive: any surprise falls
    * back to −1 (fresh query), never an exception at source build. */
  private var admitted: Long = {
    val fromMarkers =
      if (!mfs.exists(markerDir)) None
      else mfs.listStatus(markerDir).toSeq
        .flatMap(st => st.getPath.getName.toLongOption)
        .maxOption
    fromMarkers.orElse(engineOffsetFallback()).getOrElse(-1L)
  }

  /** The newest offset the ENGINE recorded for this source, read from
    * `<checkpoint>/offsets/<batchId>` (metadataPath is
    * `<checkpoint>/sources/<i>`): the file's last non-empty line is
    * this source's serialized offset — for a txlog source, a bare
    * version number. */
  private def engineOffsetFallback(): Option[Long] =
    try {
      val ckpt = new Path(metadataPath).getParent.getParent
      val offsetsDir = new Path(ckpt, "offsets")
      if (!mfs.exists(offsetsDir)) None
      else {
        val batches = mfs.listStatus(offsetsDir).toSeq
          .flatMap(st => st.getPath.getName.toLongOption.map(_ -> st.getPath))
        batches.sortBy(_._1).lastOption.flatMap { case (_, p) =>
          val in = mfs.open(p)
          val text =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          text.linesIterator.filter(_.trim.nonEmpty).toSeq.lastOption
            .flatMap(_.trim.toLongOption)
        }
      }
    } catch { case _: Exception => None }

  /** The (files, rows) stream-cost of each commit, parsed once — log
    * metadata, never data. */
  private val costCache =
    scala.collection.mutable.Map.empty[Long, (Long, Long)]
  private def costOf(v: Long): (Long, Long) =
    costCache.getOrElseUpdate(v, TxLog.commitAddCost(spark, dir, v))

  private def persistAdmitted(v: Long): Unit = {
    if (v <= admitted) return
    val marker = new Path(markerDir, f"$v%020d")
    val prior =
      if (!mfs.exists(markerDir)) Nil
      else mfs.listStatus(markerDir).toSeq.map(_.getPath)
    mfs.mkdirs(markerDir)
    // the value rides in the NAME — an interrupted create still
    // carries it, so content is irrelevant and the write is crash-safe
    mfs.create(marker, true).close()
    prior.filter(_.getName != marker.getName)
      .foreach(p => mfs.delete(p, false))
    admitted = v
  }

  /** The next offset to expose: the head, or — under admission
    * control — the furthest version whose cumulative (files, rows)
    * cost from the admitted frontier fits both budgets (≥ 1 commit
    * always, for progress on oversized commits). One driver pass over
    * log metadata either way. */
  override def getOffset: Option[V1Offset] = {
    val head = TxLog.snapshot(spark, dir).version
    val next =
      if (maxFiles.isEmpty && maxRows.isEmpty) head
      else if (admitted >= head) head
      else {
        var v = admitted
        var files = 0L
        var rows = 0L
        var granting = true
        while (granting && v < head) {
          val (cf, cr) = costOf(v + 1)
          val fits = maxFiles.forall(files + cf <= _) &&
            maxRows.forall(rows + cr <= _)
          if (fits || v == admitted) { // ≥ 1 commit per trigger
            v += 1; files += cf; rows += cr
          } else granting = false
        }
        v
      }
    persistAdmitted(next)
    Some(LongOffset(next))
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val since = start.map(version).getOrElse(-1L)
    val until = version(end)
    persistAdmitted(until) // replayed batch after restart: re-anchor
    if (cdc) {
      // CHANGE-FEED mode (Delta's readChangeFeed): the span's
      // row-level diff, stamped (_change_type, _commit_version) — a
      // downstream copy follows the table THROUGH deletes, updates
      // and merges, which the plain source refuses. The feed plan
      // composes joins over file relations, so it rides behind one
      // streaming LogicalRDD leaf instead of per-relation marks.
      if (until <= since) PlanBridge.emptyStreamingBatch(spark, schema)
      else PlanBridge.asStreamingRdd(spark,
        TxLog.changeFeed(spark, dir, since, Some(until)))
    } else {
      val (added, spanSchema, mapping) =
        TxLog.changedFiles(spark, dir, since, Some(until))
      if (added.isEmpty) PlanBridge.emptyStreamingBatch(spark, spanSchema)
      else PlanBridge.asStreamingBatch(spark,
        TxLog.readAdded(spark, dir, added, spanSchema, mapping))
    }
  }

  override def stop(): Unit = ()

  override def toString: String = s"TxLogSource[$dir]"
}
