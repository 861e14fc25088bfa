package graft.sources

import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}

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
  * Contracts inherited from [[TxLog.changedFiles]]: compactions inside
  * a span contribute nothing (rewrites, not new rows); an overwrite
  * inside a span fails the stream (not expressible as additions — same
  * as Delta's source without ignoreChanges); a truncated/vacuumed span
  * refuses with the re-seed message. Cost per micro-batch: log
  * metadata + a scan of only the delta files.
  */
class TxLogStreamProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "txlog"

  private def dir(parameters: Map[String, String]): String =
    parameters.get("path").orElse(parameters.get("load")).getOrElse(
      throw new IllegalArgumentException(
        "txlog source needs a table directory: .load(<dir>) or " +
          ".option(\"path\", <dir>)"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val d = dir(parameters)
    require(TxLog.isLogged(sqlContext.sparkSession, d),
      s"txlog source: no transaction log under $d — create the table " +
        "first (commitOverwrite / a logged MedallionPipeline write)")
    ("txlog", schema.getOrElse(
      DataType.fromJson(TxLog.snapshot(sqlContext.sparkSession, d)
        .schemaJson).asInstanceOf[StructType]))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new TxLogSource(sqlContext.sparkSession, dir(parameters))
}

class TxLogSource(spark: SparkSession, dir: String) extends Source {

  override val schema: StructType =
    DataType.fromJson(TxLog.snapshot(spark, dir).schemaJson)
      .asInstanceOf[StructType]

  private def version(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.trim.toLong
  }

  /** The table's head version — one driver pass over log metadata. */
  override def getOffset: Option[V1Offset] =
    Some(LongOffset(TxLog.snapshot(spark, dir).version))

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val since = start.map(version).getOrElse(-1L)
    val until = version(end)
    val (added, spanSchema, mapping) =
      TxLog.changedFiles(spark, dir, since, Some(until))
    if (added.isEmpty) PlanBridge.emptyStreamingBatch(spark, spanSchema)
    else {
      val physSchema = org.apache.spark.sql.types.StructType(
        spanSchema.fields.map(fl =>
          fl.copy(name = mapping.getOrElse(fl.name, fl.name))))
      val raw = spark.read.schema(physSchema)
        .parquet(added.map(a => s"$dir/${a.path}"): _*)
      val logical =
        if (mapping.isEmpty) raw
        else raw.select(spanSchema.fields.map(fl =>
          org.apache.spark.sql.functions
            .col(mapping.getOrElse(fl.name, fl.name)).as(fl.name)).toSeq: _*)
      PlanBridge.asStreamingBatch(spark, logical)
    }
  }

  override def stop(): Unit = ()

  override def toString: String = s"TxLogSource[$dir]"
}
