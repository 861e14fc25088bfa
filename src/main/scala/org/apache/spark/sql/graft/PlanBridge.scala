package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** `private[sql]` re-export of [[org.apache.spark.sql.connector
  * .catalog.V2TableWithV1Fallback]]: a v2 Table mixing this in makes
  * `writeStream.toTable("t")` fall back to the table provider's v1
  * streaming sink (the DeltaTableV2 pattern — the trait is public in
  * bytecode but `private[sql]` to Scala). */
trait V1FallbackBridge
  extends org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback

/** The minimal `private[sql]` bridge a DataSource-v1 streaming source
  * needs (the same package-placement pattern Spark's own bundled
  * connectors use, e.g. the Kafka source living under
  * `org.apache.spark.sql.kafka010`): a v1 `Source.getBatch` must
  * return a DataFrame whose logical plan is marked `isStreaming=true`
  * (MicroBatchExecution asserts it), and both the plan constructor
  * (`Dataset.ofRows`) and the relation copy live behind
  * `private[sql]`. Nothing else of Spark's internals is touched. */
object PlanBridge {

  private def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** A DataFrame over an already-ANALYZED logical plan — the SQL DML
    * rule hands the statement's resolved source subtree straight back
    * to the engine (re-parsing its SQL text would re-resolve against
    * a possibly-changed catalog). */
  def fromPlan(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ofRows(spark, plan)

  /** Wrap a Catalyst expression as a user-facing Column (the
    * `private[sql]` direction the SQL DML rule needs: a statement's
    * resolved condition / assignment expressions become arguments to
    * the TxLog Scala API). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** The reverse direction: a Column's underlying Catalyst
    * expression (merge-candidate pruning inspects the ON condition's
    * equality conjuncts without re-parsing SQL text). */
  def expression(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** A v1 streaming-relation leaf over the named source — the
    * `v1Relation` fallback [[org.apache.spark.sql.catalyst.streaming
    * .StreamingRelationV2]] consults when its table offers no
    * MicroBatchStream: `spark.readStream.table("t")` on a txlog table
    * then rides the SAME v1 Source as `readStream.format("txlog")`. */
  def v1StreamingRelation(spark: SparkSession, provider: String,
      options: Map[String, String]): LogicalPlan = {
    val ds = org.apache.spark.sql.execution.datasources.DataSource(
      spark.asInstanceOf[ClassicSession], className = provider,
      options = options)
    org.apache.spark.sql.execution.streaming.runtime.StreamingRelation(ds)
  }

  /** The storage `path` of a session-catalog table whose provider is
    * `txlog`, unwrapped from the `private[sql]` V1Table the default
    * session catalog returns — the time-travel catalog's dispatch
    * test (non-txlog tables fall through to Spark's own refusal). */
  def v1TxlogPath(t: org.apache.spark.sql.connector.catalog.Table)
      : Option[String] = t match {
    case v1: org.apache.spark.sql.connector.catalog.V1Table
        if v1.v1Table.provider.exists(_.equalsIgnoreCase("txlog")) =>
      // the catalog normalizes the `path` option into the table
      // LOCATION; an explicit storage property wins when present
      v1.v1Table.storage.properties.collectFirst {
        case (k, v) if k.equalsIgnoreCase("path") => v
      }.orElse(v1.v1Table.storage.locationUri.map(_.toString))
    case _ => None
  }

  /** The underlying CatalogTable of a default-session-catalog
    * `V1Table` (both `private[sql]`) — the real catalog identity the
    * txlog v2 table hands back through its `v1Table` fallback, so
    * `writeStream.toTable("t")` resolves the REGISTERED name, not a
    * synthesized one. */
  def v1CatalogTable(t: org.apache.spark.sql.connector.catalog.Table)
      : Option[org.apache.spark.sql.catalyst.catalog.CatalogTable] =
    t match {
      case v1: org.apache.spark.sql.connector.catalog.V1Table =>
        Some(v1.v1Table)
      case _ => None
    }

  /** Re-wrap a file-relation DataFrame as a streaming batch — the
    * FileStreamSource.getBatch shape. The file relation may sit under
    * narrow plan nodes (e.g. the column-mapping physical→logical
    * rename Project), so the streaming mark is applied bottom-up
    * wherever the relation appears. */
  def asStreamingBatch(spark: SparkSession, df: DataFrame): DataFrame =
    ofRows(spark, df.queryExecution.analyzed.transformUp {
      case lr: LogicalRelation => lr.copy(isStreaming = true)
    })

  /** An empty streaming batch with the given schema (a span that added
    * no rows — e.g. only compactions). */
  def emptyStreamingBatch(spark: SparkSession, schema: StructType): DataFrame =
    ofRows(spark, LocalRelation(DataTypeUtils.toAttributes(schema),
      Seq.empty[InternalRow], isStreaming = true))

  /** Re-wrap a COMPOSED DataFrame (joins/unions over file relations —
    * e.g. a change-feed span) as one streaming batch behind a single
    * streaming leaf: the plan compiles as the batch plan it is, and
    * only the wrapping LogicalRDD carries the streaming mark — so the
    * engine's streaming assertions never meet the inner joins. */
  def asStreamingRdd(spark: SparkSession, df: DataFrame): DataFrame =
    ofRows(spark, org.apache.spark.sql.execution.LogicalRDD.fromDataset(
      df.queryExecution.toRdd, df.asInstanceOf[ClassicDataset[_]],
      isStreaming = true))

  /** Re-wrap a streaming micro-batch DataFrame as a BATCH one (the
    * ForeachBatchSink recipe): a v1 `Sink.addBatch` receives a
    * streaming-planned Dataset on which batch writes refuse, so a
    * sink that wants to `df.write` must first re-root the plan on the
    * micro-batch's RDD with the streaming mark dropped. */
  def asBatch(df: DataFrame): DataFrame =
    ofRows(df.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD.fromDataset(
        df.queryExecution.toRdd, df.asInstanceOf[ClassicDataset[_]],
        isStreaming = false))

  /** Whether a [[org.apache.spark.sql.catalyst.catalog
    * .CatalogColumnStat]] round-trips into plan statistics for this
    * type — i.e. its min/max external strings parse under
    * `fromExternalString` (`private[sql]`, hence bridged). The stats
    * builder validates each candidate HERE so a form Spark's parser
    * refuses degrades to "no stat" at build time instead of failing
    * the whole query inside the optimizer. */
  def colStatParses(dt: org.apache.spark.sql.types.DataType,
      cs: org.apache.spark.sql.catalyst.catalog.CatalogColumnStat)
      : Boolean =
    scala.util.Try(cs.toPlanStat("c", dt)).isSuccess

  /** Catalyst predicate → v1 `sources.Filter` (the `protected[sql]`
    * translator the file-index read path reuses so its data-filter
    * file skipping speaks the SAME filter algebra as the V1 scan's
    * pushdown — one pruning semantics, two entry points). */
  def translateFilter(e: org.apache.spark.sql.catalyst.expressions
      .Expression): Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = false)}
