package graft.sources

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference, ExprId, Expression, PlanExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.sources._

/** SQL row-level DML over registered txlog tables — the layer that
  * turns `CREATE TABLE t USING txlog` into a full SQL citizen:
  * `DELETE FROM t WHERE …`, `UPDATE t SET … WHERE …` and the complete
  * `MERGE INTO t USING s ON … WHEN …` statement all lower to the SAME
  * Scala commit machinery ([[TxLog.delete]] / [[TxLog.update]] /
  * [[TxLog.mergeInto]]) — one code path, so CHECK constraints,
  * identity/generated/default columns, deletion-vector pinning and
  * conflict detection behave identically from SQL and Scala. Delta's
  * primary DML surface is SQL; this is that surface.
  *
  * Mechanics: a post-hoc resolution rule (installed by
  * [[graft.functions.GraftExtensions]] via
  * `spark.sql.extensions=graft.functions.GraftExtensions`) replaces
  * the analyzed [[DeleteFromTable]] / [[UpdateTable]] /
  * [[MergeIntoTable]] nodes whose target resolves to a
  * [[TxLogBatchTable]] with runnable commands. Statement expressions
  * are already RESOLVED against the relation outputs; they re-anchor
  * by NAME (target → alias `t`, source → alias `s` — the contract
  * [[TxLog.mergeInto]] documents) so the command can evaluate them
  * against the table's own read path. Conditions containing
  * subqueries are left to Spark's native path (which refuses with its
  * own message) — a path-addressed table has no catalog identity for
  * subquery rewrites to anchor on. Plain sessions without the
  * extension still get `DELETE FROM` through [[TxLogBatchTable]]'s
  * `SupportsDelete`.
  */
private[graft] object TxLogSql {

  /** A table REFERENCE — directory path or registered name — to its
    * directory: anything containing '/' (or already logged) is a
    * path; otherwise the session catalog resolves the name and the
    * table's provider must be txlog (its location is the dir). Used
    * by the name-addressed DDL forms (`DESCRIBE HISTORY t`) and the
    * `txlog_changes` table function — the Delta usability shape,
    * where admin surfaces take either spelling. */
  def resolveDir(spark: SparkSession, ref: String): String =
    if (ref.contains('/') || TxLog.isLogged(spark, ref)) ref
    else {
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(ref)
      val meta = spark.sessionState.catalog.getTableMetadata(ident)
      require(meta.provider.exists(_.equalsIgnoreCase("txlog")),
        s"txlog: table $ref is not a txlog table " +
          s"(provider ${meta.provider.getOrElse("none")})")
      meta.storage.properties.collectFirst {
        case (k, v) if k.equalsIgnoreCase("path") => v
      }.orElse(meta.storage.locationUri.map(_.toString)).getOrElse(
        throw new IllegalArgumentException(
          s"txlog: table $ref has no location"))
    }

  /** The `txlog_changes(table, from[, to])` TABLE FUNCTION — Delta's
    * `table_changes` analog, the SQL access path to the row-level
    * change feed: one row per changed row across commits
    * `from..to` (inclusive; `to` defaults to head), stamped
    * `_change_type` (insert/delete — an update is its delete+insert
    * pair) and `_commit_version`. `table` is a registered name or a
    * directory path. Cost: log metadata + scans of only the span's
    * touched files ([[TxLog.changeFeed]]). */
  def changesPlan(args: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    require(args.size == 2 || args.size == 3,
      "txlog_changes(table, fromVersion[, toVersion])")
    require(args.forall(_.foldable),
      "txlog_changes arguments must be literals")
    val spark = SparkSession.active
    val dir = resolveDir(spark, String.valueOf(args.head.eval()))
    def lng(e: Expression): Long =
      e.eval().asInstanceOf[Number].longValue()
    val from = lng(args(1))
    val until = if (args.size == 3) Some(lng(args(2))) else None
    // Delta's table_changes(from, to) includes commit `from`; the
    // feed's span is (since, until], so since = from − 1
    TxLog.changeFeed(spark, dir, from - 1, until)
      .queryExecution.logical
  }

  /** v1 pushed-filter → Column, total over Spark's Filter algebra —
    * the `SupportsDelete.deleteWhere` bridge. */
  def filterColumn(f: org.apache.spark.sql.sources.Filter): Column =
    f match {
    case EqualTo(a, v) => col(a) === lit(v)
    case EqualNullSafe(a, v) => col(a) <=> lit(v)
    case GreaterThan(a, v) => col(a) > lit(v)
    case GreaterThanOrEqual(a, v) => col(a) >= lit(v)
    case LessThan(a, v) => col(a) < lit(v)
    case LessThanOrEqual(a, v) => col(a) <= lit(v)
    case In(a, vs) => col(a).isInCollection(vs.toSeq)
    case IsNull(a) => col(a).isNull
    case IsNotNull(a) => col(a).isNotNull
    case And(l, r) => filterColumn(l) && filterColumn(r)
    case Or(l, r) => filterColumn(l) || filterColumn(r)
    case Not(c) => not(filterColumn(c))
    case StringStartsWith(a, v) => col(a).startsWith(v)
    case StringEndsWith(a, v) => col(a).endsWith(v)
    case StringContains(a, v) => col(a).contains(v)
    case AlwaysTrue() => lit(true)
    case AlwaysFalse() => lit(false)
    case other => throw new IllegalArgumentException(
      s"txlog: cannot translate pushed filter $other")
  }
}

/** The analyzer rule. One instance per session (stateless). */
class GraftTxLogSqlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def relationOf(p: LogicalPlan): Option[DataSourceV2Relation] =
    p match {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[TxLogBatchTable] => Some(r)
      case SubqueryAlias(_, child) => relationOf(child)
      case _ => None
    }

  private def refusePinned(t: TxLogBatchTable): Unit =
    require(!t.pinned,
      s"txlog: cannot run DML against ${t.dir} pinned at version " +
        s"${t.asOf} (time-travel reads are immutable history)")

  private def hasSubquery(es: Seq[Expression]): Boolean =
    es.exists(_.exists(_.isInstanceOf[PlanExpression[_]]))

  /** Re-anchor a resolved expression's attribute references by NAME.
    * DELETE/UPDATE evaluate against the table's own (unaliased) read,
    * so target attributes re-anchor BARE; MERGE evaluates against the
    * two-sided join, so target re-anchors under qualifier `t` and
    * source under `s` (the [[TxLog.mergeInto]] contract). */
  private def reanchor(e: Expression, tIds: Map[ExprId, String],
      sIds: Map[ExprId, String], qualify: Boolean): Column =
    PlanBridge.column(e.transform {
      case a: AttributeReference if tIds.contains(a.exprId) =>
        UnresolvedAttribute(
          if (qualify) Seq("t", tIds(a.exprId)) else Seq(tIds(a.exprId)))
      case a: AttributeReference if sIds.contains(a.exprId) =>
        UnresolvedAttribute(Seq("s", sIds(a.exprId)))
    })

  private def keyName(e: Expression): String = e match {
    case a: Attribute => a.name
    case other => throw new IllegalArgumentException(
      s"txlog: SQL DML can only assign top-level columns, got $other")
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      // `spark.readStream.table("t")`: the catalog hands back the
      // batch table (no MicroBatchStream), which the capability check
      // would refuse — swap the node for the v1 streaming leaf
      // DataStreamReader itself builds for format("txlog"), aliased
      // so the statement's resolved references keep their ids. The
      // stream then rides the SAME v1 Source: admission control,
      // startingVersion and readChangeFeed options included.
      case s: org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
          if s.table.isInstanceOf[TxLogBatchTable] =>
        import scala.jdk.CollectionConverters._
        val t = s.table.asInstanceOf[TxLogBatchTable]
        require(!t.pinned,
          "txlog: streaming reads cannot pin a time-travel version " +
            "— use startingVersion to bound the span instead")
        val v1 = PlanBridge.v1StreamingRelation(spark, "txlog",
          s.extraOptions.asScala.toMap + ("path" -> t.dir))
        Project(s.output.map { a =>
          val src = v1.output.find(_.name == a.name).getOrElse(
            throw new IllegalStateException(
              s"txlog: stream schema lost column ${a.name}"))
          org.apache.spark.sql.catalyst.expressions.Alias(
            src, a.name)(exprId = a.exprId)
        }, v1)

      case d @ DeleteFromTable(target, cond) =>
        relationOf(target) match {
          case Some(r) if cond.resolved && !hasSubquery(Seq(cond)) =>
            val t = r.table.asInstanceOf[TxLogBatchTable]
            refusePinned(t)
            val tIds = r.output.map(a => a.exprId -> a.name).toMap
            GraftDeleteCommand(t.dir,
              reanchor(cond, tIds, Map.empty, qualify = false))
          case _ => d
        }

      case u @ UpdateTable(target, assignments, condOpt) =>
        relationOf(target) match {
          case Some(r) if assignments.forall(_.resolved) &&
              condOpt.forall(_.resolved) &&
              !hasSubquery(assignments ++ condOpt.toSeq) =>
            val t = r.table.asInstanceOf[TxLogBatchTable]
            refusePinned(t)
            val tIds = r.output.map(a => a.exprId -> a.name).toMap
            val set = assignments.map(a => keyName(a.key) ->
              reanchor(a.value, tIds, Map.empty, qualify = false)).toMap
            val cond = condOpt
              .map(c => reanchor(c, tIds, Map.empty, qualify = false))
              .getOrElse(lit(true))
            GraftUpdateCommand(t.dir, cond, set)
          case _ => u
        }

      case m: MergeIntoTable =>
        relationOf(m.targetTable) match {
          case Some(r) if m.sourceTable.resolved &&
              m.mergeCondition.resolved &&
              (m.matchedActions ++ m.notMatchedActions ++
                m.notMatchedBySourceActions).forall(actionResolved) &&
              !hasSubquery(Seq(m.mergeCondition)) =>
            val t = r.table.asInstanceOf[TxLogBatchTable]
            refusePinned(t)
            require(!m.withSchemaEvolution,
              "txlog: MERGE WITH SCHEMA EVOLUTION is not supported — " +
                "widen the table first (mergeSchema append)")
            val tIds = r.output.map(a => a.exprId -> a.name).toMap
            val sIds = m.sourceTable.output
              .map(a => a.exprId -> a.name).toMap
            def q(e: Expression): Column =
              reanchor(e, tIds, sIds, qualify = true)
            def qo(c: Option[Expression]): Option[Column] = c.map(q)
            val targetCols = r.output.map(_.name)
            def starSet: Map[String, Column] =
              targetCols.map(n => n -> col("s." + n)).toMap
            def assignSet(as: Seq[Assignment]): Map[String, Column] =
              as.map(a => keyName(a.key) -> q(a.value)).toMap
            val clauses: Seq[TxLog.MergeClause] =
              m.matchedActions.map {
                case UpdateAction(c, as, _) =>
                  TxLog.MergeMatchedUpdate(assignSet(as), qo(c))
                case UpdateStarAction(c) =>
                  TxLog.MergeMatchedUpdate(starSet, qo(c))
                case DeleteAction(c) => TxLog.MergeMatchedDelete(qo(c))
                case other => throw new IllegalArgumentException(
                  s"txlog: unsupported MATCHED action $other")
              } ++ m.notMatchedActions.map {
                case InsertAction(c, as) =>
                  TxLog.MergeInsert(assignSet(as), qo(c))
                case InsertStarAction(c) =>
                  TxLog.MergeInsert(starSet, qo(c))
                case other => throw new IllegalArgumentException(
                  s"txlog: unsupported NOT MATCHED action $other")
              } ++ m.notMatchedBySourceActions.map {
                case UpdateAction(c, as, _) =>
                  TxLog.MergeNotMatchedBySourceUpdate(assignSet(as), qo(c))
                case DeleteAction(c) =>
                  TxLog.MergeNotMatchedBySourceDelete(qo(c))
                case other => throw new IllegalArgumentException(
                  s"txlog: unsupported NOT MATCHED BY SOURCE action $other")
              }
            GraftMergeCommand(t.dir, m.sourceTable,
              q(m.mergeCondition), clauses)
          case _ => m
        }
    }

  private def actionResolved(a: MergeAction): Boolean = a match {
    case UpdateAction(c, as, _) =>
      c.forall(_.resolved) && as.forall(_.resolved)
    case InsertAction(c, as) =>
      c.forall(_.resolved) && as.forall(_.resolved)
    case DeleteAction(c) => c.forall(_.resolved)
    case UpdateStarAction(c) => c.forall(_.resolved)
    case InsertStarAction(c) => c.forall(_.resolved)
    case _ => false
  }
}

private[graft] case class GraftDeleteCommand(dir: String, cond: Column)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    TxLog.delete(session, dir, cond)
    Seq.empty
  }
}

private[graft] case class GraftUpdateCommand(dir: String, cond: Column,
    set: Map[String, Column]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    TxLog.update(session, dir, cond, set)
    Seq.empty
  }
}

private[graft] case class GraftMergeCommand(dir: String,
    sourcePlan: LogicalPlan, cond: Column,
    clauses: Seq[TxLog.MergeClause]) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(sourcePlan)
  override def run(session: SparkSession): Seq[Row] = {
    TxLog.mergeInto(session, dir,
      PlanBridge.fromPlan(session, sourcePlan), cond, clauses)
    Seq.empty
  }
}
