package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference, Exists, ExprId, Expression, InSubquery, ListQuery,
  OuterReference, PlanExpression,
  Alias => CAlias, And => CAnd, EqualTo => CEqualTo, Not => CNot}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter,
  Project => LProject}
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
  * against the table's own read path.
  *
  * DELETE/UPDATE conditions MAY contain subqueries (Delta supports
  * them; `DELETE FROM t WHERE k IN (SELECT …)` is the everyday
  * quarantine-list shape). Supported as top-level AND conjuncts:
  * `[NOT] IN (SELECT …)` uncorrelated, and `[NOT] EXISTS (SELECT …)`
  * uncorrelated or with equality-only correlation. They lower to the
  * SAME row-level machinery: the subquery plan is carried into the
  * command and joined at run time through [[TxLog.mergeInto]] —
  * positives as a MATCHED clause against the DISTINCT subquery rows
  * (cardinality holds by construction, and the source value envelope
  * still file-prunes via the merge's equality conjuncts), negatives
  * as a NOT-MATCHED-BY-SOURCE clause (NOT IN is null-aware: a NULL in
  * the list makes the statement a no-op, a NULL probe row is exempt).
  * Anything else — correlated IN, non-equality correlation, scalar
  * subqueries, subqueries in SET or MERGE — refuses with the graft
  * grammar error rather than falling through to Spark's native path,
  * which cannot rewrite a path-addressed v2 table. Plain sessions
  * without the extension still get `DELETE FROM` through
  * [[TxLogBatchTable]]'s `SupportsDelete`.
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

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case CAnd(l, r) => splitAnd(l) ++ splitAnd(r)
    case x => Seq(x)
  }

  private def hasOuter(e: Expression): Boolean =
    e.exists(_.isInstanceOf[OuterReference])
  private def planHasOuter(p: LogicalPlan): Boolean =
    p.exists(_.expressions.exists(hasOuter))

  /** Lower a DELETE/UPDATE condition CONTAINING subqueries. Each
    * top-level AND conjunct is either subquery-free (re-anchored into
    * the base condition), `[NOT] IN (SELECT …)` uncorrelated, or
    * `[NOT] EXISTS (SELECT …)` uncorrelated / equality-correlated.
    * The subquery plans travel into [[GraftSubqueryDmlCommand]],
    * which joins them at run time through [[TxLog.mergeInto]] — see
    * the class doc for the MATCHED / NOT-MATCHED-BY-SOURCE mapping.
    * Everything is re-anchored BARE: the built merge source exposes
    * only `__graft_sq_*` columns, so bare target names can never be
    * ambiguous inside the join. */
  private def lowerSubqueryDml(dir: String, cond: Expression,
      tIds: Map[ExprId, String],
      set: Option[Map[String, Column]]): LogicalPlan = {
    def bare(e: Expression): Column =
      reanchor(e, tIds, Map.empty, qualify = false)
    def refuse(what: String): Nothing =
      throw new IllegalArgumentException(
        s"txlog: unsupported subquery shape in DML condition — $what. " +
          "Supported as top-level AND conjuncts: [NOT] IN (SELECT …) " +
          "uncorrelated, [NOT] EXISTS (SELECT …) uncorrelated or " +
          "with equality-only correlation")
    val base = Seq.newBuilder[Column]
    val preds = Seq.newBuilder[GraftSqPred]
    def inPred(values: Seq[Expression], lq: ListQuery,
        neg: Boolean): Unit = {
      if (lq.outerAttrs.nonEmpty || planHasOuter(lq.plan))
        refuse("correlated IN subquery")
      if (hasSubquery(values)) refuse("nested subquery in IN values")
      preds += GraftSqPred(values.map(bare), lq.plan,
        negated = neg, nullAwareNotIn = neg)
    }
    def existsPred(ex: Exists, neg: Boolean): Unit =
      if (ex.outerAttrs.isEmpty && !planHasOuter(ex.plan))
        preds += GraftSqPred(Nil, ex.plan, negated = neg,
          nullAwareNotIn = false)
      else {
        // equality-correlated EXISTS: Project*(Filter(conjs, child))
        // where every outer reference sits in a conjunct
        // `OuterReference(t.a) = <inner expr>` — the semi-join shape
        def strip(p: LogicalPlan): LogicalPlan = p match {
          case LProject(pl, ch) if !pl.exists(hasOuter) => strip(ch)
          case other => other
        }
        strip(ex.plan) match {
          case LFilter(fc, child) if !planHasOuter(child) =>
            val (outerCs, innerCs) = splitAnd(fc).partition(hasOuter)
            val pairs = outerCs.map {
              case CEqualTo(OuterReference(a: AttributeReference), in)
                  if tIds.contains(a.exprId) && !hasOuter(in) &&
                    !hasSubquery(Seq(in)) => (a, in)
              case CEqualTo(in, OuterReference(a: AttributeReference))
                  if tIds.contains(a.exprId) && !hasOuter(in) &&
                    !hasSubquery(Seq(in)) => (a, in)
              case other =>
                refuse(s"non-equality correlation in EXISTS: $other")
            }
            if (pairs.isEmpty) refuse("EXISTS correlation lost")
            val kept = innerCs.reduceOption(CAnd.apply)
              .map(LFilter(_, child)).getOrElse(child)
            val proj = LProject(pairs.zipWithIndex.map {
              case ((_, in), j) => CAlias(in, s"__graft_sq$j")()
            }, kept)
            preds += GraftSqPred(pairs.map(p => bare(p._1)), proj,
              negated = neg, nullAwareNotIn = false)
          case _ => refuse("EXISTS correlation outside a top-level " +
            "WHERE filter")
        }
      }
    splitAnd(cond).foreach {
      case c if !hasSubquery(Seq(c)) => base += bare(c)
      case InSubquery(values, lq) => inPred(values, lq, neg = false)
      case CNot(InSubquery(values, lq)) => inPred(values, lq, neg = true)
      case ex: Exists => existsPred(ex, neg = false)
      case CNot(ex: Exists) => existsPred(ex, neg = true)
      case other => refuse(s"conjunct $other")
    }
    val ps = preds.result()
    val njoin = ps.count(p => p.negated && p.tExprs.nonEmpty)
    require(njoin <= 1 && (njoin == 0 ||
      !ps.exists(p => !p.negated && p.tExprs.nonEmpty)),
      "txlog: DML supports at most one joined NEGATED subquery " +
        "conjunct (NOT IN / correlated NOT EXISTS), not mixed with " +
        "joined positive subquery conjuncts")
    GraftSubqueryDmlCommand(dir,
      base.result().reduceOption(_ && _).getOrElse(lit(true)), ps, set)
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
          case Some(r) if cond.resolved =>
            val t = r.table.asInstanceOf[TxLogBatchTable]
            refusePinned(t)
            val tIds = r.output.map(a => a.exprId -> a.name).toMap
            if (!hasSubquery(Seq(cond)))
              GraftDeleteCommand(t.dir,
                reanchor(cond, tIds, Map.empty, qualify = false))
            else lowerSubqueryDml(t.dir, cond, tIds, None)
          case _ => d
        }

      case u @ UpdateTable(target, assignments, condOpt) =>
        relationOf(target) match {
          case Some(r) if assignments.forall(_.resolved) &&
              condOpt.forall(_.resolved) =>
            val t = r.table.asInstanceOf[TxLogBatchTable]
            refusePinned(t)
            require(!hasSubquery(assignments),
              "txlog: subqueries in UPDATE SET assignments are not " +
                "supported — compute the value into a view and MERGE")
            val tIds = r.output.map(a => a.exprId -> a.name).toMap
            val set = assignments.map(a => keyName(a.key) ->
              reanchor(a.value, tIds, Map.empty, qualify = false)).toMap
            if (!hasSubquery(condOpt.toSeq)) {
              val cond = condOpt
                .map(c => reanchor(c, tIds, Map.empty, qualify = false))
                .getOrElse(lit(true))
              GraftUpdateCommand(t.dir, cond, set)
            } else lowerSubqueryDml(t.dir, condOpt.get, tIds, Some(set))
          case _ => u
        }

      case m: MergeIntoTable =>
        relationOf(m.targetTable) match {
          case Some(r) if m.sourceTable.resolved &&
              m.mergeCondition.resolved &&
              (m.matchedActions ++ m.notMatchedActions ++
                m.notMatchedBySourceActions).forall(actionResolved) =>
            val t = r.table.asInstanceOf[TxLogBatchTable]
            refusePinned(t)
            require(!hasSubquery(Seq(m.mergeCondition)) &&
              !hasSubquery(m.matchedActions ++ m.notMatchedActions ++
                m.notMatchedBySourceActions),
              "txlog: subqueries in MERGE conditions or assignments " +
                "are not supported — materialize the subquery into " +
                "the USING source instead")
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

/** One subquery conjunct of a lowered DELETE/UPDATE condition.
  * `tExprs` are the target-side probe expressions (bare-anchored);
  * `plan` outputs exactly `tExprs.size` columns (positionally the
  * join partners) — empty `tExprs` marks an uncorrelated EXISTS,
  * which gates the whole statement on run-time (non-)emptiness. */
private[graft] case class GraftSqPred(tExprs: Seq[Column],
    plan: LogicalPlan, negated: Boolean, nullAwareNotIn: Boolean)

/** DELETE (`set` = None) / UPDATE (`set` = Some) whose condition
  * carries subquery conjuncts. Lowered through [[TxLog.mergeInto]]:
  * positives become a MATCHED clause against the DISTINCT subquery
  * rows (the distinct makes Delta's cardinality contract hold by
  * construction, and the equality conjuncts keep the merge's
  * stats-based file pruning); the one allowed joined negative
  * becomes a NOT-MATCHED-BY-SOURCE clause — rows present in the
  * subquery are matched and therefore exempt, which relies on
  * mergeInto gating NMBS on true matched-ness. NOT IN is null-aware:
  * a NULL anywhere in the list makes the statement a no-op, a NULL
  * probe row is exempt against a non-empty list (`IS NOT NULL`
  * folded into the clause), and an EMPTY list makes the conjunct
  * universally TRUE — NULL probes included — so it lowers to the
  * plain predicate form. */
private[graft] case class GraftSubqueryDmlCommand(dir: String,
    baseCond: Column, preds: Seq[GraftSqPred],
    set: Option[Map[String, Column]]) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = preds.map(_.plan)
  override def run(session: SparkSession): Seq[Row] = {
    def sub(p: GraftSqPred): DataFrame =
      PlanBridge.fromPlan(session, p.plan)
    // uncorrelated [NOT] EXISTS conjuncts gate the whole statement:
    // a FALSE conjunct means no row can satisfy the condition
    for (p <- preds if p.tExprs.isEmpty)
      if (p.negated != sub(p).isEmpty) return Seq.empty
    val joined = preds.filter(_.tExprs.nonEmpty)
    val (njoin, pjoin) = joined.partition(_.negated)
    if (joined.isEmpty) {
      set match {
        case Some(s) => TxLog.update(session, dir, baseCond, s)
        case None => TxLog.delete(session, dir, baseCond)
      }
      return Seq.empty
    }
    val opName = if (set.isDefined) "update" else "delete"
    def eq(p: GraftSqPred, names: Seq[String]): Column =
      p.tExprs.zip(names).map { case (te, n) => te === col(n) }
        .reduce(_ && _)
    if (njoin.isEmpty) {
      val (src, on) = pjoin.zipWithIndex
        .foldLeft(Option.empty[DataFrame] -> lit(true)) {
          case ((acc, cnd), (p, i)) =>
            val names = p.tExprs.indices.map(j => s"__graft_sq_${i}_$j")
            val d = sub(p).toDF(names: _*).distinct()
            (Some(acc.map(_.crossJoin(d)).getOrElse(d)),
              cnd && eq(p, names))
        }
      val clause: TxLog.MergeClause = set match {
        case Some(s) => TxLog.MergeMatchedUpdate(s, Some(baseCond))
        case None => TxLog.MergeMatchedDelete(Some(baseCond))
      }
      TxLog.mergeInto(session, dir, src.get, on, Seq(clause),
        op = opName)
    } else {
      val p = njoin.head
      val names = p.tExprs.indices.map(j => s"__graft_sq_0_$j")
      // checkpoint once: the list is consumed by the null/empty
      // probes AND as the merge source — without it the full
      // subquery plan (scan + distinct shuffle) runs per consumer
      val d = sub(p).toDF(names: _*).distinct().localCheckpoint(true)
      try {
        if (p.nullAwareNotIn &&
            d.filter(names.map(col(_).isNull).reduce(_ || _))
              .head(1).nonEmpty)
          return Seq.empty // NOT IN over a NULL-bearing list: never TRUE
        if (d.isEmpty) {
          // NOT IN / NOT EXISTS over an EMPTY result is TRUE for
          // EVERY probe row — including NULL probes, which the nn
          // exemption below would wrongly spare. Lower to the plain
          // predicate form.
          set match {
            case Some(s) => TxLog.update(session, dir, baseCond, s)
            case None => TxLog.delete(session, dir, baseCond)
          }
        } else {
          val nn = if (p.nullAwareNotIn)
            p.tExprs.map(_.isNotNull).reduce(_ && _) else lit(true)
          val clause: TxLog.MergeClause = set match {
            case Some(s) =>
              TxLog.MergeNotMatchedBySourceUpdate(s, Some(baseCond && nn))
            case None =>
              TxLog.MergeNotMatchedBySourceDelete(Some(baseCond && nn))
          }
          TxLog.mergeInto(session, dir, d, eq(p, names), Seq(clause),
            op = opName)
        }
      } finally graft.operators.Dedup.release(d)
    }
    Seq.empty
  }
}
