package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, DataType, LongType,
  StringType, StructType}

/** SQL DDL / utility surface for txlog tables — the admin commands
  * Delta exposes in SQL. Every statement takes a table REFERENCE:
  * a quoted directory path (`'…/t'` — a logged table's identity is
  * its directory) or a bare registered-table name (resolved through
  * the session catalog at run time, [[TxLogSql.resolveDir]] — the
  * Delta usability shape):
  *
  * {{{
  *   OPTIMIZE 'dir'|t [WHERE <pred>] [TARGET <n> FILES] [ZORDER BY (a[, b])]
  *   VACUUM 'dir' [RETAIN <n> VERSIONS] [DRY RUN]
  *   DESCRIBE HISTORY 'dir'
  *   DESCRIBE DETAIL 'dir'
  *   RESTORE 'dir' [TO] VERSION AS OF <v>
  *   RESTORE 'dir' [TO] TIMESTAMP AS OF <epoch-ms>
  *   ALTER TXLOG 'dir' ADD CONSTRAINT <name> CHECK (<expr>)
  *   ALTER TXLOG 'dir' DROP CONSTRAINT <name>
  *   ALTER TXLOG 'dir' ALTER COLUMN <c> SET DEFAULT (<expr>)
  *   ALTER TXLOG 'dir' ALTER COLUMN <c> DROP DEFAULT
  *   ALTER TXLOG 'dir' ALTER COLUMN <c> SET GENERATED AS (<expr>)
  *   ALTER TXLOG 'dir' ALTER COLUMN <c> DROP GENERATED
  *   ALTER TXLOG 'dir' ALTER COLUMN <c> SET IDENTITY [START <s>] [STEP <p>] [BY DEFAULT]
  * }}}
  *
  * Installed by [[graft.functions.GraftExtensions]] as a DELEGATING
  * parser: statements matching the grammar above lower straight to
  * the Scala API ([[TxLog.compact]], [[TxLog.vacuum]],
  * [[TxLog.history]], [[TxLog.describeDetail]], [[TxLog.restore]],
  * [[TxLog.addCheckConstraint]], [[TxLog.setDefault]],
  * [[TxLog.setGenerated]], [[TxLog.setIdentity]] …); everything else
  * passes through to Spark's own parser untouched, so the session's
  * SQL surface is strictly widened. `ALTER TXLOG` (not `ALTER TABLE`)
  * keeps the grammar disjoint from Spark's catalog DDL — a quoted
  * path after `ALTER TABLE` would shadow statements Spark may learn
  * to parse. OPTIMIZE's default target sizes rewrites at ~128 MiB
  * per file from the live-byte count (the Delta default), so an
  * argument-less `OPTIMIZE 'dir'` is sane at any table size.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    parseGraft(sqlText.trim).getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String) =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)

  private def parseGraft(sql: String): Option[LogicalPlan] = {
    val s = sql.stripSuffix(";").trim
    optimizeRe.findFirstMatchIn(s).map { m =>
      GraftOptimizeCommand(ref(m),
        Option(m.group("pred")),
        Option(m.group("target")).map(_.toInt),
        Option(m.group("z1")).toSeq ++ Option(m.group("z2")).toSeq)
    }.orElse(vacuumRe.findFirstMatchIn(s).map { m =>
      GraftVacuumCommand(ref(m),
        Option(m.group("retain")).map(_.toInt).getOrElse(0),
        dryRun = m.group("dry") != null)
    }).orElse(historyRe.findFirstMatchIn(s).map { m =>
      GraftHistoryCommand(ref(m))
    }).orElse(detailRe.findFirstMatchIn(s).map { m =>
      GraftDetailCommand(ref(m))
    }).orElse(restoreRe.findFirstMatchIn(s).map { m =>
      GraftRestoreCommand(ref(m),
        byTimestamp = m.group("kind").equalsIgnoreCase("TIMESTAMP"),
        m.group("v").toLong)
    }).orElse(addConsRe.findFirstMatchIn(s).map { m =>
      GraftAlterCommand(ref(m), "addConstraint",
        m.group("name"), m.group("expr"))
    }).orElse(dropConsRe.findFirstMatchIn(s).map { m =>
      GraftAlterCommand(ref(m), "dropConstraint",
        m.group("name"), "")
    }).orElse(setDefaultRe.findFirstMatchIn(s).map { m =>
      GraftAlterCommand(ref(m), "setDefault",
        m.group("col"), m.group("expr"))
    }).orElse(dropDefaultRe.findFirstMatchIn(s).map { m =>
      GraftAlterCommand(ref(m), "dropDefault",
        m.group("col"), "")
    }).orElse(setGenRe.findFirstMatchIn(s).map { m =>
      GraftAlterCommand(ref(m), "setGenerated",
        m.group("col"), m.group("expr"))
    }).orElse(dropGenRe.findFirstMatchIn(s).map { m =>
      GraftAlterCommand(ref(m), "dropGenerated",
        m.group("col"), "")
    }).orElse(setIdentityRe.findFirstMatchIn(s).map { m =>
      GraftSetIdentityCommand(ref(m), m.group("col"),
        Option(m.group("start")).map(_.toLong).getOrElse(1L),
        Option(m.group("step")).map(_.toLong).getOrElse(1L),
        always = m.group("bydef") == null)
    })
  }
}

private[graft] object GraftSqlParser {
  // a table REFERENCE: 'path' (with '' escaping) or a bare
  // registered-table identifier — resolved to a dir at run time
  // ([[TxLogSql.resolveDir]]), the Delta usability shape
  private def dir =
    """(?:'(?<dir>(?:[^']|'')+)'|(?<tname>[A-Za-z_][A-Za-z0-9_.]*))"""
  private val ws = """\s+"""

  val optimizeRe: scala.util.matching.Regex =
    ("""(?is)\AOPTIMIZE""" + ws + dir +
      """(?:\s+WHERE\s+(?<pred>.+?))??""" +
      """(?:\s+TARGET\s+(?<target>\d+)\s+FILES)?""" +
      """(?:\s+ZORDER\s+BY\s+\(\s*(?<z1>\w+)\s*(?:,\s*(?<z2>\w+)\s*)?\))?\z""").r
  val vacuumRe: scala.util.matching.Regex =
    ("""(?is)\AVACUUM""" + ws + dir +
      """(?:\s+RETAIN\s+(?<retain>\d+)\s+VERSIONS)?""" +
      """(?<dry>\s+DRY\s+RUN)?\z""").r
  val historyRe: scala.util.matching.Regex =
    ("""(?is)\ADESCRIBE""" + ws + "HISTORY" + ws + dir + """\z""").r
  val detailRe: scala.util.matching.Regex =
    ("""(?is)\ADESCRIBE""" + ws + "DETAIL" + ws + dir + """\z""").r
  val restoreRe: scala.util.matching.Regex =
    ("""(?is)\ARESTORE""" + ws + dir +
      """(?:\s+TO)?\s+(?<kind>VERSION|TIMESTAMP)\s+AS\s+OF\s+(?<v>\d+)\z""").r
  val addConsRe: scala.util.matching.Regex =
    ("""(?is)\AALTER""" + ws + "TXLOG" + ws + dir + ws +
      """ADD\s+CONSTRAINT\s+(?<name>\w+)\s+CHECK\s*\((?<expr>.+)\)\z""").r
  val dropConsRe: scala.util.matching.Regex =
    ("""(?is)\AALTER""" + ws + "TXLOG" + ws + dir + ws +
      """DROP\s+CONSTRAINT\s+(?<name>\w+)\z""").r
  val setDefaultRe: scala.util.matching.Regex =
    ("""(?is)\AALTER""" + ws + "TXLOG" + ws + dir + ws +
      """ALTER\s+COLUMN\s+(?<col>\w+)\s+SET\s+DEFAULT\s*\((?<expr>.+)\)\z""").r
  val dropDefaultRe: scala.util.matching.Regex =
    ("""(?is)\AALTER""" + ws + "TXLOG" + ws + dir + ws +
      """ALTER\s+COLUMN\s+(?<col>\w+)\s+DROP\s+DEFAULT\z""").r
  val setGenRe: scala.util.matching.Regex =
    ("""(?is)\AALTER""" + ws + "TXLOG" + ws + dir + ws +
      """ALTER\s+COLUMN\s+(?<col>\w+)\s+SET\s+GENERATED\s+AS\s*\((?<expr>.+)\)\z""").r
  val dropGenRe: scala.util.matching.Regex =
    ("""(?is)\AALTER""" + ws + "TXLOG" + ws + dir + ws +
      """ALTER\s+COLUMN\s+(?<col>\w+)\s+DROP\s+GENERATED\z""").r
  val setIdentityRe: scala.util.matching.Regex =
    ("""(?is)\AALTER""" + ws + "TXLOG" + ws + dir + ws +
      """ALTER\s+COLUMN\s+(?<col>\w+)\s+SET\s+IDENTITY""" +
      """(?:\s+START\s+(?<start>-?\d+))?(?:\s+STEP\s+(?<step>-?\d+))?""" +
      """(?<bydef>\s+BY\s+DEFAULT)?\z""").r

  def unq(dir: String): String = dir.replace("''", "'")

  /** The matched reference: the quoted path (unescaped) or the bare
    * identifier, whichever alternative fired. */
  def ref(m: scala.util.matching.Regex.Match): String =
    Option(m.group("dir")).map(unq)
      .getOrElse(m.group("tname"))

  def attr(name: String, dt: DataType): Attribute =
    AttributeReference(name, dt, nullable = true)()
}

private[graft] case class GraftOptimizeCommand(dirRaw: String,
    pred: Option[String], target: Option[Int], zorder: Seq[String])
    extends LeafRunnableCommand {
  import GraftSqlParser._
  override val output: Seq[Attribute] =
    Seq(attr("version", LongType), attr("target_files", LongType))
  override def run(session: SparkSession): Seq[Row] = {
    val dir = TxLogSql.resolveDir(session, dirRaw)
    val n = target.getOrElse {
      // Delta's default shape: ~128 MiB per rewritten file
      val snap = TxLog.snapshot(session, dir)
      val bytes = snap.files.flatMap(_.bytes).sum
      math.max(1, math.ceil(bytes / (128.0 * 1024 * 1024)).toInt)
    }
    val v = TxLog.compact(session, dir, n,
      zorderBy = zorder,
      where = pred.map(org.apache.spark.sql.functions.expr))
    Seq(Row(v, n.toLong))
  }
}

private[graft] case class GraftVacuumCommand(dirRaw: String,
    retain: Int, dryRun: Boolean) extends LeafRunnableCommand {
  import GraftSqlParser._
  override val output: Seq[Attribute] =
    Seq(attr("path", StringType), attr("deleted", BooleanType))
  override def run(session: SparkSession): Seq[Row] = {
    val dir = TxLogSql.resolveDir(session, dirRaw)
    if (dryRun)
      TxLog.vacuumDryRun(session, dir, retain).map(Row(_, false))
    else {
      val before = TxLog.vacuumDryRun(session, dir, retain)
      TxLog.vacuum(session, dir, retain)
      before.map(Row(_, true))
    }
  }
}

private[graft] case class GraftHistoryCommand(dirRaw: String)
    extends LeafRunnableCommand {
  import GraftSqlParser._
  override val output: Seq[Attribute] = Seq(
    attr("version", LongType), attr("timestamp", LongType),
    attr("op", StringType),
    attr("n_added", org.apache.spark.sql.types.IntegerType),
    attr("n_removed", org.apache.spark.sql.types.IntegerType),
    attr("rows_added", LongType), attr("app_id", StringType),
    attr("batch_id", LongType))
  override def run(session: SparkSession): Seq[Row] =
    TxLog.history(session,
      TxLogSql.resolveDir(session, dirRaw)).collect().toSeq
}

private[graft] case class GraftDetailCommand(dirRaw: String)
    extends LeafRunnableCommand {
  import GraftSqlParser._
  override val output: Seq[Attribute] = Seq(
    attr("version", LongType), attr("num_files", LongType),
    attr("num_rows", LongType), attr("num_deleted_rows", LongType),
    attr("live_bytes", LongType), attr("bytes_in_dir", LongType),
    attr("num_dv_files", LongType), attr("num_constraints", LongType),
    attr("column_mapping", BooleanType), attr("min_reader", LongType))
  override def run(session: SparkSession): Seq[Row] =
    TxLog.describeDetail(session,
      TxLogSql.resolveDir(session, dirRaw)).collect().toSeq
}

private[graft] case class GraftRestoreCommand(dirRaw: String,
    byTimestamp: Boolean, v: Long) extends LeafRunnableCommand {
  import GraftSqlParser._
  override val output: Seq[Attribute] = Seq(attr("version", LongType))
  override def run(session: SparkSession): Seq[Row] = {
    val dir = TxLogSql.resolveDir(session, dirRaw)
    val out =
      if (byTimestamp) TxLog.restoreAt(session, dir, v)
      else TxLog.restore(session, dir, v)
    Seq(Row(out))
  }
}

private[graft] case class GraftAlterCommand(dirRaw: String, op: String,
    name: String, exprStr: String) extends LeafRunnableCommand {
  import GraftSqlParser._
  override val output: Seq[Attribute] = Seq(attr("version", LongType))
  override def run(session: SparkSession): Seq[Row] = {
    val dir = TxLogSql.resolveDir(session, dirRaw)
    val v = op match {
      case "addConstraint" =>
        TxLog.addCheckConstraint(session, dir, name, exprStr)
      case "dropConstraint" =>
        TxLog.dropCheckConstraint(session, dir, name)
      case "setDefault" => TxLog.setDefault(session, dir, name, exprStr)
      case "dropDefault" => TxLog.dropDefault(session, dir, name)
      case "setGenerated" =>
        TxLog.setGenerated(session, dir, name, exprStr)
      case "dropGenerated" => TxLog.dropGenerated(session, dir, name)
    }
    Seq(Row(v))
  }
}

private[graft] case class GraftSetIdentityCommand(dirRaw: String,
    col: String, start: Long, step: Long, always: Boolean)
    extends LeafRunnableCommand {
  import GraftSqlParser._
  override val output: Seq[Attribute] = Seq(attr("version", LongType))
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(TxLog.setIdentity(session,
      TxLogSql.resolveDir(session, dirRaw), col, start, step,
      always)))
}
