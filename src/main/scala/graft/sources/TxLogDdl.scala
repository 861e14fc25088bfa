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
  *   OPTIMIZE 'dir'|t [WHERE <pred>] [TARGET <n> FILES] [ZORDER BY (c1, …, cN)] [FLATTEN]
  *   VACUUM 'dir' [RETAIN <n> VERSIONS] [DRY RUN]
  *   DESCRIBE HISTORY 'dir'
  *   DESCRIBE DETAIL 'dir'
  *   RESTORE 'dir' [TO] VERSION AS OF <v>
  *   RESTORE 'dir' [TO] TIMESTAMP AS OF <epoch-ms>
  *   CONVERT TO TXLOG 'dir' [STATS (c1, …, cN)]
  *   COPY INTO 'dir'|t FROM '<src>' FILEFORMAT = PARQUET|CSV|JSON [PATTERN = '<glob>'] [FORMAT_OPTIONS ('k' = 'v', …)] [FORCE]
  *   CREATE TABLE t|'dir' [SHALLOW|DEEP] CLONE s [VERSION|TIMESTAMP AS OF <n>] [LOCATION 'dir']
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
    val parsed = optimizeRe.findFirstMatchIn(s).map { m =>
      // FLATTEN is NOT a reserved word: in `OPTIMIZE t WHERE x =
      // flatten` the lazy predicate backtracks to pred='x =' plus the
      // keyword, breaking a previously valid statement. Disambiguate
      // by PARSING: when the clipped predicate is not a valid
      // expression but predicate+trailing-token is, the token was an
      // identifier — reattach it (original text, original case) and
      // drop the flag. `WHERE x = 1 FLATTEN` keeps the keyword (the
      // clipped form parses); `WHERE x = flatten FLATTEN` keeps both.
      val pred0 = Option(m.group("pred"))
      val flat0 = m.group("flatten") != null
      def parses(e: String): Boolean =
        scala.util.Try(delegate.parseExpression(e)).isSuccess
      val (pred, flat) = pred0 match {
        case Some(p) if flat0 && !parses(p) &&
            parses(p + m.group("flatten")) =>
          (Some(p + m.group("flatten")), false)
        case _ => (pred0, flat0)
      }
      GraftOptimizeCommand(ref(m),
        pred,
        Option(m.group("target")).map(_.toInt),
        Option(m.group("zcols")).toSeq.flatMap(_.split(",").toSeq
          .map(_.trim).filter(_.nonEmpty)),
        flatten = flat)
    }.orElse(vacuumRe.findFirstMatchIn(s).map { m =>
      GraftVacuumCommand(ref(m),
        Option(m.group("retain")).map(_.toInt).getOrElse(0),
        dryRun = m.group("dry") != null)
    }).orElse(historyRe.findFirstMatchIn(s).flatMap { m =>
      claimDescribe(m).map(GraftHistoryCommand)
    }).orElse(detailRe.findFirstMatchIn(s).flatMap { m =>
      claimDescribe(m).map(GraftDetailCommand)
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
    }).orElse(convertRe.findFirstMatchIn(s).map { m =>
      GraftConvertCommand(ref(m),
        quotedPath = m.group("dir") != null,
        Option(m.group("stats")).toSeq.flatMap(_.split(",").toSeq
          .map(_.trim).filter(_.nonEmpty)))
    }).orElse(cloneRe.findFirstMatchIn(s).map { m =>
      GraftCloneCommand(
        tgtName = Option(m.group("tname")),
        tgtDir = Option(m.group("tdir")).map(unq),
        deep = m.group("kind") == null ||
          !m.group("kind").equalsIgnoreCase("SHALLOW"),
        srcRaw = Option(m.group("sdir")).map(unq)
          .getOrElse(m.group("sname")),
        byTimestamp = Option(m.group("tkind"))
          .exists(_.equalsIgnoreCase("TIMESTAMP")),
        travel = Option(m.group("v")).map(_.toLong),
        loc = Option(m.group("loc")).map(unq))
    }).orElse(replaceWhereRe.findFirstMatchIn(s).map { m =>
      GraftReplaceWhereCommand(ref(m), m.group("pred"),
        delegate.parseQuery(m.group("query")))
    }).orElse(copyIntoRe.findFirstMatchIn(s).map { m =>
      GraftCopyIntoCommand(ref(m), unq(m.group("src")),
        m.group("fmt").toLowerCase,
        Option(m.group("pat")).map(unq),
        Option(m.group("fopts")).map(parseKvOptions).getOrElse(Map.empty),
        force = m.group("force") != null)
    }).orElse(setPropsRe.findFirstMatchIn(s).map { m =>
      GraftPropertiesCommand(ref(m),
        parseKvOptions(m.group("props")), Nil)
    }).orElse(unsetPropsRe.findFirstMatchIn(s).map { m =>
      GraftPropertiesCommand(ref(m), Map.empty,
        parseKeyList(m.group("keys")))
    }).orElse(showPropsRe.findFirstMatchIn(s).flatMap { m =>
      // SHOW stays delegating for non-txlog tables (Spark owns the
      // keyword); a quoted path claims unconditionally
      claimDescribe(m).map(r => GraftShowPropertiesCommand(r,
        Option(m.group("key")).map(unq)))
    }).orElse(descExtRe.findFirstMatchIn(s).flatMap { m =>
      claimDescribe(m).map(GraftDescribeExtendedCommand)
    })
    // first-token ownership: a statement that BEGINS with a keyword
    // Spark's grammar has no meaning for (OPTIMIZE / VACUUM / RESTORE
    // / ALTER TXLOG) but fails the full graft grammar must raise the
    // graft error naming the expected shape — never fall through to
    // Spark's unrelated ParseException (DESCRIBE stays delegating:
    // Spark owns that keyword)
    if (parsed.isEmpty) ownedToken.findFirstMatchIn(s).foreach { m =>
      throw new IllegalArgumentException(
        s"txlog: cannot parse '${m.group(1).toUpperCase} …' — " +
          grammarFor(m.group(1)))
    }
    parsed
  }

  /** DESCRIBE HISTORY/DETAIL claims a QUOTED path unconditionally,
    * but a bare identifier only when it resolves to a txlog table —
    * otherwise `DESCRIBE history <col>` (a user table literally named
    * `history`) would be shadowed; unresolvable names delegate to
    * Spark's own DESCRIBE. */
  private def claimDescribe(m: scala.util.matching.Regex.Match)
      : Option[String] = {
    val r = ref(m)
    if (m.group("dir") != null) Some(r)
    else scala.util.Try {
      val session = SparkSession.active
      TxLogSql.resolveDir(session, r)
    }.toOption.map(_ => r)
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
      """(?:\s+ZORDER\s+BY\s+\(\s*(?<zcols>[\w\s,]+?)\s*\))?""" +
      """(?<flatten>\s+FLATTEN)?\z""").r
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
  val convertRe: scala.util.matching.Regex =
    ("""(?is)\ACONVERT\s+TO\s+TXLOG""" + ws + dir +
      """(?:\s+STATS\s*\(\s*(?<stats>[\w\s,]+?)\s*\))?\z""").r
  // Delta's atomic partial overwrite: INSERT INTO t REPLACE WHERE
  // <pred> <query>. The predicate is the plain-expression slice (no
  // subqueries — a lazy match up to the query's leading keyword);
  // the query is handed to Spark's own parser.
  val replaceWhereRe: scala.util.matching.Regex =
    ("""(?is)\AINSERT\s+INTO""" + ws + dir + ws +
      """REPLACE\s+WHERE\s+(?<pred>.+?)\s+""" +
      """(?<query>(?:SELECT|WITH|VALUES|TABLE|FROM)\b.+)\z""").r
  // target and source each take either spelling; named groups must be
  // unique, so the clone regex spells them out instead of reusing `dir`
  val cloneRe: scala.util.matching.Regex =
    ("""(?is)\ACREATE\s+TABLE\s+""" +
      """(?:'(?<tdir>(?:[^']|'')+)'|(?<tname>[A-Za-z_][A-Za-z0-9_.]*))""" +
      """(?:\s+(?<kind>SHALLOW|DEEP))?\s+CLONE\s+""" +
      """(?:'(?<sdir>(?:[^']|'')+)'|(?<sname>[A-Za-z_][A-Za-z0-9_.]*))""" +
      """(?:\s+(?<tkind>VERSION|TIMESTAMP)\s+AS\s+OF\s+(?<v>\d+))?""" +
      """(?:\s+LOCATION\s+'(?<loc>(?:[^']|'')+)')?\z""").r

  // log-carried table properties: SET/UNSET ride ALTER TXLOG; SHOW
  // answers from the snapshot ([[TxLog.setTblProperties]])
  val setPropsRe: scala.util.matching.Regex =
    ("""(?is)\AALTER""" + ws + "TXLOG" + ws + dir + ws +
      """SET\s+TBLPROPERTIES\s*\((?<props>[^)]*)\)\z""").r
  val unsetPropsRe: scala.util.matching.Regex =
    ("""(?is)\AALTER""" + ws + "TXLOG" + ws + dir + ws +
      """UNSET\s+TBLPROPERTIES\s*\((?<keys>[^)]*)\)\z""").r
  val showPropsRe: scala.util.matching.Regex =
    ("""(?is)\ASHOW\s+TBLPROPERTIES""" + ws + dir +
      """(?:\s*\(\s*'(?<key>(?:[^']|'')+)'\s*\))?\z""").r
  val descExtRe: scala.util.matching.Regex =
    ("""(?is)\ADESCRIBE(?:\s+TABLE)?\s+EXTENDED""" + ws + dir +
      """\z""").r

  // Delta's COPY INTO: idempotent batch file ingest ([[TxLog.copyInto]])
  val copyIntoRe: scala.util.matching.Regex =
    ("""(?is)\ACOPY\s+INTO""" + ws + dir + ws +
      """FROM\s+'(?<src>(?:[^']|'')+)'""" + ws +
      """FILEFORMAT\s*=\s*(?<fmt>PARQUET|CSV|JSON)""" +
      """(?:\s+PATTERN\s*=\s*'(?<pat>(?:[^']|'')+)')?""" +
      """(?:\s+FORMAT_OPTIONS\s*\((?<fopts>[^)]*)\))?""" +
      """(?<force>\s+FORCE)?\z""").r

  private val kvOptRe =
    """'((?:[^']|'')+)'\s*=\s*'((?:[^']|'')*)'""".r

  /** FORMAT_OPTIONS body: `'k' = 'v'[, …]` (quotes with '' escaping). */
  def parseKvOptions(body: String): Map[String, String] =
    kvOptRe.findAllMatchIn(body)
      .map(m => unq(m.group(1)) -> unq(m.group(2))).toMap

  private val keyListRe = """'((?:[^']|'')+)'""".r

  /** UNSET TBLPROPERTIES body: `'k'[, …]` (quotes with '' escaping). */
  def parseKeyList(body: String): Seq[String] =
    keyListRe.findAllMatchIn(body).map(m => unq(m.group(1))).toSeq

  /** First tokens Spark's grammar has NO statement for — a match here
    * with a failed full parse is a graft grammar error, never a
    * delegation (DESCRIBE and CREATE stay delegating: Spark owns
    * those keywords). */
  val ownedToken: scala.util.matching.Regex =
    """(?is)\A(OPTIMIZE|VACUUM|RESTORE|CONVERT|COPY|ALTER\s+TXLOG)\b""".r

  def grammarFor(tok: String): String =
    tok.trim.split("\\s+").head.toUpperCase match {
      case "OPTIMIZE" => "expected: OPTIMIZE 'dir'|t [WHERE <pred>] " +
        "[TARGET <n> FILES] [ZORDER BY (c1, …, cN)] [FLATTEN]"
      case "VACUUM" => "expected: VACUUM 'dir'|t " +
        "[RETAIN <n> VERSIONS] [DRY RUN]"
      case "RESTORE" => "expected: RESTORE 'dir'|t [TO] " +
        "VERSION|TIMESTAMP AS OF <n>"
      case "CONVERT" => "expected: CONVERT TO TXLOG 'dir'|t " +
        "[STATS (c1, …, cN)]"
      case "COPY" => "expected: COPY INTO 'dir'|t FROM '<src>' " +
        "FILEFORMAT = PARQUET|CSV|JSON [PATTERN = '<glob>'] " +
        "[FORMAT_OPTIONS ('k' = 'v', …)] [FORCE]"
      case _ => "expected: ALTER TXLOG 'dir'|t ADD CONSTRAINT <name> " +
        "CHECK (<expr>) | DROP CONSTRAINT <name> | ALTER COLUMN <c> " +
        "SET DEFAULT (<expr>) | DROP DEFAULT | SET GENERATED AS " +
        "(<expr>) | DROP GENERATED | SET IDENTITY [START <s>] " +
        "[STEP <p>] [BY DEFAULT] | SET TBLPROPERTIES ('k' = 'v', …) " +
        "| UNSET TBLPROPERTIES ('k', …)"
    }

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
    pred: Option[String], target: Option[Int], zorder: Seq[String],
    flatten: Boolean = false)
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
    // SQL maintenance must never DEMOTE the table: on a partitioned
    // table, OPTIMIZE compacts within partition values (purify — the
    // planner's partitioned presentation survives); `FLATTEN` asks
    // for the flat single-layout rewrite explicitly (the
    // clone-enabling form). Unpartitioned tables are unaffected.
    val v = TxLog.compact(session, dir, n,
      zorderBy = zorder,
      where = pred.map(org.apache.spark.sql.functions.expr),
      purify = !flatten)
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
    else
      // single pass: report exactly what the walk deleted, never a
      // racy dry-run snapshot taken before the actual reap
      TxLog.vacuumAndList(session, dir, retain).map(Row(_, true))
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

/** `CONVERT TO TXLOG 'dir' [STATS (c1, …)]` — SQL access to
  * [[TxLog.convertInPlace]]: adopt an existing parquet dataset (flat
  * or hive-partitioned) into the log without rewriting a byte,
  * optionally recording min/max stats for the named columns. */
private[graft] case class GraftConvertCommand(dirRaw: String,
    quotedPath: Boolean, statsCols: Seq[String])
    extends LeafRunnableCommand {
  import GraftSqlParser._
  override val output: Seq[Attribute] = Seq(attr("version", LongType))
  override def run(session: SparkSession): Seq[Row] = {
    // the quoted form IS a path (the dataset being adopted usually
    // has no catalog identity yet); a bare name resolves normally
    val dir = if (quotedPath) dirRaw
      else TxLogSql.resolveDir(session, dirRaw)
    Seq(Row(TxLog.convertInPlace(session, dir, statsCols = statsCols)))
  }
}

/** `COPY INTO t FROM '<src>' FILEFORMAT = … [PATTERN = …]
  * [FORMAT_OPTIONS (…)] [FORCE]` — Delta's idempotent batch ingest
  * ([[TxLog.copyInto]]): one atomic commit carries the fresh files'
  * rows AND their per-file markers, so reruns skip what's loaded. */
private[graft] case class GraftCopyIntoCommand(dirRaw: String,
    src: String, format: String, pattern: Option[String],
    options: Map[String, String], force: Boolean)
    extends LeafRunnableCommand {
  import GraftSqlParser._
  override val output: Seq[Attribute] =
    Seq(attr("files_loaded", LongType), attr("files_skipped", LongType),
      attr("rows_inserted", LongType), attr("version", LongType))
  override def run(session: SparkSession): Seq[Row] = {
    val dir = TxLogSql.resolveDir(session, dirRaw)
    val r = TxLog.copyInto(session, dir, src, format, pattern,
      options, force)
    Seq(Row(r.filesLoaded, r.filesSkipped, r.rowsInserted, r.version))
  }
}

/** `CREATE TABLE tgt [SHALLOW|DEEP] CLONE src [VERSION|TIMESTAMP AS
  * OF n] [LOCATION 'dir']` — Delta's clone statement. Unqualified
  * CLONE is DEEP (self-contained copy, Delta's default); SHALLOW
  * registers the source files by absolute path (a KB-sized metadata
  * commit at any table size). A bare target name registers in the
  * session catalog and needs LOCATION; a quoted target path clones
  * in place without registration. */
private[graft] case class GraftCloneCommand(tgtName: Option[String],
    tgtDir: Option[String], deep: Boolean, srcRaw: String,
    byTimestamp: Boolean, travel: Option[Long], loc: Option[String])
    extends LeafRunnableCommand {
  import GraftSqlParser._
  override val output: Seq[Attribute] =
    Seq(attr("path", StringType), attr("version", LongType))
  override def run(session: SparkSession): Seq[Row] = {
    require(tgtDir.isEmpty || loc.isEmpty,
      "txlog: CLONE takes a quoted target path OR a LOCATION clause, " +
        "not both")
    val target = tgtDir.orElse(loc).getOrElse(
      throw new IllegalArgumentException(
        "txlog: CREATE TABLE <name> … CLONE needs LOCATION 'dir' " +
          "(a logged table's identity is its directory)"))
    val srcDir = TxLogSql.resolveDir(session, srcRaw)
    val asOf = travel.map(v =>
      if (byTimestamp) TxLog.versionAt(session, srcDir, v) else v)
    val ver = if (deep) TxLog.deepClone(session, srcDir, target, asOf)
      else TxLog.clone(session, srcDir, target, asOf)
    tgtName.foreach { n =>
      session.sql(s"CREATE TABLE $n USING txlog OPTIONS (path " +
        s"'${target.replace("'", "''")}')")
    }
    Seq(Row(target, ver))
  }
}

/** `INSERT INTO t REPLACE WHERE <pred> <query>` — Delta's atomic
  * partial overwrite as a statement: in ONE commit, rows matching
  * the predicate are replaced by the query's rows (each of which
  * must itself match the predicate — [[TxLog.replaceWhere]]'s
  * idempotence contract), and everything outside the slice survives
  * by path. Columns align POSITIONALLY and cast to the table types,
  * the INSERT convention. */
private[graft] case class GraftReplaceWhereCommand(dirRaw: String,
    predSql: String,
    query: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
    extends LeafRunnableCommand {
  import GraftSqlParser._
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override val output: Seq[Attribute] = Seq(attr("version", LongType))
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, expr}
    val dir = TxLogSql.resolveDir(session, dirRaw)
    val df = org.apache.spark.sql.graft.PlanBridge.fromPlan(session, query)
    val snap = TxLog.snapshot(session, dir)
    val schema = DataType.fromJson(snap.schemaJson)
      .asInstanceOf[StructType]
    require(df.columns.length == schema.fields.length,
      s"txlog: REPLACE WHERE query produces ${df.columns.length} " +
        s"column(s), table has ${schema.fields.length}")
    val aligned = df.toDF(schema.fieldNames.toIndexedSeq: _*)
      .select(schema.fields.map(f =>
        col(f.name).cast(f.dataType)).toIndexedSeq: _*)
    Seq(Row(TxLog.replaceWhere(session, dir, aligned, expr(predSql))))
  }
}

/** `ALTER TXLOG t SET TBLPROPERTIES ('k' = 'v', …)` / `UNSET
  * TBLPROPERTIES ('k', …)` — Delta's table-properties DDL, carried
  * in the LOG (one KB commit, full-map replay), never the session
  * catalog's stored copy. */
private[graft] case class GraftPropertiesCommand(dirRaw: String,
    set: Map[String, String], unset: Seq[String])
    extends LeafRunnableCommand {
  import GraftSqlParser._
  override val output: Seq[Attribute] = Seq(attr("version", LongType))
  override def run(session: SparkSession): Seq[Row] = {
    val dir = TxLogSql.resolveDir(session, dirRaw)
    val v = if (unset.nonEmpty) TxLog.unsetTblProperties(session, dir,
      unset)
    else TxLog.setTblProperties(session, dir, set)
    Seq(Row(v))
  }
}

/** `SHOW TBLPROPERTIES t ['key']` answering from the SNAPSHOT — the
  * log is the source of truth for a logged table's properties; the
  * session catalog's stored copy (what Spark's own command prints)
  * goes stale the moment another writer commits. A requested key
  * that is absent errors loudly, Spark's own contract. */
private[graft] case class GraftShowPropertiesCommand(dirRaw: String,
    key: Option[String]) extends LeafRunnableCommand {
  import GraftSqlParser._
  override val output: Seq[Attribute] =
    Seq(attr("key", StringType), attr("value", StringType))
  override def run(session: SparkSession): Seq[Row] = {
    val dir = TxLogSql.resolveDir(session, dirRaw)
    val props = TxLog.snapshot(session, dir).properties
    key match {
      case Some(k) =>
        require(props.contains(k),
          s"txlog: table $dirRaw has no property '$k'")
        Seq(Row(k, props(k)))
      case None =>
        props.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
    }
  }
}

/** `DESCRIBE EXTENDED t` for logged tables, answering from the
  * SNAPSHOT: schema (with partition/identity/generated/default
  * annotations), then the `# Detailed Table Information` section —
  * location, format, log version, file/row/byte counts, properties,
  * constraints, column mapping and reader generation. Spark's own
  * DESCRIBE consults the catalog's stored copy, which knows nothing
  * of commits made since registration (or by other sessions). */
private[graft] case class GraftDescribeExtendedCommand(dirRaw: String)
    extends LeafRunnableCommand {
  import GraftSqlParser._
  override val output: Seq[Attribute] =
    Seq(attr("col_name", StringType), attr("data_type", StringType),
      attr("comment", StringType))
  override def run(session: SparkSession): Seq[Row] = {
    val dir = TxLogSql.resolveDir(session, dirRaw)
    val snap = TxLog.snapshot(session, dir)
    val schema = DataType.fromJson(snap.schemaJson)
      .asInstanceOf[StructType]
    def note(n: String): String = {
      val tags = Seq(
        if (snap.partitionCols.contains(n)) Some("partition") else None,
        snap.identity.get(n).map(s =>
          if (s.always) "identity (always)" else "identity (by default)"),
        snap.generated.get(n).map(e => s"generated as ($e)"),
        snap.defaults.get(n).map(e => s"default $e"),
        snap.mapping.get(n).map(p => s"physical '$p'")).flatten
      if (tags.isEmpty) null else tags.mkString(", ")
    }
    val cols = schema.fields.toSeq.map(f =>
      Row(f.name, f.dataType.catalogString, note(f.name)))
    val files = snap.files
    val detail = Seq(
      Row("", "", null),
      Row("# Detailed Table Information", "", null),
      Row("Location", dir, null),
      Row("Provider", "txlog", null),
      Row("Log Version", snap.version.toString, null),
      Row("Num Files", files.size.toString, null),
      Row("Num Rows", files.map(f => f.rows - f.dvRows).sum.toString,
        null),
      Row("Size In Bytes", files.flatMap(_.bytes).sum.toString, null),
      Row("Partition Columns",
        if (snap.partitionCols.isEmpty) "(none)"
        else snap.partitionCols.mkString(", "), null),
      Row("Min Reader Generation", snap.minReader.toString, null),
      Row("Column Mapping",
        if (snap.mapping.isEmpty) "none" else "name", null)) ++
      snap.properties.toSeq.sortBy(_._1).map { case (k, v) =>
        Row(s"Property $k", v, null) } ++
      snap.constraints.toSeq.sortBy(_._1).map { case (n, e) =>
        Row(s"Constraint $n", s"CHECK ($e)", null) }
    cols ++ detail
  }
}
