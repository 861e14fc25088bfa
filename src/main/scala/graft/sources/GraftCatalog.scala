package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Column,
  DelegatingCatalogExtension, Identifier, Table, TableCatalogCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Session-catalog extension adding SQL TIME TRAVEL to registered
  * txlog tables — `SELECT … FROM t VERSION AS OF 3` /
  * `TIMESTAMP AS OF '…'` (the Delta syntax; DeltaCatalog is the same
  * `DelegatingCatalogExtension` shape). Install with
  * `spark.sql.catalog.spark_catalog=graft.sources.GraftCatalog`.
  *
  * Only the two time-travel `loadTable` overloads change behavior,
  * and only for tables whose provider is `txlog`: the pinned version
  * resolves through the SAME core as the reader options
  * (`versionAsOf`/`timestampAsOf` — [[TxLogBatch.resolve]], the
  * timestamp through the in-commit-timestamp axis), and the returned
  * table is read-only by construction (history is immutable).
  * Everything else — including plain resolution of txlog and
  * non-txlog tables — delegates to the default session catalog
  * untouched, so installing the extension strictly widens the SQL
  * surface. */
class GraftCatalog extends DelegatingCatalogExtension {

  private def txlogDir(ident: Identifier): Option[String] =
    try PlanBridge.v1TxlogPath(super.loadTable(ident))
    catch { case _: Throwable => None }

  /** Plain resolution: a LOGGED txlog table loads as the v2 batch
    * table directly (schema from the log — the catalog's stored copy
    * may be stale or, after CTAS, would push resolution down Spark's
    * v1 relation path, which cannot host a bare TableProvider). An
    * UNLOGGED dir (creation in flight) and every other provider
    * delegate untouched. */
  /** Advertise column-spec columns as Spark DEFAULTs so `INSERT INTO
    * t (subset…)` analyzes: Spark's TableOutputResolver fills an
    * omitted column ONLY from `CURRENT_DEFAULT` schema metadata
    * (else it errors "cannot find data"). A declared DEFAULT column
    * carries its real expression (Spark fills the value itself, SQL
    * semantics intact); identity/generated columns carry NULL — the
    * writer recognizes the engine-filled all-NULL column and
    * generates/computes ([[TxLog]]'s applyIdentityCols /
    * applyGeneratedCols). Decoration is advertise-only: the LOG's
    * schema stays clean, and tables with no specs pass through
    * untouched. */
  private def withDefaultMeta(snap: TxLog.TxSnapshot,
      schema: StructType): StructType = {
    if (snap.defaults.isEmpty && snap.identity.isEmpty &&
      snap.generated.isEmpty) schema
    else StructType(schema.map { f =>
      val d =
        if (snap.defaults.contains(f.name)) Some(snap.defaults(f.name))
        else if (snap.identity.contains(f.name) ||
          snap.generated.contains(f.name)) Some("NULL")
        else None
      d.fold(f) { e =>
        // CURRENT_DEFAULT only — it is what INSERT analysis consults
        // for an omitted column. EXISTS_DEFAULT is deliberately NOT
        // set: it tells readers what to backfill into rows written
        // BEFORE the column had data, and this engine's contract is
        // NULL there (ALTER … SET DEFAULT must not rewrite history);
        // advertising the CURRENT expression would backfill old rows
        // with the new default in any consumer honoring it.
        val mb = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
          .putString("CURRENT_DEFAULT", e)
        // identity/generated columns advertise nullable so the NULL
        // fill survives analysis — the writer replaces it with
        // generated/computed values before any byte is staged
        f.copy(metadata = mb.build(),
          nullable = f.nullable || e == "NULL")
      }
    })
  }

  override def loadTable(ident: Identifier): Table = {
    val base = super.loadTable(ident)
    PlanBridge.v1TxlogPath(base) match {
      case Some(dir) if TxLog.isLogged(SparkSession.active, dir) =>
        val (d, v, schema, pinned, snap) = TxLogBatch.resolveWithSnap(
          SparkSession.active, Map("path" -> dir))
        new TxLogBatchTable(d, v,
          snap.fold(schema)(withDefaultMeta(_, schema)), pinned,
          v1Catalog = PlanBridge.v1CatalogTable(base),
          resolvedSnap = snap)
      case Some(dir) if !base.schema().isEmpty =>
        // declared (CTAS / CREATE with schema) but not yet written:
        // a WRITABLE creation placeholder lets the exec's first write
        // create the log; reads refuse until it exists
        new TxLogBatchTable(dir, -1L, base.schema(), pinned = false,
          writableCreate = true,
          v1Catalog = PlanBridge.v1CatalogTable(base))
      case _ => base
    }
  }

  /** Accepting inline column specs in CREATE TABLE requires declaring
    * the capabilities — Spark's analyzer refuses `GENERATED ALWAYS AS
    * (…)` / `… AS IDENTITY` / `DEFAULT …` column clauses otherwise.
    * The claim is session-wide, so [[createTable]] refuses
    * generated/identity declarations for NON-txlog providers loudly
    * (nothing would enforce them there); plain DEFAULTs keep Spark's
    * own session-catalog handling. */
  override def capabilities(): java.util.Set[TableCatalogCapability] = {
    val s = new java.util.HashSet[TableCatalogCapability](
      super.capabilities())
    s.add(TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)
    s.add(TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS)
    s.add(TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)
    s
  }

  /** SQL `CREATE TABLE … USING txlog PARTITIONED BY (…)` would store
    * partition columns the write path never consults — refuse loudly
    * instead of minting a silently-flat table (the same contract the
    * save path enforces; the registered-hive-layout create is
    * `df.write.partitionBy(...).format("txlog")`). */
  override def createTable(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val isTxlog = "txlog".equalsIgnoreCase(properties.get("provider"))
    require(partitions.isEmpty || !isTxlog,
      "txlog: PARTITIONED BY is not supported in CREATE TABLE — " +
        "create through df.write.partitionBy(...).format(\"txlog\") " +
        "(registered hive layout) or rely on statsCols pruning")
    val idCols = columns.filter(_.identityColumnSpec() != null)
    val genCols = columns.filter(_.generationExpression() != null)
    val defCols = columns.filter(_.defaultValue() != null)
    if (!isTxlog) {
      // the capability claim is ours, so the enforcement gap is ours
      // to close: no other provider in this session applies these
      require(idCols.isEmpty && genCols.isEmpty,
        "IDENTITY/GENERATED column declarations are supported for " +
          "USING txlog tables only")
      return super.createTable(ident, columns, partitions, properties)
    }
    if (idCols.isEmpty && genCols.isEmpty && defCols.isEmpty)
      return super.createTable(ident, columns, partitions, properties)
    idCols.foreach(c => require(c.dataType() == LongType,
      s"txlog: identity column '${c.name}' must be BIGINT, is " +
        c.dataType().simpleString))
    // validate BEFORE registering — a failure past super.createTable
    // would leave an orphan catalog entry whose later plain write
    // mints the table WITHOUT its declared specs
    val spark = SparkSession.active
    val writerDefined = (idCols ++ genCols).map(_.name).toSet
    val physSchema = StructType(columns.toSeq
      .filterNot(c => writerDefined.contains(c.name))
      .map(c => StructField(c.name, c.dataType, c.nullable)))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], physSchema)
    genCols.foreach { c =>
      val t = empty.select(org.apache.spark.sql.functions
        .expr(c.generationExpression())).schema.head.dataType
      require(t == c.dataType(),
        s"txlog: generated column '${c.name}' declares " +
          s"${c.dataType().simpleString} but the expression yields " +
          s"${t.simpleString} — cast inside the expression")
    }
    val created = super.createTable(ident, columns, partitions, properties)
    // inline specs need a live log to carry them: initialize version 0
    // now (empty table, declared order) with the same creation-time
    // maps the Scala API takes — and either commit it or unregister
    // the entry this statement just made
    try {
      // resolve the location through a fresh catalog load (the
      // create's return value needn't be a V1Table with storage)
      val dir = txlogDir(ident).getOrElse(
        throw new IllegalArgumentException(
          "txlog: CREATE TABLE with inline column specs needs a " +
            "resolvable table location"))
      TxLog.commitOverwrite(spark, dir, empty,
        identity = idCols.map { c =>
          val s0 = c.identityColumnSpec()
          c.name -> TxLog.IdentitySpec(s0.getStart, s0.getStep,
            always = !s0.isAllowExplicitInsert)
        }.toMap,
        generated = genCols.map(c =>
          c.name -> c.generationExpression()).toMap,
        defaults = defCols.map(c =>
          c.name -> c.defaultValue().getSql).toMap,
        columnOrder = Some(columns.map(_.name).toSeq))
    } catch {
      case e: Throwable =>
        try super.dropTable(ident) catch { case _: Throwable => () }
        throw e
    }
    created
  }

  /** Standard SQL schema DDL on txlog tables — `ALTER TABLE t ADD
    * COLUMN c TYPE` / `RENAME COLUMN a TO b` / `DROP COLUMN c` lower
    * to the metadata-only log commits ([[TxLog.addColumn]] /
    * [[TxLog.renameColumn]] / [[TxLog.dropColumn]] — column-mapping
    * renames/drops, KB-sized at any table size). The catalog's own
    * stored schema is NOT touched: the log is the source of truth
    * and [[loadTable]] always resolves from it. Unsupported change
    * shapes (nested fields, positions, type changes, NOT NULL,
    * comments) refuse loudly. Non-txlog tables delegate. */
  override def alterTable(ident: Identifier,
      changes: org.apache.spark.sql.connector.catalog.TableChange*)
      : Table =
    txlogDir(ident) match {
      case None => super.alterTable(ident, changes: _*)
      case Some(dir) =>
        import org.apache.spark.sql.connector.catalog.TableChange
        val spark = SparkSession.active
        changes.foreach {
          case a: TableChange.AddColumn =>
            require(a.fieldNames.length == 1 && a.position() == null,
              "txlog: ADD COLUMN supports top-level columns without " +
                "position clauses")
            require(a.isNullable,
              "txlog: an added column must be nullable — existing " +
                "files read it as NULL")
            require(a.defaultValue() == null,
              "txlog: declare defaults separately (ALTER TXLOG … " +
                "SET DEFAULT) — ADD COLUMN is a metadata-only widen")
            TxLog.addColumn(spark, dir, a.fieldNames.head,
              a.dataType().sql)
          case r: TableChange.RenameColumn =>
            require(r.fieldNames.length == 1,
              "txlog: RENAME COLUMN supports top-level columns")
            TxLog.renameColumn(spark, dir, r.fieldNames.head,
              r.newName)
          case d: TableChange.DeleteColumn =>
            require(d.fieldNames.length == 1,
              "txlog: DROP COLUMN supports top-level columns")
            TxLog.dropColumn(spark, dir, d.fieldNames.head)
          case other => throw new IllegalArgumentException(
            s"txlog: unsupported ALTER TABLE change $other — " +
              "constraints/defaults/identity/generated ride ALTER " +
              "TXLOG statements")
        }
        loadTable(ident)
    }

  override def loadTable(ident: Identifier, version: String): Table =
    txlogDir(ident) match {
      case Some(dir) =>
        val (d, v, schema, _, snap) = TxLogBatch.resolveWithSnap(
          SparkSession.active,
          Map("path" -> dir, "versionAsOf" -> version))
        new TxLogBatchTable(d, v, schema, pinned = true,
          resolvedSnap = snap)
      case None => super.loadTable(ident, version)
    }

  override def loadTable(ident: Identifier, timestamp: Long): Table =
    txlogDir(ident) match {
      case Some(dir) =>
        // the engine hands MICROseconds; the log's axis is millis
        val (d, v, schema, _, snap) = TxLogBatch.resolveWithSnap(
          SparkSession.active,
          Map("path" -> dir,
            "timestampAsOf" -> (timestamp / 1000L).toString))
        new TxLogBatchTable(d, v, schema, pinned = true,
          resolvedSnap = snap)
      case None => super.loadTable(ident, timestamp)
    }
}
