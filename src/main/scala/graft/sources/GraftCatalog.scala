package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Column,
  DelegatingCatalogExtension, Identifier, Table}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.graft.PlanBridge

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
  override def loadTable(ident: Identifier): Table = {
    val base = super.loadTable(ident)
    PlanBridge.v1TxlogPath(base) match {
      case Some(dir) if TxLog.isLogged(SparkSession.active, dir) =>
        val (d, v, schema, pinned) =
          TxLogBatch.resolve(SparkSession.active, Map("path" -> dir))
        new TxLogBatchTable(d, v, schema, pinned,
          v1Catalog = PlanBridge.v1CatalogTable(base))
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

  /** SQL `CREATE TABLE … USING txlog PARTITIONED BY (…)` would store
    * partition columns the write path never consults — refuse loudly
    * instead of minting a silently-flat table (the same contract the
    * save path enforces; the registered-hive-layout create is
    * `df.write.partitionBy(...).format("txlog")`). */
  override def createTable(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    require(partitions.isEmpty ||
      !"txlog".equalsIgnoreCase(properties.get("provider")),
      "txlog: PARTITIONED BY is not supported in CREATE TABLE — " +
        "create through df.write.partitionBy(...).format(\"txlog\") " +
        "(registered hive layout) or rely on statsCols pruning")
    super.createTable(ident, columns, partitions, properties)
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
        val (d, v, schema, _) = TxLogBatch.resolve(SparkSession.active,
          Map("path" -> dir, "versionAsOf" -> version))
        new TxLogBatchTable(d, v, schema, pinned = true)
      case None => super.loadTable(ident, version)
    }

  override def loadTable(ident: Identifier, timestamp: Long): Table =
    txlogDir(ident) match {
      case Some(dir) =>
        // the engine hands MICROseconds; the log's axis is millis
        val (d, v, schema, _) = TxLogBatch.resolve(SparkSession.active,
          Map("path" -> dir,
            "timestampAsOf" -> (timestamp / 1000L).toString))
        new TxLogBatchTable(d, v, schema, pinned = true)
      case None => super.loadTable(ident, timestamp)
    }
}
