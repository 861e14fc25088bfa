package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias,
  AttributeReference, BoundReference, Cast, Expression, GetStructField,
  Literal, Not, Predicate, And => CAnd}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project,
  Filter => LFilter}
import org.apache.spark.sql.execution.datasources.{DataSourceStrategy,
  FileFormat, FileIndex, HadoopFsRelation, LogicalRelation,
  PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.TxLog.{TxFile, TxSnapshot}

/** Log-backed [[FileIndex]] — the planner-visible face of a txlog
  * snapshot (the Delta `TahoeLogFileIndex` shape, re-derived for this
  * log format; the reference has no storage layer at all — its
  * "tables" are driver-local `list[dict]`s, e.g. etl_manager.py:37).
  *
  * Why this exists: the batch "txlog" DataSource is a DSv2 table
  * whose scan falls back to a [[org.apache.spark.sql.connector.read
  * .V1Scan]], and Spark's `V1ScanWrapper` does not forward
  * `SupportsReportStatistics` — so every logged table used to present
  * `defaultSizeInBytes` (Long.MaxValue) to the join planner: a 10 MB
  * logged dimension joined to a large fact never planned a static
  * broadcast, and never triggered dynamic partition pruning. AQE
  * converts SMJ→BHJ at runtime, but only after the probe side's
  * shuffle map write is already paid — at 100 TB that is a full
  * extra pass over the fact.
  *
  * Presenting the snapshot as a `FileIndex` inside a
  * `HadoopFsRelation` fixes the whole class at once, because this is
  * the path the engine optimizes best:
  *
  *  - `sizeInBytes` is the EXACT post-replay byte sum from the log
  *    (per-file `bytes` is commit metadata) → static broadcast
  *    planning with no filesystem listing, at any file count;
  *  - `listFiles` applies the SAME stats-in-log data skipping as
  *    [[TxLog.readPrunedAll]] to the scan's pushed data filters —
  *    file-level pruning now rides EVERY filtered read, Scala or SQL;
  *  - partitioned registrations present a real `PartitionSpec`
  *    recovered from per-file stats (a partition value is constant
  *    per file, so min = max = the value — convertInPlace records
  *    exactly this), which turns on native partition pruning AND
  *    dynamic partition pruning (`FileSourceScanExec` evaluates DPP
  *    subquery results against these partition values at runtime —
  *    runtime file skipping from commit metadata alone);
  *  - the scan itself is Spark's vectorized parquet reader fused
  *    into whole-stage codegen (the V1 fallback's `RowDataSourceScan`
  *    boundary is gone).
  *
  * Eligibility (checked by [[TxFileIndex.build]]): every live file
  * must be free of deletion vectors and carry recorded `bytes`;
  * a partitioned table additionally needs every partition value
  * exactly recoverable from stats (min = max with zero nulls, or the
  * all-null / empty-file degenerate). Ineligible snapshots keep the
  * V1 read path — merge-on-read vectors genuinely need the
  * anti-join subtraction plan. Column mapping is fine: the index
  * serves PHYSICAL parquet names and [[TxFileRelation]] projects
  * back to logical ones.
  *
  * Immutability: the index answers for ONE snapshot (dir, version,
  * file list) — concurrent commits cannot tear a scan, and equality
  * is by that identity so plan caching works across identical reads.
  */
private[graft] final class TxFileIndex(
    spark: SparkSession,
    val dir: String,
    snap: TxSnapshot,
    partitions: Seq[(InternalRow, Seq[TxFile])],
    override val partitionSchema: StructType) extends FileIndex {

  private val hadoopConf = spark.sparkContext.hadoopConfiguration

  private def qualify(rel: String): Path = {
    val p = new Path(TxLog.resolveData(dir, rel))
    p.getFileSystem(hadoopConf).makeQualified(p)
  }

  private def status(f: TxFile): FileStatus =
    new FileStatus(f.bytes.getOrElse(0L), false, 1, 128L * 1024 * 1024,
      0L, qualify(f.path))

  override def rootPaths: Seq[Path] = {
    val p = new Path(dir)
    Seq(p.getFileSystem(hadoopConf).makeQualified(p))
  }

  /** Data-filter file skipping: pushed filters arrive as Catalyst
    * expressions over PHYSICAL column names; translate to the v1
    * algebra, take interval hulls with the SAME machinery as the V1
    * scan ([[TxLogBatch.intervals]]), map names back to logical (the
    * pruner re-applies the mapping), and prune per partition group.
    * Untranslatable filters simply don't prune (conservative). */
  private def prune(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[(InternalRow, Seq[TxFile])] = {
    // only conjuncts an interpreted predicate can actually evaluate
    // over a partition-values row: subquery expressions (IN (SELECT
    // …)) and other non-deterministic/unevaluable shapes prune
    // nothing here (conservative — the engine applies them row-
    // exactly; DPP delivers the subquery-driven file skipping)
    val evaluable = partitionFilters.filter(e => e.deterministic &&
      e.find(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions
        .PlanExpression[_]]).isEmpty)
    val kept =
      if (evaluable.isEmpty || partitionSchema.isEmpty) partitions
      else {
        // the WHOLE bind+eval sits inside the Try: an unexpected
        // attribute in a partition filter (the require below) must
        // degrade to "no pruning" like any other unevaluable shape,
        // not fail the query — pruning here is an optimization, the
        // engine re-applies every filter row-exactly
        scala.util.Try {
          val bound = evaluable.reduce(CAnd(_, _)).transform {
            case a: AttributeReference =>
              val i = partitionSchema.fieldNames.indexWhere(
                _.equalsIgnoreCase(a.name))
              require(i >= 0,
                s"txlog file index: unknown partition column ${a.name}")
              BoundReference(i, partitionSchema.fields(i).dataType,
                nullable = true)
          }
          val pred = Predicate.createInterpreted(bound)
          pred.initialize(0)
          partitions.filter(p => pred.eval(p._1))
        }.getOrElse(partitions) // unevaluable → keep all (sound)
      }
    val physToLogical =
      snap.mapping.map(_.swap).withDefault(identity[String])
    val v1 = dataFilters.flatMap(e =>
      org.apache.spark.sql.graft.PlanBridge.translateFilter(e))
      .filter(TxLogBatch.prunable(_))
    val preds = TxLogBatch.intervals(v1)
      .map { case (c, lo, hi) => (physToLogical(c), lo, hi) }
    val nulls = TxLogBatch.nullPreds(v1)
      .map { case (c, w) => (physToLogical(c), w) }
    if (preds.isEmpty && nulls.isEmpty) kept
    else kept.map { case (values, files) =>
      (values, TxLog.prunedSnapshotFiles(spark,
        snap.copy(files = files), preds, nulls))
    }.filter(_._2.nonEmpty)
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val pruned = prune(partitionFilters, dataFilters)
    TxLogBatch.lastScan.set(pruned.flatMap(_._2.map(_.path)))
    pruned.map { case (values, files) =>
      PartitionDirectory(values, files.map(status).toArray)
    }
  }

  /** PLAN-TIME restriction (the PrepareDeltaScan shape): the same
    * pruning [[listFiles]] applies at execution, hoisted into a new
    * index so the LOGICAL stats the join planner reads reflect the
    * filter — a narrow slice of a big logged table can then plan a
    * static broadcast. Conjuncts split by reference: partition-only
    * ones prune partitions, data-only ones prune by log stats; mixed
    * or untranslatable conjuncts prune nothing (conservative, the
    * engine re-applies every filter row-exactly). Returns None when
    * nothing shrank — the caller keeps the original plan, which also
    * makes the optimizer-rule fixpoint trivially stable. */
  def restrict(conjuncts: Seq[Expression]): Option[TxFileIndex] = {
    val deterministic = conjuncts.filter(_.deterministic)
    val pNames = partitionSchema.fieldNames.map(_.toLowerCase).toSet
    val (pf, rest) = deterministic.partition(c =>
      c.references.nonEmpty &&
        c.references.forall(a => pNames.contains(a.name.toLowerCase)))
    val kept = prune(pf, rest)
    val keptFiles = kept.flatMap(_._2)
    if (keptFiles.map(_.path).toSet == snap.files.map(_.path).toSet)
      None
    else Some(new TxFileIndex(spark, dir,
      snap.copy(files = keptFiles.sortBy(_.path)), kept,
      partitionSchema))
  }

  override def inputFiles: Array[String] =
    snap.files.map(f => qualify(f.path).toString).toArray

  override def refresh(): Unit = () // a snapshot is immutable

  override def sizeInBytes: Long =
    // dv-scaled (the shared formula): files may carry standing
    // deletion vectors on this presentation now — the planner must
    // see LIVE bytes, or a half-deleted dim would refuse to broadcast
    TxLogStats.liveBytes(snap).getOrElse(snap.files.flatMap(_.bytes).sum)

  /** The (possibly restricted) snapshot's CBO statistics, keyed by
    * the physical names this relation serves — what the read rule
    * attaches and [[GraftTxLogStatsRule]] refreshes on restriction. */
  private[graft] def catalogStats
      : Option[org.apache.spark.sql.catalyst.catalog.CatalogStatistics] =
    TxLogStats.catalogStats(snap, physNames = true)

  /** Identity for plan/cache equality: same table dir, same log
    * version, same (possibly restricted) live-file set. */
  private val identityKey: (String, Long, Seq[String]) =
    (dir, snap.version, snap.files.map(_.path))

  override def equals(other: Any): Boolean = other match {
    case o: TxFileIndex => identityKey == o.identityKey
    case _ => false
  }

  override def hashCode(): Int = identityKey.hashCode()
}

private[graft] object TxFileIndex {

  /** Recover a partition value from its canonical cast-to-string
    * stat form (exact for every stats dtype: the forms round-trip
    * through `CAST(s AS t)`). Returns the INTERNAL representation
    * (what a `PartitionSpec` row holds), or None on a parse failure
    * (→ the table falls back to the V1 path). */
  private def castVal(s: String, dt: DataType, tz: String): Option[Any] = {
    val v = Cast(Literal(UTF8String.fromString(s), StringType), dt,
      Option(tz), ansiEnabled = false).eval()
    if (v == null) None else Some(v)
  }

  /** The file-index presentation of a snapshot, or None when the
    * snapshot needs the V1 plan (missing byte sizes, partition values
    * not exactly recoverable — or deletion vectors unless the caller
    * passes `allowDv = true`, which ONLY [[TxFileRelation.planFor]]
    * may do because it is the one that applies the vectors as a scan
    * filter; any other caller reading through a bare dv-bearing index
    * would silently resurrect deleted rows). */
  def build(spark: SparkSession, dir: String,
      snap: TxSnapshot, allowDv: Boolean = false): Option[TxFileIndex] = {
    if (snap.files.isEmpty) return None
    if (snap.files.exists(f =>
        (f.dv.isDefined && !allowDv) || f.bytes.isEmpty))
      return None
    val schema =
      DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    if (snap.partitionCols.isEmpty)
      return Some(new TxFileIndex(spark, dir, snap,
        Seq((InternalRow.empty, snap.files)), new StructType()))
    // partitioned: every live file must be single-valued on every
    // partition column, with the value recoverable from stats.
    // Registration-time (hive-layout) files are by construction;
    // post-registration flat appends qualify only when the writer
    // kept partition values file-pure.
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    // MAPPING-AWARE resolution: partitionCols holds registration-time
    // PHYSICAL names (never renamed). Resolve each entry
    // PHYSICAL-FIRST — the logical column whose parquet name IS the
    // entry — and only then as a current logical name. Order matters:
    // with no renames the two agree, but a rename sequence that
    // reuses a former partition column's name (partition col b→c,
    // then a→b) would bind the logical-first lookup to the WRONG
    // column (the renamed a, not the registered b). Either way the
    // served name stays PHYSICAL (= the nested `key=value/` dirs and
    // the per-file stat keys). Unresolvable → V1 fallback.
    val pFields = snap.partitionCols.map { c =>
      val f = schema.fields.find(fl => snap.phys(fl.name) == c)
        .orElse(schema.fields.find(_.name == c))
        .getOrElse(return None)
      (snap.phys(f.name), f)
    }
    val pSchema = StructType(pFields.map { case (pc, f) =>
      f.copy(name = pc) })
    val tuples: Seq[Option[Seq[Any]]] = snap.files.map { f =>
      val vs = pFields.map { case (pc, fl) =>
        f.stats.get(pc) match {
          case _ if f.rows == 0L => Some(null)
          case Some(st) if st.nulls.contains(f.rows) => Some(null)
          case Some(st) if st.min.isDefined && st.min == st.max &&
              st.nulls.contains(0L) =>
            castVal(st.min.get, fl.dataType, tz)
          case _ => None
        }
      }
      if (vs.exists(_.isEmpty)) None else Some(vs.map(_.get))
    }
    if (tuples.exists(_.isEmpty)) return None
    val grouped = snap.files.zip(tuples.map(_.get))
      .groupBy(_._2)
      .toSeq
      .sortBy(_._1.map(String.valueOf).mkString("\u0000"))
      .map { case (vals, fs) =>
        (InternalRow.fromSeq(vals), fs.map(_._1)) }
    Some(new TxFileIndex(spark, dir, snap, grouped, pSchema))
  }
}

/** Assembles the LOGICAL read plan over a [[TxFileIndex]]:
  * `Project(logical names, LogicalRelation(HadoopFsRelation(index)))`.
  * The relation serves PHYSICAL parquet names (data columns first,
  * partition columns appended — Spark's `HadoopFsRelation` contract);
  * the projection restores logical names and declared column order,
  * so callers see exactly the table schema. */
private[graft] object TxFileRelation {

  /** Session kill-switch: `spark.graft.fileIndexRead=false` restores
    * the V1 read plan everywhere (escape hatch, default on). */
  def enabled(spark: SparkSession): Boolean =
    spark.conf.get("spark.graft.fileIndexRead", "true").toBoolean

  def planFor(spark: SparkSession, dir: String,
      snap: TxSnapshot): Option[LogicalPlan] = {
    if (!enabled(spark)) return None
    // DV-bearing snapshots stay on the index when the session allows
    // it and the vectors fit the broadcast bound (decided from commit
    // metadata — dvRows sums — before any vector is read); otherwise
    // the caller falls back to the split-union / V1 read
    val dvFiles = snap.files.filter(_.dv.isDefined)
    if (dvFiles.nonEmpty && (!DvIndex.enabled(spark) ||
        dvFiles.map(_.dvRows).sum > DvIndex.maxRows(spark)))
      return None
    TxFileIndex.build(spark, dir, snap,
      allowDv = dvFiles.nonEmpty).flatMap { idx =>
      val schema =
        DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
      val phys = TxLog.physSchema(schema, snap.mapping)
      // nullability RELAXES at the relation (what DataSource's own
      // resolveRelation does via asNullable): an evolved column may
      // be absent from pre-evolution files, where the reader fills
      // NULL — a non-nullable read schema would make the vectorized
      // reader refuse the file instead
      def relaxed(s: StructType): StructType =
        StructType(s.fields.map(_.copy(nullable = true)))
      val dataFields = phys.fields.filterNot(f =>
        idx.partitionSchema.fieldNames.contains(f.name))
      val rel = HadoopFsRelation(idx, relaxed(idx.partitionSchema),
        relaxed(StructType(dataFields)), None, new ParquetFileFormat,
        Map.empty[String, String])(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
      val lr = LogicalRelation(rel)
      // deletion vectors apply as a SCAN-LEVEL row filter over the
      // parquet metadata columns — the one vectorized FileScan keeps
      // every file (static + dynamic partition pruning included), and
      // the filter fuses into its whole-stage-codegen span. See
      // [[DvIndex]]. A (pathological) physical column named
      // `_metadata` shadows the metadata struct → no filter hook →
      // refuse the presentation rather than resurrect deleted rows.
      val scanned: Option[LogicalPlan] =
        if (dvFiles.isEmpty) Some(lr)
        else {
          val lrMeta = lr.withMetadataColumns()
            .asInstanceOf[LogicalRelation]
          lrMeta.output.find(_.name == FileFormat.METADATA_NAME)
            .collect {
              case m if m.dataType.isInstanceOf[StructType] &&
                  m.dataType.asInstanceOf[StructType].fieldNames
                    .contains("file_path") &&
                  m.dataType.asInstanceOf[StructType].fieldNames
                    .contains("row_index") =>
                val st = m.dataType.asInstanceOf[StructType]
                def fld(n: String) =
                  GetStructField(m, st.fieldIndex(n), Some(n))
                LFilter(Not(DvDeleted(fld("file_path"),
                  fld("row_index"),
                  DvIndex.broadcastFor(spark, dir, snap, dvFiles))),
                  lrMeta)
            }
        }
      scanned.map { src =>
        val byPhys = lr.output.map(a => a.name -> a).toMap
        val proj: Seq[org.apache.spark.sql.catalyst.expressions
          .NamedExpression] = schema.fields.toSeq.map { fl =>
          val a = byPhys(snap.phys(fl.name))
          if (a.name == fl.name) a else Alias(a, fl.name)()
        }
        // the dv form always projects — `_metadata` must not leak
        // into the table's user-facing schema
        if (dvFiles.isEmpty && proj == lr.output) lr
        else Project(proj, src)
      }
    }
  }
}
