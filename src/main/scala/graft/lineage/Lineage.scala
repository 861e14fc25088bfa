package graft.lineage

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Aggregate, Window => WindowPlan}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Lineage (SURVEY.md §2.4) — re-expression of the reference's
  * LineageTracker (/root/reference/src/lineage/lineage_tracker.py:218-560):
  * asset registry, transformation steps with column-level lineage,
  * pipeline runs, upstream/downstream graph traversal, audit export.
  *
  * Spark-first twist: the reference requires callers to hand-declare
  * column lineage (lineage_tracker.py:271-338). Here the Catalyst
  * analyzed plan IS the lineage — [[PlanLineage]] derives source files
  * and column-level dependencies from any DataFrame, so tracking is
  * automatic and can never drift from the actual computation.
  */
final case class ColumnLineage(
    outputColumn: String, sourceColumns: Set[String])

final case class Asset(
    assetId: String, name: String, zone: String, format: String,
    location: String)

final case class TransformationStep(
    stepId: String, name: String, transformationType: String,
    inputAssets: Seq[String], outputAssets: Seq[String],
    columnLineage: Seq[ColumnLineage])

final case class PipelineRun(
    runId: String, pipelineName: String, stepIds: Seq[String],
    status: String)

/** Derive lineage from a DataFrame's analyzed Catalyst plan. */
object PlanLineage {

  /** Root paths of every file-based relation feeding the plan —
    * INCLUDING relations that appear only inside subquery expressions
    * (EXISTS/IN/scalar subqueries live in expressions, not plan
    * children, so a plain collect misses them; found by the q20
    * SQL-surface lineage test, round 8). */
  def sourcePaths(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collectWithSubqueries {
      case r: LogicalRelation =>
        r.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten.distinct

  /** Column-level lineage: output column name → set of "path#column"
    * source labels, computed by walking attribute references bottom-up
    * through Project/Aggregate/Window nodes. */
  def columnLineage(df: DataFrame): Seq[ColumnLineage] = {
    val plan = df.queryExecution.analyzed

    def walk(p: LogicalPlan): Map[ExprId, Set[String]] = {
      val fromChildren: Map[ExprId, Set[String]] =
        p.children.map(walk).foldLeft(Map.empty[ExprId, Set[String]])(_ ++ _)
      p match {
        case r: LogicalRelation =>
          val roots = r.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString).mkString(",")
            case _ => "relation"
          }
          r.output.map(a => a.exprId -> Set(s"$roots#${a.name}")).toMap
        case _ =>
          val named: Seq[NamedExpression] = p match {
            case pr: Project => pr.projectList
            case ag: Aggregate => ag.aggregateExpressions
            case w: WindowPlan => w.windowExpressions
            case _ => Seq.empty
          }
          val derived = named.map { ne =>
            val srcs = ne.references.toSeq
              .flatMap(a => fromChildren.getOrElse(a.exprId, Set.empty))
              .toSet
            ne.exprId -> (if (srcs.isEmpty)
              fromChildren.getOrElse(ne.exprId, Set.empty) else srcs)
          }.toMap
          fromChildren ++ derived
      }
    }

    val resolved = walk(plan)
    plan.output.map { a: Attribute =>
      ColumnLineage(a.name, resolved.getOrElse(a.exprId, Set.empty))
    }
  }

  /** Lineage edge list as a DataFrame (SURVEY #27): one row per
    * (output_column, source) dependency edge. */
  def edges(spark: SparkSession, df: DataFrame): DataFrame = {
    val rows = for {
      cl <- columnLineage(df)
      src <- cl.sourceColumns.toSeq.sorted
      Array(path, column) = src.split("#", 2)
    } yield Row(cl.outputColumn, path, column)
    val schema = StructType(Seq(
      StructField("output_column", StringType),
      StructField("source_path", StringType),
      StructField("source_column", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }
}

/** Asset/transformation registry with graph traversal —
  * lineage_tracker.py:218-560. Registry state is driver-side metadata
  * (small by construction: assets, not rows); traversal is BFS with a
  * depth cap like the reference's max_lineage_depth. */
class LineageTracker(maxDepth: Int = 10) {
  private val assets = mutable.LinkedHashMap.empty[String, Asset]
  private val steps = mutable.LinkedHashMap.empty[String, TransformationStep]
  private val runs = mutable.LinkedHashMap.empty[String, PipelineRun]
  // edge maps: downstream(a) = assets directly derived from a
  private val downstream = mutable.Map.empty[String, mutable.Set[String]]
  private val upstream = mutable.Map.empty[String, mutable.Set[String]]

  def registerAsset(name: String, zone: String, format: String = "parquet",
      location: String = ""): Asset = {
    val id = s"asset_${zone}_$name"
    val a = Asset(id, name, zone, format, location)
    assets(id) = a
    a
  }

  def getAsset(assetId: String): Option[Asset] = assets.get(assetId)

  /** Record a transformation; column lineage may be auto-derived via
    * [[PlanLineage.columnLineage]]. */
  def recordTransformation(
      name: String,
      transformationType: String,
      inputAssets: Seq[String],
      outputAssets: Seq[String],
      columnLineage: Seq[ColumnLineage] = Seq.empty): TransformationStep = {
    val id = s"step_${steps.size}_$name"
    val st = TransformationStep(id, name, transformationType, inputAssets,
      outputAssets, columnLineage)
    steps(id) = st
    for (i <- inputAssets; o <- outputAssets) {
      downstream.getOrElseUpdate(i, mutable.Set.empty) += o
      upstream.getOrElseUpdate(o, mutable.Set.empty) += i
    }
    st
  }

  /** Record a DataFrame-producing step with plan-derived lineage. */
  def recordDataFrame(name: String, transformationType: String,
      df: DataFrame, outputAsset: String): TransformationStep = {
    val inputs = PlanLineage.sourcePaths(df).map { p =>
      val a = registerAsset(p.split('/').last.stripSuffix(".parquet"),
        zone = "source", location = p)
      a.assetId
    }
    recordTransformation(name, transformationType, inputs, Seq(outputAsset),
      PlanLineage.columnLineage(df))
  }

  def startPipelineRun(pipelineName: String): String = {
    val id = s"run_${runs.size}_$pipelineName"
    runs(id) = PipelineRun(id, pipelineName, Seq.empty, "running")
    id
  }

  def completePipelineRun(runId: String, stepIds: Seq[String],
      status: String = "completed"): Unit =
    runs.get(runId).foreach(r =>
      runs(runId) = r.copy(stepIds = stepIds, status = status))

  private def traverse(start: String,
      edgesOf: String => Set[String]): Seq[(String, Int)] = {
    val seen = mutable.LinkedHashMap.empty[String, Int]
    var frontier = Set(start)
    var depth = 0
    while (frontier.nonEmpty && depth < maxDepth) {
      depth += 1
      frontier = frontier.flatMap(edgesOf)
        .filterNot(a => seen.contains(a) || a == start)
      frontier.foreach(a => seen(a) = depth)
    }
    seen.toSeq
  }

  /** All transitive producers of an asset (impact: what it depends on). */
  def getUpstreamLineage(assetId: String): Seq[(String, Int)] =
    traverse(assetId,
      a => upstream.getOrElse(a, mutable.Set.empty).toSet)

  /** All transitive consumers (impact analysis: what a change breaks). */
  def getDownstreamImpact(assetId: String): Seq[(String, Int)] =
    traverse(assetId,
      a => downstream.getOrElse(a, mutable.Set.empty).toSet)

  /** Per-asset lineage report for regulatory documentation —
    * lineage_tracker.py:451-497: the asset, its transitive upstream and
    * downstream assets, and the set of zones traversed. */
  def generateLineageReport(assetId: String): Map[String, Any] = {
    val asset = assets.getOrElse(assetId,
      throw new IllegalArgumentException(s"Asset not found: $assetId"))
    val up = getUpstreamLineage(assetId).map(_._1)
    val down = getDownstreamImpact(assetId).map(_._1)
    Map(
      "asset" -> asset,
      "upstream_lineage" -> Map(
        "count" -> up.size,
        "assets" -> up.flatMap(assets.get)),
      "downstream_impact" -> Map(
        "count" -> down.size,
        "assets" -> down.flatMap(assets.get)),
      "data_zones_traversed" ->
        (up ++ down :+ assetId).flatMap(assets.get).map(_.zone).distinct)
  }

  /** Audit export — lineage_tracker.py:499-536. */
  def exportForAudit(): Map[String, Any] = Map(
    "assets" -> assets.values.toSeq,
    "transformations" -> steps.values.toSeq,
    "pipeline_runs" -> runs.values.toSeq,
    "asset_count" -> assets.size,
    "transformation_count" -> steps.size)

  /** The registry as queryable DataFrames — (assets, edges): edges is
    * one row per (input asset, output asset, step), so impact analysis
    * becomes SQL/DataFrame joins instead of driver-side traversal when
    * the lineage graph itself needs reporting at scale. */
  def toDataFrames(spark: SparkSession): (DataFrame, DataFrame) = {
    import spark.implicits._
    val assetsDf = assets.values.toSeq
      .map(a => (a.assetId, a.name, a.zone, a.format, a.location))
      .toDF("asset_id", "name", "zone", "format", "location")
    val edgesDf = steps.values.toSeq
      .flatMap(st => for (i <- st.inputAssets; o <- st.outputAssets)
        yield (i, o, st.stepId, st.transformationType))
      .toDF("input_asset", "output_asset", "step_id", "transformation_type")
    (assetsDf, edgesDf)
  }
}
