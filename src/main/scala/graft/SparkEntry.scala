package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, Core, CurationQueries, DedupQueries, EtlQueries, QualityQueries, SamplingQueries, SimilarityQueries, TextQueries, TrainingQueries}

/** Driver contract — see /root/repo/SURVEY.md §2 + §7. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Core.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Core.queries ++ QualityQueries.queries ++ EtlQueries.queries ++
      DedupQueries.queries ++ TextQueries.queries ++
      SamplingQueries.queries ++ CurationQueries.queries ++
      SimilarityQueries.queries ++ AnalyticsQueries.queries ++
      TrainingQueries.queries ++ graft.queries.TxQueries.queries ++
      graft.multimodal.MediaQueries.queries ++
      graft.sources.Json.queries ++ graft.operators.AsOf.queries ++
      graft.queries.RangeQueries.queries ++
      Map(
      // #27 lineage edge list (rows-only): plan-derived column lineage of
      // the bronze-cleanse pipeline — the Catalyst plan IS the lineage.
      "lineage_edges" -> ((s: SparkSession, dir: String) =>
        graft.lineage.PlanLineage.edges(s, EtlQueries.etlBronzeCleanse(s, dir))))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    Core.oracleSql ++ QualityQueries.oracleSql ++ EtlQueries.oracleSql ++
      DedupQueries.oracleSql ++ TextQueries.oracleSql ++
      SamplingQueries.oracleSql ++ CurationQueries.oracleSql ++
      SimilarityQueries.oracleSql ++ AnalyticsQueries.oracleSql ++
      TrainingQueries.oracleSql ++ graft.queries.TxQueries.oracleSql ++
      graft.multimodal.MediaQueries.oracleSql ++
      graft.sources.Json.oracleSql ++ graft.operators.AsOf.oracleSql ++
      graft.queries.RangeQueries.oracleSql
}
