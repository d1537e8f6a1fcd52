package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query groups live in graft.operators.* / graft.functions.*; each group
  * exposes `defs: Seq[QueryDef]` (Spark impl + optional DuckDB oracle).
  */
object SparkEntry {

  private def groups: Seq[QueryDef] =
    operators.Relational.defs ++
    operators.TpchAdapted.defs ++
    functions.TextAnalysis.defs ++
    functions.FunctionBatteries.defs ++
    operators.Dedup.defs ++
    operators.PipelineCompositions.defs ++
    operators.CorpusOps.defs ++
    operators.CurationOps.defs ++
    operators.AnnSearch.defs ++
    operators.EventOps.defs ++
    operators.StreamAnalogs.defs ++
    operators.StreamLive.defs ++
    operators.StateV2Live.defs ++
    operators.StateV2Timers.defs ++
    operators.StateV2Init.defs ++
    operators.RelationalExtra.defs ++
    operators.AnalyticsExtra.defs ++
    operators.TemporalJoins.defs ++
    operators.ScalePatterns.defs ++
    operators.ScaleStorage.defs ++
    operators.DataQuality.defs ++
    operators.GraphIterative.defs ++
    operators.SearchRank.defs ++
    operators.EntityResolution.defs ++
    operators.SketchOps.defs ++
    operators.StatsExtra.defs ++
    operators.PrivacyOps.defs ++
    multimodal.MultimodalOps.defs ++
    npm.NpmReplayOps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
