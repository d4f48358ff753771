package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def registry: Map[String, QueryDef] =
    RelationalQueries.defs ++ OptionsQueries.defs ++ FetchQueries.defs ++
      FeatureQueries.defs ++ QualityQueries.defs ++ GreeksQueries.defs ++
      LlmQueries.defs ++ CoverageQueries.defs ++ EgarchQueries.defs ++
      SystemQueries.defs ++ MultimodalQueries.defs ++ ScaleQueries.defs ++
      EventsQueries.defs ++ CurationQueries.defs ++ RetrievalQueries.defs ++
      VolQueries.defs ++ QuantQueries.defs ++ MicroQueries.defs ++
      CorpusQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    * Queries whose oracle depends on run artifacts (the trained-ANN
    * shortlists) stash theirs in [[queries.DynamicOracles]] as they
    * run; Verify dumps this map after running every query. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, QueryDef(_, Some(sql))) => k -> sql } ++
      DynamicOracles.snapshot
}
