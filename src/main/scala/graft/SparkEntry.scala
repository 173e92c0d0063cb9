package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates one gate entry per implemented SURVEY.md §2 operator
  * (and per LLM-pipeline operator); `oracleSql` holds the DuckDB-equivalent
  * SQL for every entry that is SQL-expressible — entries absent from
  * `oracleSql` get the driver's weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q9_region_rollup")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ EngineQueries.queries ++
      SearchQueries.queries ++ LlmQueries.queries ++ CdcQueries.queries ++
      CurationQueries.queries ++ ConnectorQueries.queries ++ TimeQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ EngineQueries.oracles ++
      SearchQueries.oracles ++ LlmQueries.oracles ++ CdcQueries.oracles ++
      CurationQueries.oracles ++ ConnectorQueries.oracles ++ TimeQueries.oracles
}
