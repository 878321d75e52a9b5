package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{CdcQueries, ExtendedQueries, LlmQueries, OpsQueries, RelationalQueries, SelectionQueries, TrainingQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers a [[GraftQuery]] (Spark impl +
  * DuckDB oracle SQL) in one of the module registries below; this object
  * just flattens them into the driver's expected maps.
  */
object SparkEntry {

  /** All declared queries, in module order. Names must be unique. */
  def registry: Seq[GraftQuery] =
    RelationalQueries.all ++ CdcQueries.all ++ LlmQueries.all ++
      ExtendedQueries.all ++ TrainingQueries.all ++
      SelectionQueries.all ++ OpsQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_multi_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
