package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each implemented operator from SURVEY.md §2 (plus the training-data
  * pipeline ops) is one [[QueryDef]] in one of the `graft.queries` modules;
  * this object assembles them into the driver-facing maps.
  */
object SparkEntry {

  /** All operator/query definitions, by module. */
  def allDefs: Seq[QueryDef] =
    graft.queries.TpchQueries.defs ++
      graft.queries.TpchQueries2.defs ++
      graft.queries.TpchQueries3.defs ++
      graft.queries.TpcdsQueries.defs ++
      graft.queries.TpcdsQueries2.defs ++
      graft.queries.TpcdsQueries3.defs ++
      graft.queries.TpcdsQueries4.defs ++
      graft.queries.RelationalQueries.defs ++
      graft.queries.EventQueries.defs ++
      graft.queries.PipelineQueries.defs ++
      graft.queries.MutationQueries.defs ++
      graft.queries.MatViewQueries.defs ++
      graft.queries.AqpQueries.defs ++
      graft.queries.SecurityQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
