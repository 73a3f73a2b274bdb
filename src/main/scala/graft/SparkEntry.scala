package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q3TopK(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.OpsQueries.queries ++
      graft.queries.EvalQueries.queries ++
      graft.queries.CmfQueries.queries ++
      graft.queries.DedupSimQueries.queries ++
      graft.queries.StreamMmQueries.queries ++
      graft.queries.SourceQueries.queries ++
      graft.queries.StatQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.OpsQueries.oracles ++
      graft.queries.EvalQueries.oracles ++
      graft.queries.CmfQueries.oracles ++
      graft.queries.DedupSimQueries.oracles ++
      graft.queries.StreamMmQueries.oracles ++
      graft.queries.SourceQueries.oracles ++
      graft.queries.StatQueries.oracles
}
