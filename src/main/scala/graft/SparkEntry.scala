package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 + §7. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.Engine.queries ++
      graft.queries.Pipeline.queries ++ graft.queries.Advanced.queries ++
      graft.queries.TrainPrep.queries ++ graft.queries.Stats.queries ++
      graft.queries.Vectors.queries ++ graft.queries.Analytics.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.Engine.oracles ++
      graft.queries.Pipeline.oracles ++ graft.queries.Advanced.oracles ++
      graft.queries.TrainPrep.oracles ++ graft.queries.Stats.oracles ++
      graft.queries.Vectors.oracles ++ graft.queries.Analytics.oracles
}
