package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY.md §2 to a
  * DataFrame builder `(spark, sfDir) => DataFrame`; `oracleSql` carries the
  * DuckDB-equivalent SQL for the correctness harness. Query groups live in
  * `graft.queries.*`; this object only aggregates them.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("nats_flagship")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.NatsQueries.queries ++
      graft.queries.RelationalQueries.queries ++
      graft.queries.ProtoQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.V2Queries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.ScaleQueries.queries ++
      graft.queries.TransportQueries.queries ++
      graft.queries.AnalyticQueries.queries ++
      graft.queries.TrainingDataQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.WireQueries.queries ++
      graft.queries.RetrievalQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.NatsQueries.oracleSql ++
      graft.queries.RelationalQueries.oracleSql ++
      graft.queries.ProtoQueries.oracleSql ++
      graft.queries.PipelineQueries.oracleSql ++
      graft.queries.V2Queries.oracleSql ++
      graft.queries.MultimodalQueries.oracleSql ++
      graft.queries.ScaleQueries.oracleSql ++
      graft.queries.TransportQueries.oracleSql ++
      graft.queries.AnalyticQueries.oracleSql ++
      graft.queries.TrainingDataQueries.oracleSql ++
      graft.queries.CurationQueries.oracleSql ++
      graft.queries.WireQueries.oracleSql ++
      graft.queries.RetrievalQueries.oracleSql
}
