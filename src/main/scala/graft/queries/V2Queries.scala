package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries through the DataSource V2 registration
  * (`spark.read.format("nats_scan")`) — same semantics as the facade, but
  * range/subject predicates arrive via Catalyst pushdown instead of bind-time
  * options, and partitions follow parquet row groups. */
object V2Queries {

  private def v2(s: SparkSession, dir: String): DataFrame =
    s.read.format("nats_scan").option("dir", dir).load()

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // seq range pushed down → row-group pruning + parquet record filter
    "v2_seq_range" -> ((s, dir) =>
      v2(s, dir)
        .filter(col("seq") >= 1001L && col("seq") <= 3000L)
        .select("seq", "subject", "ts_nats")
        .orderBy("seq")),

    // time range + subject contains, both pushed; projection pruned to 2 cols
    "v2_time_subject" -> ((s, dir) =>
      v2(s, dir)
        .filter(col("ts_nats") >= lit(java.time.Instant.parse("2024-01-10T00:00:00Z")) &&
          col("ts_nats") <= lit(java.time.Instant.parse("2024-01-20T00:00:00Z")) &&
          col("subject").contains("click"))
        .groupBy("subject")
        .agg(count(lit(1)).as("n"), min("seq").as("min_seq"), max("seq").as("max_seq"))
        .orderBy("subject")),

    // payload flows through the V2 reader as binary
    "v2_payload" -> ((s, dir) =>
      v2(s, dir)
        .filter(col("seq") <= 500L)
        .select(col("seq"),
          expr("octet_length(payload)").as("payload_bytes"),
          col("payload").cast("string").as("payload_str"))
        .orderBy("seq"))
  )

  def oracleSql: Map[String, String] = {
    val env = NatsQueries.envSql
    Map(
      "v2_seq_range" ->
        s"$env SELECT seq, subject, ts_nats FROM env WHERE seq BETWEEN 1001 AND 3000 ORDER BY seq",

      "v2_time_subject" ->
        s"""$env SELECT subject, count(*) AS n, min(seq) AS min_seq, max(seq) AS max_seq
           | FROM env
           | WHERE ts_nats >= TIMESTAMP '2024-01-10 00:00:00'
           |   AND ts_nats <= TIMESTAMP '2024-01-20 00:00:00'
           |   AND subject LIKE '%click%'
           | GROUP BY subject ORDER BY subject""".stripMargin,

      "v2_payload" ->
        s"""$env SELECT seq, CAST(octet_length(payload::BLOB) AS INTEGER) AS payload_bytes,
           |       payload AS payload_str
           | FROM env WHERE seq <= 500 ORDER BY seq""".stripMargin
    )
  }
}
