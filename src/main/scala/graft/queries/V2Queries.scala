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

  /** unique scratch store per invocation, removed on JVM exit. */
  private def freshSinkDir(): String = graft.Scratch.dir("graft_v2_sink_")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // seq range pushed down → row-group pruning + parquet record filter.
    // Bounds sit inside even the sf0.001 fixture (1000 events), so the
    // gate is substantive at every SF — a range past the smallest fixture
    // would let that SF's check pass vacuously on zero rows.
    "v2_seq_range" -> ((s, dir) =>
      v2(s, dir)
        .filter(col("seq") >= 401L && col("seq") <= 900L)
        .select("seq", "subject", "ts_nats")
        .orderBy("seq")),

    // THE reference's SQL shape verbatim: `FROM nats_scan('stream', …)`
    // (src/nats_scan.cpp:844-857; every docs/GUIDE.md example). The
    // injected table function (plans/GraftExtensions) resolves to the SAME
    // DSv2 relation as `spark.read.format("nats_scan")`, so the WHERE
    // range still reaches the scan as a pushed filter — asserted in
    // GraftExtensionsSpec; this entry hash-gates the results end-to-end.
    "v2_sql_tvf" -> ((s, dir) => s.sql(
      s"""SELECT subject, count(*) AS n, min(seq) AS min_seq, max(seq) AS max_seq
         |FROM nats_scan('events', 'dir', '$dir')
         |WHERE seq BETWEEN 101 AND 700
         |GROUP BY subject ORDER BY subject""".stripMargin)),

    // the reference TVF's TYPED named parameters (nats_scan.cpp:849-857):
    // UBIGINT seq bounds and a LIST(VARCHAR) json_extract, straight in the
    // function call — the bounds become pushed Catalyst filters, the
    // extraction runs the facade's chain over the DSv2 relation
    "v2_sql_tvf_typed" -> ((s, dir) => s.sql(
      s"""SELECT seq, subject, k
         |FROM nats_scan('events', 'dir', '$dir',
         |               start_seq => 101, end_seq => 700,
         |               json_extract => array('k'))
         |ORDER BY seq""".stripMargin)),

    // stream HEAD: ORDER BY seq LIMIT n rides the top-n pushdown
    // (SupportsPushDownTopN → per-partition early stop over the seq-sorted
    // layouts) — this entry hash-verifies that the early-stop returns
    // exactly the n lowest sequences, not just any n rows
    "v2_stream_head" -> ((s, dir) =>
      v2(s, dir)
        .select("seq", "subject", "ts_nats")
        .orderBy("seq")
        .limit(100)),

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
        .orderBy("seq")),

    // COMPLETE aggregate pushdown: an unfiltered count/min/max over the
    // stream reads parquet FOOTERS (O(files)), never a data page — the
    // plan audit asserts the STATS-ONLY scan; this entry hash-verifies
    // the footer-derived values against the oracle recomputing from rows
    "v2_stats_agg" -> ((s, dir) =>
      v2(s, dir).agg(
        count(lit(1)).as("n"),
        min("seq").as("min_seq"), max("seq").as("max_seq"),
        min("ts_nats").as("min_ts"), max("ts_nats").as("max_ts"))),

    // the scan routed through the stream-discovery CATALOG: spark.table
    // ("<cat>.events") resolves via NatsCatalog → the same NatsScanTable /
    // pushdown / vectorized readers as format("nats_scan"). The catalog
    // name embeds the dir (catalogs are cached per name per session; two
    // SFs in one JVM must not alias).
    "v2_catalog" -> ((s, dir) => {
      val cat = "nats_" +
        java.lang.Integer.toHexString(dir.hashCode).replace('-', 'm')
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.NatsCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.dir", dir)
      s.table(s"$cat.events")
        .filter(col("seq") <= 1200L)
        .withColumn("etype", element_at(split(col("subject"), "\\."), 2))
        .groupBy("etype")
        .agg(count(lit(1)).as("n"),
          min("seq").as("min_seq"), max("seq").as("max_seq"),
          max("ts_nats").as("max_ts"))
        .orderBy("etype")
    }),

    // full write→read round trip through the native message store: publish a
    // seq range into a fresh store (truncate write), read it back through the
    // same V2 source (native layout: seq/ts stats pruning + record filters),
    // and aggregate. The oracle recomputes from the fixture directly — a
    // writer bug (lost rows, mangled timestamps/payloads) breaks the match.
    "v2_sink_roundtrip" -> ((s, dir) => {
      // per-invocation unique store: enumerating the query inventory (plan
      // dumps, schema audits) triggers this write eagerly, and two
      // concurrent runs on a shared fixed path would race truncate vs read.
      // Unique dirs make every invocation self-contained; a shutdown hook
      // reclaims them.
      val out = V2Queries.freshSinkDir()
      v2(s, dir)
        .filter(col("seq") <= 2000L)
        .write.format("nats_scan").option("dir", out)
        .mode("overwrite").save()
      s.read.format("nats_scan").option("dir", out).load()
        .filter(col("seq") >= 501L && col("seq") <= 1500L)
        .withColumn("etype", element_at(split(col("subject"), "\\."), 2))
        .groupBy("etype")
        .agg(count(lit(1)).as("n"),
          min("seq").as("min_seq"), max("seq").as("max_seq"),
          max("ts_nats").as("max_ts"),
          sum(expr("octet_length(payload)")).as("payload_bytes"))
        .orderBy("etype")
    })
  )

  def oracleSql: Map[String, String] = {
    val env = NatsQueries.envSql
    Map(
      "v2_seq_range" ->
        s"$env SELECT seq, subject, ts_nats FROM env WHERE seq BETWEEN 401 AND 900 ORDER BY seq",

      "v2_stream_head" ->
        s"$env SELECT seq, subject, ts_nats FROM env ORDER BY seq LIMIT 100",

      "v2_sql_tvf" ->
        s"""$env SELECT subject, count(*) AS n, min(seq) AS min_seq, max(seq) AS max_seq
           | FROM env WHERE seq BETWEEN 101 AND 700
           | GROUP BY subject ORDER BY subject""".stripMargin,

      "v2_sql_tvf_typed" ->
        s"""$env SELECT seq, subject, json_extract_string(payload, '$$.k') AS k
           | FROM env WHERE seq BETWEEN 101 AND 700
           | ORDER BY seq""".stripMargin,

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
           | FROM env WHERE seq <= 500 ORDER BY seq""".stripMargin,

      "v2_stats_agg" ->
        s"""$env SELECT count(*) AS n, min(seq) AS min_seq, max(seq) AS max_seq,
           | min(ts_nats) AS min_ts, max(ts_nats) AS max_ts FROM env""".stripMargin,

      "v2_catalog" ->
        s"""$env SELECT string_split(subject, '.')[2] AS etype, count(*) AS n,
           |       min(seq) AS min_seq, max(seq) AS max_seq, max(ts_nats) AS max_ts
           | FROM env WHERE seq <= 1200
           | GROUP BY 1 ORDER BY etype""".stripMargin,

      "v2_sink_roundtrip" ->
        s"""$env SELECT string_split(subject, '.')[2] AS etype, count(*) AS n,
           |       min(seq) AS min_seq, max(seq) AS max_seq,
           |       max(ts_nats) AS max_ts,
           |       CAST(sum(octet_length(payload::BLOB)) AS BIGINT) AS payload_bytes
           | FROM env WHERE seq BETWEEN 501 AND 1500
           | GROUP BY 1 ORDER BY etype""".stripMargin
    )
  }
}
