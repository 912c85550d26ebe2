package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.nats.{NatsScan, NatsScanOptions}

/** Layer-A query surface: the `nats_scan` source semantics exercised the way
  * the reference's SQL suites exercise them (SURVEY.md §2 Layer A).
  * Each entry has a DuckDB oracle over the same `events.parquet` fixture.
  */
object NatsQueries {

  /** envelope CTE shared by every oracle — identical construction to
    * ParquetMessageStore (FIXTURES.md §6). */
  val envSql: String =
    """WITH env AS (
      |  SELECT 'events' AS stream,
      |         'events.' || event_type || '.' || CAST(user_id AS VARCHAR) AS subject,
      |         event_id + 1 AS seq,
      |         CAST(ts AS TIMESTAMP) AS ts_nats,
      |         props AS payload
      |  FROM events
      |)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nats_scan_full" -> ((s, dir) =>
      NatsScan.scanDir(s, dir)
        .select("stream", "subject", "seq", "ts_nats")
        .orderBy("seq")),

    "nats_seq_range" -> ((s, dir) =>
      NatsScan.scanDir(s, dir,
          opts = NatsScanOptions(startSeq = Some(101L), endSeq = Some(600L)))
        .select("seq", "subject", "ts_nats")
        .orderBy("seq")),

    "nats_time_range" -> ((s, dir) =>
      NatsScan.scanDir(s, dir,
          opts = NatsScanOptions(
            startTime = NatsScanOptions.ts("2024-01-05T00:00:00Z"),
            endTime = NatsScanOptions.ts("2024-01-10T00:00:00Z")))
        .select("seq", "ts_nats", "subject")
        .orderBy("seq")),

    // REFERENCE-PARITY time range: the reference resolves end_time to the
    // FIRST message at-or-after it and scans that sequence INCLUSIVELY
    // (src/nats_scan.cpp:685-698, :713) — so when no message lands exactly
    // on end_time, one message past the window is included. The default
    // nats_time_range uses the clean ts_nats <= end predicate (documented
    // divergence, SURVEY §2); this query reproduces the quirk bit-for-bit:
    // bound resolution is one global min/max aggregate over the pruned scan
    // (the columnar analog of the reference's O(log n) binary search),
    // broadcast back against the stream.
    "nats_time_range_refparity" -> ((s, dir) => {
      val env = NatsScan.scanDir(s, dir)
      val t0 = lit(java.sql.Timestamp.valueOf("2024-01-05 00:00:00"))
      val t1 = lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00"))
      val bounds = env.agg(
        min(when(col("ts_nats") >= t0, col("seq"))).as("start_seq"),
        coalesce(min(when(col("ts_nats") >= t1, col("seq"))), max(col("seq")))
          .as("end_seq"))
      env.crossJoin(broadcast(bounds))
        .filter(col("seq") >= col("start_seq") && col("seq") <= col("end_seq"))
        .select("seq", "ts_nats", "subject")
        .orderBy("seq")
    }),

    "nats_subject_contains" -> ((s, dir) =>
      NatsScan.scanDir(s, dir,
          opts = NatsScanOptions(subjectContains = Some("purchase")))
        .select("seq", "subject")
        .orderBy("seq")),

    // NATS wildcard grammar on the columnar path: `events.*.7` as a
    // pushable startswith + anchored rlike (the reference is substring-only,
    // nats_scan.cpp:741-746; '*' matches exactly one token, so user 17/70
    // stay out — a substring '7' could not express this)
    "nats_subject_wildcard" -> ((s, dir) =>
      NatsScan.scanDir(s, dir)
        .filter(NatsScan.subjectWildcard(col("subject"), "events.*.7"))
        .select("seq", "subject")
        .orderBy("seq")),

    // SUBSTRING-vs-WILDCARD divergence pin: the reference DOCUMENTS the
    // subject filter as substring matching (docs/GUIDE.md:148) while NATS
    // proper treats subjects as dot-token wildcards — our surface carries
    // both (`subject_contains` = reference parity, `subject_filter` =
    // wildcard superset). This query emits exactly the rows where the two
    // semantics disagree for the same pattern text ('4' as substring vs
    // `events.*.4` as a one-token match): subjects whose user token is 14,
    // 40, … contain '4' but are NOT `events.*.4`. Empty would mean the
    // superset silently changed reference behavior; the oracle pins the
    // divergence rows one by one.
    "nats_subject_divergence" -> ((s, dir) =>
      NatsScan.scanDir(s, dir)
        .select(col("seq"), col("subject"),
          col("subject").contains("4").as("substring_hit"),
          NatsScan.subjectWildcard(col("subject"), "events.*.4")
            .as("wildcard_hit"))
        .filter(col("substring_hit") =!= col("wildcard_hit"))
        .orderBy("seq")),

    "nats_json_extract" -> ((s, dir) =>
      NatsScan.scanDir(s, dir, opts = NatsScanOptions(jsonExtract = Seq("k")))
        .select("seq", "k", "payload")
        .orderBy("seq")),

    // JSON payload SCHEMA PROFILE — the stream-observability query a
    // schema-drift monitor runs: every key that occurs anywhere in the
    // OBJECT payloads, its occurrence count, presence rate, and coarse
    // value-type class. Keys are DYNAMIC (variant_explode — no schema
    // declared anywhere), so the same query profiles a thousand-key payload
    // mix; one key-explode + one groupBy(key) shuffle, corpus-linear.
    // Non-object payloads (arrays/scalars) are explicitly OUT of the key
    // profile on both engines — variant_explode would emit NULL-key element
    // rows for them while json_keys emits nothing, so the restriction is
    // what keeps the two sides the same query.
    "nats_json_profile" -> ((s, dir) => {
      val env = NatsScan.scanDir(s, dir)
        .select(col("payload").cast("string").as("p"))
      val total = env.agg(count(lit(1)).as("n_msgs"))
      env.filter(col("p").isNotNull &&
          expr("schema_of_variant(try_parse_json(p))").startsWith("OBJECT"))
        .createOrReplaceTempView("nats_json_profile_env")
      // variant_explode is a TABLE function: LATERAL-join it per payload
      s.sql("""SELECT v.key, v.value
              |FROM nats_json_profile_env,
              |     LATERAL variant_explode(try_parse_json(p)) AS v""".stripMargin)
        .withColumn("type_class", expr(
          """CASE WHEN schema_of_variant(value) IN ('BIGINT', 'DOUBLE')
            |       OR schema_of_variant(value) LIKE 'DECIMAL%' THEN 'number'
            |     WHEN schema_of_variant(value) = 'STRING' THEN 'string'
            |     WHEN schema_of_variant(value) = 'BOOLEAN' THEN 'boolean'
            |     WHEN schema_of_variant(value) = 'VOID' THEN 'null'
            |     ELSE 'complex' END""".stripMargin))
        .groupBy("key", "type_class")
        .agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(total))
        .select(col("key"), col("type_class"), col("n"),
          round(col("n").cast("double") / col("n_msgs"), 6).as("rate"))
        .orderBy("key", "type_class")
    }),

    // STRICT number fidelity (nats_scan.cpp:797-800): extracted JSON numbers
    // render as the reference's std::to_string(double) fixed 6-decimal text
    // ("42" → "42.000000"); the oracle rebuilds the same text from the raw
    // payload, so the mode's formatting is hash-verified
    "nats_json_strict" -> ((s, dir) =>
      NatsScan.scanDir(s, dir, opts = NatsScanOptions(jsonExtract = Seq("k"),
          jsonNumbersToString = true))
        .select("seq", "k")
        .orderBy("seq")),

    "nats_payload_blob" -> ((s, dir) =>
      NatsScan.scanDir(s, dir)
        .select(col("seq"), expr("octet_length(payload)").as("payload_bytes"))
        .orderBy("seq")),

    "nats_flagship" -> ((s, dir) => flagship(s, dir))
  )

  /** GUIDE flagship shape (/root/reference/docs/GUIDE.md:200-229): time range
    * + subject filter + json extraction + group/agg + sort, one query. */
  def flagship(s: SparkSession, dir: String): DataFrame =
    NatsScan.scanDir(s, dir,
        opts = NatsScanOptions(
          startTime = NatsScanOptions.ts("2024-01-05T00:00:00Z"),
          endTime = NatsScanOptions.ts("2024-01-20T00:00:00Z"),
          subjectContains = Some("events."),
          jsonExtract = Seq("k")))
      .groupBy("subject")
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("k").cast("double")), 4).as("avg_k"),
        max("ts_nats").as("max_ts"),
        min("seq").as("min_seq"))
      .orderBy("subject")

  def oracleSql: Map[String, String] = Map(
    "nats_scan_full" ->
      s"$envSql SELECT stream, subject, seq, ts_nats FROM env ORDER BY seq",

    "nats_seq_range" ->
      s"$envSql SELECT seq, subject, ts_nats FROM env WHERE seq BETWEEN 101 AND 600 ORDER BY seq",

    "nats_time_range" ->
      s"""$envSql SELECT seq, ts_nats, subject FROM env
         | WHERE ts_nats >= TIMESTAMP '2024-01-05 00:00:00'
         |   AND ts_nats <= TIMESTAMP '2024-01-10 00:00:00' ORDER BY seq""".stripMargin,

    "nats_time_range_refparity" ->
      s"""$envSql, b AS (
         |  SELECT min(CASE WHEN ts_nats >= TIMESTAMP '2024-01-05 00:00:00' THEN seq END) AS start_seq,
         |         coalesce(min(CASE WHEN ts_nats >= TIMESTAMP '2024-01-10 00:00:00' THEN seq END),
         |                  max(seq)) AS end_seq
         |  FROM env)
         | SELECT seq, ts_nats, subject FROM env, b
         | WHERE seq >= start_seq AND seq <= end_seq ORDER BY seq""".stripMargin,

    "nats_subject_contains" ->
      s"$envSql SELECT seq, subject FROM env WHERE subject LIKE '%purchase%' ORDER BY seq",

    "nats_subject_wildcard" ->
      s"""$envSql SELECT seq, subject FROM env
         | WHERE regexp_matches(subject, '^events\\.[^.]+\\.7$$') ORDER BY seq""".stripMargin,

    "nats_subject_divergence" ->
      s"""$envSql SELECT seq, subject,
         |   contains(subject, '4') AS substring_hit,
         |   regexp_matches(subject, '^events\\.[^.]+\\.4$$') AS wildcard_hit
         | FROM env
         | WHERE contains(subject, '4')
         |   <> regexp_matches(subject, '^events\\.[^.]+\\.4$$')
         | ORDER BY seq""".stripMargin,

    "nats_json_extract" ->
      s"$envSql SELECT seq, json_extract_string(payload, '$$.k') AS k, payload FROM env ORDER BY seq",

    "nats_json_profile" ->
      s"""$envSql, tot AS (SELECT count(*) AS n_msgs FROM env),
         | kv AS (SELECT unnest(json_keys(payload::JSON)) AS key, payload
         |        FROM env WHERE payload IS NOT NULL
         |          AND json_type(payload::JSON) = 'OBJECT'),
         | typed AS (SELECT key,
         |   json_type(json_extract(payload::JSON,
         |     '$$."' || replace(key, '"', '\\"') || '"')) AS jt
         |   FROM kv),
         | cls AS (SELECT key,
         |   CASE WHEN jt IN ('UBIGINT', 'BIGINT', 'DOUBLE') THEN 'number'
         |        WHEN jt = 'VARCHAR' THEN 'string'
         |        WHEN jt = 'BOOLEAN' THEN 'boolean'
         |        WHEN jt = 'NULL' THEN 'null'
         |        ELSE 'complex' END AS type_class
         |   FROM typed)
         | SELECT key, type_class, CAST(count(*) AS BIGINT) AS n,
         |        round(CAST(count(*) AS DOUBLE) / (SELECT n_msgs FROM tot), 6) AS rate
         | FROM cls GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "nats_json_strict" ->
      s"""$envSql SELECT seq,
         | CASE WHEN json_type(payload::JSON, '$$.k') IN ('UBIGINT','BIGINT','DOUBLE')
         |      THEN CAST(CAST(CAST(json_extract(payload, '$$.k') AS DOUBLE) AS DECIMAL(38,6)) AS VARCHAR)
         |      ELSE json_extract_string(payload, '$$.k') END AS k
         | FROM env ORDER BY seq""".stripMargin,

    "nats_payload_blob" ->
      s"$envSql SELECT seq, CAST(octet_length(payload::BLOB) AS INTEGER) AS payload_bytes FROM env ORDER BY seq",

    "nats_flagship" ->
      s"""$envSql, ext AS (
         |  SELECT subject, seq, ts_nats, json_extract_string(payload, '$$.k') AS k
         |  FROM env
         |  WHERE ts_nats >= TIMESTAMP '2024-01-05 00:00:00'
         |    AND ts_nats <= TIMESTAMP '2024-01-20 00:00:00'
         |    AND subject LIKE '%events.%'
         |)
         |SELECT subject, count(*) AS n, round(avg(CAST(k AS DOUBLE)), 4) AS avg_k,
         |       max(ts_nats) AS max_ts, min(seq) AS min_seq
         |FROM ext GROUP BY subject ORDER BY subject""".stripMargin
  )
}
