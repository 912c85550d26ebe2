package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** SQL-surface registration (the `LOAD nats_js` analog): with the extension
  * installed, proto_encode/proto_decode are callable from plain SQL. */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val proto = graft.queries.ProtoQueries.deviceProtoPath

  test("proto_encode/proto_decode round-trip from plain SQL") {
    val row = spark.sql(
      s"""SELECT d.device_id, d.position.zone AS zone, d.reading.kw AS kw, d.online
         |FROM (SELECT proto_decode(
         |    proto_encode(
         |      named_struct(
         |        'device_id', 'dev-7', 'ts', CAST(42 AS BIGINT),
         |        'position', named_struct('zone', 'z1', 'rack', 'r2', 'building', 'b3'),
         |        'reading', named_struct('kw', 70.5, 'pf', 0.93, 'voltage', 480.0),
         |        'online', true, 'firmware', 'v9'),
         |      '$proto', 'DeviceEvent'),
         |    '$proto', 'DeviceEvent') AS d)""".stripMargin).head()
    assert(row.getString(0) == "dev-7")
    assert(row.getString(1) == "z1")
    assert(row.getDouble(2) == 70.5)
    assert(row.getBoolean(3))
  }

  test("similarity functions from SQL == Column API, bit for bit") {
    import org.apache.spark.sql.functions._
    val sqlRow = spark.sql(
      """SELECT cosine_sim(array(1.0F, 2.0F, 3.0F), array(3.0F, 2.0F, 1.0F)) AS c,
        |       lsh_bucket(array(1.0F, -2.0F, 3.0F, 0.5F), 4, 4) AS b,
        |       graft_hash60('samp:42') AS h""".stripMargin).head()
    val api = spark.range(1).select(
      graft.functions.Similarity.cosine(
        typedLit(Array(1.0f, 2.0f, 3.0f)), typedLit(Array(3.0f, 2.0f, 1.0f))).as("c"),
      graft.functions.Similarity.lshBucket(
        typedLit(Array(1.0f, -2.0f, 3.0f, 0.5f)), 4, 4).as("b"),
      graft.functions.Similarity.hash60(lit("samp:42")).as("h")).head()
    assert(sqlRow.getDouble(0) == api.getDouble(0))
    assert(sqlRow.getLong(1) == api.getLong(1))
    assert(sqlRow.getLong(2) == api.getLong(2))
    assert(sqlRow.getLong(2) == graft.functions.Similarity.hash60Scala("samp:42"))
  }

  test("non-literal proto path is rejected at plan time") {
    val e = intercept[Exception] {
      spark.sql("SELECT proto_decode(CAST('x' AS BINARY), concat('a', 'b.proto'), 'M')")
        .collect()
    }
    assert(e.getMessage.contains("string literal") ||
      e.getMessage.toLowerCase.contains("literal"), e.getMessage)
  }

  test("wrong arity gives the contract error") {
    val e = intercept[Exception] {
      spark.sql("SELECT proto_decode(CAST('x' AS BINARY))").collect()
    }
    assert(e.getMessage.contains("3 arguments") ||
      e.getMessage.toLowerCase.contains("argument"), e.getMessage)
  }

  test("FROM nats_scan(...) — the reference's table-function API resolves " +
    "to the DSv2 relation, identical to the DataFrame read") {
    val dir = "/root/testdata/sf0.001"
    val viaSql = spark.sql(
      s"SELECT seq, subject, ts_nats FROM nats_scan('events', 'dir', '$dir') " +
        "ORDER BY seq")
    val viaApi = spark.read.format("nats_scan")
      .option("dir", dir).option("stream", "events").load()
      .selectExpr("seq", "subject", "ts_nats").orderBy("seq")
    assert(viaSql.collect().toSeq == viaApi.collect().toSeq)
  }

  test("nats_scan TVF keeps filter pushdown: a seq-range predicate reaches " +
    "the scan (no full-stream read at 100 TB)") {
    val dir = "/root/testdata/sf0.001"
    val q = spark.sql(
      s"SELECT seq FROM nats_scan('events', 'dir', '$dir') " +
        "WHERE seq BETWEEN 10 AND 20 ORDER BY seq")
    assert(q.collect().map(_.getLong(0)).toSeq == (10L to 20L))
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("nats_scan"), physical.take(400))
  }

  test("nats_scan TVF accepts SQL named arguments (the reference's " +
    "named-parameter style) and mixes them with positional pairs") {
    val dir = "/root/testdata/sf0.001"
    val named = spark.sql(
      s"SELECT seq FROM nats_scan('events', dir => '$dir') " +
        "WHERE seq <= 5 ORDER BY seq").collect().map(_.getLong(0))
    assert(named.toSeq == (1L to 5L))
    val mixed = spark.sql(
      s"SELECT seq FROM nats_scan('events', 'stream', 'events', dir => '$dir') " +
        "WHERE seq <= 3 ORDER BY seq").collect().map(_.getLong(0))
    assert(mixed.toSeq == (1L to 3L))
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM nats_scan('events', dir => concat('a', 'b'))")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"), e.getMessage)
  }

  test("nats_scan TVF takes the reference's TYPED named parameters: " +
    "integer seq bounds, TIMESTAMP time bounds, array() extract lists") {
    val dir = "/root/testdata/sf0.001"
    // UBIGINT-style integer literals for the seq range
    val seqs = spark.sql(
      s"SELECT seq FROM nats_scan('events', 'dir', '$dir', " +
        "start_seq => 2, end_seq => 5) ORDER BY seq")
      .collect().map(_.getLong(0))
    assert(seqs.toSeq == (2L to 5L))
    // LIST(VARCHAR) extraction paths run the facade's extraction chain
    // over the TVF's DSv2 relation — identical to NatsScan.scanDir
    val viaTvf = spark.sql(
      s"SELECT seq, k FROM nats_scan('events', 'dir', '$dir', " +
        "json_extract => array('k')) WHERE seq <= 20 ORDER BY seq")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val viaFacade = graft.nats.NatsScan
      .scanDir(spark, dir, opts = graft.nats.NatsScanOptions(
        jsonExtract = Seq("k")))
      .filter(org.apache.spark.sql.functions.col("seq") <= 20).orderBy("seq")
      .select("seq", "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(viaTvf.nonEmpty && viaTvf == viaFacade)
    // TIMESTAMP literal time bound == facade Instant bound
    val inst = graft.nats.NatsScan.scanDir(spark, dir)
      .filter(org.apache.spark.sql.functions.col("seq") === 3)
      .select("ts_nats").head.getTimestamp(0).toInstant
    val lit = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
      .withZone(java.time.ZoneOffset.UTC).format(inst)
    val tvfRows = spark.sql(
      s"SELECT seq FROM nats_scan('events', 'dir', '$dir', " +
        s"start_time => TIMESTAMP '$lit') ORDER BY seq")
      .collect().map(_.getLong(0)).toSeq
    val facadeRows = graft.nats.NatsScan.scanDir(spark, dir,
        opts = graft.nats.NatsScanOptions(startTime = Some(inst)))
      .orderBy("seq").select("seq").collect().map(_.getLong(0)).toSeq
    assert(tvfRows.nonEmpty && tvfRows == facadeRows)
    // mutual exclusions fire at bind through the same validate()
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM nats_scan('events', 'dir', '$dir', " +
        "json_extract => array('k'), proto_extract => array('x'))").collect()
    }
    assert(e.getMessage.contains("json_extract and proto_extract"),
      e.getMessage)
  }

  test("nats_scan TVF honors list-valued options in the positional " +
    "string-pair form (comma-separated paths), same as named array()") {
    val dir = "/root/testdata/sf0.001"
    val positional = spark.sql(
      s"SELECT seq, k FROM nats_scan('events', 'dir', '$dir', " +
        "'json_extract', 'k') WHERE seq <= 20 ORDER BY seq")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val named = spark.sql(
      s"SELECT seq, k FROM nats_scan('events', 'dir', '$dir', " +
        "json_extract => array('k')) WHERE seq <= 20 ORDER BY seq")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(positional.nonEmpty && positional == named)
    // comma-separated = multiple paths
    val multi = spark.sql(
      s"SELECT seq, k, missing FROM nats_scan('events', 'dir', '$dir', " +
        "'json_extract', 'k, missing') WHERE seq <= 5 ORDER BY seq")
    assert(multi.columns.toSeq.containsSlice(Seq("k", "missing")))
    assert(multi.collect().length == 5)
    // both forms for the same key conflict at bind
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM nats_scan('events', 'dir', '$dir', " +
        "'json_extract', 'k', json_extract => array('k'))").collect()
    }
    assert(e.getMessage.contains("both as a positional pair"), e.getMessage)
    // and scalar keys conflict the same way
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM nats_scan('events', 'dir', '$dir', " +
        "'start_seq', '2', start_seq => 3)").collect()
    }
    assert(e2.getMessage.contains("both as a positional pair"), e2.getMessage)
  }

  test("nats_scan TVF resolves TIMESTAMP_NTZ literals in the SESSION " +
    "timezone (wall-clock, not UTC epoch micros)") {
    val dir = "/root/testdata/sf0.001"
    val inst = graft.nats.NatsScan.scanDir(spark, dir)
      .filter(org.apache.spark.sql.functions.col("seq") === 3)
      .select("ts_nats").head.getTimestamp(0).toInstant
    val facadeRows = graft.nats.NatsScan.scanDir(spark, dir,
        opts = graft.nats.NatsScanOptions(startTime = Some(inst)))
      .orderBy("seq").select("seq").collect().map(_.getLong(0)).toSeq
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      // the NTZ literal is the instant's TOKYO wall clock; a correct bind
      // maps it back to the same instant (the old UTC-assuming code was
      // off by 9 hours here)
      val wall = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
        .withZone(java.time.ZoneId.of("Asia/Tokyo")).format(inst)
      val tvfRows = spark.sql(
        s"SELECT seq FROM nats_scan('events', 'dir', '$dir', " +
          s"start_time => TIMESTAMP_NTZ '$wall') ORDER BY seq")
        .collect().map(_.getLong(0)).toSeq
      assert(tvfRows.nonEmpty && tvfRows == facadeRows)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("nats_scan TVF rejects non-literal and mis-paired arguments at bind") {
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM nats_scan('events', 'dir')").collect()
    }
    assert(e1.getMessage.contains("key/value") ||
      e1.getMessage.toLowerCase.contains("argument"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM nats_scan(concat('ev', 'ents'))").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("literal"), e2.getMessage)
  }

  test("FROM nats_obj(...) — the bucket scan's SQL face: identical to the " +
    "DataFrame read, named args typed, bind errors pointed") {
    val url = "nats://graftext-obj:4222"
    graft.transport.FakeJetStream.listen(url)
    val os = new graft.transport.ObjectStore(
      graft.transport.Transport.connect(url), "sqlb", chunkSize = 8)
    (0 until 12).foreach(i =>
      os.put(s"o$i", (s"payload-$i" * 2).getBytes("UTF-8"), i.toLong))
    val viaSql = spark.sql(
      s"""SELECT name, size, digest, CAST(data AS STRING) AS text
         |FROM nats_obj('sqlb', 'url', '$url', shards => 4)
         |ORDER BY name""".stripMargin)
    val viaApi = spark.read.format("nats_obj").option("url", url)
      .option("bucket", "sqlb").option("shards", "4").load()
      .selectExpr("name", "size", "digest", "CAST(data AS STRING) AS text")
      .orderBy("name")
    val sqlRows = viaSql.collect().toSeq
    assert(sqlRows.length == 12 && sqlRows == viaApi.collect().toSeq)
    // name pushdown still collapses to the targeted single partition
    val point = spark.sql(
      s"SELECT name FROM nats_obj('sqlb', 'url', '$url') WHERE name = 'o3'")
    assert(point.rdd.getNumPartitions == 1)
    assert(point.collect().map(_.getString(0)).toSeq == Seq("o3"))
    // bind errors: missing option pairs, non-literal bucket, bad option
    val e1 = intercept[Exception] {
      spark.sql(s"SELECT * FROM nats_obj('sqlb', 'url')").collect()
    }
    assert(e1.getMessage.contains("key/value") ||
      e1.getMessage.toLowerCase.contains("argument"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM nats_obj(concat('sq', 'lb'))").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("literal"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql(s"SELECT * FROM nats_obj('sqlb', 'url', '$url', " +
        "shards => 0)").collect()
    }
    assert(e3.getMessage.contains("shards must be >= 1"), e3.getMessage)
  }

  test("FROM nats_kv(...) — the KV current-state scan's SQL face") {
    val url = "nats://graftext-kv:4222"
    graft.transport.FakeJetStream.listen(url)
    val kv = new graft.transport.KvStore(
      graft.transport.Transport.connect(url), "sqlkv", maxHistory = 2)
    (0 until 9).foreach(i => kv.put(s"k$i", s"v$i".getBytes("UTF-8"), i.toLong))
    kv.put("k1", "v1b".getBytes("UTF-8"), 10L)
    kv.delete("k2", 11L)
    val viaSql = spark.sql(
      s"""SELECT key, CAST(value AS STRING) AS v
         |FROM nats_kv('sqlkv', 'url', '$url', shards => 4)
         |ORDER BY key""".stripMargin).collect()
    assert(viaSql.length == 8) // k2 tombstoned
    assert(viaSql.find(_.getString(0) == "k1").get.getString(1) == "v1b")
    val viaApi = spark.read.format("nats_kv").option("url", url)
      .option("bucket", "sqlkv").option("shards", "4").load()
      .selectExpr("key", "CAST(value AS STRING) AS v").orderBy("key").collect()
    assert(viaSql.toSeq == viaApi.toSeq)
    // key pushdown through SQL: point lookup plans one partition
    val point = spark.sql(
      s"SELECT key FROM nats_kv('sqlkv', 'url', '$url') WHERE key = 'k3'")
    assert(point.rdd.getNumPartitions == 1)
    assert(point.collect().map(_.getString(0)).toSeq == Seq("k3"))
  }
}
