package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.transport._

/** Transport-seam behaviors, mirroring the reference's connection test suite
  * (/root/reference/test/sql/test_connection_errors.sql) — including the
  * commented-out error cases E1-E6 the reference documents but cannot run in
  * its own CI. Here they run for real against the in-JVM fake JetStream. */
class TransportSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val url = "nats://spec-server:4222"

  private lazy val server: FakeJetStreamServer = {
    val s = FakeJetStream.listen(url)
    // 100 messages, ts strictly increasing, a gap at every multiple of 10
    (1L to 100L).foreach { seq =>
      s.publish("telemetry", seq, s"telemetry.dev${seq % 5}",
        1700000000000000000L + seq * 1000000000L, s"""{"v":$seq}""".getBytes)
    }
    (10L to 100L by 10L).foreach(s.deleteMsg("telemetry", _))
    s.addStream("empty_test_stream")
    s
  }

  private def read(stream: String, opts: Map[String, String] = Map.empty) = {
    server // force fixture
    val b = spark.read.format("nats_scan").option("url", url)
      .option("stream", stream).option("slice_width", "16")
    opts.foldLeft(b) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  private def messageChain(t: Throwable): String = {
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
  }

  /** row count through the REAL scan path: a bare `count()` is now answered
    * by streamInfo via aggregate pushdown, which tests of fetch/cursor
    * behavior must not take */
  private def scanRows(df: org.apache.spark.sql.DataFrame): Long =
    df.select("seq").collect().length.toLong

  // --- success behaviors (tests 1-10) ---

  test("custom URL connects and scans; gaps are skipped silently") {
    assert(scanRows(read("telemetry")) == 90L) // 100 minus 10 deleted
  }

  test("default URL (implicit localhost:4222)") {
    val s = FakeJetStream.listen("nats://localhost:4222")
    s.publish("local_stream", 1L, "a", 1L, "x".getBytes)
    val df = spark.read.format("nats_scan")
      .option("url", "nats://localhost:4222")
      .option("stream", "local_stream").load()
    assert(df.count() == 1L)
  }

  test("empty stream: zero results, not an error") {
    assert(read("empty_test_stream").count() == 0L)
  }

  test("multiple queries over one stream are isolated") {
    assert(scanRows(read("telemetry")) == scanRows(read("telemetry")))
  }

  test("metadata columns carry the envelope types") {
    val f = read("telemetry").schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(f("stream") == "string" && f("subject") == "string" &&
      f("seq") == "long" && f("ts_nats") == "timestamp" && f("payload") == "binary")
  }

  test("connection with all parameters (url, subject, seq range)") {
    val df = read("telemetry",
      Map("subject" -> "dev1", "start_seq" -> "10", "end_seq" -> "60"))
    // seqs 11,16,...,56 end in 1 or 6 (≡ dev1), minus deleted multiples of 10
    val seqs = df.select("seq").collect().map(_.getLong(0)).sorted
    assert(seqs.nonEmpty && seqs.forall(s => s >= 10 && s <= 60 && s % 5 == 1))
  }

  test("concurrent access to two streams in one query") {
    val a = read("telemetry").groupBy(lit(1).as("k")).agg(count(lit(1)).as("n_t"))
    val b = read("empty_test_stream").groupBy(lit(1).as("k"))
      .agg(count(lit(1)).as("n_e"))
    val row = a.join(b, Seq("k"), "left").select("n_t", "n_e").head
    assert(row.getLong(0) == 90L && (row.isNullAt(1) || row.getLong(1) == 0L))
  }

  // --- error behaviors (E1-E6) ---
  // Complete map of the reference's commented-out negative cases
  // (/root/reference/test/sql/test_connection_errors.sql:172-199):
  //   E1 invalid URL (:173)            → "E1 invalid URL..." below
  //   E2 non-existent stream (:177)    → "E2 non-existent stream..." below
  //   E3 empty stream name (:181)      → "E3 empty stream name..." below
  //   E4 unreachable server (:185)     → "E4 unreachable server..." below
  //   E5 seq+time conflict (:189-192)  → "E5 sequence range..." below
  //   E6 json+proto conflict (:194-199)→ NatsScanOptionsSpec
  //     ("E6 json_extract + proto_file/proto_message ... exact reference
  //     shape") — bind-time validation, no connection involved

  test("E1 invalid URL fails with the connect error shape") {
    val e = intercept[Throwable](
      spark.read.format("nats_scan").option("url", "invalid://bad-url:9999")
        .option("stream", "telemetry").load().count())
    assert(messageChain(e).contains("Failed to connect to NATS"), messageChain(e))
  }

  test("E2 non-existent stream fails with stream-not-found") {
    val e = intercept[Throwable](read("nonexistent_stream_xyz").count())
    assert(messageChain(e).contains("Failed to get stream info"), messageChain(e))
    assert(messageChain(e).contains("stream not found"), messageChain(e))
  }

  test("E3 empty stream name is rejected") {
    val e = intercept[Throwable](read("").count())
    assert(messageChain(e).contains("stream name must not be empty"), messageChain(e))
  }

  test("E4 unreachable server times out after the connect timeout") {
    FakeJetStream.blackhole("nats://blackhole-host:4222")
    val t0 = System.nanoTime()
    val e = intercept[Throwable](
      spark.read.format("nats_scan").option("url", "nats://blackhole-host:4222")
        .option("stream", "telemetry").option("connect_timeout_ms", "200")
        .load().count())
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(messageChain(e).contains("Failed to connect to NATS: Timeout"), messageChain(e))
    assert(elapsedMs >= 200L, s"timed out too early: ${elapsedMs}ms")
  }

  test("E5 sequence range and time range are mutually exclusive") {
    val e = intercept[IllegalArgumentException](
      spark.read.format("nats_scan").option("url", url)
        .option("stream", "telemetry")
        .option("start_seq", "10")
        .option("start_time", "2025-11-12T00:00:00Z").load())
    assert(e.getMessage.contains("Cannot specify both sequence range"))
  }

  test("unregistered address fails fast with no-server (vs blackhole timeout)") {
    val e = intercept[Throwable](
      spark.read.format("nats_scan").option("url", "nats://nowhere:4222")
        .option("stream", "telemetry").load().count())
    assert(messageChain(e).contains("No server available for connection"), messageChain(e))
  }

  // --- transport topology properties ---

  test("E7 wrong/missing token against an auth server → Authorization Violation") {
    val authUrl = "nats://auth-server:4222"
    val s = FakeJetStream.listen(authUrl)
    s.publish("secure", 1L, "secure.a", 1700000000000000000L, "x".getBytes)
    FakeJetStream.requireToken(authUrl, "s3cret")
    // no token
    val eNone = intercept[Exception] {
      spark.read.format("nats_scan").option("url", authUrl)
        .option("stream", "secure").load().count()
    }
    assert(messageChain(eNone).contains("Authorization Violation"),
      messageChain(eNone))
    val eWrong = intercept[Exception] {
      spark.read.format("nats_scan").option("url", "nats://nope@auth-server:4222")
        .option("stream", "secure").load().count()
    }
    assert(messageChain(eWrong).contains("Authorization Violation"),
      messageChain(eWrong))
    // correct token connects and scans
    val n = spark.read.format("nats_scan")
      .option("url", "nats://s3cret@auth-server:4222")
      .option("stream", "secure").load().count()
    assert(n == 1L)
  }

  test("E9 JWT/creds + TLS surface: negatives carry the server's status texts") {
    val aurl = "nats://auth-negative-spec:4222"
    val srv = FakeJetStream.listen(aurl)
    srv.publish("s", 1L, "s.x", 1000000000L, "p".getBytes)
    FakeJetStream.requireTls(aurl)
    FakeJetStream.requireCreds(aurl, "want-jwt")

    def credsFile(jwt: String): String = {
      val f = java.nio.file.Files.createTempFile("graft_spec", ".creds")
      java.nio.file.Files.write(f,
        s"""-----BEGIN NATS USER JWT-----
           |$jwt
           |------END NATS USER JWT------
           |-----BEGIN USER NKEY SEED-----
           |SUASPECSEEDSPECSEEDSPECSEEDSPECSEED
           |------END USER NKEY SEED------
           |""".stripMargin.getBytes("UTF-8"))
      f.toFile.deleteOnExit()
      f.toString
    }

    def scan(opts: (String, String)*) = {
      val b = spark.read.format("nats_scan").option("url", aurl)
        .option("stream", "s")
      opts.foldLeft(b) { case (r, (k, v)) => r.option(k, v) }.load()
        .select("seq").collect()
    }

    // plaintext dial against a TLS-only server → handshake failure
    val e1 = intercept[Exception](scan("user_creds" -> credsFile("want-jwt")))
    assert(messageChain(e1).contains("TLS handshake failure"), messageChain(e1))
    // TLS but wrong identity → the server's Authorization Violation
    val e2 = intercept[Exception](
      scan("user_creds" -> credsFile("wrong-jwt"), "tls" -> "true"))
    assert(messageChain(e2).contains("Authorization Violation"), messageChain(e2))
    // TLS + matching creds → rows flow
    assert(scan("user_creds" -> credsFile("want-jwt"), "tls" -> "true")
      .length == 1)

    // NKey-required server: seed must match; wrong seed is a violation
    val nurl = "nats://nkey-spec:4222"
    val nsrv = FakeJetStream.listen(nurl)
    nsrv.publish("s", 1L, "s.x", 1000000000L, "p".getBytes)
    FakeJetStream.requireNkey(nurl, "SUAREALSEEDREALSEEDREALSEED")
    def nscan(opts: (String, String)*) = {
      val b = spark.read.format("nats_scan").option("url", nurl)
        .option("stream", "s")
      opts.foldLeft(b) { case (r, (k, v)) => r.option(k, v) }.load()
        .select("seq").collect()
    }
    val e3 = intercept[Exception](
      nscan("nkey_seed" -> "SUAWRONGSEEDWRONGSEEDWRONGSEED"))
    assert(messageChain(e3).contains("Authorization Violation"), messageChain(e3))
    assert(nscan("nkey_seed" -> "SUAREALSEEDREALSEEDREALSEED").length == 1)
  }

  test("E10 credential options validate at BIND, before any dial") {
    def load(opts: (String, String)*) = {
      val b = spark.read.format("nats_scan").option("url", url)
        .option("stream", "telemetry")
      opts.foldLeft(b) { case (r, (k, v)) => r.option(k, v) }.load()
    }
    // user_creds + nkey_seed are mutually exclusive
    val e1 = intercept[Exception](
      load("user_creds" -> "/nope.creds", "nkey_seed" -> "SUAX"))
    assert(messageChain(e1).contains("mutually exclusive"), messageChain(e1))
    // nkey_seed must be a USER seed
    val e2 = intercept[Exception](load("nkey_seed" -> "SAACCOUNTSEED"))
    assert(messageChain(e2).contains("USER seed"), messageChain(e2))
    // tls must be boolean
    val e3 = intercept[Exception](load("tls" -> "yes"))
    assert(messageChain(e3).contains("tls must be"), messageChain(e3))
    // creds file must exist
    val e4 = intercept[Exception](load("user_creds" -> "/no/such/file.creds"))
    assert(messageChain(e4).contains("not found"), messageChain(e4))
    // creds file must carry both blocks
    val broken = java.nio.file.Files.createTempFile("graft_spec_bad", ".creds")
    java.nio.file.Files.write(broken, "garbage".getBytes("UTF-8"))
    broken.toFile.deleteOnExit()
    val e5 = intercept[Exception](load("user_creds" -> broken.toString))
    assert(messageChain(e5).contains("block"), messageChain(e5))
    // credentials make no sense against the parquet store
    val e6 = intercept[Exception] {
      spark.read.format("nats_scan").option("dir", "/root/testdata/sf0.001")
        .option("tls", "true").load()
    }
    assert(messageChain(e6).contains("require 'url'"), messageChain(e6))
  }

  test("E8 transient wire faults mid-slice: reader retries with backoff, scan completes") {
    try {
      server.injectFaults(2) // next two data RPCs drop the connection
      val n = scanRows(read("telemetry"))
      assert(n == 90L) // full result despite the faults — retried, not skipped
      // a fault burst past the retry budget fails the task (Spark would
      // re-run the slice; locally the failure surfaces)
      server.injectFaults(1000)
      val e = intercept[Exception](scanRows(read("telemetry")))
      assert(messageChain(e).contains("Connection Closed"), messageChain(e))
    } finally server.injectFaults(0) // never leak armed faults to later tests
    assert(scanRows(read("telemetry")) == 90L)
  }

  test("consumer-mode pull: cursor parity with fetch mode, batched RPCs, gaps skipped") {
    val viaFetch = read("telemetry").select("seq", "subject", "ts_nats")
      .collect().map(_.toString).sorted
    val viaConsumer = read("telemetry", Map("fetch_mode" -> "consumer"))
      .select("seq", "subject", "ts_nats").collect().map(_.toString).sorted
    assert(viaConsumer.sameElements(viaFetch))
    // cursor survives transient faults too (position does not advance on a
    // fault, so the retry re-delivers from the same place)
    server.injectFaults(2)
    try assert(scanRows(read("telemetry", Map("fetch_mode" -> "consumer"))) == 90L)
    finally server.injectFaults(0)
    // direct cursor use: batched delivery in seq order, gaps absent
    val t = Transport.connect(url)
    try {
      val c = t.consumer("telemetry", 1L)
      val first = c.next(7)
      assert(first.map(_.seq).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))
      val second = c.next(7)
      assert(second.head.seq == 8L)
      assert(!second.map(_.seq).contains(10L)) // gap skipped
      c.close()
    } finally t.close()
  }

  test("aggregate pushdown: count/min/max seq answered by streamInfo, zero fetches") {
    val agg = read("telemetry")
      .agg(count(lit(1)).as("n"), min("seq").as("lo"), max("seq").as("hi"))
    val p = agg.queryExecution.executedPlan.toString
    assert(p.contains("STATS-ONLY"), p)
    val r = agg.collect()(0)
    // 90 live messages (gaps excluded from the server count); seq 100 is
    // itself a deleted gap, so the server's LastSeq-of-live is 99 — the
    // same answer a full row scan's max(seq) returns
    assert(r.getLong(0) == 90L && r.getLong(1) == 1L && r.getLong(2) == 99L,
      r.toString)
    // ts aggregates are NOT answerable from streamInfo → real scan
    val tsAgg = read("telemetry").agg(max("ts_nats"))
    assert(!tsAgg.queryExecution.executedPlan.toString.contains("STATS-ONLY"))
    tsAgg.collect()
  }

  test("timestamp resolution is a remote binary search: O(log n) probes, gap-safe") {
    val t = Transport.connect(url).asInstanceOf[FakeTransport]
    val before = t.rpcCount
    // ts of seq 57 is 1700000000 + 57s; ask for exactly it → expect seq 57
    val got = graft.sources.NatsTransportScan.resolveTimestamp(
      t, "telemetry", 1700000000000000000L + 57L * 1000000000L, 1L, 100L)
    assert(got.contains(57L))
    val probes = t.rpcCount - before
    assert(probes <= 16L, s"binary search used $probes probes for n=100") // 2*log2(100)+buffer
    // REFERENCE QUIRK, pinned: target ts(30); 30 is deleted AND the first
    // midpoint (50) is deleted too — the reference's NOT_FOUND step
    // (left = mid + 1, nats_scan.cpp:568-572) discards the whole left half
    // and resolves to 51, not the true first-at-or-after (31)
    val refParity = graft.sources.NatsTransportScan.resolveTimestamp(
      t, "telemetry", 1700000000000000000L + 30L * 1000000000L, 1L, 100L)
    assert(refParity.contains(51L), s"got $refParity")
    // the gap-safe variant (used for Catalyst-pushed ts bounds, where
    // pruning must not drop matching rows) finds the true answer
    val gapSafe = graft.sources.NatsTransportScan.resolveTimestampGapSafe(
      t, "telemetry", 1700000000000000000L + 30L * 1000000000L, 1L, 100L)
    assert(gapSafe.contains(31L), s"got $gapSafe")
    // past the last message → None (reference: done=true, zero rows)
    assert(graft.sources.NatsTransportScan.resolveTimestamp(
      t, "telemetry", Long.MaxValue, 1L, 100L).isEmpty)
    assert(graft.sources.NatsTransportScan.resolveTimestampGapSafe(
      t, "telemetry", Long.MaxValue, 1L, 100L).isEmpty)
  }

  test("bounded scan fetches in batches, not one RPC per message") {
    val t = Transport.connect(url).asInstanceOf[FakeTransport]
    val before = t.rpcCount
    val msgs = t.fetch("telemetry", 1L, 100L, 2048)
    assert(msgs.length == 90)
    assert(t.rpcCount - before == 1L, "one batched fetch, not per-message gets")
    // messages arrive in seq order with gaps absent
    assert(msgs.map(_.seq).toSeq == (1L to 100L).filterNot(_ % 10 == 0))
  }

  test("seq predicates prune slice partitions") {
    val df = read("telemetry").filter(col("seq") >= 33L && col("seq") <= 48L)
    val parts = df.rdd.getNumPartitions
    // slice_width=16 over [33,48] → exactly 1 slice; unpruned would be ~7
    assert(parts == 1, s"expected 1 slice partition, got $parts")
    assert(df.count() == 15L) // 16 seqs minus deleted 40
  }

  test("planning dials once: statistics and slice planning share one streamInfo") {
    server // force fixture
    val schema = read("telemetry").schema
    val scan = new graft.sources.NatsTransportScan(url, "telemetry", schema,
      seqLo = 1L, seqHi = Long.MaxValue,
      tsLoNs = Long.MinValue, tsHiNs = Long.MaxValue,
      startTimeNs = None, endTimeNs = None,
      subjectContains = List("dev1"), subjectPrefixes = Nil,
      maxPerBatch = 512L, sliceWidth = 16L,
      connectTimeoutMs = Transport.DefaultTimeoutMs)
    val before = server.connectCount
    scan.estimateStatistics()
    scan.estimateStatistics() // repeated stats asks (optimizer/AQE) are free
    val parts = scan.planInputPartitions()
    assert(parts.nonEmpty)
    assert(server.connectCount - before <= 1L,
      s"stats + slice planning must share ≤1 dial (0 when the pool is " +
        s"warm), used ${server.connectCount - before}")
  }

  test("end-to-end dial budget: pooled readers + pooled planning ≤ 2 dials/query") {
    server // force fixture
    val df = read("telemetry")
      .filter(col("seq") >= 1L && col("seq") <= 64L &&
        col("subject").contains("dev"))
      .select("seq", "subject")
    val parts = df.rdd.getNumPartitions
    assert(parts >= 3, s"want a multi-slice scan, got $parts") // slice_width=16
    val before = server.connectCount
    assert(df.collect().nonEmpty)
    val dials = server.connectCount - before
    // planning ≤1 (pooled, shared streamInfo) + readers ≤1 (one pooled
    // connection per executor JVM — all slice tasks share it)
    assert(dials <= 2L,
      s"query used $dials dials for $parts slices; readers must share the " +
        "executor pool and planning must not re-dial per ask")
    // fully warm second query: zero new dials end to end
    val before2 = server.connectCount
    assert(read("telemetry").select("seq").collect().length == 90)
    assert(server.connectCount - before2 == 0L,
      "warm pool: a repeat query must not dial at all")
  }

  test("LIVE TAIL: messages published mid-query appear in later micro-batches") {
    import org.apache.spark.sql.streaming.Trigger
    val tailUrl = "nats://tail-server:4222"
    val srv = FakeJetStream.listen(tailUrl)
    (1L to 40L).foreach { seq =>
      srv.publish("tail", seq, s"tail.a", 1700000000000000000L + seq * 1000000L,
        s"m$seq".getBytes)
    }
    val q = spark.readStream.format("nats_scan")
      .option("url", tailUrl).option("stream", "tail")
      .option("max_msgs_per_batch", "25").option("slice_width", "25")
      .load()
      .writeStream.format("memory").queryName("livetail")
      .trigger(Trigger.ProcessingTime("300 milliseconds"))
      .start()
    try {
      def seen: Long =
        spark.sql("SELECT count(*) FROM livetail").head().getLong(0)
      val d1 = System.currentTimeMillis() + 60000
      while (seen < 40L && System.currentTimeMillis() < d1) Thread.sleep(200)
      assert(seen == 40L, s"initial backlog not drained: $seen")
      // publish NEW messages while the query is running — the live tail
      (41L to 60L).foreach { seq =>
        srv.publish("tail", seq, s"tail.b",
          1700000000000000000L + seq * 1000000L, s"m$seq".getBytes)
      }
      val d2 = System.currentTimeMillis() + 60000
      while (seen < 60L && System.currentTimeMillis() < d2) Thread.sleep(200)
      assert(seen == 60L, s"live-published messages not tailed: $seen")
      val seqs = spark.sql("SELECT seq FROM livetail").collect()
        .map(_.getLong(0)).sorted
      assert(seqs.sameElements(1L to 60L), "exactly-once, in-order coverage")
    } finally { q.stop(); q.awaitTermination(30000) }
  }

  test("64-slice scan: planning is O(1) RPCs, ts probes O(log n), fetches batched") {
    val surl = "nats://slice-scale-spec:4222"
    val srv = FakeJetStream.listen(surl)
    val n = 6400L
    (1L to n).foreach { seq =>
      srv.publish("wide", seq, s"wide.${seq % 5}",
        1700000000000000000L + seq * 1000000L, s"m$seq".getBytes)
    }
    def scan() = spark.read.format("nats_scan")
      .option("url", surl).option("stream", "wide")
      .option("slice_width", "100").load() // 6400/100 = 64 slices
    // planning at 64 slices costs ONE streamInfo RPC — slice arithmetic
    // never enumerates messages
    val p0 = srv.rpcCountTotal
    assert(scan().select("seq").rdd.getNumPartitions == 64)
    assert(srv.rpcCountTotal - p0 <= 1L,
      s"planning used ${srv.rpcCountTotal - p0} RPCs at 64 slices; must be ≤1")
    // timestamp bound adds only the O(log n) binary-search probes
    val p1 = srv.rpcCountTotal
    scan().filter(col("ts_nats") >=
        lit(java.sql.Timestamp.valueOf("2023-11-15 01:00:00")))
      .select("seq").rdd.getNumPartitions
    val probes = srv.rpcCountTotal - p1
    val logN = 64 - java.lang.Long.numberOfLeadingZeros(n)
    assert(probes <= 2L * logN + 2L,
      s"ts planning used $probes RPCs; expected ≤ ${2 * logN + 2} (O(log n))")
    // execution: batched fetches, ≤2 RPCs per slice (one data batch under
    // the 2048 cap + one tail check), on ≤1 pooled dial
    val r0 = srv.rpcCountTotal
    assert(scan().select("seq").collect().length == n)
    val execRpcs = srv.rpcCountTotal - r0
    assert(execRpcs <= 2L * 64 + 2L,
      s"execution used $execRpcs RPCs for 64 slices; fetches must be batched")
  }

  test("LIVE consumer-mode kill-restart: checkpointed seq offsets resume exactly-once") {
    import org.apache.spark.sql.streaming.Trigger
    val curl = "nats://restart-spec:4222"
    val srv = FakeJetStream.listen(curl)
    (1L to 1000L).foreach { seq =>
      srv.publish("r", seq, s"r.${seq % 7}",
        1700000000000000000L + seq * 1000000L, s"m$seq".getBytes)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_restart_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_restart_ckpt").toString
    def start(trigger: Trigger) = spark.readStream.format("nats_scan")
      .option("url", curl).option("stream", "r")
      .option("fetch_mode", "consumer") // per-slice ordered-consumer cursors
      .option("max_msgs_per_batch", "150").option("slice_width", "64")
      .load()
      .writeStream.format("nats_scan")
      .option("dir", tmp).option("checkpointLocation", ckpt)
      .trigger(trigger).start()
    // phase 1: kill after the first committed batch — the checkpoint holds a
    // mid-stream seq offset, possibly with an epoch in flight
    val q1 = start(Trigger.ProcessingTime("1 second"))
    val deadline = System.currentTimeMillis() + 60000
    while (q1.recentProgress.count(_.numInputRows > 0) < 1 &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    q1.stop()
    q1.awaitTermination(60000)
    val partial = spark.read.format("nats_scan").option("dir", tmp).load()
      .count()
    assert(partial > 0L && partial < 1000L,
      s"expected a partial sink after the crash, got $partial")
    // phase 2: SAME checkpoint → the stream resumes AFTER the recorded seq
    // (the durable-consumer contract: re-request from last acked position);
    // the sink's idempotent epoch re-commit absorbs the replayed epoch
    val q2 = start(Trigger.AvailableNow())
    q2.awaitTermination(120000)
    val back = spark.read.format("nats_scan").option("dir", tmp).load()
    assert(back.count() == 1000L, "exactly-once after restart: total count")
    assert(back.select("seq").distinct().count() == 1000L,
      "exactly-once after restart: no seq delivered twice")
    val bounds = back.agg(min("seq"), max("seq")).head
    assert(bounds.getLong(0) == 1L && bounds.getLong(1) == 1000L)
  }

  test("durable consumer: ack-based handoff across jobs with NO shared checkpoint") {
    import org.apache.spark.sql.streaming.Trigger
    val durl = "nats://durable-spec:4222"
    val srv = FakeJetStream.listen(durl)
    (1L to 600L).foreach { seq =>
      srv.publish("etl", seq, s"etl.${seq % 3}",
        1700000000000000000L + seq * 1000000L, s"m$seq".getBytes)
    }
    def job(name: String, trigger: Trigger) = {
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft_durable_$name").toString
      spark.readStream.format("nats_scan")
        .option("url", durl).option("stream", "etl")
        .option("durable", "grp")
        .option("max_msgs_per_batch", "100").option("slice_width", "64")
        .load()
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt).trigger(trigger).start()
    }
    // job 1: commit a couple of batches, then die mid-stream
    val q1 = job("durable_job1", Trigger.ProcessingTime("300 milliseconds"))
    val deadline = System.currentTimeMillis() + 60000
    while (q1.recentProgress.count(_.numInputRows > 0) < 2 &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    q1.stop()
    q1.awaitTermination(60000)
    val t = Transport.connect(durl)
    val floor = t.ackFloor("etl", "grp")
    assert(floor > 0L && floor < 600L,
      s"expected a mid-stream ack floor after the crash, got $floor")
    // job 2: FRESH checkpoint, same durable → resumes AFTER the floor; no
    // Spark state is shared between the jobs, only the server's ack state
    val q2 = job("durable_job2", Trigger.AvailableNow())
    q2.awaitTermination(120000)
    val seqs2 = spark.sql("SELECT seq FROM durable_job2").collect()
      .map(_.getLong(0))
    assert(seqs2.min == floor + 1L,
      s"successor must resume after the ack floor $floor, started at ${seqs2.min}")
    assert(seqs2.max == 600L && seqs2.length == (600L - floor).toInt,
      "successor must drain exactly the unacked tail, no dupes, no loss")
    // Spark commits a batch's SOURCE offsets while constructing the next
    // batch, so at shutdown the ack floor lags the sink by at most one
    // batch — this IS the at-least-once window of the handoff (JetStream
    // AckAll semantics), pinned here rather than papered over
    val floor2 = t.ackFloor("etl", "grp")
    assert(floor2 >= 600L - 100L && floor2 <= 600L,
      s"floor must land within one batch of the end, got $floor2")
    if (floor2 < 600L) {
      // a THIRD job re-reads exactly the unacked tail: duplicated into the
      // new sink (at-least-once), never lost
      val q3 = job("durable_job3", Trigger.AvailableNow())
      q3.awaitTermination(120000)
      val seqs3 = spark.sql("SELECT seq FROM durable_job3").collect()
        .map(_.getLong(0))
      assert(seqs3.min == floor2 + 1L && seqs3.max == 600L &&
        seqs3.length == (600L - floor2).toInt,
        s"third job must re-read the unacked tail ${floor2 + 1}..600, got " +
          s"${seqs3.min}..${seqs3.max}")
    }
    // stale lower acks never regress the floor; durables are independent
    val floorBefore = t.ackFloor("etl", "grp")
    t.ackAll("etl", "grp", 5L)
    assert(t.ackFloor("etl", "grp") == floorBefore, "AckAll floors are monotonic")
    assert(t.ackFloor("etl", "other-group") == 0L)
  }

  test("PUBLISH direction: streaming sink → JetStream with Msg-Id dedup is idempotent") {
    import org.apache.spark.sql.streaming.Trigger
    val pubUrl = "nats://publish-server:4222"
    FakeJetStream.listen(pubUrl).addStream("published")
    val dir = "/root/testdata/sf0.001"
    def run(): Unit = {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_pub_ckpt").toString
      val q = spark.readStream.format("nats_scan").option("dir", dir)
        .option("max_msgs_per_batch", "300").load()
        .writeStream.format("nats_scan")
        .option("url", pubUrl).option("stream", "published")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    def published = spark.read.format("nats_scan")
      .option("url", pubUrl).option("stream", "published").load()
    run()
    assert(published.count() == 1000L)
    // REPUBLISH the whole job (fresh checkpoint): deterministic batch
    // boundaries give identical epoch/partition/row msgIds, so the server's
    // dedup window no-ops every publish — exactly-once across full reruns,
    // with zero sink-side state
    run()
    assert(published.count() == 1000L, "replayed publishes must dedup")
    assert(published.select("seq").distinct().count() == 1000L)
    // a raw duplicate msgId is a no-op ack too
    val t = Transport.connect(pubUrl)
    t.publish("published", "dup.subject", 1L, "dup".getBytes, "graft-0-0-0")
    assert(published.count() == 1000L)
    // payload content survived the publish round trip
    val a = spark.read.format("nats_scan").option("dir", dir).load()
      .agg(sum(expr("octet_length(payload)"))).head.getLong(0)
    val b = published.agg(sum(expr("octet_length(payload)"))).head.getLong(0)
    assert(a == b, s"payload bytes differ: $a vs $b")
  }

  test("transport scan ≡ parquet scan on the shared fixture (pruning equivalence)") {
    val dir = "/root/testdata/sf0.001"
    val u = graft.queries.TransportQueries.fixtureUrl(spark, dir)
    for ((lo, hi) <- Seq((1L, 500L), (101L, 600L), (950L, 1200L))) {
      val viaT = spark.read.format("nats_scan").option("url", u)
        .option("slice_width", "128").load()
        .filter(col("seq") >= lo && col("seq") <= hi)
        .select("seq", "subject").orderBy("seq").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val viaP = graft.nats.NatsScan.scanDir(spark, dir)
        .filter(col("seq") >= lo && col("seq") <= hi)
        .select("seq", "subject").orderBy("seq").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(viaT.sameElements(viaP), s"range [$lo,$hi] disagrees")
    }
  }

  // --- named connection profiles (GUIDE.md:494 roadmap) ---

  test("connection profile: scan via option(profile) = scan via inline url") {
    server
    graft.transport.ConnectionProfiles.register("spec",
      Map("url" -> url, "connect_timeout_ms" -> "2000"))
    try {
      val viaProfile = spark.read.format("nats_scan")
        .option("profile", "spec").option("stream", "telemetry")
        .option("slice_width", "16").load()
      assert(scanRows(viaProfile) == 90L)
    } finally graft.transport.ConnectionProfiles.remove("spec")
  }

  test("connection profile: explicit scan options override profile defaults") {
    FakeJetStream.blackhole("nats://profile-blackhole:4222")
    graft.transport.ConnectionProfiles.register("overridable",
      Map("url" -> "nats://profile-blackhole:4222",
        "connect_timeout_ms" -> "60000"))
    try {
      // explicit url wins over the profile's blackhole → the scan works
      server
      val df = spark.read.format("nats_scan")
        .option("profile", "overridable").option("url", url)
        .option("stream", "telemetry").option("slice_width", "16").load()
      assert(scanRows(df) == 90L)
      // profile's url kept, explicit SHORT timeout wins → fast fail
      val t0 = System.nanoTime()
      val e = intercept[Exception] {
        spark.read.format("nats_scan")
          .option("profile", "overridable")
          .option("connect_timeout_ms", "300")
          .option("stream", "telemetry").load().collect()
      }
      assert((System.nanoTime() - t0) / 1e9 < 30.0)
      assert(messageChain(e).toLowerCase.contains("time"))
    } finally graft.transport.ConnectionProfiles.remove("overridable")
  }

  test("connection profile negatives: unknown name lists registered; " +
    "non-connection keys rejected at registration") {
    graft.transport.ConnectionProfiles.register("listed",
      Map("url" -> url))
    try {
      val e = intercept[Exception] {
        spark.read.format("nats_scan").option("profile", "nope")
          .option("stream", "telemetry").load()
      }
      assert(messageChain(e).contains("unknown connection profile 'nope'"))
      assert(messageChain(e).contains("listed"))
    } finally graft.transport.ConnectionProfiles.remove("listed")
    val bad = intercept[IllegalArgumentException] {
      graft.transport.ConnectionProfiles.register("bad",
        Map("url" -> url, "start_seq" -> "5"))
    }
    assert(bad.getMessage.contains("start_seq"))
    val noUrl = intercept[IllegalArgumentException] {
      graft.transport.ConnectionProfiles.register("nourl",
        Map("tls" -> "true"))
    }
    assert(noUrl.getMessage.contains("url"))
  }

  // --- NATS wildcard subject filters + last_by_subject (KV) ---

  test("SubjectFilter: token-wise wildcard semantics and validation") {
    import graft.transport.SubjectFilter
    val m = SubjectFilter.matcher("events.*.7")
    assert(m.matches("events.click.7"))
    assert(!m.matches("events.click.70")) // '*' ≠ substring
    assert(!m.matches("events.click.extra.7")) // '*' is exactly one token
    assert(!m.matches("events.7"))
    val g = SubjectFilter.matcher("events.purchase.>")
    assert(g.matches("events.purchase.1"))
    assert(g.matches("events.purchase.a.b")) // '>' spans tokens
    assert(!g.matches("events.purchase")) // '>' needs ≥1 more token
    assert(SubjectFilter.matcher(">").matches("anything.at.all"))
    assert(SubjectFilter.literalPrefix("events.purchase.*") == "events.purchase.")
    assert(SubjectFilter.literalPrefix("events.*.7") == "events.")
    assert(SubjectFilter.literalPrefix("*.x") == "")
    // a wildcard-free pattern is its own prefix VERBATIM — a trailing dot
    // would exclude the only matching subject (round-8 review regression)
    assert(SubjectFilter.literalPrefix("events.purchase.7") == "events.purchase.7")
    assert(SubjectFilter.toRegex("events.*.7") == "^\\Qevents\\E\\.[^.]+\\.\\Q7\\E$")
    // '>' must reject malformed subjects with empty tokens exactly like
    // Matcher.matches does (round-8 advisor: a bare '.+' accepted 'a.b..c')
    val gtRe = SubjectFilter.toRegex("a.>").r
    assert(gtRe.matches("a.b") && gtRe.matches("a.b.c"))
    assert(!gtRe.matches("a.b..c") && !gtRe.matches("a.") && !gtRe.matches("a"))
    assert(!SubjectFilter.matcher("a.>").matches("a.b..c"))
    for (bad <- Seq("a..b", "a.>.b", "ev*nts.x", "", ".a"))
      assertThrows[RuntimeException](SubjectFilter.validate(bad))
    // the shard hash is a CROSS-BINDING contract (a live client-side
    // sharding must land subjects in the same buckets as the fake server):
    // pin concrete FNV-1a values so any accidental change fails loudly
    assert(SubjectFilter.shard("events.click.7", 16) ==
      SubjectFilter.shard("events.click.7", 16))
    val pinned = Seq("events.click.7", "telemetry.dev0", "k.a")
      .map(s => SubjectFilter.shard(s, 16))
    assert(pinned == Seq(5, 3, 7), s"FNV-1a shard values moved: $pinned")
  }

  test("wildcard subject_filter: fetch and consumer modes agree, exact-token match") {
    // dev0 messages are seqs ≡ 0 (mod 5); deleted multiples of 10 leave the
    // odd multiples of 5 → exactly 10 survivors
    val fetch = read("telemetry", Map("subject_filter" -> "telemetry.dev0"))
      .select("seq").collect().map(_.getLong(0)).sorted
    val cons = read("telemetry", Map("subject_filter" -> "telemetry.dev0",
        "fetch_mode" -> "consumer"))
      .select("seq").collect().map(_.getLong(0)).sorted
    assert(fetch.toSeq == (5L to 95L by 10L).toSeq)
    assert(cons.toSeq == fetch.toSeq)
    // a '*' pattern spanning all devices matches everything (2-token subjects)
    assert(scanRows(read("telemetry", Map("subject_filter" -> "telemetry.*"))) == 90L)
    // bind-time validation, before any dial
    val e = intercept[Exception] {
      spark.read.format("nats_scan").option("url", url)
        .option("stream", "telemetry").option("subject_filter", "a.>.b").load()
    }
    assert(messageChain(e).contains("'>' must be the final token"))
  }

  test("consumer filter_subject filters SERVER-side: only matches are delivered") {
    val t = Transport.connect(url)
    val c = t.consumer("telemetry", 1L, Some("telemetry.dev1"))
    val page = c.next(1000)
    // dev1 = seqs ≡ 1 (mod 5), none are multiples of 10 → all 20 survive
    assert(page.length == 20)
    assert(page.forall(_.subject == "telemetry.dev1"))
    assert(page.map(_.seq).toSeq == (1L to 96L by 5L).toSeq)
    assert(c.next(1000).isEmpty) // log exhausted
    // filling a page mid-chunk must not skip later matches
    val c2 = t.consumer("telemetry", 1L, Some("telemetry.dev1"))
    val first = c2.next(3)
    val rest = c2.next(1000)
    assert((first ++ rest).map(_.seq).toSeq == (1L to 96L by 5L).toSeq)
  }

  test("last_by_subject: one CURRENT row per subject, O(keys) RPC volume") {
    val df = read("telemetry", Map("last_by_subject" -> "true",
      "kv_buckets" -> "4"))
    val got = df.select("subject", "seq").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // per-device last surviving seq (100 is deleted → dev0 falls back to 95)
    assert(got == Map("telemetry.dev0" -> 95L, "telemetry.dev1" -> 96L,
      "telemetry.dev2" -> 97L, "telemetry.dev3" -> 98L,
      "telemetry.dev4" -> 99L))
    // RPC budget: 1 planning streamInfo + ≤ (1 page + 1 terminal short-page
    // check) per bucket — NEVER proportional to the 90 stored messages
    val before = server.rpcCountTotal
    assert(df.select("subject").collect().length == 5)
    val delta = server.rpcCountTotal - before
    assert(delta <= 1 + 4 * 2, s"KV scan cost $delta RPCs")
  }

  test("queue group: members split delivery exactly once, O(msgs) volume") {
    val t = Transport.connect(url)
    val before = server.rpcCountTotal
    // three members drain the 90 surviving telemetry messages in 40-claims
    val members = Seq("m0", "m1", "m2")
    var delivered = Map.empty[String, Seq[Long]]
    var spins = 0
    var totalClaims = 0
    while (delivered.values.map(_.size).sum < 90 && spins < 50) {
      members.foreach { m =>
        val got = t.groupNext("telemetry", "grp_split", m, 100L, 40, 30000L, None)
        if (got.nonEmpty) {
          totalClaims += 1
          delivered += m -> (delivered.getOrElse(m, Seq.empty) ++ got.map(_.seq))
          t.groupAck("telemetry", "grp_split", got.map(_.seq))
        }
      }
      spins += 1
    }
    val all = delivered.values.flatten.toSeq
    // exactly-once union: every surviving seq delivered to exactly ONE member
    assert(all.sorted == (1L to 100L).filterNot(_ % 10L == 0L).sorted)
    assert(all.distinct.length == all.length, "a message was double-delivered")
    // every member did real work (server balanced, not single-member)
    assert(delivered.keySet == members.toSet)
    // drained: nothing deliverable, nothing pending
    assert(t.groupNext("telemetry", "grp_split", "m0", 100L, 40, 30000L, None).isEmpty)
    assert(t.groupPending("telemetry", "grp_split") == 0L)
    // wire volume: total MESSAGES delivered across the fleet is 90 (each
    // once) and claim RPCs ∝ ceil(msgs/batch) = 3 — never members × msgs
    // (the continuous_shards trade measured at 8.3 rpc/kmsg for 8 shards)
    assert(totalClaims == 3, s"claims=$totalClaims (expected ceil(90/40)=3)")
    val delta = server.rpcCountTotal - before
    assert(delta <= 3L + 3L + totalClaims * 2L + 2L, s"group drain cost $delta RPCs")
  }

  test("queue group: a dead member's unacked claims redeliver after ack-wait") {
    val t = Transport.connect(url)
    // "dying" member claims 25 messages under a 120 ms lease and never acks
    val doomed = t.groupNext("telemetry", "grp_death", "dead", 100L, 25, 120L, None)
    assert(doomed.length == 25)
    assert(t.groupPending("telemetry", "grp_death") == 25L)
    // before the lease expires the survivor gets only FRESH messages
    val fresh = t.groupNext("telemetry", "grp_death", "alive", 100L, 2048, 30000L, None)
    assert(fresh.map(_.seq).intersect(doomed.map(_.seq)).isEmpty)
    t.groupAck("telemetry", "grp_death", fresh.map(_.seq))
    Thread.sleep(150L) // the dead member's lease expires
    // the survivor now receives the REDELIVERY of exactly the dead claims
    val redelivered = t.groupNext("telemetry", "grp_death", "alive", 100L, 2048, 30000L, None)
    assert(redelivered.map(_.seq).sorted.toSeq == doomed.map(_.seq).sorted.toSeq)
    t.groupAck("telemetry", "grp_death", redelivered.map(_.seq))
    assert(t.groupNext("telemetry", "grp_death", "alive", 100L, 2048, 30000L, None).isEmpty)
    assert(t.groupPending("telemetry", "grp_death") == 0L)
    // union across both members is the full stream exactly once
    assert((doomed ++ fresh).map(_.seq).sorted.toSeq ==
      (1L to 100L).filterNot(_ % 10L == 0L).sorted)
  }

  test("deliver_group Spark scan: member partitions, exactly-once union") {
    val df = read("telemetry", Map("deliver_group" -> "grp_spark",
      "group_members" -> "3"))
    assert(df.queryExecution.toRdd.getNumPartitions == 3)
    val seqs = df.select("seq").collect().map(_.getLong(0))
    assert(seqs.sorted.toSeq == (1L to 100L).filterNot(_ % 10L == 0L).sorted)
    // the group's cursor persists: a rerun under the SAME name delivers
    // nothing (queue semantics — drained is drained)
    val again = read("telemetry", Map("deliver_group" -> "grp_spark",
      "group_members" -> "3"))
    assert(again.select("seq").collect().isEmpty)
  }

  test("deliver_group post-settle re-attempt guard refuses loudly, scoped per stage") {
    import graft.sources.NatsTransportGroupReader
    val key = "7/3/telemetry/grp_guard/m1"
    // never settled → a (re-)attempt is welcome
    NatsTransportGroupReader.refuseIfSettledByPriorAttempt(key)
    NatsTransportGroupReader.recordSettled(key)
    // once a prior attempt SETTLED (acked) its claims, a re-run of the same
    // task cannot recover them — must fail loudly, not drain short
    val e = intercept[IllegalStateException](
      NatsTransportGroupReader.refuseIfSettledByPriorAttempt(key))
    assert(e.getMessage.contains("settled"), e.getMessage)
    // a later QUERY on the same group is a different stage → unaffected
    NatsTransportGroupReader.refuseIfSettledByPriorAttempt(
      "8/3/telemetry/grp_guard/m1")
  }

  test("queue group property: random claim/ack/death interleavings keep the " +
    "delivery contract (clean = exactly once; deaths = at least once)") {
    // deterministic pseudo-random schedules over a dedicated stream; each
    // trial drives 3 members through random batch sizes, random ack
    // skipping (member "death" = claims whose short lease must expire and
    // redeliver), interleaved claim order — then drains and checks:
    //   1. acked ∪ finally-drained == every stored message,
    //   2. no seq acked twice,
    //   3. pending == 0 at the end.
    val t = Transport.connect(url)
    val allSeqs = (1L to 100L).filterNot(_ % 10L == 0L).toSet
    for (trial <- 0 until 8) {
      val rnd = new scala.util.Random(trial * 7919L)
      val grp = s"grp_prop_$trial"
      val acked = scala.collection.mutable.Set[Long]()
      var abandoned = 0
      // phase 1: random interleaved claims, some abandoned (member death)
      for (_ <- 0 until 20) {
        val member = s"m${rnd.nextInt(3)}"
        val batch = 1 + rnd.nextInt(17)
        val got = t.groupNext("telemetry", grp, member, 100L, batch, 120L, None)
        if (got.nonEmpty) {
          if (rnd.nextInt(4) == 0) abandoned += got.length // dies, no ack
          else {
            // a seq can legitimately repeat here only if its first claim's
            // lease expired mid-phase (slow box) — at-least-once, not a bug
            got.map(_.seq).foreach(acked += _)
            t.groupAck("telemetry", grp, got.map(_.seq))
          }
        }
      }
      // phase 2: wait out every abandoned lease, then drain to empty
      Thread.sleep(150L)
      var spins = 0
      var done = false
      while (!done && spins < 200) {
        val got = t.groupNext("telemetry", grp, "drainer", 100L, 2048, 30000L, None)
        if (got.nonEmpty) {
          got.map(_.seq).foreach(acked += _) // redeliveries may repeat seqs
          t.groupAck("telemetry", grp, got.map(_.seq))
        } else if (t.groupPending("telemetry", grp) == 0L) done = true
        else Thread.sleep(20L)
        spins += 1
      }
      assert(done, s"trial $trial: drain never converged")
      assert(acked == allSeqs,
        s"trial $trial: union mismatch — missing ${allSeqs -- acked}, " +
          s"extra ${acked -- allSeqs}")
      assert(t.groupPending("telemetry", grp) == 0L)
    }
    t.close()
  }

  test("deliver_group bind validation: ranges, shards, members") {
    def bindErr(opts: Map[String, String]): String =
      messageChain(intercept[Exception](read("telemetry", opts)))
    assert(bindErr(Map("deliver_group" -> "g", "start_seq" -> "5"))
      .contains("incompatible with start_seq"))
    assert(bindErr(Map("deliver_group" -> "g", "continuous_shards" -> "4"))
      .contains("competing distribution strategies"))
    assert(bindErr(Map("deliver_group" -> "g", "last_by_subject" -> "true"))
      .contains("mutually exclusive"))
    assert(bindErr(Map("group_members" -> "4"))
      .contains("group_members requires deliver_group"))
    assert(bindErr(Map("deliver_group" -> "g", "group_members" -> "0"))
      .contains("group_members must be >= 1"))
    assert(bindErr(Map("deliver_group" -> "g", "durable" -> "d"))
      .contains("competing progress mechanisms"))
    // re-joining an existing group with a DIFFERENT filter is a config error
    val t = Transport.connect(url)
    t.groupNext("telemetry", "grp_filt", "m", 100L, 1, 30000L, None)
    val e = intercept[IllegalArgumentException](
      t.groupNext("telemetry", "grp_filt", "m", 100L, 1, 30000L, Some("a.*")))
    assert(e.getMessage.contains("cannot re-join with filter"))
  }

  test("kv_buckets < 1 is rejected at bind, not silently planned as empty") {
    for (bad <- Seq("0", "-3")) {
      val e = intercept[Exception] {
        read("telemetry", Map("last_by_subject" -> "true", "kv_buckets" -> bad))
      }
      assert(messageChain(e).contains("kv_buckets must be >= 1"),
        s"kv_buckets=$bad: ${messageChain(e)}")
    }
  }

  test("republish at an existing seq under a new subject leaves no phantom subject") {
    val repubUrl = "nats://republish-spec:4222"
    val s = FakeJetStream.listen(repubUrl)
    s.publish("st", 1L, "old.subj", 1L, "a".getBytes)
    s.publish("st", 1L, "new.subj", 2L, "b".getBytes) // replaces seq 1
    // the old subject's count dropped to 0 → its stats ENTRY must be gone,
    // matching the deleteMsg path (round-8 advisor: a phantom 0-count group
    // appeared in subjectStatsPage that the row scan never produces)
    val t = Transport.connect(repubUrl)
    val stats = (0 until 16).flatMap(b =>
      t.subjectStats("st", None, b, 16, None, 100))
    assert(stats.map(_.subject).sorted == Seq("new.subj"))
    assert(stats.head.count == 1L && stats.head.lastSeq == 1L)
  }

  test("last_by_subject composes with wildcard; range options are rejected at bind") {
    val one = read("telemetry", Map("last_by_subject" -> "true",
        "subject_filter" -> "telemetry.dev2"))
      .select("seq").collect().map(_.getLong(0)).toSeq
    assert(one == Seq(97L))
    val e = intercept[Exception] {
      spark.read.format("nats_scan").option("url", url)
        .option("stream", "telemetry").option("last_by_subject", "true")
        .option("start_seq", "5").load()
    }
    assert(messageChain(e).contains("incompatible"))
    val e2 = intercept[Exception] {
      spark.read.format("nats_scan").option("dir", "/tmp/nowhere")
        .option("last_by_subject", "true").load()
    }
    assert(messageChain(e2).contains("requires 'url'"))
  }

  test("streaming KV view (tail + max_by per subject) ≡ batch last_by_subject") {
    // the materialized-view alternative the KV snapshot's streaming error
    // points at: tail the stream, keep max_by(·, seq) per subject in a
    // complete-mode aggregate — its final state must equal the snapshot
    val kurl = "nats://kv-stream-parity:4222"
    val srv2 = FakeJetStream.listen(kurl)
    (1L to 60L).foreach(i =>
      srv2.publish("kvp", i, s"key.${i % 9}", i * 1000L,
        s"v$i".getBytes))
    val view = spark.readStream.format("nats_scan")
      .option("url", kurl).option("stream", "kvp")
      .option("slice_width", "16").load()
      .groupBy("subject")
      .agg(expr("max_by(seq, seq)").as("seq"),
        expr("max_by(payload, seq)").as("payload"))
    val q = view.writeStream.format("memory").queryName("kv_view")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000L)
    val streamed = spark.table("kv_view")
      .select("subject", "seq").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val snapshot = spark.read.format("nats_scan")
      .option("url", kurl).option("stream", "kvp")
      .option("last_by_subject", "true").load()
      .select("subject", "seq").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == snapshot && snapshot.size == 9)
  }

  test("GROUP BY subject pushdown: answered from the index, deletes counted, zero fetches") {
    val df = read("telemetry")
      .groupBy("subject")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.max("seq").as("last_seq"))
    assert(df.queryExecution.executedPlan.toString.contains("SUBJECT-STATS"))
    val r0 = server.rpcCountTotal
    val got = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val delta = server.rpcCountTotal - r0
    // dev0 lost its multiples of 10 (10 deleted) → 10 remain; others keep 20
    assert(got == Map(
      "telemetry.dev0" -> (10L, 95L), "telemetry.dev1" -> (20L, 96L),
      "telemetry.dev2" -> (20L, 97L), "telemetry.dev3" -> (20L, 98L),
      "telemetry.dev4" -> (20L, 99L)))
    // index pages only: ≤ (1 page + 1 terminal check) per default 16 buckets,
    // zero message fetches — never ceil(90/2048)-shaped
    assert(delta <= 32L, s"subject-stats scan cost $delta RPCs")
  }

  test("grouped pushdown retries transient wire faults like every reader") {
    server.injectFaults(2)
    try {
      val got = read("telemetry")
        .groupBy("subject")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .collect()
      assert(got.length == 5)
    } finally server.injectFaults(0)
  }

  test("grouped pushdown on a missing stream surfaces stream-not-found") {
    val e = intercept[Exception] {
      read("no_such_stream_stats")
        .groupBy("subject")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .collect()
    }
    assert(messageChain(e).contains("stream not found"))
  }

  test("restricted scans decline the stream-wide stats shortcut (regression)") {
    // a wildcard-filtered count must NOT be answered by streamInfo totals
    assert(read("telemetry", Map("subject_filter" -> "telemetry.dev0"))
      .count() == 10L)
    // a KV scan's count is its subject count, not the message count
    assert(read("telemetry", Map("last_by_subject" -> "true")).count() == 5L)
    // and grouped pushdown under the wildcard honors it server-side
    val wild = read("telemetry", Map("subject_filter" -> "telemetry.dev0"))
      .groupBy("subject")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wild == Map("telemetry.dev0" -> 10L))
  }

  test("per-subject index survives deleting a subject's current message") {
    val s2 = FakeJetStream.listen("nats://kv-delete-spec:4222")
    s2.publish("kvs", 1L, "k.a", 1L, "one".getBytes)
    s2.publish("kvs", 2L, "k.a", 2L, "two".getBytes)
    s2.publish("kvs", 3L, "k.a", 3L, "three".getBytes)
    s2.publish("kvs", 4L, "k.b", 4L, "other".getBytes)
    s2.deleteMsg("kvs", 3L) // k.a's CURRENT message
    val t = Transport.connect("nats://kv-delete-spec:4222")
    val lasts = (0 until 4).flatMap(b =>
      t.lastForSubjects("kvs", None, b, 4, None, 100))
      .map(m => m.subject -> m.seq).toMap
    assert(lasts == Map("k.a" -> 2L, "k.b" -> 4L)) // re-pointed, not dropped
    s2.deleteMsg("kvs", 2L); s2.deleteMsg("kvs", 1L)
    val gone = (0 until 4).flatMap(b =>
      t.lastForSubjects("kvs", None, b, 4, None, 100)).map(_.subject)
    assert(gone == Seq("k.b")) // fully deleted subject leaves the index
  }

  test("DSv2 custom scan metrics: fetch_rpcs / msgs_emitted / msgs_filtered " +
    "aggregate into the scan node") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def metricsOf(df: org.apache.spark.sql.DataFrame): Map[String, Long] = {
      df.collect()
      val scan = df.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec => b
      }.getOrElse(fail("no BatchScanExec in plan"))
      scan.metrics.map { case (k, m) => k -> m.value }
    }
    // full scan: 90 surviving messages over 7 slices of width 16 — one
    // fetch RPC per non-empty slice pass, nothing residual-filtered
    val full = metricsOf(read("telemetry").select("seq", "subject"))
    assert(full("msgs_emitted") == 90L, full.toString)
    assert(full("msgs_filtered") == 0L, full.toString)
    assert(full("fetch_rpcs") >= 7L && full("fetch_rpcs") <= 14L,
      s"expected ~1 RPC per slice, got ${full("fetch_rpcs")}")
    // residual subject filter: fetched rows that fail the re-check are
    // counted filtered, not silently dropped
    val filt = metricsOf(read("telemetry", Map("subject" -> "dev2"))
      .select("seq"))
    assert(filt("msgs_emitted") == 20L, filt.toString)
    assert(filt("msgs_filtered") == 70L, filt.toString)
    // KV index read: one page RPC per bucket shard, one row per subject
    val kv = metricsOf(read("telemetry", Map("last_by_subject" -> "true",
      "kv_buckets" -> "3")).select("subject"))
    assert(kv("msgs_emitted") == 5L, kv.toString)
    assert(kv("fetch_rpcs") == 3L, kv.toString)
    // queue-group drain: claim RPCs + the final empty claim per member
    val grp = metricsOf(read("telemetry", Map(
      "deliver_group" -> "metrics-g", "group_members" -> "2"))
      .select("seq"))
    assert(grp("msgs_emitted") == 90L, grp.toString)
    assert(grp("fetch_rpcs") >= 2L, grp.toString)
  }
}
