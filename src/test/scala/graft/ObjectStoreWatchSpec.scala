package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.transport._

/** `nats_obj` streaming WATCH: the bucket's meta changelog as seq-offset
  * micro-batches. The scale property under test is behavioral — chunk
  * messages are destroyed server-side and meta-only watches never notice
  * (wire volume O(changes), not O(bucket bytes)). */
class ObjectStoreWatchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val url = "nats://objwatch-spec:4222"
  private lazy val server: FakeJetStreamServer = FakeJetStream.listen(url)

  private def store(bucket: String, chunk: Int = 8,
                    retainHistory: Boolean = false) = {
    server
    new ObjectStore(Transport.connect(url), bucket, chunk, retainHistory)
  }

  private def watch(bucket: String, opts: Map[String, String] = Map.empty) = {
    server
    val b = spark.readStream.format("nats_obj").option("url", url)
      .option("bucket", bucket).option("watch", "true")
    opts.foldLeft(b) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  /** drain one AvailableNow pass into (a fresh epoch of) memory table `q` —
    * note the memory sink does NOT support checkpoint recovery, so resume
    * tests use [[drainToParquet]] instead */
  private def drain(df: org.apache.spark.sql.DataFrame, name: String,
                    ckpt: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(!q.isActive, s"watch query $name did not drain")
  }

  /** drain one AvailableNow pass into a DURABLE parquet sink — restartable
    * from `ckpt`, so a second call resumes where the first committed */
  private def drainToParquet(df: org.apache.spark.sql.DataFrame, out: String,
                             ckpt: String): Unit = {
    val q = df.writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(!q.isActive, "watch query did not drain")
  }

  test("changelog replay, checkpoint resume, tombstones, current-state view") {
    val os = store("wlog")
    (0 until 6).foreach(i => os.put(s"k$i", s"v$i-a".getBytes(UTF_8), 10L + i))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_watch_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_watch_out").toString

    // pass 1: full changelog from seq 1 — one meta per put
    def changelog = watch("wlog", Map("include_deletes" -> "true"))
      .select("seq", "name", "size", "mtime_ns", "deleted")
    drainToParquet(changelog, out, ckpt)
    val p1 = spark.read.parquet(out).orderBy("seq").collect()
    assert(p1.length == 6 && p1.map(_.getString(1)).toSeq ==
      (0 until 6).map(i => s"k$i"))
    assert(p1.forall(!_.getBoolean(4)))

    // mutate: overwrite k1, delete k2, add k6 — then resume from checkpoint
    os.put("k1", "v1-b".getBytes(UTF_8), 100L)
    os.delete("k2", 101L)
    os.put("k6", "v6-a".getBytes(UTF_8), 102L)
    drainToParquet(changelog, out, ckpt)
    val p2 = spark.read.parquet(out).orderBy("seq").collect()
    // ONLY the 3 new metas arrived — nothing replayed
    assert(p2.length == 9, s"expected 9 changelog rows, got ${p2.length}")
    assert(p2.drop(6).map(r => (r.getString(1), r.getBoolean(4))).toSeq ==
      Seq(("k1", false), ("k2", true), ("k6", false)))

    // current-state view: max_by(seq) per name, tombstones drop the key
    spark.read.parquet(out).createOrReplaceTempView("w1")
    val state = spark.sql(
      """SELECT name FROM (
        |  SELECT name, max_by(deleted, seq) AS del FROM w1 GROUP BY name)
        | WHERE NOT del ORDER BY name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(state == Seq("k0", "k1", "k3", "k4", "k5", "k6"))
  }

  test("default watch skips tombstones; include_deletes surfaces them") {
    // default writer ROLLS UP: a's put meta is gone once the tombstone
    // lands, so the watch replays current state only — 'a' never appears
    // (deleted objects must not resurrect, the real-NATS Watch shape)
    val os = store("wtomb")
    os.put("a", "1".getBytes(UTF_8), 1L)
    os.delete("a", 2L)
    os.put("b", "2".getBytes(UTF_8), 3L)
    val c1 = java.nio.file.Files.createTempDirectory("graft_watch_t1").toString
    drain(watch("wtomb").select("name", "deleted"), "wt1", c1)
    assert(spark.sql("SELECT name FROM wt1 ORDER BY name").collect()
      .map(_.getString(0)).toSeq == Seq("b"))
    assert(spark.sql("SELECT count(*) FROM wt1 WHERE deleted").head().getLong(0) == 0L)
    // include_deletes: the tombstone itself arrives, marked
    val c2 = java.nio.file.Files.createTempDirectory("graft_watch_t2").toString
    drain(watch("wtomb", Map("include_deletes" -> "true"))
      .select("name", "deleted"), "wt2", c2)
    assert(spark.sql("SELECT name, deleted FROM wt2 ORDER BY name").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toSeq ==
      Seq(("a", true), ("b", false)))
    // a RETAINING writer keeps the full history: a's put meta replays
    val osR = store("wtombr", retainHistory = true)
    osR.put("a", "1".getBytes(UTF_8), 1L)
    osR.delete("a", 2L)
    osR.put("b", "2".getBytes(UTF_8), 3L)
    val c3 = java.nio.file.Files.createTempDirectory("graft_watch_t3").toString
    drain(watch("wtombr").select("name", "deleted"), "wt3", c3)
    assert(spark.sql("SELECT name FROM wt3 ORDER BY name").collect()
      .map(_.getString(0)).toSeq == Seq("a", "b"))
  }

  test("watch_data: retained history replays every version; reclaimed go null") {
    // retainHistory writer: superseded versions stay fetchable by nuid
    val osR = store("wdata", retainHistory = true)
    osR.put("doc", ("old" * 10).getBytes(UTF_8), 1L)
    osR.put("doc", ("new" * 10).getBytes(UTF_8), 2L) // overwrite, fresh nuid
    val c = java.nio.file.Files.createTempDirectory("graft_watch_d").toString
    drain(watch("wdata", Map("watch_data" -> "true")).selectExpr("seq", "name",
      "CAST(data AS STRING) AS text"), "wd", c)
    val rows = spark.sql("SELECT text FROM wd ORDER BY seq").collect()
      .map(_.getString(0)).toSeq
    assert(rows == Seq("old" * 10, "new" * 10))

    // DEFAULT (reclaiming) writer: the overwrite purged the old chunks AND
    // rolled the old meta up — the watch replays the current version only
    val osD = store("wdata2")
    osD.put("doc", ("old" * 10).getBytes(UTF_8), 1L)
    osD.put("doc", ("new" * 10).getBytes(UTF_8), 2L)
    val c2 = java.nio.file.Files.createTempDirectory("graft_watch_d2").toString
    drain(watch("wdata2", Map("watch_data" -> "true")).selectExpr("seq", "name",
      "CAST(data AS STRING) AS text"), "wd2", c2)
    val rows2 = spark.sql("SELECT text FROM wd2 ORDER BY seq").collect()
      .map(_.getString(0)).toSeq
    assert(rows2 == Seq("new" * 10))

    // a meta surviving with purged chunks (no rollup, e.g. mid-crash) is
    // the null case, not an error: simulate by purging chunks directly
    val osM = store("wdata3", retainHistory = true)
    val v1 = osM.put("doc", ("old" * 10).getBytes(UTF_8), 1L)
    Transport.connect(url).purgeSubject(osM.stream, s"$$O.wdata3.C.${v1.nuid}")
    val c3 = java.nio.file.Files.createTempDirectory("graft_watch_d3").toString
    drain(watch("wdata3", Map("watch_data" -> "true")).selectExpr("seq",
      "CAST(data AS STRING) AS text"), "wd3", c3)
    assert(spark.sql("SELECT text FROM wd3").collect()
      .map(_.getString(0)).toSeq == Seq(null))
  }

  test("meta-only watch never touches chunks: survives chunk destruction") {
    val os = store("wmeta")
    (0 until 8).foreach(i => os.put(s"m$i", ("z" * 40).getBytes(UTF_8), i.toLong))
    // destroy EVERY chunk server-side; the meta changelog must not care
    val t = Transport.connect(url)
    val last = t.streamInfo(os.stream).lastSeq
    t.fetch(os.stream, 1L, last, last.toInt)
      .filter(_.subject.contains(".C."))
      .foreach(m => server.deleteMsg(os.stream, m.seq))
    val c = java.nio.file.Files.createTempDirectory("graft_watch_m").toString
    drain(watch("wmeta").select("name", "size", "digest"), "wm", c)
    assert(spark.sql("SELECT count(*), sum(size) FROM wm").head().toSeq ==
      Seq(8L, 320L))
  }

  test("updates_only starts at the current head: history never replays") {
    val os = store("wupd")
    os.put("before", "x".getBytes(UTF_8), 1L)
    val c = java.nio.file.Files.createTempDirectory("graft_watch_u").toString
    val out = java.nio.file.Files.createTempDirectory("graft_watch_uo").toString
    def updates = watch("wupd", Map("watch_updates_only" -> "true"))
      .select("name")
    drainToParquet(updates, out, c)
    // explicit schema: the empty pass may leave no parquet files to infer from
    assert(spark.read.schema("name STRING").parquet(out).count() == 0L)
    os.put("after", "y".getBytes(UTF_8), 2L)
    drainToParquet(updates, out, c)
    assert(spark.read.schema("name STRING").parquet(out).collect()
      .map(_.getString(0)).toSeq == Seq("after"))
  }

  test("admission control paces the replay; prefix filter applies at meta level") {
    val os = store("wpace")
    (0 until 30).foreach(i => os.put(s"keep/$i", "k".getBytes(UTF_8), i.toLong))
    (0 until 10).foreach(i => os.put(s"drop/$i", "d".getBytes(UTF_8), i.toLong))
    val c = java.nio.file.Files.createTempDirectory("graft_watch_p").toString
    val df = watch("wpace", Map("max_msgs_per_batch" -> "20",
        "name_prefix" -> "keep/")).select("seq", "name")
    val q = df.writeStream.format("memory").queryName("wp")
      .option("checkpointLocation", c)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.sql("SELECT count(*) FROM wp").head().getLong(0) == 30L)
    // 80 stream seqs (40 puts × chunk+meta) at ≤20 seqs/batch → ≥4 batches
    val batches = q.recentProgress.count(_.numInputRows >= 0)
    assert(batches >= 4, s"expected ≥4 paced batches, got $batches")
  }

  test("durable watch: an UNRELATED job (fresh checkpoint) resumes at the ack floor") {
    val os = store("wdur")
    // 1-chunk payloads: object d<i>'s meta lands at seq 2i (chunk at 2i-1)
    (1 to 6).foreach(i => os.put(s"d$i", s"v$i".getBytes(UTF_8), i.toLong))
    def job(n: Int): Seq[String] = {
      // a brand-new checkpoint each time: only the durable carries state
      val c = java.nio.file.Files.createTempDirectory(s"graft_watch_dur$n").toString
      drain(watch("wdur", Map("durable" -> "obj-cursor",
        "max_msgs_per_batch" -> "4")).select("seq", "name"), s"wdur$n", c)
      spark.sql(s"SELECT name FROM wdur$n ORDER BY seq").collect()
        .map(_.getString(0)).toSeq
    }
    assert(job(1) == (1 to 6).map(i => s"d$i")) // full replay in 3 batches
    // Spark commits a batch's source offsets while constructing the NEXT
    // batch, so the floor lags the sink by at most one batch (the
    // at-least-once handoff window, same as the message stream's durable)
    val floor = Transport.connect(url).ackFloor("OBJ_wdur", "obj-cursor")
    assert(floor >= 8L, s"floor must cover the committed batches, got $floor")
    os.put("d7", "v7".getBytes(UTF_8), 7L)
    // successor: exactly the unacked tail + the new arrival — no loss
    assert(job(2) ==
      (1 to 7).filter(i => 2L * i > floor).map(i => s"d$i"))
    // durable + updates_only is a bind-time contradiction
    val e = intercept[Exception](spark.readStream.format("nats_obj")
      .option("url", url).option("bucket", "wdur").option("watch", "true")
      .option("durable", "x").option("watch_updates_only", "true").load())
    assert(e.getMessage.contains("mutually exclusive"))
  }

  test("landing-zone CDC: the watch feeds the streaming dedup gate") {
    // the 100 TB ingestion story end-to-end: producers put documents into
    // a bucket (the landing zone); the watch streams arrivals as CDC; the
    // dedup gate drops near-dups against everything already accepted.
    val os = store("wgate")
    def words(seed: String) = (1 to 24).map(i => s"$seed$i").mkString(" ")
    def put(id: Long, text: String) = os.put(s"d$id", text.getBytes(UTF_8), id)
    put(1L, words("alpha")); put(2L, words("beta"))
    val root = java.nio.file.Files.createTempDirectory("graft_watch_gate").toString
    val cfg = graft.streaming.StreamingDedup.Config(s"$root/index", s"$root/out")
    def run(): Unit = {
      val q = watch("wgate", Map("watch_data" -> "true"))
        .selectExpr("CAST(substring(name, 2) AS BIGINT) AS doc_id",
          "CAST(data AS STRING) AS text")
        .writeStream.option("checkpointLocation", s"$root/ckpt")
        .foreachBatch(graft.streaming.StreamingDedup.ingest(cfg) _)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      assert(!q.isActive, "watch→gate did not drain")
    }
    run()
    // new arrivals: one near-dup of an accepted doc (drops), one new
    put(11L, words("alpha")); put(12L, words("delta"))
    run()
    val out = spark.read.parquet(cfg.outDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L, 12L), out)
  }

  test("WIRE e2e: the watch over real loopback sockets (MiniNatsServer)") {
    val backing = new FakeJetStreamServer()
    val srv = new MiniNatsServer(backing)
    srv.start()
    try {
      val t = Transport.connect(srv.url)
      val os = new ObjectStore(t, "wirew", chunkSize = 16)
      (0 until 5).foreach(i =>
        os.put(s"w$i", (s"wire-$i" * 3).getBytes(UTF_8), i.toLong))
      os.delete("w2", 10L)
      val c = java.nio.file.Files.createTempDirectory("graft_watch_w").toString
      val q = spark.readStream.format("nats_obj").option("url", srv.url)
        .option("bucket", "wirew").option("watch", "true")
        .option("include_deletes", "true")
        .load().select("seq", "name", "deleted")
        .writeStream.format("memory").queryName("ww")
        .option("checkpointLocation", c)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      assert(!q.isActive, "wire watch did not drain")
      // the delete rolled w2's put meta up: current state + the tombstone
      val rows = spark.sql("SELECT name, deleted FROM ww ORDER BY seq")
        .collect().map(r => (r.getString(0), r.getBoolean(1))).toSeq
      assert(rows == Seq("w0", "w1", "w3", "w4").map((_, false)) :+
        ("w2", true))
    } finally srv.stop()
  }

  test("AvailableNow pins the head at prepare time: racing puts wait for " +
    "the next run (both transport-backed micro-batch streams)") {
    val os = store("wpin")
    os.put("p1", "x".getBytes(UTF_8), 1L)
    val ws = new graft.streaming.ObjectStoreWatchStream(url, "wpin",
      required = graft.sources.ObjectStoreSource.watchSchema, shards = 2,
      updatesOnly = false, includeDeletes = false,
      maxPerBatch = Long.MaxValue, connectTimeoutMs = 5000L,
      auth = TransportAuth.anonymous, namePrefix = None)
    ws.prepareForTriggerAvailableNow()
    val pinned = ws.latestOffset().json().trim.toLong
    os.put("p2", "y".getBytes(UTF_8), 2L) // races the drain
    assert(ws.latestOffset().json().trim.toLong == pinned,
      "watch head must stay pinned after prepare")
    // the message stream pins identically
    val srv2 = FakeJetStream.listen("nats://watch-pin-msg:4222")
    (1L to 5L).foreach(i => srv2.publish("s", i, "s.a", i, "m".getBytes))
    val ms = new graft.streaming.NatsTransportMicroBatchStream(
      "nats://watch-pin-msg:4222", "s", maxPerBatch = Long.MaxValue,
      sliceWidth = 16L, connectTimeoutMs = 5000L)
    ms.prepareForTriggerAvailableNow()
    assert(ms.latestOffset().json().trim.toLong == 5L)
    srv2.publish("s", 6L, "s.a", 6L, "m".getBytes)
    assert(ms.latestOffset().json().trim.toLong == 5L,
      "message-stream head must stay pinned after prepare")
    // and the overflow guard saturates instead of wrapping
    val off = ms.latestOffset(graft.streaming.SeqOffset(3L),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    assert(off.json().trim.toLong == 5L)
  }

  test("mode gates: batch+watch, stream without watch, option validation") {
    server
    val e1 = intercept[Exception](spark.read.format("nats_obj")
      .option("url", url).option("bucket", "g").option("watch", "true")
      .load().collect())
    assert(e1.getMessage.contains("streaming changelog surface"))
    val e2 = intercept[Exception] {
      val q = spark.readStream.format("nats_obj").option("url", url)
        .option("bucket", "g").load()
        .writeStream.format("memory").queryName("gate")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      throw q.exception.map(ex => ex: Exception)
        .getOrElse(new IllegalStateException("watch gate did not fire"))
    }
    assert(Iterator.iterate[Throwable](e2)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("bucket watch"))))
    val e3 = intercept[Exception](spark.read.format("nats_obj")
      .option("url", url).option("bucket", "g")
      .option("include_deletes", "true").load())
    assert(e3.getMessage.contains("watch-mode options"))
  }
}
