package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.transport._

/** `nats_obj` DSv2 surface: bucket scans, meta-only column pruning, name
  * pushdown, and the write direction. The pruning/pushdown assertions are
  * BEHAVIORAL, not plan-string: we break the chunk data server-side and
  * prove the pruned/pushed plans never notice. */
class ObjectStoreSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val url = "nats://objsource-spec:4222"
  private lazy val server: FakeJetStreamServer = FakeJetStream.listen(url)

  private def store(bucket: String, chunk: Int = 8) = {
    server
    new ObjectStore(Transport.connect(url), bucket, chunk)
  }

  private def read(bucket: String, opts: Map[String, String] = Map.empty) = {
    server
    val b = spark.read.format("nats_obj").option("url", url)
      .option("bucket", bucket)
    opts.foldLeft(b) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  /** delete every message whose subject matches `pred` (public transport
    * reads + the fake's delete hook — no private server internals) */
  private def deleteChunks(stream: String, pred: String => Boolean): Unit = {
    val t = Transport.connect(url)
    val last = t.streamInfo(stream).lastSeq
    t.fetch(stream, 1L, last, last.toInt.max(1))
      .filter(m => pred(m.subject))
      .foreach(m => server.deleteMsg(stream, m.seq))
  }

  test("bucket scan: rows mirror the facade, data reassembles chunks") {
    val os = store("scan1")
    (0 until 20).foreach(i => os.put(s"o$i", (s"content-$i" * 3).getBytes(UTF_8), i.toLong))
    val df = read("scan1")
    assert(df.count() == 20L)
    val r = df.filter(col("name") === "o7")
      .select("size", "chunks", "data").collect()(0)
    val expect = "content-7" * 3
    assert(r.getLong(0) == expect.length.toLong)
    assert(r.getInt(1) == (expect.length - 1) / 8 + 1)
    assert(new String(r.getAs[Array[Byte]]("data"), UTF_8) == expect)
  }

  test("meta-only projection never touches chunks: scan survives chunk loss") {
    val os = store("metaonly")
    (0 until 10).foreach(i => os.put(s"m$i", ("z" * 50).getBytes(UTF_8), 1L))
    // destroy EVERY chunk message server-side; metas stay
    val infos = os.list()
    assert(infos.size == 10)
    deleteChunks(os.stream, _.contains(".C."))
    val metaDf = read("metaonly").select("name", "size", "digest", "chunks")
    assert(metaDf.count() == 10L) // no chunk fetch -> no failure
    assert(metaDf.agg(sum("size")).collect()(0).getLong(0) == 500L)
    // but a projection that NEEDS data fails loudly (incomplete object)
    val e = intercept[Exception](read("metaonly").select("data").collect())
    assert(Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("incomplete"))))
  }

  test("exact-name pushdown: targeted lookup, one partition, others untouched") {
    val os = store("target")
    os.put("good", ("g" * 30).getBytes(UTF_8), 1L)
    os.put("bad", ("b" * 30).getBytes(UTF_8), 1L)
    // corrupt 'bad' chunks: a full scan with data would die, a pushed
    // name='good' must not even fetch them
    val badNuid = os.info("bad").get.nuid
    deleteChunks(os.stream, _.endsWith(s".C.$badNuid"))
    val q = read("target").filter(col("name") === "good").select("name", "data")
    assert(q.rdd.getNumPartitions == 1) // names partition, not 16 shards
    val rows = q.collect()
    assert(rows.length == 1 &&
      new String(rows(0).getAs[Array[Byte]]("data"), UTF_8) == "g" * 30)
    // IN-list pushdown keeps the single targeted partition too
    val inQ = read("target").filter(col("name").isin("good", "missing"))
      .select("name")
    assert(inQ.rdd.getNumPartitions == 1)
    assert(inQ.collect().map(_.getString(0)).toSeq == Seq("good"))
  }

  test("prefix pushdown prefilters at the meta level before chunk fetch") {
    val os = store("prefix")
    os.put("keep/1", "k1".getBytes(UTF_8), 1L)
    os.put("keep/2", "k2".getBytes(UTF_8), 1L)
    os.put("drop/1", ("d" * 40).getBytes(UTF_8), 1L)
    val dropNuid = os.info("drop/1").get.nuid
    deleteChunks(os.stream, _.endsWith(s".C.$dropNuid"))
    // full-namespace scan, but prefix-pruned rows are never chunk-fetched
    val rows = read("prefix").filter(col("name").startsWith("keep/"))
      .select("name", "data").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("keep/1", "keep/2"))
  }

  test("write direction: df.write puts objects; roundtrip through the facade") {
    import spark.implicits._
    server
    val df = (0 until 15)
      .map(i => (s"w$i", (s"bytes-$i" * 2).getBytes(UTF_8), i.toLong))
      .toDF("name", "data", "mtime_ns")
    df.write.format("nats_obj").option("url", url)
      .option("bucket", "wrt").option("chunk_size", "8").mode("append").save()
    val os = store("wrt")
    val infos = os.list()
    assert(infos.size == 15)
    assert(new String(os.get("w3"), UTF_8) == "bytes-3" * 2)
    assert(infos.forall(i => i.chunks == (i.size - 1) / 8 + 1))
    // and the read side sees what the write side put
    assert(read("wrt").count() == 15L)
  }

  test("mode(overwrite): the bucket becomes exactly the dataframe") {
    import spark.implicits._
    server
    val os = store("ow", 8)
    os.put("stale/1", ("s" * 40).getBytes(UTF_8), 1L)
    os.put("stale/2", ("s" * 40).getBytes(UTF_8), 1L)
    val df = Seq(("fresh/1", "f1".getBytes(UTF_8), 2L))
      .toDF("name", "data", "mtime_ns")
    df.write.format("nats_obj").option("url", url)
      .option("bucket", "ow").option("chunk_size", "8")
      .mode("overwrite").save()
    assert(os.list().map(_.name) == Seq("fresh/1"))
    assert(new String(os.get("fresh/1"), UTF_8) == "f1")
    // the reconcile really reclaimed: fresh chunk + meta, and per stale
    // name ONE rolled-up tombstone (its chunks purged) — storage stays
    // O(current + removed names), not O(history)
    val t = Transport.connect(url)
    assert(t.streamInfo(os.stream).messages == 4L) // 1 chunk + 1 meta + 2 tombstones
  }

  test("mode(overwrite) stages: a failed job leaves prior contents intact") {
    import spark.implicits._
    server
    val os = store("owfail", 8)
    os.put("keep/1", ("k" * 20).getBytes(UTF_8), 1L)
    os.put("keep/2", ("k" * 20).getBytes(UTF_8), 1L)
    // a single-partition df whose SECOND row explodes after the first put —
    // the job fails mid-write, after real puts have happened
    val df = Seq(("new/1", "n1", 2L), ("", "boom", 2L))
      .toDF("name", "payload", "mtime_ns")
      .coalesce(1)
      .selectExpr("name", "CAST(payload AS BINARY) AS data", "mtime_ns")
    intercept[Exception] {
      df.write.format("nats_obj").option("url", url)
        .option("bucket", "owfail").option("chunk_size", "8")
        .mode("overwrite").save()
    }
    // pre-truncate semantics would have emptied the bucket here; staged
    // overwrite keeps everything the job did not successfully replace
    val names = os.list().map(_.name).toSet
    assert(Set("keep/1", "keep/2").subsetOf(names),
      s"failed overwrite destroyed prior contents: $names")
    assert(new String(os.get("keep/1"), UTF_8) == "k" * 20)
  }

  test("bulk_window writer option: loader path is read-identical, bulk " +
    "overwrite sweeps superseded chunks at commit") {
    import spark.implicits._
    server
    val os = store("blkw", 8)
    os.put("old/1", ("o" * 20).getBytes(UTF_8), 1L)
    val df = (0 until 30).map(i => (s"w/$i", s"bulk-data-$i", i.toLong))
      .toDF("name", "payload", "mtime_ns")
      .selectExpr("name", "CAST(payload AS BINARY) AS data", "mtime_ns")
    df.write.format("nats_obj").option("url", url)
      .option("bucket", "blkw").option("chunk_size", "8")
      .option("bulk_window", "7") // several windows per task
      .mode("overwrite").save()
    val names = os.list().map(_.name).sorted
    assert(names == (0 until 30).map(i => s"w/$i").sorted,
      s"bulk overwrite state wrong: $names")
    assert(new String(os.get("w/7"), UTF_8) == "bulk-data-7")
    // the commit epilogue swept: no unreferenced chunk subjects remain
    assert(os.sweepOrphans() == 0)
    // overwrite the SAME names in bulk: superseded chunks reclaimed at
    // commit (the bulk path's deferred reclamation), state = new content
    df.selectExpr("name", "CAST(concat('v2-', CAST(data AS STRING)) AS BINARY) AS data",
        "mtime_ns + 100 AS mtime_ns")
      .write.format("nats_obj").option("url", url)
      .option("bucket", "blkw").option("chunk_size", "8")
      .option("bulk_window", "7").mode("overwrite").save()
    assert(new String(os.get("w/7"), UTF_8) == "v2-bulk-data-7")
    assert(os.sweepOrphans() == 0, "bulk overwrite leaked superseded chunks")
    // validation
    val e = intercept[Exception] {
      spark.range(1).selectExpr("'n' AS name", "CAST('d' AS BINARY) AS data")
        .write.format("nats_obj").option("url", url)
        .option("bucket", "blkw").option("bulk_window", "-1")
        .mode("append").save()
    }
    assert(e.getMessage.contains("bulk_window"), e.getMessage)
  }

  test("staged overwrite preserves CONCURRENT writes: a name put mid-job " +
    "(after the watermark) survives the commit reconcile") {
    server
    val os = store("owconc", 8)
    os.put("stale/1", ("s" * 20).getBytes(UTF_8), 1L)
    // drive the write protocol directly so a concurrent put can be
    // interleaved between watermark capture and job commit
    val writers = new graft.sources.ObjectStoreRowWriters(url, "owconc",
      chunkSize = 8, connectTimeoutMs = 2000L,
      graft.transport.TransportAuth.anonymous,
      nameIdx = 0, dataIdx = 1, mtimeIdx = 2, retainHistory = false)
    val bw = new graft.sources.ObjectStoreBatchWrite(writers,
      truncateFirst = true)
    val factory = bw.createBatchWriterFactory(null) // watermark captured here
    // ...another client writes while the job runs
    os.put("concurrent/1", "mid-job".getBytes(UTF_8), 2L)
    val w = factory.createWriter(0, 0L)
    w.write(org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString("new/1"),
      "n1".getBytes(UTF_8), 3L))
    val msg = w.commit()
    bw.commit(Array(msg))
    // reconcile deleted ONLY pre-watermark names: the overwrite's own rows
    // and the concurrent writer's post-watermark put both survive
    assert(os.list().map(_.name).sorted == Seq("concurrent/1", "new/1"))
    assert(new String(os.get("concurrent/1"), UTF_8) == "mid-job")
    assert(new String(os.get("new/1"), UTF_8) == "n1")
  }

  test("sweepOrphans reclaims unreferenced chunk subjects only") {
    server
    val os = store("sweep", 8)
    os.put("live", ("L" * 20).getBytes(UTF_8), 1L)
    val t = Transport.connect(url)
    // simulate a put killed between chunk publish and meta publish: chunks
    // land under a nuid no meta will ever reference
    val orphan = ObjectStore.newNuid()
    t.publish(os.stream, s"$$O.sweep.C.$orphan", 2L, "zzz".getBytes(UTF_8),
      msgId = s"$orphan/0")
    val before = t.streamInfo(os.stream).messages
    assert(os.sweepOrphans() == 1)
    assert(t.streamInfo(os.stream).messages == before - 1L)
    // the live object is untouched and still digest-verifies
    assert(new String(os.get("live"), UTF_8) == "L" * 20)
    // idempotent: nothing left to reclaim
    assert(os.sweepOrphans() == 0)
    // retainHistory: superseded versions stay referenced via meta history
    val osH = new ObjectStore(Transport.connect(url), "sweeph", 8,
      retainHistory = true)
    osH.put("v", "one".getBytes(UTF_8), 1L)
    osH.put("v", "two".getBytes(UTF_8), 2L)
    assert(osH.sweepOrphans() == 0) // both versions' chunks are referenced
    assert(new String(osH.get("v"), UTF_8) == "two")
  }

  test("streaming sink: writeStream puts per epoch; replays converge") {
    import spark.implicits._
    server
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)](spark)
    val q = ms.toDF().selectExpr("_1 AS name", "CAST(_2 AS BINARY) AS data")
      .writeStream.format("nats_obj").option("url", url)
      .option("bucket", "sink").option("chunk_size", "8")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_obj_sink").toString)
      .start()
    try {
      ms.addData(("s1", "epoch-one"), ("s2", "epoch-one-too"))
      q.processAllAvailable()
      val os = store("sink", 8)
      assert(os.list().map(_.name).sorted == Seq("s1", "s2"))
      // next epoch: new object + an overwrite — rollup keeps the bucket tight
      ms.addData(("s1", "epoch-two"), ("s3", "third"))
      q.processAllAvailable()
      assert(os.list().map(_.name).sorted == Seq("s1", "s2", "s3"))
      assert(new String(os.get("s1"), UTF_8) == "epoch-two")
      val t = Transport.connect(url)
      // exactly current content: chunks (s1=2, s2=2, s3=1) + one meta each
      // — the overwrite's old chunks and meta were reclaimed
      val msgs = t.streamInfo(os.stream).messages
      assert(msgs == 8L, s"sink bucket carries $msgs messages, expected 8")
    } finally q.stop()
  }

  test("review fixes: invalid pushed names match nothing; Complete mode rejected") {
    val os = store("rev")
    os.put("ok", "v".getBytes(UTF_8), 1L)
    // a facade-rejected pushed name is an empty result, never a task abort
    assert(read("rev").filter(col("name") === "").count() == 0L)
    assert(read("rev").filter(col("name").isin("ok", "")).count() == 1L)
    // a never-written bucket scans as empty
    assert(read("neverwrittenobj").count() == 0L)
    // streaming Complete mode (per-epoch truncation) refuses loudly with
    // the foreachBatch alternative, instead of silently appending
    import spark.implicits._
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)](spark)
    val q = ms.toDF().selectExpr("_1 AS name", "CAST(_2 AS BINARY) AS data")
      .groupBy("name").agg(org.apache.spark.sql.functions.max("data").as("data"))
      .writeStream.format("nats_obj").option("url", url)
      .option("bucket", "rev").outputMode("complete")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_obj_cm").toString)
      .start()
    ms.addData(("k", "v"))
    val e = intercept[Exception](q.processAllAvailable())
    def rootMsgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(rootMsgs(e).contains("foreachBatch"), rootMsgs(e))
  }

  test("bind validation: missing url/bucket, bad shards/chunk_size") {
    def load(opts: Map[String, String]) = {
      val b = spark.read.format("nats_obj")
      opts.foldLeft(b) { case (r, (k, v)) => r.option(k, v) }.load()
    }
    assert(intercept[Exception](load(Map("bucket" -> "b")))
      .getMessage.contains("'url' option required"))
    assert(intercept[Exception](load(Map("url" -> url)))
      .getMessage.contains("'bucket' option required"))
    assert(intercept[Exception](load(Map("url" -> url, "bucket" -> "b",
      "shards" -> "0"))).getMessage.contains("shards must be >= 1"))
    assert(intercept[Exception](load(Map("url" -> url, "bucket" -> "has.dot")))
      .getMessage.contains("invalid object-store bucket"))
    assert(intercept[Exception](load(Map("url" -> url, "bucket" -> "b",
      "chunk_size" -> "0"))).getMessage.contains("chunk_size must be >= 1"))
  }

  test("shard partitioning: default scan plans `shards` independent tasks") {
    val os = store("fan")
    (0 until 40).foreach(i => os.put(s"f$i", "x".getBytes(UTF_8), 1L))
    val df = read("fan", Map("shards" -> "8")).select("name")
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == 40L)
  }
}
