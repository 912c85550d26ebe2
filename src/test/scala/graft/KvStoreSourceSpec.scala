package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.transport._

/** `nats_kv` DSv2 surface: current-state scans over the per-subject index,
  * key pushdown, and the write direction. */
class KvStoreSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val url = "nats://kvsource-spec:4222"
  private lazy val server: FakeJetStreamServer = FakeJetStream.listen(url)

  private def kv(bucket: String, history: Int = 4) = {
    server
    new KvStore(Transport.connect(url), bucket, history)
  }

  private def read(bucket: String, opts: Map[String, String] = Map.empty) = {
    server
    val b = spark.read.format("nats_kv").option("url", url)
      .option("bucket", bucket)
    opts.foldLeft(b) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("current-state scan: one row per live key, latest revision wins") {
    val store = kv("scan")
    (0 until 20).foreach(i => store.put(s"k$i", s"v$i".getBytes(UTF_8), i.toLong))
    store.put("k3", "v3-new".getBytes(UTF_8), 100L) // update
    store.delete("k5", 101L)                        // tombstone
    val df = read("scan")
    assert(df.count() == 19L)
    val r = df.filter(col("key") === "k3")
      .selectExpr("CAST(value AS STRING) AS v", "revision").collect()(0)
    assert(r.getString(0) == "v3-new")
    assert(r.getLong(1) == store.get("k3").get.revision)
    assert(read("scan").filter(col("key") === "k5").count() == 0L)
  }

  test("key pushdown: = and IN collapse to targeted lookups; prefix filters") {
    val store = kv("push")
    Seq("app.a", "app.b", "sys.c").foreach(k =>
      store.put(k, k.getBytes(UTF_8), 1L))
    val point = read("push").filter(col("key") === "app.a").select("key")
    assert(point.rdd.getNumPartitions == 1)
    assert(point.collect().map(_.getString(0)).toSeq == Seq("app.a"))
    val in = read("push").filter(col("key").isin("app.b", "missing"))
    assert(in.rdd.getNumPartitions == 1 && in.count() == 1L)
    val pre = read("push").filter(col("key").startsWith("app."))
      .select("key").collect().map(_.getString(0)).sorted
    assert(pre.toSeq == Seq("app.a", "app.b"))
    // conjunct exact-key filters INTERSECT: the plan's pushed key set is
    // the conjunction's satisfiable keys, never the union of the sets
    val conj = read("push")
      .filter(col("key") === "app.a" && col("key").isin("app.a", "app.b"))
    assert(conj.count() == 1L)
    def scanDesc(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("nats_kv(")).mkString("\n")
    val desc = scanDesc(conj)
    assert(desc.contains("keys=app.a") && !desc.contains("app.b"),
      s"conjunction pushed a superset scan:\n$desc")
    // an empty intersection is a contradiction: zero lookups, zero rows
    val none = read("push")
      .filter(col("key") === "app.a" && col("key").isin("app.b", "sys.c"))
    assert(none.count() == 0L)
    val noneDesc = scanDesc(none)
    assert(!noneDesc.contains("app.b") && !noneDesc.contains("sys.c"),
      s"contradiction still planned lookups:\n$noneDesc")
  }

  test("write direction: df.write puts rows; history option bounds revisions") {
    import spark.implicits._
    server
    val df = (0 until 12).map(i => (s"w${i % 4}", s"v$i".getBytes(UTF_8)))
      .toDF("key", "value")
    df.coalesce(1).write.format("nats_kv").option("url", url)
      .option("bucket", "wrt").option("history", "2").mode("append").save()
    val store = kv("wrt")
    assert(store.keys().sorted == Seq("w0", "w1", "w2", "w3"))
    // 4 keys × history 2 = 8 retained messages, regardless of 12 writes
    assert(Transport.connect(url).streamInfo(store.stream).messages == 8L)
    // read-back through the scan matches the facade
    val back = read("wrt").selectExpr("key", "CAST(value AS STRING) AS v")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back == store.entries().map(e => e.key -> e.valueUtf8).toMap)
  }

  test("bulk_window writer option: KV loader path is read-identical and " +
    "history stays bounded") {
    import spark.implicits._
    val df = (0 until 50).map(i => (s"bk/$i", s"val-$i"))
      .toDF("key", "payload")
      .selectExpr("key", "CAST(payload AS BINARY) AS value")
    df.write.format("nats_kv").option("url", url)
      .option("bucket", "bulkkv").option("history", "1")
      .option("bulk_window", "13") // several windows per task
      .mode("append").save()
    val store = kv("bulkkv")
    assert(store.entries().length == 50)
    assert(store.get("bk/7").map(_.valueUtf8).contains("val-7"))
    // rewrite through bulk: last-write-wins, history=1 trims per window —
    // the stream stays at exactly one message per live key
    df.selectExpr("key", "CAST(concat('v2-', CAST(value AS STRING)) AS BINARY) AS value")
      .write.format("nats_kv").option("url", url)
      .option("bucket", "bulkkv").option("history", "1")
      .option("bulk_window", "13").mode("append").save()
    assert(store.get("bk/7").map(_.valueUtf8).contains("v2-val-7"))
    val t = graft.transport.Transport.connect(url)
    assert(t.streamInfo("KV_bulkkv").messages == 50L,
      "bulk rewrite leaked history past the bound")
    // facade putBulk: duplicate keys in one window are successive revisions
    val kv2 = kv("bulkkv2")
    assert(kv2.putBulk(Iterator(
      ("d", "one".getBytes(UTF_8), 1L),
      ("d", "two".getBytes(UTF_8), 2L)), window = 10) == 2L)
    assert(kv2.get("d").map(_.valueUtf8).contains("two"))
    // validation
    val e = intercept[Exception] {
      spark.range(1).selectExpr("'k' AS key", "CAST('v' AS BINARY) AS value")
        .write.format("nats_kv").option("url", url)
        .option("bucket", "bulkkv").option("bulk_window", "-2")
        .mode("append").save()
    }
    assert(e.getMessage.contains("bulk_window"), e.getMessage)
  }

  test("streaming sink: writeStream upserts per epoch; replays converge " +
    "(last-write-wins)") {
    import spark.implicits._
    server
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)](spark)
    val q = ms.toDF().selectExpr("_1 AS key", "CAST(_2 AS BINARY) AS value")
      .writeStream.format("nats_kv").option("url", url)
      .option("bucket", "kvsink").option("history", "2")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_kv_sink").toString)
      .start()
    try {
      ms.addData(("f/1", "epoch-one"), ("f/2", "two"))
      q.processAllAvailable()
      val store = kv("kvsink")
      assert(store.entries().map(_.key).sorted == Seq("f/1", "f/2"))
      // next epoch: an upsert + a new key — the feature-store shape
      ms.addData(("f/1", "epoch-two"), ("f/3", "three"))
      q.processAllAvailable()
      assert(store.get("f/1").map(_.valueUtf8).contains("epoch-two"))
      assert(store.entries().map(_.key).sorted == Seq("f/1", "f/2", "f/3"))
      // the history bound held per key (history=2: both f/1 revisions)
      assert(store.history("f/1").length == 2)
    } finally q.stop()
  }

  test("watch -> transform -> sink: a DERIVED bucket materializes from " +
    "another bucket's changelog (streaming materialized view)") {
    server
    val src = kv("mvsrc", history = 1)
    src.put("m/1", "11".getBytes(UTF_8), 1L)
    src.put("m/2", "7".getBytes(UTF_8), 2L)
    // watch the source changelog, derive (key, value*2), upsert into a
    // SECOND bucket through the streaming sink — the engine's streaming-
    // materialized-view shape, all on the same transport
    val q = spark.readStream.format("nats_kv").option("url", url)
      .option("bucket", "mvsrc").option("watch", "true")
      .option("ignore_deletes", "true").load()
      .selectExpr("key",
        "CAST(CAST(CAST(CAST(value AS STRING) AS INT) * 2 AS STRING) AS BINARY) AS value")
      .writeStream.format("nats_kv").option("url", url)
      .option("bucket", "mvdst").option("history", "1")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_kv_mv").toString)
      .start()
    try {
      q.processAllAvailable()
      val dst = kv("mvdst")
      assert(dst.get("m/1").map(_.valueUtf8).contains("22"))
      assert(dst.get("m/2").map(_.valueUtf8).contains("14"))
      // live update flows through: a new source write materializes
      src.put("m/1", "20".getBytes(UTF_8), 3L)
      q.processAllAvailable()
      assert(dst.get("m/1").map(_.valueUtf8).contains("40"))
    } finally q.stop()
  }

  test("WATCH: the changelog streams with ops; deletes arrive by default") {
    import org.apache.spark.sql.streaming.Trigger
    val store = kv("watch", history = 8)
    store.put("a", "1".getBytes(UTF_8), 1L)
    store.put("a", "2".getBytes(UTF_8), 2L)
    store.put("b", "x".getBytes(UTF_8), 3L)
    store.delete("a", 4L)
    val c = java.nio.file.Files.createTempDirectory("graft_kv_watch").toString
    val out = java.nio.file.Files.createTempDirectory("graft_kv_watch_o").toString
    def drain(opts: Map[String, String], sink: String, ckpt: String): Unit = {
      val b = spark.readStream.format("nats_kv").option("url", url)
        .option("bucket", "watch").option("watch", "true")
      val q = opts.foldLeft(b) { case (r, (k, v)) => r.option(k, v) }.load()
        .selectExpr("revision", "key", "CAST(value AS STRING) AS v", "op")
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      assert(!q.isActive, "kv watch did not drain")
    }
    drain(Map.empty, out, c)
    val rows = spark.read.parquet(out).orderBy("revision")
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3)))
    assert(rows.toSeq == Seq(("a", "1", "PUT"), ("a", "2", "PUT"),
      ("b", "x", "PUT"), ("a", null, "DEL")))
    // checkpoint resume: only new writes arrive
    store.put("c", "y".getBytes(UTF_8), 5L)
    drain(Map.empty, out, c)
    assert(spark.read.parquet(out).count() == 5L)
    // ignore_deletes + key_prefix
    val c2 = java.nio.file.Files.createTempDirectory("graft_kv_watch2").toString
    val out2 = java.nio.file.Files.createTempDirectory("graft_kv_watch_o2").toString
    drain(Map("ignore_deletes" -> "true", "key_prefix" -> "a"), out2, c2)
    val rows2 = spark.read.parquet(out2).orderBy("revision")
      .collect().map(r => (r.getString(1), r.getString(3)))
    assert(rows2.toSeq == Seq(("a", "PUT"), ("a", "PUT")))
    // a current-state view downstream: max_by(op/value, revision) per key
    spark.read.parquet(out).createOrReplaceTempView("kw1")
    spark.sql("SELECT key, max_by(op, revision) AS op, " +
        "max_by(v, revision) AS v FROM kw1 GROUP BY key")
      .createOrReplaceTempView("kwstate")
    val state = spark.sql(
      "SELECT key, v FROM kwstate WHERE op = 'PUT' ORDER BY key")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(state.toSeq == Seq(("b", "x"), ("c", "y")))
    // bind gates
    val e = intercept[Exception](spark.read.format("nats_kv")
      .option("url", url).option("bucket", "watch")
      .option("ignore_deletes", "true").load())
    assert(e.getMessage.contains("watch-mode options"))
  }

  test("review fixes: invalid pushed keys match nothing; fresh buckets scan empty") {
    val store = kv("rev")
    store.put("ok", "v".getBytes(UTF_8), 1L)
    // a grammar-invalid pushed key is an empty result, never a task abort
    assert(read("rev").filter(col("key") === "a b").count() == 0L)
    assert(read("rev").filter(col("key").isin("ok", "", ".bad")).count() == 1L)
    // a bucket whose stream does not exist yet scans as empty
    assert(read("neverwritten").count() == 0L)
    assert(read("neverwritten").filter(col("key") === "x").count() == 0L)
  }

  test("bind validation: url/bucket required, shards/history bounded") {
    def load(opts: Map[String, String]) = {
      val b = spark.read.format("nats_kv")
      opts.foldLeft(b) { case (r, (k, v)) => r.option(k, v) }.load()
    }
    assert(intercept[Exception](load(Map("bucket" -> "b")))
      .getMessage.contains("'url' option required"))
    assert(intercept[Exception](load(Map("url" -> url)))
      .getMessage.contains("'bucket' option required"))
    assert(intercept[Exception](load(Map("url" -> url, "bucket" -> "b",
      "shards" -> "0"))).getMessage.contains("shards must be >= 1"))
    assert(intercept[Exception](load(Map("url" -> url, "bucket" -> "b",
      "history" -> "65"))).getMessage.contains("history must be in [0, 64]"))
  }
}
