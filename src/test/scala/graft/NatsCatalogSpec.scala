package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Stream-discovery catalog: SHOW TABLES enumerates streams (fixture +
  * native stores + transport), spark.table routes through the same V2
  * scan, and DDL is rejected. */
class NatsCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("dir catalog: SHOW TABLES lists fixture + native streams; table() scans") {
    // store dir with the fixture stream and one native store
    val tmp = java.nio.file.Files.createTempDirectory("graft_catalog").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$tmp/events.parquet"))
    spark.read.format("nats_scan").option("dir", dir).load()
      .filter(col("seq") <= 100L)
      .write.format("nats_scan").option("dir", tmp)
      .option("stream", "metrics").mode("overwrite").save()

    spark.conf.set("spark.sql.catalog.cattest",
      classOf[graft.sources.NatsCatalog].getName)
    spark.conf.set("spark.sql.catalog.cattest.dir", tmp)

    val shown = spark.sql("SHOW TABLES IN cattest")
      .select("tableName").collect().map(_.getString(0)).sorted
    assert(shown.sameElements(Array("events", "metrics")), shown.mkString(","))

    // catalog-routed scan ≡ format() scan, same vectorized/pushdown path
    val viaCat = spark.table("cattest.metrics")
      .agg(count(lit(1)), min("seq"), max("seq")).collect().head
    assert(viaCat.getLong(0) == 100L && viaCat.getLong(1) == 1L &&
      viaCat.getLong(2) == 100L, viaCat.toString)
    val plan = spark.table("cattest.metrics").queryExecution
      .executedPlan.toString
    assert(plan.contains("ColumnarToRow"), plan)

    val e = intercept[Exception](spark.table("cattest.nope").collect())
    assert(e.getMessage.toLowerCase.contains("nope"), e.getMessage)
  }

  test("url catalog: streams discovered via the transport's stream list") {
    // NOTE: no FakeJetStream.reset() here — the registry is JVM-global and
    // other suites' fixture servers (cached by address in TransportQueries)
    // must survive; this test's unique address is isolation enough
    val server = graft.transport.FakeJetStream.listen("cat-host:4222")
    server.publish("orders_live", 1L, "orders.new", 1700000000000000000L,
      "a".getBytes)
    server.publish("telemetry", 1L, "t.cpu", 1700000000000000000L,
      "b".getBytes)

    spark.conf.set("spark.sql.catalog.caturl",
      classOf[graft.sources.NatsCatalog].getName)
    spark.conf.set("spark.sql.catalog.caturl.url", "nats://cat-host:4222")

    val shown = spark.sql("SHOW TABLES IN caturl")
      .select("tableName").collect().map(_.getString(0)).sorted
    assert(shown.sameElements(Array("orders_live", "telemetry")),
      shown.mkString(","))

    val row = spark.table("caturl.telemetry").collect()
    assert(row.length == 1 && row.head.getAs[String]("subject") == "t.cpu")
  }

  test("obj namespace: buckets discovered and scanned as nats.obj.<bucket>") {
    val url = "nats://cat-obj:4222"
    graft.transport.FakeJetStream.listen(url)
    val os = new graft.transport.ObjectStore(
      graft.transport.Transport.connect(url), "docs", chunkSize = 8)
    (0 until 5).foreach(i => os.put(s"o$i", (s"text-$i" * 2).getBytes("UTF-8"), i.toLong))

    spark.conf.set("spark.sql.catalog.catobj",
      classOf[graft.sources.NatsCatalog].getName)
    spark.conf.set("spark.sql.catalog.catobj.url", url)

    // bucket discovery: the namespace lists buckets, the root lists streams
    val ns = spark.sql("SHOW NAMESPACES IN catobj")
      .collect().map(_.getString(0))
    assert(ns.contains("obj"), ns.mkString(","))
    val shown = spark.sql("SHOW TABLES IN catobj.obj")
      .select("tableName").collect().map(_.getString(0))
    assert(shown.sameElements(Array("docs")), shown.mkString(","))
    // the raw OBJ_docs stream stays reachable at the root (chunks + metas:
    // 5 objects × (2 chunks + 1 meta))
    assert(spark.table("catobj.OBJ_docs").count() == 15L)

    // the bucket table IS the object scan: reassembled data, meta columns
    val rows = spark.table("catobj.obj.docs")
      .selectExpr("name", "CAST(data AS STRING) AS text")
      .orderBy("name").collect()
    assert(rows.length == 5 &&
      rows.map(_.getString(1)).toSeq == (0 until 5).map(i => s"text-$i" * 2))

    // the write direction through the catalog identifier: writeTo.append
    import spark.implicits._
    Seq(("o5", "added".getBytes("UTF-8"), 9L))
      .toDF("name", "data", "mtime_ns")
      .writeTo("catobj.obj.docs").append()
    assert(new String(os.get("o5"), "UTF-8") == "added")
    assert(spark.table("catobj.obj.docs").count() == 6L)

    // KV namespace rides the same catalog: discovery, scan, write
    val kv = new graft.transport.KvStore(
      graft.transport.Transport.connect(url), "cfgkv")
    kv.put("a", "1".getBytes("UTF-8"), 1L)
    kv.delete("a", 2L)
    kv.put("b", "2".getBytes("UTF-8"), 3L)
    assert(spark.sql("SHOW TABLES IN catobj.kv")
      .select("tableName").collect().map(_.getString(0)).toSeq == Seq("cfgkv"))
    assert(spark.table("catobj.kv.cfgkv").select("key")
      .collect().map(_.getString(0)).toSeq == Seq("b")) // tombstone hidden
    Seq(("c", "3".getBytes("UTF-8"))).toDF("key", "value")
      .writeTo("catobj.kv.cfgkv").append()
    assert(kv.get("c").get.valueUtf8 == "3")

    // dir-mode catalogs have no object layer
    spark.conf.set("spark.sql.catalog.catdirx",
      classOf[graft.sources.NatsCatalog].getName)
    spark.conf.set("spark.sql.catalog.catdirx.dir", dir)
    val e = intercept[Exception](spark.table("catdirx.obj.anything").collect())
    assert(e.getMessage.toLowerCase.contains("obj") ||
      e.getMessage.toLowerCase.contains("not found"), e.getMessage)
  }

  test("CALL obj.sweep_orphans: SQL-face maintenance reclaims orphaned " +
    "chunk subjects and reports the count") {
    val url = "nats://cat-sweep:4222"
    graft.transport.FakeJetStream.listen(url)
    val t = graft.transport.Transport.connect(url)
    val os = new graft.transport.ObjectStore(t, "gc", chunkSize = 8)
    os.put("live", ("L" * 20).getBytes("UTF-8"), 1L)
    // two torn puts (chunks published, meta never made it, task died with
    // no exception path): orphaned chunk subjects no meta references
    (0 until 2).foreach { i =>
      val nuid = graft.transport.ObjectStore.newNuid()
      t.publish(os.stream, s"$$O.gc.C.$nuid", 2L + i,
        "zzz".getBytes("UTF-8"), msgId = s"$nuid/0")
    }
    spark.conf.set("spark.sql.catalog.catgc",
      classOf[graft.sources.NatsCatalog].getName)
    spark.conf.set("spark.sql.catalog.catgc.url", url)

    val r = spark.sql(
      "CALL catgc.obj.sweep_orphans(bucket => 'gc')").collect()
    assert(r.length == 1 && r.head.getString(0) == "gc" &&
      r.head.getLong(1) == 2L, r.mkString(","))
    // the live object is untouched; a second sweep finds nothing
    assert(new String(os.get("live"), "UTF-8") == "L" * 20)
    assert(spark.sql("CALL catgc.obj.sweep_orphans('gc')")
      .collect().head.getLong(1) == 0L)
    // discovery: the procedure is listed under the obj namespace
    val procs = spark.sql("SHOW PROCEDURES IN catgc.obj")
      .collect().map(_.toString)
    assert(procs.exists(_.contains("sweep_orphans")), procs.mkString(","))
    // unknown procedures refuse loudly, naming the available surface in
    // the cause chain (Spark wraps it in FAILED_TO_LOAD_ROUTINE)
    val e = intercept[Exception](
      spark.sql("CALL catgc.obj.nope()").collect())
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + msgs(t.getCause)
    assert(msgs(e).contains("sweep_orphans"), msgs(e))
  }

  test("DDL is rejected: streams are not provisioned by Spark") {
    spark.conf.set("spark.sql.catalog.catddl",
      classOf[graft.sources.NatsCatalog].getName)
    spark.conf.set("spark.sql.catalog.catddl.dir", dir)
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE catddl.x (a INT) USING nats_scan").collect()
    }
    def rootMsg(t: Throwable): String =
      if (t.getCause == null) t.getMessage else rootMsg(t.getCause)
    assert((e.getMessage + rootMsg(e)).toLowerCase.contains("not supported"),
      e.getMessage)
  }
}
