package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.VectorIndex
import graft.streaming.StreamingVectorIngest

/** Streaming ANN ingestion gate: micro-batches of embeddings append into
  * the persisted IVF-PQ index under its FROZEN quantizer. Contract: the
  * streamed index is row-identical to a one-shot batch build over the
  * union — the frozen-codebook/centroid property that makes incremental
  * ingestion sound — and a restart with a different config cannot fork
  * the encoding (the persisted quantizer wins). */
object StreamingVectorIngestSpec {
  final case class SVec(vec_id: Long, embedding: Array[Float])
}

class StreamingVectorIngestSpec extends AnyFunSuite with BeforeAndAfterAll {
  import StreamingVectorIngestSpec.SVec

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.load(spark, dir, "embeddings")

  private lazy val codebook = emb.filter(col("vec_id") < 8)
    .select(col("vec_id"), col("embedding")).collect()
    .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
  private lazy val centroids = emb.filter(col("vec_id") < 4)
    .select(col("vec_id"), col("embedding")).collect()
    .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)

  private def cfgFor(idx: String) = StreamingVectorIngest.Config(
    indexDir = idx, numSub = 8, dim = codebook.head._2.length,
    codebook = codebook, centroids = centroids)

  private def postings(p: String): Set[String] =
    spark.read.parquet(s"$p/postings")
      .select(col("label"), col("vec_id"), col("codes"))
      .collect().map(_.toString).toSet

  test("streamed batches == one-shot batch build over the union " +
    "(frozen quantizer), driven through a real writeStream") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_svi").toString
    val cfg = cfgFor(s"$root/index")

    val rows = emb.select(col("vec_id"), col("embedding"))
      .as[SVec].collect().toSeq
    val (b1, b2) = rows.partition(_.vec_id % 2 == 0)

    val in = MemoryStream[SVec](spark)
    val q = in.toDF().writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch(StreamingVectorIngest.ingest(cfg) _)
      .start()
    in.addData(b1)
    q.processAllAvailable()
    in.addData(b2)
    q.processAllAvailable()
    q.stop()

    // one-shot reference build: same frozen codebook + centroids
    val ref = s"$root/ref"
    VectorIndex.build(
      VectorIndex.assignLabels(emb.select(col("vec_id"), col("embedding")),
        centroids),
      VectorIndex.Spec(8, codebook.head._2.length, codebook), ref)
    assert(postings(s"$root/index") == postings(ref),
      "streamed postings diverge from the one-shot build")

    // and the search surface serves identical answers
    val queries = VectorIndex.assignLabels(
        emb.filter(col("vec_id") < 6).select(col("vec_id"), col("embedding")),
        centroids)
      .select(col("label"), col("vec_id").as("qid"),
        col("embedding").as("qv"))
    val a = VectorIndex.searchTopK(spark, s"$root/index", queries, k = 3)
      .orderBy("qid", "rank").collect().map(_.toString)
    val b = VectorIndex.searchTopK(spark, ref, queries, k = 3)
      .orderBy("qid", "rank").collect().map(_.toString)
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("in-batch duplicate vec_ids keep one deterministic row") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_svi_dup").toString
    val cfg = cfgFor(s"$root/index")
    val v = emb.filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding")).as[SVec].collect().toSeq
    // the same vec_ids twice in ONE batch
    StreamingVectorIngest.ingest(cfg)((v ++ v).toDF(), 0L)
    val ids = spark.read.parquet(s"${cfg.indexDir}/postings")
      .groupBy("vec_id").count().collect()
    assert(ids.length == 3 && ids.forall(_.getLong(1) == 1L), ids.toSeq)
  }

  test("replayed batchIds are a no-op: at-least-once redelivery cannot " +
    "double-append a vector") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_svi_rp").toString
    val cfg = cfgFor(s"$root/index")
    val rows = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding")).as[SVec].collect().toSeq
    val (b0, b1) = rows.partition(_.vec_id < 10)
    StreamingVectorIngest.ingest(cfg)(b0.toDF(), 0L)
    StreamingVectorIngest.ingest(cfg)(b1.toDF(), 1L)
    val snap = postings(cfg.indexDir)
    // the crash-replay: both batches re-delivered
    StreamingVectorIngest.ingest(cfg)(b0.toDF(), 0L)
    StreamingVectorIngest.ingest(cfg)(b1.toDF(), 1L)
    assert(postings(cfg.indexDir) == snap, "replay must not change postings")
    val perId = spark.read.parquet(s"${cfg.indexDir}/postings")
      .groupBy("vec_id").count().filter(col("count") > 1).count()
    assert(perId == 0, "no vec_id may appear twice after replay")
  }

  test("an index built by plain VectorIndex.build (no persisted " +
    "centroids) adopts the config quantizer on first contact") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_svi_pre").toString
    val idx = s"$root/index"
    // pre-gate index over the even half, labels from the SAME quantizer
    VectorIndex.build(
      VectorIndex.assignLabels(
        emb.filter(pmod(col("vec_id"), lit(2)) === 0)
          .select(col("vec_id"), col("embedding")), centroids),
      VectorIndex.Spec(8, codebook.head._2.length, codebook), idx)
    assert(!new java.io.File(s"$idx/centroids").exists())

    val rows = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
      .select(col("vec_id"), col("embedding")).as[SVec].collect().toSeq
    StreamingVectorIngest.ingest(cfgFor(idx))(rows.toDF(), 0L)
    // quantizer adopted + persisted; combined index == one-shot build
    assert(VectorIndex.loadCentroids(spark, idx).map(_._1).toSeq ==
      centroids.map(_._1).toSeq)
    val ref = s"$root/ref"
    VectorIndex.build(
      VectorIndex.assignLabels(emb.select(col("vec_id"), col("embedding")),
        centroids),
      VectorIndex.Spec(8, codebook.head._2.length, codebook), ref)
    assert(postings(idx) == postings(ref))
  }

  test("restart with a DIFFERENT config quantizer cannot fork the " +
    "encoding: the persisted centroids win") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_svi_rs").toString
    val cfg = cfgFor(s"$root/index")
    val rows = emb.select(col("vec_id"), col("embedding")).as[SVec]
      .collect().toSeq
    StreamingVectorIngest.ingest(cfg)(
      rows.filter(_.vec_id % 2 == 0).toDF(), 0L)

    // "restart": a config pointing at DIFFERENT centroids (first 2 only)
    val forked = cfg.copy(centroids = centroids.take(2))
    StreamingVectorIngest.ingest(forked)(
      rows.filter(_.vec_id % 2 == 1).toDF(), 1L)

    // persisted quantizer unchanged, and the full index still equals the
    // one-shot build under the ORIGINAL centroids
    val persisted = VectorIndex.loadCentroids(spark, cfg.indexDir)
    assert(persisted.map(_._1).toSeq == centroids.map(_._1).toSeq)
    val ref = s"$root/ref"
    VectorIndex.build(
      VectorIndex.assignLabels(emb.select(col("vec_id"), col("embedding")),
        centroids),
      VectorIndex.Spec(8, codebook.head._2.length, codebook), ref)
    assert(postings(cfg.indexDir) == postings(ref))
  }

  test("deferMaintenance: crossing the threshold only SIGNALS compaction " +
    "(no rewrite inside the batch); an out-of-band compact clears it") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_svi_defer").toString
    val cfg = cfgFor(s"$root/index")
      .copy(compactThreshold = 2, deferMaintenance = true)
    val rows = emb.select(col("vec_id"), col("embedding"))
      .as[SVec].collect().toSeq
    (0 until 6).foreach { i =>
      StreamingVectorIngest.ingest(cfg)(
        rows.filter(_.vec_id % 6 == i).toDF(), i.toLong)
    }
    // no generation flip ran inside any micro-batch (batch latency stays
    // O(batch) across the threshold crossing); the due-signal is pending
    assert(VectorIndex.liveGeneration(spark, cfg.indexDir) == 0,
      "deferMaintenance must not compact inside the micro-batch")
    assert(VectorIndex.maxFilesPerLabel(spark, cfg.indexDir) >
      cfg.compactThreshold)
    assert(VectorIndex.maintenanceDue(spark, cfg.indexDir))
    // the out-of-band maintainer acts on the signal (the packaged
    // graft.IndexMaintainer, exercising its VECTOR-kind detection); its
    // successful flip clears the flag and answers are unchanged vs the
    // one-shot build
    val sweep = IndexMaintainer.runOnce(spark, Seq(cfg.indexDir)).head
    assert(sweep.kind == "vector" && sweep.due && sweep.compacted &&
      sweep.error.isEmpty, sweep.toString)
    assert(!VectorIndex.maintenanceDue(spark, cfg.indexDir))
    assert(VectorIndex.liveGeneration(spark, cfg.indexDir) == 1)
    assert(VectorIndex.maxFilesPerLabel(spark, cfg.indexDir) == 1)
    val ref = s"$root/ref"
    VectorIndex.build(
      VectorIndex.assignLabels(emb.select(col("vec_id"), col("embedding")),
        centroids),
      VectorIndex.Spec(8, codebook.head._2.length, codebook), ref)
    val qGate = VectorIndex.assignLabels(
        emb.filter(col("vec_id") < 10)
          .select(col("vec_id"), col("embedding")), centroids)
      .select(col("label"), col("vec_id").as("qid"),
        col("embedding").as("qv"))
    assert(VectorIndex.searchTopK(spark, cfg.indexDir, qGate, k = 3)
      .orderBy("qid", "rank").collect().map(_.toString)
      .sameElements(VectorIndex.searchTopK(spark, ref, qGate, k = 3)
        .orderBy("qid", "rank").collect().map(_.toString)))
    // and the gate keeps ingesting against the compacted generation
    StreamingVectorIngest.ingest(cfg)(
      rows.filter(_.vec_id % 6 == 0).map(v => v.copy(vec_id = v.vec_id + 10000))
        .toDF(), 6L)
    assert(VectorIndex.liveGeneration(spark, cfg.indexDir) == 1)
  }

  test("compactThreshold: the gate auto-compacts once a label dir " +
    "exceeds the file budget; search answers unchanged") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_svi_cmp").toString
    val cfg = cfgFor(s"$root/index").copy(compactThreshold = 2)
    val rows = emb.select(col("vec_id"), col("embedding"))
      .as[SVec].collect().toSeq
    // 6 micro-batches: without compaction the hot label dirs would hold
    // 6 files; the gate must keep every label dir at <= threshold + 1
    // (one batch may land before the listing triggers)
    (0 until 6).foreach { i =>
      StreamingVectorIngest.ingest(cfg)(
        rows.filter(_.vec_id % 6 == i).toDF(), i.toLong)
    }
    assert(VectorIndex.maxFilesPerLabel(spark, cfg.indexDir) <=
      cfg.compactThreshold + 1,
      "auto-compaction did not bound per-label file count")
    // at least one compaction actually happened (generation advanced)
    assert(new java.io.File(s"${cfg.indexDir}/gen").exists(),
      "no generation pointer: compaction never fired")
    // and the gate's index still equals the one-shot build
    val ref = s"$root/ref"
    VectorIndex.build(
      VectorIndex.assignLabels(emb.select(col("vec_id"), col("embedding")),
        centroids),
      VectorIndex.Spec(8, codebook.head._2.length, codebook), ref)
    // query labels must match the gate's computed assignment
    val qGate = VectorIndex.assignLabels(
        emb.filter(col("vec_id") < 10)
          .select(col("vec_id"), col("embedding")), centroids)
      .select(col("label"), col("vec_id").as("qid"),
        col("embedding").as("qv"))
    assert(VectorIndex.searchTopK(spark, cfg.indexDir, qGate, k = 3)
      .orderBy("qid", "rank").collect().map(_.toString)
      .sameElements(VectorIndex.searchTopK(spark, ref, qGate, k = 3)
        .orderBy("qid", "rank").collect().map(_.toString)))
  }
}
