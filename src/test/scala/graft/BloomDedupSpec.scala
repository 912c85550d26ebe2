package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.BloomDedup

/** BloomDedup contract: the Bloom prefilter is a PLAN optimization — the
  * result must be bit-identical to the plain anti-join at any filter sizing
  * (an undersized filter only sends more rows through the verify join), and
  * the definitely-new branch must actually bypass the join. */
class BloomDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  private def split(): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val d = Tables.load(spark, dir, "documents")
    (d.filter(pmod(col("doc_id"), lit(10)) >= 8).select("doc_id", "text"),
      d.filter(pmod(col("doc_id"), lit(10)) < 8).select("doc_id", "text"))
  }

  private def exactNew(batch: org.apache.spark.sql.DataFrame,
                       corpus: org.apache.spark.sql.DataFrame): Set[Long] =
    batch.join(corpus.select(md5(col("text")).as("__h")).distinct(),
        md5(col("text")) === col("__h"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet

  test("bloom-prefiltered result ≡ plain anti-join (with planted duplicates)") {
    val (b0, corpus) = split()
    // plant exact duplicates: every third batch doc copies a corpus text
    val donor = corpus.select(col("doc_id").as("src_id"), col("text").as("src_text"))
    val batch = b0.withColumn("src_id", col("doc_id") - pmod(col("doc_id"), lit(10)))
      .join(donor, "src_id")
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(3)) === 0, col("src_text"))
          .otherwise(col("text")).as("text"))
    val expect = exactNew(batch, corpus)
    assert(expect.nonEmpty && expect.size < batch.count(),
      "fixture must exercise both keep and drop paths")
    val got = BloomDedup.newDocs(batch, corpus, "text", 4096L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expect)
    Caches.drain()
  }

  test("result is invariant to filter sizing (undersized filter = more FPs only)") {
    val (batch, corpus) = split()
    val expect = exactNew(batch, corpus)
    // 16 expected items for a 400-doc corpus: heavily undersized, high fpp
    val tiny = BloomDedup.newDocs(batch, corpus, "text", 16L, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(tiny == expect)
    Caches.drain()
  }

  test("definitely-new rows bypass the verify join; probe is a plan-time literal") {
    val (batch, corpus) = split()
    val bf = corpus.select(xxhash64(col("text")).as("__k"))
      .stat.bloomFilter("__k", 4096L, 0.01)
    // no cross-split exact dups in the raw fixture: nearly every batch row
    // must be rejected by the probe (only fpp-rate survivors)
    val maybes = batch.filter(
      BloomDedup.mightContain({
        val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos); bos.toByteArray
      }, xxhash64(col("text")))).count()
    assert(maybes <= batch.count() / 4,
      s"bloom should reject most novel rows, but $maybes of ${batch.count()} passed")
    // the composed operator's plan carries the codegen'd probe expression
    val p = BloomDedup.newDocs(batch, corpus, "text", 4096L)
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), p)
    assert(p.contains("LeftAnti"), p)
    Caches.drain()
  }

  test("SHARDED result ≡ plain anti-join at several bucket counts, incl. " +
    "buckets > distinct texts (empty buckets = definitely new)") {
    val (b0, corpus) = split()
    val donor = corpus.select(col("doc_id").as("src_id"), col("text").as("src_text"))
    val batch = b0.withColumn("src_id", col("doc_id") - pmod(col("doc_id"), lit(10)))
      .join(donor, "src_id")
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(3)) === 0, col("src_text"))
          .otherwise(col("text")).as("text"))
    val expect = exactNew(batch, corpus)
    assert(expect.nonEmpty && expect.size < batch.count())
    for (buckets <- Seq(1, 4, 16, 1024)) {
      val got = BloomDedup.newDocsSharded(batch, corpus, "text",
          expectedItemsPerBucket = 64L, buckets = buckets)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == expect, s"sharded($buckets) diverged from the anti-join")
    }
    Caches.drain()
  }

  test("sharded: null-text batch rows are kept (anti-join parity) and " +
    "per-bucket bitmaps shrink as buckets grow (no single big bitmap)") {
    val (b0, corpus) = split()
    import spark.implicits._
    val withNulls = b0.unionByName(
      Seq((900001L, null.asInstanceOf[String]),
        (900002L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val expect = exactNew(withNulls, corpus)
    assert(Set(900001L, 900002L).subsetOf(expect),
      "anti-join keeps null-text rows; sharded must too")
    val got = BloomDedup.newDocsSharded(withNulls, corpus, "text", 64L,
        buckets = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expect)
    // the memory claim behind sharding: per-bucket serialized bitmap bytes
    // drop as the corpus spreads over more buckets — the building block
    // that replaces a single ~1.2 GB driver bitmap at 10⁹ docs
    def maxBloomBytes(buckets: Int): Long =
      BloomDedup.bucketBlooms(corpus, "text",
          expectedItemsPerBucket = math.max(4096L / buckets, 16L),
          fpp = 0.01, buckets = buckets)
        .select(max(length(col("__bloom")))).head().getInt(0).toLong
    val b4 = maxBloomBytes(4)
    val b64 = maxBloomBytes(64)
    assert(b64 < b4, s"per-bucket bitmap must shrink: 4→$b4 bytes, 64→$b64")
    Caches.drain()
  }
}
