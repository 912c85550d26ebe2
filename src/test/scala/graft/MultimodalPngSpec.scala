package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Multimodal

/** Real-bytes multimodal path: PNGs synthesized and decoded through
  * javax.imageio (in the JDK — no external codec), same partition topology
  * and output schema as the oracle-checked stub path. */
class MultimodalPngSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("synthesized cells are genuine PNG files") {
    val docs = Tables.load(spark, dir, "documents").limit(20)
    val cells = Multimodal.synthesizePng(docs).collect()
    assert(cells.length == 20)
    cells.foreach { c =>
      val b = c.media
      // PNG signature: 89 50 4E 47 0D 0A 1A 0A
      assert((b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G',
        s"doc ${c.doc_id}: missing PNG signature")
    }
  }

  test("real decode recovers the synthesized dimensions, channels, pixels") {
    val docs = Tables.load(spark, dir, "documents").limit(50)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val meta = Multimodal.decodePng(Multimodal.synthesizePng(docs))
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta.size == 50)
    texts.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val m = meta(id)
      assert(m.width == (bytes.length % 13) + 2, s"doc $id width")
      assert(m.height == (bytes.length % 11) + 2, s"doc $id height")
      assert(m.channels == 3, s"doc $id channels")
      // recompute the expected pixel checksum from the synthesis rule
      var expected = 0L
      for (i <- 0 until m.width * m.height * 3)
        expected += (bytes(i % bytes.length) & 0xFF)
      assert(m.checksum == expected, s"doc $id pixel checksum")
      assert(m.fps == 0 && m.n_bytes > 8)
    }
  }

  test("decoded metadata composes with the downstream resize operator") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents").limit(10)
    val meta = Multimodal.decodePng(Multimodal.synthesizePng(docs))
    val resized = Multimodal.resize(meta, maxDim = 4)
      .select("doc_id", "out_width", "out_height").collect()
    resized.foreach { r =>
      assert(r.getInt(1) <= 4 && r.getInt(2) <= 4)
      assert(r.getInt(1) >= 1 && r.getInt(2) >= 1)
    }
  }

  test("corrupt bytes fail decode with a clear error, not garbage metadata") {
    import spark.implicits._
    val bad = Seq(Multimodal.MediaCell(1L, Array[Byte](1, 2, 3, 4))).toDS()
    val e = intercept[Exception](Multimodal.decodePng(bad).collect())
    val chain = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("not a decodable image"), chain)
  }
}
