package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Multimodal

/** Real-bytes multimodal AUDIO path: WAVs synthesized and decoded through
  * javax.sound.sampled (in the JDK — no external codec), same partition
  * topology and output schema as the image paths. */
class MultimodalWavSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("synthesized cells are genuine RIFF/WAVE files") {
    val docs = Tables.load(spark, dir, "documents").limit(20)
    val cells = Multimodal.synthesizeWav(docs).collect()
    assert(cells.length == 20)
    cells.foreach { c =>
      val b = c.media
      assert(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E',
        s"doc ${c.doc_id}: missing RIFF/WAVE header")
    }
  }

  test("real decode recovers format, frame count, and exact PCM samples") {
    val docs = Tables.load(spark, dir, "documents").limit(50)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val meta = Multimodal.decodeWav(Multimodal.synthesizeWav(docs))
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta.size == 50)
    texts.foreach { case (id, text) =>
      val m = meta(id)
      val bytes = text.getBytes("UTF-8")
      val nFrames = (bytes.length % 50) + 10
      assert(m.sample_rate == 8000 && m.n_channels == 1 && m.bits == 16,
        s"doc $id: wrong format $m")
      assert(m.n_frames == nFrames.toLong, s"doc $id: frames $m")
      // recompute the expected signed-sample checksum from the text bytes
      var want = 0L
      var i = 0
      while (i < nFrames) {
        want += (((bytes(i % bytes.length) & 0xFF) - 128) * 256).toLong
        i += 1
      }
      assert(m.pcm_checksum == want, s"doc $id: checksum $m want $want")
    }
  }
}
