package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media travels as
  * opaque BINARY columns with typed metadata structs; decode / feature
  * extraction runs partition-parallel via typed `mapPartitions` (the Scala
  * analog of `mapInPandas` batch UDFs — one iterator per partition, so a real
  * decoder would amortize codec/model initialization per partition, never per
  * row, and no data ever routes through the driver).
  *
  * The actual byte decoding is STUBBED deterministically (this container has
  * no image/audio codecs): a fake 8-byte header [magic, w_hi, w_lo, h_hi,
  * h_lo, channels, fps, reserved] is parsed exactly as a real decoder would
  * parse a PNG/WAV header. Everything around the stub — schema, batching,
  * partitioning, metadata typing — is production-shaped and tested.
  */
object Multimodal {

  final case class MediaCell(doc_id: Long, media: Array[Byte])
  final case class MediaMeta(doc_id: Long, width: Int, height: Int,
                             channels: Int, fps: Int, n_bytes: Int,
                             checksum: Long)

  /** Manufacture a deterministic fake media blob per document: 8-byte header
    * derived from the doc's text bytes + the text itself as "pixel data".
    * Pure expression — no shuffle, no driver state. */
  def synthesizeMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(
        // header: magic 0x47, width/height/channels/fps from content lengths
        // every header byte stays < 128 so the UTF-8 cast to binary is
        // one byte per chr() (codepoints ≥ 128 would encode as two bytes)
        expr("""concat(
          |  chr(71),
          |  chr(pmod(length(text), 4) + 1),
          |  chr(pmod(length(text), 97)),
          |  chr(pmod(n_chars, 3) + 1),
          |  chr(pmod(n_chars, 89)),
          |  chr(pmod(length(lang), 4) + 1),
          |  chr(pmod(length(source), 30) + 1),
          |  chr(0))""".stripMargin).cast("binary"),
        col("text").cast("binary")).as("media"))

  /** STUB decode: parse the fake header + checksum the body. A real
    * implementation would replace ONLY the body of the `map` below with
    * a codec call (e.g. javax.imageio / ffmpeg JNI); the partition topology
    * and output schema stay identical. */
  def decodeMeta(cells: Dataset[MediaCell]): Dataset[MediaMeta] = {
    import cells.sparkSession.implicits._
    cells.mapPartitions { it =>
      // per-partition init would construct the decoder ONCE here
      it.map { cell =>
        val b = cell.media
        require(b.length >= 8 && (b(0) & 0xFF) == 71, "bad media magic")
        val width = ((b(1) & 0xFF) << 8) | (b(2) & 0xFF)
        val height = ((b(3) & 0xFF) << 8) | (b(4) & 0xFF)
        val channels = b(5) & 0xFF
        val fps = b(6) & 0xFF
        var sum = 0L
        var i = 8
        while (i < b.length) { sum += (b(i) & 0xFF); i += 1 }
        MediaMeta(cell.doc_id, width, height, channels, fps, b.length, sum)
      }
    }
  }

  final case class MediaFeature(doc_id: Long, embedding: Array[Float])

  /** STUB feature extraction — the batched-inference shape (mapInPandas /
    * predict_batch_udf analog): a real implementation constructs the
    * vision/audio model ONCE per partition and runs the iterator through it
    * in batches; the stub folds body bytes into a `dim`-component vector
    * (component j = sum of body bytes at positions ≡ j mod dim — integer
    * sums, exactly representable in Float). Output feeds the ANN/near-dup
    * operators directly. */
  def extractFeatures(cells: Dataset[MediaCell], dim: Int = 8): Dataset[MediaFeature] = {
    import cells.sparkSession.implicits._
    cells.mapPartitions { it =>
      // per-partition init: real model/codec handle would be built here
      it.map { cell =>
        val b = cell.media
        val e = new Array[Float](dim)
        var i = 8
        while (i < b.length) {
          e((i - 8) % dim) = e((i - 8) % dim) + (b(i) & 0xFF)
          i += 1
        }
        MediaFeature(cell.doc_id, e)
      }
    }
  }

  /** STUB resize: recompute header dims (a real kernel would transform the
    * pixel body); emits the new metadata. Demonstrates the
    * binary-in/binary-out transform shape. */
  def resize(meta: Dataset[MediaMeta], maxDim: Int): DataFrame = {
    import meta.sparkSession.implicits._
    meta.toDF().withColumn("scale",
        when(greatest(col("width"), col("height")) > maxDim,
          lit(maxDim) / greatest(col("width"), col("height")).cast("double"))
          .otherwise(1.0))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))
      .drop("scale")
  }

  /** STUB frame sampling for "video" cells: pick every k-th of `fps *
    * seconds` virtual frames — emits (doc_id, frame_idx) pairs, the explode
    * shape a real frame sampler produces. */
  def sampleFrames(meta: Dataset[MediaMeta], everyK: Int): DataFrame = {
    import meta.sparkSession.implicits._
    meta.toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("fps") - 1, lit(everyK))))
      .select("doc_id", "frame_idx")
  }
}
