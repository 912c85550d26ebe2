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
  * The ORACLE-CHECKED path decodes a deterministic fake 8-byte header
  * [magic, w_hi, w_lo, h_hi, h_lo, channels, fps, reserved] exactly as a
  * real decoder would parse a container header (DuckDB can replay it, so
  * the full pipeline hash-matches). REAL decoders run beside it with the
  * SAME topology using only JDK codecs: PNG via javax.imageio
  * ([[synthesizePng]]/[[decodePng]]) and WAV via javax.sound.sampled
  * ([[synthesizeWav]]/[[decodeWav]]) — spec-verified on genuine bytes.
  * Schema, batching, partitioning, and metadata typing are identical
  * across all three.
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

  final case class AudioMeta(doc_id: Long, sample_rate: Int, n_channels: Int,
                             n_frames: Long, bits: Int, pcm_checksum: Long)

  /** REAL WAV path (like the PNG path, no external codec needed —
    * javax.sound.sampled ships in the JDK): a deterministic 16-bit PCM
    * mono waveform derived from the doc's text bytes, containerized as a
    * WAVE file. Partition-parallel, no driver state. */
  def synthesizeWav(docs: DataFrame): Dataset[MediaCell] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          // empty doc → single zero byte: the modulo cycling below must
          // never divide by zero
          val bytes = {
            val b = text.getBytes("UTF-8")
            if (b.isEmpty) Array[Byte](0) else b
          }
          val nFrames = (bytes.length % 50) + 10
          val pcm = new Array[Byte](nFrames * 2)
          var i = 0
          while (i < nFrames) {
            val s = ((bytes(i % bytes.length) & 0xFF) - 128) * 256
            pcm(i * 2) = (s & 0xFF).toByte
            pcm(i * 2 + 1) = ((s >> 8) & 0xFF).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
            true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          MediaCell(id, bos.toByteArray)
        }
      }
  }

  /** REAL WAV decode: container parse + PCM sample checksum through the
    * same per-partition topology as every other decoder here. */
  def decodeWav(cells: Dataset[MediaCell]): Dataset[AudioMeta] = {
    import cells.sparkSession.implicits._
    cells.mapPartitions { it =>
      it.map { cell =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(cell.media))
        val fmt = ais.getFormat
        val nFrames = ais.getFrameLength
        val pcm = ais.readAllBytes()
        ais.close()
        var sum = 0L
        var i = 0
        while (i + 1 < pcm.length) {
          // little-endian signed 16-bit samples
          sum += (((pcm(i + 1) & 0xFF) << 8) | (pcm(i) & 0xFF)).toShort.toLong
          i += 2
        }
        AudioMeta(cell.doc_id, fmt.getSampleRate.toInt, fmt.getChannels,
          nFrames, fmt.getSampleSizeInBits, sum)
      }
    }
  }

  final case class AudioFingerprint(doc_id: Long, n_frames: Long,
                                    fingerprint: Long)

  /** Acoustic fingerprint over REAL decoded PCM (the chromaprint shape,
    * reduced to what a codec-free JDK can compute): frame the decoded
    * 16-bit samples into windows of `window`, take each window's energy
    * Σs², and emit one bit per window — 1 where the window's energy
    * exceeds the clip's integer mean energy. Every step is integer
    * arithmetic on the decoded samples, so the fingerprint is bit-exact
    * across engines and parallelism — the property that lets the oracle
    * replay it symbolically from the source text while Spark computes it
    * from the actual WAV container. Partition-parallel mapPartitions,
    * the per-partition init seam a real DSP library would plug into. */
  def audioFingerprint(cells: Dataset[MediaCell],
                       window: Int = 4): Dataset[AudioFingerprint] = {
    import cells.sparkSession.implicits._
    cells.mapPartitions { it =>
      it.map { cell =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(cell.media))
        val pcm = ais.readAllBytes()
        ais.close()
        val n = pcm.length / 2
        val nw = (n + window - 1) / window
        val energies = new Array[Long](nw)
        var i = 0
        while (i < n) {
          val s = (((pcm(2 * i + 1) & 0xFF) << 8) | (pcm(2 * i) & 0xFF))
            .toShort.toLong
          energies(i / window) += s * s
          i += 1
        }
        var tot = 0L
        var w = 0
        while (w < nw) { tot += energies(w); w += 1 }
        val mean = tot / nw
        var fp = 0L
        var j = 0
        while (j < nw) { if (energies(j) > mean) fp |= 1L << j; j += 1 }
        AudioFingerprint(cell.doc_id, n.toLong, fp)
      }
    }
  }

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

  final case class ImageHash(doc_id: Long, width: Int, height: Int,
                             ahash: Long)

  /** Perceptual average-hash (aHash) over REAL decoded pixels: ImageIO
    * inflates the PNG, pixels fall into an 8×8 grid of bins
    * (bin = (y·8/h)·8 + x·8/w), and bit k is set iff bin k's gray sum is
    * strictly above the image mean — all in INTEGER arithmetic
    * (binSum·N > total·n_k), so the oracle replays it exactly with no
    * float rounding hazard. Near-identical images land within a small
    * Hamming distance; the hash is 8 bytes per image no matter the
    * resolution — the fingerprint you ship to the dedup join instead of
    * the pixels. Entirely map-side (the 100 TB shape: decode cost scales
    * per partition, nothing shuffles but (id, hash)). */
  def perceptualHash(cells: Dataset[MediaCell]): Dataset[ImageHash] = {
    import cells.sparkSession.implicits._
    cells.mapPartitions { it =>
      it.map { cell =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(cell.media))
        val w = img.getWidth
        val h = img.getHeight
        val binSum = new Array[Long](64)
        val binN = new Array[Long](64)
        var total = 0L
        var n = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val gray = ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
            val bin = (y * 8 / h) * 8 + (x * 8 / w)
            binSum(bin) += gray
            binN(bin) += 1
            total += gray
            n += 1
            x += 1
          }
          y += 1
        }
        var hash = 0L
        var k = 0
        while (k < 64) {
          if (binN(k) > 0 && binSum(k) * n > total * binN(k)) hash |= (1L << k)
          k += 1
        }
        ImageHash(cell.doc_id, w, h, hash)
      }
    }
  }

  /** REAL image path — javax.imageio ships in the JDK, so PNG decode needs
    * no external codec: manufacture a genuine PNG per document (BufferedImage
    * → ImageIO.write), deterministic in the document's text. Same
    * mapPartitions topology as the stub path; the cells it emits are valid
    * PNG files any decoder reads. */
  def synthesizePng(docs: DataFrame): Dataset[MediaCell] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          // empty doc → single zero byte: the modulo cycling below must
          // never divide by zero
          val bytes = {
            val b = text.getBytes("UTF-8")
            if (b.isEmpty) Array[Byte](0) else b
          }
          val w = (bytes.length % 13) + 2
          val h = (bytes.length % 11) + 2
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              // deterministic pixels: cycle the text bytes through RGB
              val i = (y * w + x) * 3
              val r = bytes(i % bytes.length) & 0xFF
              val g = bytes((i + 1) % bytes.length) & 0xFF
              val b = bytes((i + 2) % bytes.length) & 0xFF
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaCell(id, bos.toByteArray)
        }
      }
  }

  /** REAL decode: ImageIO parses the PNG container and inflates the pixel
    * data — width/height/channels come from the actual image, the checksum
    * folds the decoded RGB samples (so a pixel-level corruption changes it,
    * not just a byte-level one). fps = 0 for stills. Same output schema as
    * the stub decode, so everything downstream (resize, frame sampling,
    * feature extraction, ANN) composes unchanged. */
  def decodePng(cells: Dataset[MediaCell]): Dataset[MediaMeta] = {
    import cells.sparkSession.implicits._
    cells.mapPartitions { it =>
      // per-partition init: a pooled ImageReader would be constructed here
      it.map { cell =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(cell.media))
        require(img != null, s"doc ${cell.doc_id}: not a decodable image")
        val w = img.getWidth
        val h = img.getHeight
        val channels = img.getRaster.getNumBands
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
            x += 1
          }
          y += 1
        }
        MediaMeta(cell.doc_id, w, h, channels, 0, cell.media.length, sum)
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
      // clamp to >= 1 px: an extreme aspect ratio must not floor the short
      // side to zero (every real resize kernel does the same)
      .withColumn("out_width",
        greatest(floor(col("width") * col("scale")), lit(1)).cast("int"))
      .withColumn("out_height",
        greatest(floor(col("height") * col("scale")), lit(1)).cast("int"))
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

  final case class FrameLum(doc_id: Long, frame_idx: Int, lum: Long, fps: Int)

  /** Per-frame luminance for "video" cells — the decode half of scene-cut
    * detection. Frame f's luminance = sum of body bytes at positions ≡ f
    * (mod fps): one pass over the blob, all integer arithmetic, so the
    * oracle replays it symbolically from the source text while Spark folds
    * the actual decoded bytes (a real build swaps this for the codec's
    * per-frame Y-plane mean inside the same mapPartitions seam — one
    * decoder per partition, frames emitted as rows). */
  def frameLuminance(cells: Dataset[MediaCell]): Dataset[FrameLum] = {
    import cells.sparkSession.implicits._
    cells.mapPartitions { it =>
      it.flatMap { cell =>
        val b = cell.media
        require(b.length >= 8 && (b(0) & 0xFF) == 71, "bad media magic")
        val fps = b(6) & 0xFF
        val lums = new Array[Long](fps)
        var i = 8
        while (i < b.length) { lums((i - 8) % fps) += (b(i) & 0xFF); i += 1 }
        // only frames that received >= 1 body byte exist: a clip shorter than
        // fps must not emit zero-filled phantom tail frames (they would fake
        // a luminance cliff at the clip boundary)
        val emitted = math.min(fps, b.length - 8)
        (0 until emitted).iterator.map(f => FrameLum(cell.doc_id, f, lums(f), fps))
      }
    }
  }
}
