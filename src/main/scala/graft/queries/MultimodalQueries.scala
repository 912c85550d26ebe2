package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Multimodal

/** Multimodal-column surface: binary media cells + typed metadata, decode /
  * resize / frame-sample via partition-parallel typed operators. The decode
  * stub is deterministic byte arithmetic, so the DuckDB oracle reproduces it
  * from the source columns — proving the bytes that crossed the
  * mapPartitions boundary are exactly the bytes the expression synthesized. */
object MultimodalQueries {

  private def meta(s: SparkSession, dir: String) = {
    import s.implicits._
    Multimodal.decodeMeta(
      Multimodal.synthesizeMedia(Tables.load(s, dir, "documents"))
        .as[Multimodal.MediaCell])
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "mm_decode_meta" -> ((s, dir) =>
      meta(s, dir).toDF()
        .select("doc_id", "width", "height", "channels", "fps", "n_bytes", "checksum")
        .orderBy("doc_id")),

    "mm_resize" -> ((s, dir) =>
      Multimodal.resize(meta(s, dir), maxDim = 256)
        .select("doc_id", "width", "height", "out_width", "out_height")
        .orderBy("doc_id")),

    "mm_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(meta(s, dir), everyK = 3)
        .orderBy("doc_id", "frame_idx")),

    // perceptual image fingerprint: aHash over the REAL decoded PNG pixels
    // (8×8 grid bins, integer-arithmetic threshold against the image mean).
    // The oracle recomputes the identical hash from the pixel-generation
    // arithmetic — so this also proves encode→decode is pixel-exact.
    // acoustic fingerprint over the REAL WAV path: decode the container,
    // frame the 16-bit PCM into 4-sample windows, 1 bit per window where
    // the window energy exceeds the clip's integer mean — all integer
    // arithmetic, so the oracle replays it symbolically from the source
    // text while Spark computes it from the actual decoded bytes.
    // fp_dups counts other docs with the identical fingerprint (the audio
    // dedup candidate set); the window key (n_frames, fingerprint) is
    // high-cardinality, never a global sort.
    "mm_audio_fingerprint" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("n_frames", "fingerprint")
      Multimodal.audioFingerprint(
          Multimodal.synthesizeWav(Tables.load(s, dir, "documents")))
        .toDF()
        .withColumn("fp_dups", (count(lit(1)).over(w) - 1).cast("long"))
        .orderBy("doc_id")
    }),

    "mm_phash" -> ((s, dir) => {
      import s.implicits._
      Multimodal.perceptualHash(
          Multimodal.synthesizePng(Tables.load(s, dir, "documents")))
        .toDF().orderBy("doc_id")
    }),

    // image near-dup dedup over the perceptual hash: the SimHash banding
    // pattern applied to media — 4×16-bit bands block the pair space
    // (candidates share at least one band), exact Hamming distance
    // verifies. Only (id, hash, band) rows shuffle; pixels never leave
    // the map side. 100 TB of images dedups on 8-byte fingerprints.
    // The (doc_id, ahash) frame is materialized once — both sides of the
    // band self-join read the 16-byte rows, not the PNG decode lineage.
    "mm_phash_dedup" -> ((s, dir) => {
      import s.implicits._
      val ph = graft.Caches.tracked(Multimodal.perceptualHash(
          Multimodal.synthesizePng(Tables.load(s, dir, "documents"))).toDF())
      val bands = ph.select(col("doc_id"), col("ahash"),
          explode(expr("sequence(0, 3)")).as("b"))
        .withColumn("band_val",
          expr("shiftright(ahash, cast(b * 16 as int)) & 65535"))
      val l = bands.select(col("b"), col("band_val"),
        col("doc_id").as("id1"), col("ahash").as("h1"))
      val r = bands.select(col("b"), col("band_val"),
        col("doc_id").as("id2"), col("ahash").as("h2"))
      l.join(r, Seq("b", "band_val"))
        .filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          expr("cast(bit_count(h1 ^ h2) as int)").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("id1", "id2")
    }),

    // multimodal → similarity composition: features extracted from media
    // cells feed the ANN top-k directly (small query set broadcast, corpus
    // scan stays partitioned — the ann_topk shape over extracted features)
    "mm_ann" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val feats = Multimodal.extractFeatures(
          Multimodal.synthesizeMedia(Tables.load(s, dir, "documents"))
            .as[Multimodal.MediaCell])
        .toDF().select(col("doc_id"), col("embedding"))
      val q = broadcast(feats.filter(col("doc_id") < 5)
        .select(col("doc_id").as("qid"), col("embedding").as("qv")))
      val w = Window.partitionBy("qid")
        .orderBy(col("cos").desc, col("doc_id").asc)
      feats.crossJoin(q)
        .filter(col("doc_id") =!= col("qid"))
        .withColumn("cos", round(
          graft.functions.Similarity.cosine(col("qv"), col("embedding")), 6))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("qid", "rank", "doc_id", "cos")
        .orderBy("qid", "rank")
    }),

    // scene-cut detection over "video" cells: per-frame luminance from the
    // decoder seam, then a LAG window per doc — a cut is a frame whose
    // luminance jump exceeds 1/8 of the clip's mean frame luminance
    // (delta · fps · 8 > total, all integer math). The window partitions by
    // doc_id (≤ fps rows per doc), so 100 TB of video stays doc-local —
    // frame rows shuffle once on doc_id, pixels never leave the map side.
    "mm_scene_cut" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val fr = Multimodal.frameLuminance(
          Multimodal.synthesizeMedia(Tables.load(s, dir, "documents"))
            .as[Multimodal.MediaCell]).toDF()
      val seq = Window.partitionBy("doc_id").orderBy("frame_idx")
      val doc = Window.partitionBy("doc_id")
      fr.withColumn("delta", abs(col("lum") - lag("lum", 1).over(seq)))
        .withColumn("total", sum("lum").over(doc))
        .filter(col("delta") * col("fps") * 8 > col("total"))
        .select(col("doc_id"), col("frame_idx"), col("lum"),
          col("delta").cast("long").as("delta"))
        .orderBy("doc_id", "frame_idx")
    }),

    // media bytes → feature vector (the batched-inference shape); the
    // oracle recomputes the byte folds from the source text, proving the
    // embedding crossing the mapPartitions boundary is byte-exact
    "mm_embed" -> ((s, dir) => {
      import s.implicits._
      val cells = Multimodal.synthesizeMedia(Tables.load(s, dir, "documents"))
        .as[Multimodal.MediaCell]
      Multimodal.extractFeatures(cells).toDF()
        .select(col("doc_id"),
          element_at(col("embedding"), 1).cast("double").as("e0"),
          element_at(col("embedding"), 8).cast("double").as("e7"),
          round(sqrt(expr(
            "aggregate(embedding, 0.0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")),
            6).as("norm"))
        .orderBy("doc_id")
    })
  )

  private val metaSql = """
    WITH m AS (
      SELECT doc_id,
             CAST((length(text) % 4 + 1) * 256 + (length(text) % 97) AS INTEGER) AS width,
             CAST((n_chars % 3 + 1) * 256 + (n_chars % 89) AS INTEGER) AS height,
             CAST(length(lang) % 4 + 1 AS INTEGER) AS channels,
             CAST(length(source) % 30 + 1 AS INTEGER) AS fps,
             CAST(8 + octet_length(text::BLOB) AS INTEGER) AS n_bytes,
             CAST(list_sum([ord(text[i]) FOR i IN range(1, length(text) + 1)]) AS BIGINT) AS checksum
      FROM documents)"""

  /** replays [[Multimodal.perceptualHash]] from the pixel-generation
    * arithmetic of [[Multimodal.synthesizePng]]: pixels cycle the text
    * bytes through RGB, bins are the 8×8 grid, bit k set iff
    * binSum·N > total·n_k (all integers — no float rounding anywhere).
    * DuckDB refuses `1 << 63`, hence the explicit Long.MinValue branch. */
  private val phashSql = """
    WITH d AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS L0 FROM documents),
    dim AS (SELECT doc_id, text,
            CASE WHEN L0 = 0 THEN 1 ELSE L0 END AS L,
            CAST((L0 % 13) + 2 AS INTEGER) AS w,
            CAST((L0 % 11) + 2 AS INTEGER) AS h FROM d),
    px AS (
      SELECT doc_id, w, h,
        i.i % w AS x, i.i // w AS y,
        (CASE WHEN text = '' THEN 0 ELSE ascii(substr(text, CAST((3*i.i) % L AS INTEGER) + 1, 1)) END
         + CASE WHEN text = '' THEN 0 ELSE ascii(substr(text, CAST((3*i.i+1) % L AS INTEGER) + 1, 1)) END
         + CASE WHEN text = '' THEN 0 ELSE ascii(substr(text, CAST((3*i.i+2) % L AS INTEGER) + 1, 1)) END) AS gray
      FROM dim, (SELECT unnest(range(0, 200)) AS i) i
      WHERE i.i < w * h),
    bins AS (
      SELECT doc_id, w, h, (y*8//h)*8 + (x*8//w) AS bin,
             sum(gray) AS s_k, count(*) AS n_k
      FROM px GROUP BY 1, 2, 3, 4),
    tot AS (SELECT doc_id, sum(s_k) AS S, sum(n_k) AS N FROM bins GROUP BY 1),
    bits AS (
      SELECT b.doc_id, b.w, b.h,
             CASE WHEN b.s_k * t.N <= t.S * b.n_k THEN 0
                  WHEN b.bin = 63 THEN -9223372036854775807 - 1
                  ELSE (1::BIGINT << CAST(b.bin AS INTEGER)) END AS bv
      FROM bins b JOIN tot t USING (doc_id)),
    ph AS (
      SELECT doc_id, w AS width, h AS height, bit_or(bv) AS ahash
      FROM bits GROUP BY 1, 2, 3)"""

  def oracleSql: Map[String, String] = Map(
    "mm_decode_meta" -> s"""$metaSql
      SELECT doc_id, width, height, channels, fps, n_bytes, checksum
      FROM m ORDER BY doc_id""",

    "mm_resize" -> s"""$metaSql
      SELECT doc_id, width, height,
             CAST(greatest(floor(width * CASE WHEN greatest(width, height) > 256
               THEN 256 / CAST(greatest(width, height) AS DOUBLE) ELSE 1.0 END), 1) AS INTEGER) AS out_width,
             CAST(greatest(floor(height * CASE WHEN greatest(width, height) > 256
               THEN 256 / CAST(greatest(width, height) AS DOUBLE) ELSE 1.0 END), 1) AS INTEGER) AS out_height
      FROM m ORDER BY doc_id""",

    "mm_frames" -> s"""$metaSql
      SELECT doc_id, CAST(f.frame_idx AS INTEGER) AS frame_idx
      FROM m, (SELECT unnest(range(0, 30, 3)) AS frame_idx) f
      WHERE f.frame_idx < fps
      ORDER BY doc_id, frame_idx""",

    "mm_audio_fingerprint" -> """
      WITH base AS (
        SELECT doc_id,
               CASE WHEN octet_length(text::BLOB) = 0 THEN [0]
                    ELSE [ord(text[i]) FOR i IN range(1, length(text) + 1)]
               END AS bytes
        FROM documents),
      fr AS (
        SELECT doc_id, len(bytes) AS blen,
               (len(bytes) % 50) + 10 AS n_frames, bytes
        FROM base),
      sm AS (
        SELECT doc_id, n_frames,
               [CAST((bytes[((i - 1) % blen) + 1] - 128) * 256 AS BIGINT)
                FOR i IN range(1, n_frames + 1)] AS s
        FROM fr),
      en AS (
        SELECT doc_id, n_frames,
               [CAST(list_sum([x * x FOR x IN s[(w * 4 + 1):(w * 4 + 4)]])
                     AS BIGINT)
                FOR w IN range(0, CAST(ceil(n_frames / 4.0) AS INTEGER))] AS e
        FROM sm),
      fp AS (
        SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
               CAST(coalesce(list_sum([
                 CASE WHEN e[w + 1] > (CAST(list_sum(e) AS BIGINT) // len(e))
                      THEN (CAST(1 AS BIGINT) << w) ELSE 0 END
                 FOR w IN range(0, len(e))]), 0) AS BIGINT) AS fingerprint
        FROM en)
      SELECT doc_id, n_frames, fingerprint,
             CAST(count(*) OVER (PARTITION BY n_frames, fingerprint) - 1
                  AS BIGINT) AS fp_dups
      FROM fp ORDER BY doc_id""",

    "mm_phash" -> s"""$phashSql
      SELECT doc_id, width, height, ahash FROM ph ORDER BY doc_id""",

    "mm_phash_dedup" -> s"""$phashSql,
      bands AS (
        SELECT doc_id, ahash, b.b AS b, (ahash >> (b.b * 16)) & 65535 AS band_val
        FROM ph, (SELECT unnest(range(0, 4)) AS b) b),
      cand AS (
        SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2,
               CAST(bit_count(xor(a.ahash, c.ahash)) AS INTEGER) AS hamming
        FROM bands a JOIN bands c
          ON a.b = c.b AND a.band_val = c.band_val AND a.doc_id < c.doc_id)
      SELECT id1, id2, hamming FROM cand WHERE hamming <= 3
      ORDER BY id1, id2""",

    "mm_ann" -> """
      WITH f AS (
        SELECT doc_id,
               [CAST(list_sum([ord(text[k]) FOR k IN range(j + 1, len(text) + 1, 8)]) AS DOUBLE)
                FOR j IN range(0, 8)] AS e
        FROM documents),
      q AS (SELECT doc_id AS qid, e AS qv FROM f WHERE doc_id < 5),
      scored AS (
        SELECT q.qid, f.doc_id,
               round(list_sum([q.qv[i] * f.e[i] FOR i IN range(1, 9)]) /
                     sqrt(list_sum([q.qv[i] * q.qv[i] FOR i IN range(1, 9)])) /
                     sqrt(list_sum([f.e[i] * f.e[i] FOR i IN range(1, 9)])), 6) AS cos
        FROM f CROSS JOIN q WHERE f.doc_id <> q.qid),
      ranked AS (
        SELECT qid, doc_id, cos,
               CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, doc_id ASC) AS INTEGER) AS rank
        FROM scored)
      SELECT qid, rank, doc_id, cos FROM ranked WHERE rank <= 3 ORDER BY qid, rank""",

    "mm_scene_cut" -> """
      WITH hdr AS (
        SELECT doc_id, (length(source) % 30) + 1 AS fps, text FROM documents),
      fr AS (
        SELECT doc_id, f AS frame_idx, fps,
               CAST(list_sum([ord(text[k])
                              FOR k IN range(f + 1, len(text) + 1, fps)])
                    AS BIGINT) AS lum
        FROM hdr, (SELECT unnest(range(0, 30)) AS f) ff
        WHERE f < fps AND f < len(text)),
      d AS (
        SELECT doc_id, frame_idx, lum, fps,
               abs(lum - lag(lum) OVER (PARTITION BY doc_id ORDER BY frame_idx)) AS delta,
               sum(lum) OVER (PARTITION BY doc_id) AS total
        FROM fr)
      SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx, lum,
             CAST(delta AS BIGINT) AS delta
      FROM d WHERE delta * fps * 8 > total
      ORDER BY doc_id, frame_idx""",

    "mm_embed" -> """
      WITH f AS (
        SELECT doc_id,
               [CAST(list_sum([ord(text[k]) FOR k IN range(j + 1, len(text) + 1, 8)]) AS DOUBLE)
                FOR j IN range(0, 8)] AS e
        FROM documents)
      SELECT doc_id, e[1] AS e0, e[8] AS e7,
             round(sqrt(list_sum([x * x FOR x IN e])), 6) AS norm
      FROM f ORDER BY doc_id"""
  )
}
