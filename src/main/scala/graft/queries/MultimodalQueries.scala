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

  def oracleSql: Map[String, String] = Map(
    "mm_decode_meta" -> s"""$metaSql
      SELECT doc_id, width, height, channels, fps, n_bytes, checksum
      FROM m ORDER BY doc_id""",

    "mm_resize" -> s"""$metaSql
      SELECT doc_id, width, height,
             CAST(floor(width * CASE WHEN greatest(width, height) > 256
               THEN 256 / CAST(greatest(width, height) AS DOUBLE) ELSE 1.0 END) AS INTEGER) AS out_width,
             CAST(floor(height * CASE WHEN greatest(width, height) > 256
               THEN 256 / CAST(greatest(width, height) AS DOUBLE) ELSE 1.0 END) AS INTEGER) AS out_height
      FROM m ORDER BY doc_id""",

    "mm_frames" -> s"""$metaSql
      SELECT doc_id, CAST(f.frame_idx AS INTEGER) AS frame_idx
      FROM m, (SELECT unnest(range(0, 30, 3)) AS frame_idx) f
      WHERE f.frame_idx < fps
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
