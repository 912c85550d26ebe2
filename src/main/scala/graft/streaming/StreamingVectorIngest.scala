package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.VectorIndex

/** Streaming ANN ingestion gate: each micro-batch of embeddings is labeled
  * by the index's FROZEN coarse quantizer, PQ-encoded under its frozen
  * codebook, and appended into the persisted posting lists — the
  * `foreachBatch` packaging of [[VectorIndex.append]], and the vector
  * analog of [[StreamingDedup]]. Per batch the work is O(batch): a
  * map-side argmax over the bounded centroid set, a map-side PQ encode,
  * and an append that touches only the arriving labels' directories — the
  * resident corpus codes are never read or re-encoded, so an hourly
  * embedding drop at 100 TB costs the drop, not the corpus.
  *
  * First batch bootstraps the index when none exists: the quantizer
  * (centroids) and PQ codebook must be SUPPLIED by config — training is a
  * deliberate offline step (the `ann_ivf_kmeans` / trained-PQ queries),
  * never something a gate infers from whatever batch happens to arrive
  * first. Both freeze into `indexDir` (`meta` + `centroids`), so every
  * later batch — and every later SESSION — quantizes identically; that
  * frozen-quantizer property is exactly why streamed ingestion is
  * row-identical to a one-shot batch build over the union
  * (`StreamingVectorIngestSpec` asserts it via [[VectorIndex.searchTopK]]).
  *
  * In-batch duplicate vec_ids keep the first occurrence (deterministic:
  * min struct by vec_id is order-invariant); re-delivery of an already-
  * indexed vec_id is the caller's exactly-once concern, same retry
  * posture as [[StreamingDedup]] (route through an idempotent sink or
  * dedupe upstream — the gate's contract is the ENCODE/APPEND decision,
  * which is deterministic and replay-stable).
  */
object StreamingVectorIngest {

  /** `codebook`/`centroids` seed the index if `indexDir` is empty; once
    * the index exists the PERSISTED quantizer wins (config copies are
    * ignored — a restart with different training cannot silently fork the
    * encoding). */
  final case class Config(indexDir: String,
                          numSub: Int, dim: Int,
                          codebook: Array[(Long, Array[Float])],
                          centroids: Array[(Long, Array[Float])],
                          idCol: String = "vec_id",
                          vecCol: String = "embedding")

  /** the foreachBatch handler: `.writeStream.foreachBatch(
    *   StreamingVectorIngest.ingest(cfg) _)` */
  def ingest(cfg: Config)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val rows = batch
      .select(col(cfg.idCol).cast("long").as("vec_id"),
        col(cfg.vecCol).as("embedding"))
      .groupBy("vec_id").agg(min_by(col("embedding"),
        xxhash64(col("embedding"))).as("embedding"))
    val fresh = !VectorIndex.exists(spark, cfg.indexDir)
    val centroids =
      if (fresh) cfg.centroids
      else VectorIndex.loadCentroids(spark, cfg.indexDir)
    val labeled = VectorIndex.assignLabels(rows, centroids)
    if (fresh) {
      VectorIndex.build(labeled,
        VectorIndex.Spec(cfg.numSub, cfg.dim, cfg.codebook), cfg.indexDir)
      VectorIndex.saveCentroids(spark, cfg.indexDir, centroids)
    } else VectorIndex.append(labeled, cfg.indexDir)
  }
}
