package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * An index that predates the gate (built by plain [[VectorIndex.build]],
  * which persists no centroids) adopts the CONFIG centroids on first
  * contact and persists them — after which the persisted copy wins.
  *
  * In-batch duplicate vec_ids keep one deterministic row (min-xxhash of
  * the embedding — order-invariant, so any task arrangement picks the
  * same one). REPLAYED batches are a no-op: the gate records the last
  * applied batchId in `indexDir/_ingest_batch` and skips any batch at or
  * below it — foreachBatch's at-least-once redelivery after a crash
  * cannot double-append a vector (unlike [[StreamingDedup]], whose drop
  * decision self-heals on replay, an ANN append has no such natural
  * idempotence — it needs the marker).
  */
object StreamingVectorIngest {

  /** `codebook`/`centroids` seed the index if `indexDir` is empty; once
    * the index exists the PERSISTED quantizer wins (config copies are
    * ignored — a restart with different training cannot silently fork the
    * encoding). */
  /** `compactThreshold` > 0 auto-compacts the posting lists once any
    * label dir accretes more than that many files (one dir listing per
    * batch; compaction is [[VectorIndex.compact]] — content-neutral, so
    * search answers are unaffected). 0 disables.
    *
    * `deferMaintenance` decouples that compaction from the micro-batch:
    * the gate only SIGNALS compaction-due
    * ([[VectorIndex.signalMaintenanceDue]], one idempotent flag file), so
    * batch latency stays O(batch) across the threshold crossing; an
    * out-of-band maintainer polls [[VectorIndex.maintenanceDue]] and runs
    * [[VectorIndex.compact]] (commit-lock-guarded and append-aware, so
    * safe from any session against the gate's in-flight batches); a
    * successful flip clears the flag. See docs/DEPLOYMENT.md. */
  final case class Config(indexDir: String,
                          numSub: Int, dim: Int,
                          codebook: Array[(Long, Array[Float])],
                          centroids: Array[(Long, Array[Float])],
                          idCol: String = "vec_id",
                          vecCol: String = "embedding",
                          compactThreshold: Int = 0,
                          deferMaintenance: Boolean = false)

  /** the foreachBatch handler: `.writeStream.foreachBatch(
    *   StreamingVectorIngest.ingest(cfg) _)` */
  def ingest(cfg: Config)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (BatchMarker.alreadyApplied(spark, cfg.indexDir, batchId)) return
    val rows = batch
      .select(col(cfg.idCol).cast("long").as("vec_id"),
        col(cfg.vecCol).as("embedding"))
      .groupBy("vec_id").agg(min_by(col("embedding"),
        xxhash64(col("embedding"))).as("embedding"))
    val fresh = !VectorIndex.exists(spark, cfg.indexDir)
    val centroids =
      if (fresh) cfg.centroids
      else if (centroidsExist(spark, cfg.indexDir))
        VectorIndex.loadCentroids(spark, cfg.indexDir)
      else {
        // pre-gate index (plain build persists no centroids) or a crash
        // between the centroid and meta writes: adopt the config
        // quantizer and PERSIST it so every later batch/session agrees
        VectorIndex.saveCentroids(spark, cfg.indexDir, cfg.centroids)
        cfg.centroids
      }
    val labeled = VectorIndex.assignLabels(rows, centroids)
    if (fresh) {
      // centroids BEFORE meta: exists() keys on meta, so a crash between
      // the two writes must leave "no index yet", never "index without
      // its quantizer"
      VectorIndex.saveCentroids(spark, cfg.indexDir, centroids)
      VectorIndex.build(labeled,
        VectorIndex.Spec(cfg.numSub, cfg.dim, cfg.codebook), cfg.indexDir)
    } else VectorIndex.append(labeled, cfg.indexDir)
    BatchMarker.record(spark, cfg.indexDir, batchId)
    // auto-compaction AFTER the marker: compaction is content-neutral and
    // restartable, so a crash mid-compact can never re-append the batch —
    // the orphan generation dir is overwritten on the next trigger
    if (cfg.compactThreshold > 0 &&
        VectorIndex.maxFilesPerLabel(spark, cfg.indexDir) >
          cfg.compactThreshold) {
      if (cfg.deferMaintenance)
        VectorIndex.signalMaintenanceDue(spark, cfg.indexDir)
      else VectorIndex.compact(spark, cfg.indexDir)
    }
  }

  private def centroidsExist(spark: SparkSession,
                             indexDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/centroids")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
