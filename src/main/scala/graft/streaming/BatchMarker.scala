package graft.streaming

import org.apache.spark.sql.SparkSession

/** Last-applied-batchId marker shared by the foreachBatch ingestion gates
  * ([[StreamingDedup]], [[StreamingVectorIngest]]): foreachBatch delivers
  * at-least-once after a crash, and an append-shaped gate has no natural
  * idempotence — replaying a committed batch would double its rows. The
  * marker (`<dir>/_ingest_batch`, written AFTER the batch's appends via
  * tmp+rename) turns a replay into a no-op; a crash BETWEEN the appends
  * and the marker write replays exactly that one batch — the bounded
  * at-least-once edge the idempotent-sink docs call out.
  *
  * batchIds are monotone WITHIN one checkpoint lineage (a restart from
  * the same checkpoint continues the sequence). Starting a NEW stream —
  * fresh checkpoint, batchIds from 0 — against an index that already
  * carries a marker would silently skip the early batches: delete
  * `_ingest_batch` when deliberately re-feeding an index from a new
  * lineage. */
private[streaming] object BatchMarker {

  private val Name = "_ingest_batch"

  def lastApplied(spark: SparkSession, dir: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$Name")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString
        .trim.toLong)
      finally in.close()
    }
  }

  /** true when `batchId` was already applied (the caller should no-op) */
  def alreadyApplied(spark: SparkSession, dir: String,
                     batchId: Long): Boolean =
    lastApplied(spark, dir).exists(batchId <= _)

  def record(spark: SparkSession, dir: String, batchId: Long): Unit = {
    val base = new org.apache.hadoop.fs.Path(dir)
    val tmp = new org.apache.hadoop.fs.Path(base,
      s".$Name.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val fin = new org.apache.hadoop.fs.Path(base, Name)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(fin, false)
    require(fs.rename(tmp, fin), s"ingest marker rename failed: $tmp")
  }
}
