package graft.sources

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Maintenance for the native message store.
  *
  * A streaming sink writes one part file per (epoch × partition): a
  * long-running ingest accumulates thousands of small files, and small
  * files are the classic lakehouse scan killer (footer-per-file overhead,
  * no intra-file clustering, statistics too fine to prune). `compact`
  * rewrites the store into `numFiles` subject-clustered, seq-sorted part
  * files — after which subject-PREFIX predicates prune at row-group
  * granularity (docs/SUBJECT_PRUNING.md) and seq/ts statistics become
  * maximally selective.
  *
  * Protocol: rewrite into a scratch store (a full batch write with its own
  * staging/commit), then swap directories and drop the old store. The swap
  * window is two renames; a concurrent reader that planned against the old
  * directory keeps reading its already-opened files (POSIX semantics), and
  * a reader planning mid-swap sees a complete store either way. At cluster
  * scale the same shape runs against a DFS with a metadata-pointer swap
  * instead of directory renames.
  */
object NatsStoreMaintenance {

  def compact(spark: SparkSession, dir: String, stream: String,
              numFiles: Int, clusterBySubject: Boolean = true): Unit = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    val store = new File(s"$dir/$stream.msgs")
    require(store.isDirectory, s"no native store at $store")
    val scratch = s"$dir/.compact_${System.nanoTime()}"

    val df = spark.read.format("nats_scan")
      .option("dir", dir).option("stream", stream).load()
    val arranged =
      if (clusterBySubject)
        // subject-clustered: each output file covers a narrow subject range
        // (prefix pruning), seq-sorted within for seq/ts pruning
        df.repartitionByRange(numFiles, col("subject"), col("seq"))
          .sortWithinPartitions("subject", "seq")
      else
        df.repartitionByRange(numFiles, col("seq"))
          .sortWithinPartitions("seq")
    arranged.write.format("nats_scan")
      .option("dir", scratch).option("stream", stream)
      .mode("overwrite").save()

    // swap: old store aside, scratch store in, old dropped
    val newStore = new File(s"$scratch/$stream.msgs")
    val retired = new File(s"$dir/.retired_$stream.msgs")
    deleteRecursively(retired)
    require(store.renameTo(retired), s"compact swap failed: $store aside")
    require(newStore.renameTo(store), s"compact swap failed: $newStore in")
    deleteRecursively(retired)
    deleteRecursively(new File(scratch))
  }

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
