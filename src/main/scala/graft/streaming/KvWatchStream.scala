package graft.streaming

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.metric.CustomTaskMetric
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}

import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.ScanMetrics
import graft.transport.{KvStore, TransportAuth, TransportPool, TransportRetry}

/** KV bucket WATCH — the stream face of [[graft.transport.KvStore]] (the
  * NATS client libraries' `KeyValue.Watch`): seq-offset micro-batches of
  * the bucket's change records, each one key write in stream order —
  * `(revision, key, value, ts_nats, op)`. Tombstones ARRIVE by default
  * (`op` = DEL/PURGE, value null): a watcher that missed deletions would
  * silently diverge from the bucket; `ignore_deletes=true` opts out
  * (the client libraries' IgnoreDeletes). How much history replays is the
  * bucket's `history` depth (writers trim; a depth-1 bucket replays as
  * current state + live updates). `watch_updates_only=true` starts at the
  * head; `durable` gives unrelated jobs the ack-floor handoff; `key_prefix`
  * filters at the record level before rows materialize.
  *
  * Scale posture: one subject-filtered consumer per seq slice — wire
  * volume O(retained records), and the per-key payloads ride the same
  * frames (no second fetch: a KV record IS its message, unlike the object
  * watch's chunk indirection). */
final class KvWatchStream(url: String, bucket: String, required: StructType,
                          shards: Int, updatesOnly: Boolean,
                          ignoreDeletes: Boolean, maxPerBatch: Long,
                          connectTimeoutMs: Long, auth: TransportAuth,
                          keyPrefix: Option[String],
                          durable: Option[String] = None)
    extends SeqOffsetWatchStream(url, s"KV_$bucket", shards, updatesOnly,
      maxPerBatch, connectTimeoutMs, auth, durable) {

  override protected def mkPartition(lo: Long, hi: Long): InputPartition =
    KvWatchPartition(url, bucket, lo, hi)

  override def createReaderFactory(): PartitionReaderFactory =
    new KvWatchReaderFactory(required, ignoreDeletes, keyPrefix,
      connectTimeoutMs, auth)
}

final case class KvWatchPartition(url: String, bucket: String,
                                  lo: Long, hi: Long) extends InputPartition

final class KvWatchReaderFactory(required: StructType, ignoreDeletes: Boolean,
                                 keyPrefix: Option[String],
                                 connectTimeoutMs: Long, auth: TransportAuth)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new KvWatchReader(p.asInstanceOf[KvWatchPartition], required,
      ignoreDeletes, keyPrefix, connectTimeoutMs, auth)
}

final class KvWatchReader(p: KvWatchPartition, required: StructType,
                          ignoreDeletes: Boolean, keyPrefix: Option[String],
                          connectTimeoutMs: Long, auth: TransportAuth)
    extends PartitionReader[InternalRow] {

  private val transport = TransportPool.get(p.url, connectTimeoutMs, auth)
  private val prefix = s"$$KV.${p.bucket}."
  private val cursor = transport.consumer(s"KV_${p.bucket}", startSeq = p.lo,
    filterSubject = Some(s"$prefix>"))

  private var buf: Array[graft.transport.TransportMsg] = Array.empty
  private var i = 0
  private var done = false
  private var current: InternalRow = _
  private var nRpcs = 0L
  private var nEmitted = 0L
  private var nFiltered = 0L

  override def next(): Boolean = {
    while (!done) {
      if (i >= buf.length) {
        buf = TransportRetry.withRetry(cursor.next(KvStore.HistoryBatch))
        nRpcs += 1L
        i = 0
        if (buf.isEmpty) { done = true; return false }
      }
      val m = buf(i)
      i += 1
      if (m.seq > p.hi) { done = true; return false }
      val key = m.subject.stripPrefix(prefix)
      val op = m.headers.getOrElse(KvStore.OpHeader, KvStore.OpPut)
      val wanted = (!ignoreDeletes || op == KvStore.OpPut) &&
        keyPrefix.forall(key.startsWith(_))
      if (wanted) {
        current = toRow(m, key, op)
        nEmitted += 1L
        return true
      } else nFiltered += 1L
    }
    false
  }

  private def toRow(m: graft.transport.TransportMsg, key: String,
                    op: String): InternalRow = {
    val vals = required.fieldNames.map {
      case "revision" => m.seq
      case "key" => UTF8String.fromString(key)
      case "value" => if (op == KvStore.OpPut) m.payload else null
      case "ts_nats" => m.tsNs / 1000L // ns → µs envelope convention
      case "op" => UTF8String.fromString(op)
      case other => sys.error(s"nats_kv watch: unknown column $other")
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def currentMetricsValues(): Array[CustomTaskMetric] =
    ScanMetrics.taskValues(nRpcs, nEmitted, nFiltered)

  override def get(): InternalRow = current
  override def close(): Unit = cursor.close()
}
