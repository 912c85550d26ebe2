package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.metric.CustomTaskMetric
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}

import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{ObjectStoreSource, ScanMetrics}
import graft.transport.{ObjectStore, TransportAuth, TransportPool, TransportRetry}

/** Bucket WATCH — the object-store analog of the transport live tail (and
  * of the NATS client libraries' public `ObjectStore.Watch` surface): a
  * micro-batch stream of the bucket's META records in stream order. Each
  * put/delete publishes exactly one meta message, so the meta subspace IS
  * the bucket's changelog; the watch serves it with a server-side
  * `$$O.<bucket>.M.>` consumer filter, which makes the scale posture:
  *
  *   - **wire volume is O(changes), never O(bucket bytes)** — chunk
  *     messages (the object payloads, overwhelmingly the stream's volume)
  *     never cross the wire unless `watch_data=true` opts in;
  *   - the offset axis is the OBJ stream's sequence — checkpoints are
  *     plain seqs, recovery is "resume after seq N", identical to the
  *     message-scan stream's contract;
  *   - each batch's seq range splits into `shards` slices, every slice an
  *     independent filtered consumer — a bulk-load burst of a million puts
  *     replays as parallel tasks, not one reader.
  *
  * Semantics: replay from seq 1, then live updates. How much history the
  * replay holds is the WRITER's choice — default writers roll superseded
  * metas up (one meta per name, the ADR's `Nats-Rollup: sub` effect), so
  * the replay is CURRENT STATE + subsequent changes, exactly the NATS
  * client libraries' `Watch` shape; `retain_history` writers keep every
  * meta, making the replay a full changelog (a downstream
  * `max_by(struct(...), seq) GROUP BY name` is then the current-state
  * materialized view). `watch_updates_only=true` starts at the stream's
  * CURRENT last seq instead — new changes only.
  * Tombstones are skipped unless `include_deletes=true` (then they arrive
  * as `deleted=true, size=0, chunks=0, data=null`). `watch_data=true`
  * chunk-fetches each meta's version by its OWN nuid — superseded versions
  * still resolve, because an overwrite's chunks ride a fresh nuid and old
  * chunks remain until a store purge (cf. [[graft.transport.ObjectStore.put]]).
  * `watch_data` and `name_prefix` are OPTIONS, not pushdowns, deliberately:
  * Catalyst never prunes or pushes into streaming DSv2 scans, so only a
  * bind-time knob truly gates the chunk fetches.
  */
final class ObjectStoreWatchStream(url: String, bucket: String,
                                   required: StructType, shards: Int,
                                   updatesOnly: Boolean,
                                   includeDeletes: Boolean,
                                   maxPerBatch: Long, connectTimeoutMs: Long,
                                   auth: TransportAuth,
                                   namePrefix: Option[String],
                                   durable: Option[String] = None)
    extends SeqOffsetWatchStream(url, s"OBJ_$bucket", shards, updatesOnly,
      maxPerBatch, connectTimeoutMs, auth, durable) {

  override protected def mkPartition(lo: Long, hi: Long): InputPartition =
    ObjectStoreWatchPartition(url, bucket, lo, hi)

  override def createReaderFactory(): PartitionReaderFactory =
    new ObjectStoreWatchReaderFactory(required, includeDeletes,
      namePrefix, connectTimeoutMs, auth)
}

/** one seq slice of one watch batch */
final case class ObjectStoreWatchPartition(url: String, bucket: String,
                                           lo: Long, hi: Long)
    extends InputPartition

final class ObjectStoreWatchReaderFactory(required: StructType,
                                          includeDeletes: Boolean,
                                          namePrefix: Option[String],
                                          connectTimeoutMs: Long,
                                          auth: TransportAuth)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ObjectStoreWatchReader(p.asInstanceOf[ObjectStoreWatchPartition],
      required, includeDeletes, namePrefix, connectTimeoutMs, auth)
}

/** Walks its slice's meta records through a server-side-filtered consumer;
  * chunk-fetches ONLY metas that survive the name filter AND when the
  * schema carries `data` (watch_data=true). */
final class ObjectStoreWatchReader(p: ObjectStoreWatchPartition,
                                   required: StructType,
                                   includeDeletes: Boolean,
                                   namePrefix: Option[String],
                                   connectTimeoutMs: Long,
                                   auth: TransportAuth)
    extends PartitionReader[InternalRow] {

  private val transport = TransportPool.get(p.url, connectTimeoutMs, auth)
  private val store = new ObjectStore(transport, p.bucket)
  private val cursor = transport.consumer(store.stream, startSeq = p.lo,
    filterSubject = Some(s"$$O.${p.bucket}.M.>"))

  private var buf: Array[graft.transport.TransportMsg] = Array.empty
  private var i = 0
  private var done = false
  private var current: InternalRow = _
  private var nRpcs = 0L
  private var nEmitted = 0L
  private var nFiltered = 0L
  private var nChunkFetches = 0L

  override def next(): Boolean = {
    while (!done) {
      if (i >= buf.length) {
        buf = TransportRetry.withRetry(cursor.next(ObjectStore.MetaPage))
        nRpcs += 1L
        i = 0
        if (buf.isEmpty) { done = true; return false }
      }
      val m = buf(i)
      i += 1
      if (m.seq > p.hi) { done = true; return false }
      val info = ObjectStore.parseMeta(new String(m.payload, UTF_8))
      val wanted = (includeDeletes || !info.deleted) &&
        namePrefix.forall(info.name.startsWith(_))
      if (wanted) {
        current = toRow(m.seq, info)
        nEmitted += 1L
        return true
      } else nFiltered += 1L
    }
    false
  }

  private def toRow(seq: Long, info: graft.transport.ObjectInfo): InternalRow = {
    val vals = required.fieldNames.map {
      case "seq" => seq
      case "name" => UTF8String.fromString(info.name)
      case "size" => info.size
      case "chunks" => info.chunks
      case "digest" => UTF8String.fromString(info.digest)
      case "mtime_ns" => info.mtimeNs
      case "deleted" => info.deleted
      case "data" =>
        if (info.deleted) null
        else {
          nChunkFetches += 1L
          nRpcs += (info.chunks.toLong / ObjectStore.ChunkBatch) + 1L
          // null = version fully reclaimed (overwrite/delete purged its
          // chunk subject); partial absence still fails loudly inside
          TransportRetry.withRetry(store.tryGetByMeta(info)).orNull
        }
      case other => sys.error(s"nats_obj watch: unknown column $other")
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def currentMetricsValues(): Array[CustomTaskMetric] =
    ScanMetrics.taskValues(nRpcs, nEmitted, nFiltered) :+
      (new CustomTaskMetric {
        def name = ObjectStoreSource.ChunkFetches; def value = nChunkFetches
      }: CustomTaskMetric)

  override def get(): InternalRow = current
  override def close(): Unit = cursor.close() // transport itself is pooled
}
