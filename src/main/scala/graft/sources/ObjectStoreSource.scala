package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.transport.{ObjectInfo, ObjectStore, TransportAuth, TransportPool, TransportRetry}

/** DSv2 binding for the [[graft.transport.ObjectStore]] (ADR-20 chunked
  * blobs over JetStream): `spark.read.format("nats_obj")` scans a bucket as
  * `(name, size, chunks, digest, mtime_ns, data)`; the write direction puts
  * `(name, data[, mtime_ns])` rows as objects.
  *
  * The 100 TB posture lives in two pushdowns:
  *
  *   - **Column pruning is the data/metadata cliff**: a projection that
  *     never touches `data` plans a META-ONLY scan — each task pages its
  *     shard of the per-subject index and fetches ZERO chunk bytes, so
  *     "list a million objects with sizes and digests" costs O(objects)
  *     metadata messages, not the bucket's terabytes. Asserted by the
  *     `chunk_fetches` metric staying 0.
  *   - **Name pushdown**: `name = 'x'` / `name IN (…)` collapses the scan
  *     to targeted meta lookups (no namespace page-through at all);
  *     `startswith(name, p)` prefilters at the META level so non-matching
  *     objects are never chunk-fetched. Filters stay residual in Spark
  *     (belt and braces), same policy as the message-scan source.
  *
  * Partitioning mirrors the KV scan: `shards` (default 16) FNV-1a
  * meta-subject shards, each an independent task — distinct objects
  * parallelize freely, one object's chunks stream through one reader.
  */
class ObjectStoreSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "nats_obj"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (!options.getBoolean("watch", false)) ObjectStoreSource.schema
    else if (options.getBoolean("watch_data", false)) ObjectStoreSource.watchDataSchema
    else ObjectStoreSource.watchSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ObjectStoreTable(properties.asScala.toMap)
}

object ObjectStoreSource {
  /** bucket scan envelope; `data` is the chunk-reassembled object */
  val schema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("chunks", IntegerType, nullable = false),
    StructField("digest", StringType, nullable = false),
    StructField("mtime_ns", LongType, nullable = false),
    StructField("data", BinaryType, nullable = true)))

  /** `watch=true` changelog envelope: every META record in stream order —
    * `seq` is the OBJ stream sequence (the watch's offset axis and the
    * ordering key for a downstream `max_by(…, seq)` current-state view);
    * `deleted` marks tombstones (emitted only under `include_deletes`).
    *
    * `data` appears ONLY under `watch_data=true`: Catalyst does not prune
    * columns on STREAMING DSv2 scans (V2ScanRelationPushDown is
    * batch-only), so a schema-level opt-in is the one mechanism that
    * actually keeps chunk bytes off the wire for meta-only watches —
    * a `.select` without `data` would still have fetched every object. */
  val watchSchema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("chunks", IntegerType, nullable = false),
    StructField("digest", StringType, nullable = false),
    StructField("mtime_ns", LongType, nullable = false),
    StructField("deleted", BooleanType, nullable = false)))

  /** `watch=true, watch_data=true`: the changelog with each version's
    * chunk-reassembled content (tombstones carry null) */
  val watchDataSchema: StructType =
    StructType(watchSchema.fields :+ StructField("data", BinaryType, nullable = true))

  final val ChunkFetches = "chunk_fetches"

  final class ChunkFetchesMetric extends org.apache.spark.sql.connector.metric.CustomSumMetric {
    override def name(): String = ChunkFetches
    override def description(): String = "objects chunk-fetched (0 = meta-only scan)"
  }
}

final class ObjectStoreTable(rawProps: Map[String, String])
    extends Table with SupportsRead with SupportsWrite {
  private val props = graft.transport.ConnectionProfiles.resolve(rawProps)

  private[sources] val url = props.getOrElse("url",
    sys.error("nats_obj: 'url' option required (an object store is a live " +
      "JetStream surface; there is no directory mode)"))
  private[sources] val bucket = props.getOrElse("bucket",
    sys.error("nats_obj: 'bucket' option required"))
  private[sources] val shards = props.getOrElse("shards", "16").toInt
  locally {
    if (shards < 1) sys.error(s"nats_obj: shards must be >= 1, got $shards")
    ObjectStore.requireValidBucket(bucket) // at bind, not first task
    props.get("chunk_size").map(_.toInt).foreach(c => if (c < 1)
      sys.error(s"nats_obj: chunk_size must be >= 1, got $c"))
  }
  private[sources] val chunkSize =
    props.getOrElse("chunk_size", ObjectStore.DefaultChunkSize.toString).toInt
  private def boolOpt(name: String): Boolean = props.get(name).map {
    case "true" => true
    case "false" => false
    case other => sys.error(s"nats_obj: $name must be 'true' or 'false', got '$other'")
  }.getOrElse(false)
  /** changelog mode: streaming watch over the bucket's meta records */
  private[sources] val watch = boolOpt("watch")
  /** write option: keep superseded versions' chunks (skip the overwrite
    * purge) so a `watch_data` changelog can replay old content */
  private[sources] val retainHistory = boolOpt("retain_history")
  /** write option: LOADER path — buffer this many rows per task and ship
    * them through [[graft.transport.ObjectStore.putBulk]] windows (two
    * pipelined round-trips per window instead of 3 conversations per
    * object; measured 3.3-4.4× on loopback, more behind real RTT). Task
    * memory holds one window of objects. Bulk skips per-name prior-chunk
    * reclamation: mode("overwrite") sweeps orphans at job commit; plain
    * appends over LIVE names should schedule
    * `CALL <catalog>.obj.sweep_orphans(...)`. 0 = per-object puts. */
  private[sources] val bulkWindow =
    props.getOrElse("bulk_window", "0").toInt
  locally {
    if (bulkWindow < 0)
      sys.error(s"nats_obj: bulk_window must be >= 0, got $bulkWindow")
  }
  /** watch option: start at the CURRENT last seq (new changes only) instead
    * of replaying the full meta changelog from seq 1 */
  private[sources] val watchUpdatesOnly = boolOpt("watch_updates_only")
  /** watch option: emit delete tombstones (deleted=true, size/chunks 0) */
  private[sources] val includeDeletes = boolOpt("include_deletes")
  /** watch option: include each version's chunk-reassembled `data` column —
    * schema-level because streaming scans are never column-pruned */
  private[sources] val watchData = boolOpt("watch_data")
  /** watch option: meta-level name prefix filter — gates chunk fetches
    * BEFORE they happen (the streaming analog of the batch scan's
    * startswith pushdown, which Catalyst does not apply to streams) */
  private[sources] val watchPrefix = props.get("name_prefix")
  /** watch option: durable-consumer name — the server's ack floor seeds a
    * FRESH checkpoint and every committed batch acks back, so an
    * unrelated job resumes where the last one stopped (same contract as
    * the message stream's `durable`) */
  private[sources] val durable = props.get("durable")
  /** watch admission control, in STREAM-SEQUENCE units (chunk + meta
    * messages both advance the axis — same contract as nats_scan's
    * max_msgs_per_batch over its seq offsets) */
  private[sources] val maxPerBatch =
    props.getOrElse("max_msgs_per_batch", Long.MaxValue.toString).toLong
  locally {
    if (maxPerBatch < 1) sys.error(
      s"nats_obj: max_msgs_per_batch must be >= 1, got $maxPerBatch")
    if ((watchUpdatesOnly || includeDeletes || watchData ||
        watchPrefix.isDefined || durable.isDefined) && !watch) sys.error(
      "nats_obj: watch_updates_only/include_deletes/watch_data/name_prefix/" +
        "durable are watch-mode options — add watch=true (the streaming " +
        "changelog surface)")
    if (durable.isDefined && watchUpdatesOnly) sys.error(
      "nats_obj: durable and watch_updates_only are mutually exclusive — " +
        "a durable resumes at its ack floor; updates_only starts at the " +
        "current head")
  }
  private[sources] val connectTimeoutMs = props.getOrElse("connect_timeout_ms",
    graft.transport.Transport.DefaultTimeoutMs.toString).toLong
  private[sources] val auth: TransportAuth = TransportAuth.fromOptions(
    credsFile = props.get("user_creds"), nkeySeed = props.get("nkey_seed"),
    tls = props.get("tls"), tlsCaFile = props.get("tls_ca"),
    tlsInsecure = props.get("tls_insecure"))

  override def name(): String = s"nats_obj($bucket @ $url)"
  override def schema(): StructType =
    if (!watch) ObjectStoreSource.schema
    else if (watchData) ObjectStoreSource.watchDataSchema
    else ObjectStoreSource.watchSchema
  override def capabilities(): util.Set[TableCapability] =
    // ACCEPT_ANY_SCHEMA: the write direction's row shape (name, data
    // [, mtime_ns]) is narrower than the read envelope; the builder
    // validates the columns it needs by name+type at bind
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ObjectStoreScanBuilder(this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ObjectStoreWriteBuilder(this, info)
}

final class ObjectStoreScanBuilder(t: ObjectStoreTable)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = t.schema()
  private var exactNames: Option[Seq[String]] = None
  private var namePrefix: Option[String] = None
  private var pushed: Array[Filter] = Array.empty

  /** conjunct exact-name filters INTERSECT (see KvScanBuilder.narrowTo):
    * `name = 'a' AND name IN ('b')` plans zero lookups, never the superset */
  private def narrowTo(next: Seq[String]): Unit =
    exactNames = Some(exactNames.fold(next)(prev => prev.filter(next.toSet)))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val p = Array.newBuilder[Filter]
    filters.foreach {
      case f @ EqualTo("name", v: String) => narrowTo(Seq(v)); p += f
      case f @ In("name", vs) if vs.forall(_.isInstanceOf[String]) =>
        narrowTo(vs.toSeq.map(_.asInstanceOf[String])); p += f
      case f @ StringStartsWith("name", pre) =>
        namePrefix = Some(pre); p += f
      case _ => ()
    }
    pushed = p.result()
    filters // all residual: Spark re-applies (same policy as nats_scan)
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    // COUNT(*)-style pruning hands an empty struct — emit name-only rows
    required =
      if (requiredSchema.fields.isEmpty)
        StructType(t.schema().fields.filter(_.name == "name"))
      else requiredSchema

  override def build(): Scan = new ObjectStoreScan(t, required,
    exactNames.map(_.distinct), namePrefix)
}

final class ObjectStoreScan(t: ObjectStoreTable, required: StructType,
                            exactNames: Option[Seq[String]],
                            namePrefix: Option[String])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = {
    if (t.watch) throw new UnsupportedOperationException(
      "nats_obj: watch=true is the streaming changelog surface " +
        "(spark.readStream) — batch bucket scans read current state " +
        "without it")
    this
  }

  /** the bucket WATCH: seq-offset micro-batches over the bucket's META
    * records — see [[graft.streaming.ObjectStoreWatchStream]] */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    if (!t.watch) throw new UnsupportedOperationException(
      "nats_obj: streaming reads are the bucket watch — add " +
        "option(\"watch\", \"true\") (the schema gains the seq/deleted " +
        "changelog columns; batch reads keep the current-state envelope)")
    new graft.streaming.ObjectStoreWatchStream(t.url, t.bucket,
      required = required, shards = t.shards,
      updatesOnly = t.watchUpdatesOnly, includeDeletes = t.includeDeletes,
      maxPerBatch = t.maxPerBatch, connectTimeoutMs = t.connectTimeoutMs,
      auth = t.auth, namePrefix = t.watchPrefix, durable = t.durable)
  }

  override def description(): String =
    s"nats_obj(${t.bucket}) cols=[${required.fieldNames.mkString(",")}]" +
      exactNames.map(n => s" names=${n.mkString("|")}").getOrElse("") +
      namePrefix.map(p => s" prefix=$p").getOrElse("")

  override def planInputPartitions(): Array[InputPartition] =
    exactNames match {
      // targeted lookups: one partition, no namespace page-through
      case Some(names) =>
        Array(ObjectStoreNamesPartition(t.url, t.bucket, names))
      case None =>
        (0 until t.shards).map(i =>
          ObjectStoreShardPartition(t.url, t.bucket, i, t.shards)).toArray
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new ObjectStoreReaderFactory(required, namePrefix, t.connectTimeoutMs, t.auth)

  override def supportedCustomMetrics(): Array[CustomMetric] = Array(
    new ScanMetrics.FetchRpcsMetric, new ScanMetrics.MsgsEmittedMetric,
    new ScanMetrics.MsgsFilteredMetric, new ObjectStoreSource.ChunkFetchesMetric)
}

final case class ObjectStoreShardPartition(url: String, bucket: String,
                                           shard: Int, nShards: Int)
    extends InputPartition
final case class ObjectStoreNamesPartition(url: String, bucket: String,
                                           names: Seq[String])
    extends InputPartition

final class ObjectStoreReaderFactory(required: StructType,
                                     namePrefix: Option[String],
                                     connectTimeoutMs: Long,
                                     auth: TransportAuth)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ObjectStoreReader(p, required, namePrefix, connectTimeoutMs, auth)
}

/** Pages its meta shard (or resolves its exact names), prefilters at the
  * META level, and chunk-fetches ONLY when the projection needs `data`. */
final class ObjectStoreReader(p: InputPartition, required: StructType,
                              namePrefix: Option[String],
                              connectTimeoutMs: Long, auth: TransportAuth)
    extends PartitionReader[InternalRow] {

  private val (url, bucket) = p match {
    case s: ObjectStoreShardPartition => (s.url, s.bucket)
    case n: ObjectStoreNamesPartition => (n.url, n.bucket)
  }
  private val store =
    new ObjectStore(TransportPool.get(url, connectTimeoutMs, auth), bucket)
  private val needData = required.fieldNames.contains("data")

  private var metas: Iterator[ObjectInfo] = _
  private var current: InternalRow = _
  private var nRpcs = 0L
  private var nEmitted = 0L
  private var nFiltered = 0L
  private var nChunkFetches = 0L

  private def init(): Unit = if (metas == null) {
    metas = p match {
      case s: ObjectStoreShardPartition =>
        // LAZY index pages (2048 metas at a time, per-page retry inside
        // the facade) — a multi-million-object shard never materializes
        // its whole listing in task memory, and a transient error late in
        // the walk re-fetches one page, not the shard
        store.entriesIterator(s.shard, s.nShards, onPage = () => nRpcs += 1L)
          .map(_._1)
      case n: ObjectStoreNamesPartition =>
        n.names.iterator.flatMap { nm =>
          nRpcs += 1L
          // a pushed name the facade rejects (e.g. '') matches no rows —
          // it must not abort the query
          try TransportRetry.withRetry(store.info(nm)).iterator
          catch { case _: IllegalArgumentException => Iterator.empty }
        }
    }
  }

  override def next(): Boolean = {
    init()
    while (metas.hasNext) {
      val m = metas.next()
      if (namePrefix.forall(m.name.startsWith(_))) {
        current = toRow(m)
        nEmitted += 1L
        return true
      } else nFiltered += 1L
    }
    false
  }

  private def toRow(m: ObjectInfo): InternalRow = {
    val vals = required.fieldNames.map {
      case "name" => UTF8String.fromString(m.name)
      case "size" => m.size
      case "chunks" => m.chunks
      case "digest" => UTF8String.fromString(m.digest)
      case "mtime_ns" => m.mtimeNs
      case "data" =>
        nChunkFetches += 1L
        nRpcs += (m.chunks.toLong / ObjectStore.ChunkBatch) + 1L
        TransportRetry.withRetry(store.getByMeta(m))
      case other => sys.error(s"nats_obj: unknown column $other")
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def currentMetricsValues(): Array[CustomTaskMetric] =
    ScanMetrics.taskValues(nRpcs, nEmitted, nFiltered) :+
      (new CustomTaskMetric {
        def name = ObjectStoreSource.ChunkFetches; def value = nChunkFetches
      }: CustomTaskMetric)

  override def get(): InternalRow = current
  override def close(): Unit = () // pooled transport outlives the reader
}

// ---------------- write direction ----------------

/** `df.write.format("nats_obj")` / `df.writeStream.format("nats_obj")`:
  * each row becomes one object put. Required columns `name` (string) +
  * `data` (binary); optional `mtime_ns` (long, defaults 0). Task retries
  * and replayed streaming epochs re-put the same (name, bytes) —
  * object-level idempotent: the meta rollup keeps the last put, and the
  * overwrite purge reclaims the failed attempt's chunks (under
  * `retain_history=true` the orphaned version stays, fetchable through the
  * watch changelog). `mode("overwrite")` STAGES, never pre-truncates: the
  * driver records the bucket stream's last sequence, the tasks put their
  * rows (same-name puts roll up on the server), and only job COMMIT
  * deletes the leftovers — live objects whose meta still predates the
  * watermark. A failed overwrite therefore leaves the bucket's prior
  * contents intact except for names the job already re-put (partial
  * overwrite), never emptied. */
final class ObjectStoreWriteBuilder(t: ObjectStoreTable, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {

  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  override def build(): Write = {
    val s = info.schema()
    def col(n: String, dt: DataType): Int = {
      val i = s.fieldIndex(n)
      if (s.fields(i).dataType != dt)
        sys.error(s"nats_obj write: column '$n' must be $dt, got ${s.fields(i).dataType}")
      i
    }
    val writers = new ObjectStoreRowWriters(t.url, t.bucket, t.chunkSize,
      t.connectTimeoutMs, t.auth, col("name", StringType),
      col("data", BinaryType),
      if (s.fieldNames.contains("mtime_ns")) col("mtime_ns", LongType) else -1,
      t.retainHistory, t.bulkWindow)
    new Write {
      override def toBatch: BatchWrite =
        new ObjectStoreBatchWrite(writers, truncateFirst)
      override def toStreaming
          : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
        if (truncateFirst) throw new UnsupportedOperationException(
          "nats_obj: the streaming sink appends per epoch — Complete " +
            "output mode (per-epoch truncation) would need a bucket purge " +
            "inside every epoch, which is not transactional over a live " +
            "stream; use foreachBatch with mode(\"overwrite\") for " +
            "complete-mode semantics")
        new ObjectStoreStreamingWrite(writers)
      }
    }
  }
}

/** the shared put-per-row writer of both write flavors (serializable task
  * closure; the transport rides the per-executor pool) */
final class ObjectStoreRowWriters(url: String, bucket: String, chunkSize: Int,
                                  connectTimeoutMs: Long, auth: TransportAuth,
                                  nameIdx: Int, dataIdx: Int, mtimeIdx: Int,
                                  retainHistory: Boolean,
                                  bulkWindow: Int = 0)
    extends Serializable {
  def bucketStream: String = s"OBJ_$bucket"
  def isBulk: Boolean = bulkWindow > 0

  private def driverStore: ObjectStore = new ObjectStore(
    TransportPool.get(url, connectTimeoutMs, auth), bucket, chunkSize,
    retainHistory)

  /** watermark for the staged overwrite: the bucket stream's last sequence
    * BEFORE any task puts (0 = bucket not created yet) */
  def bucketLastSeq(): Long = driverStore.lastSeq()

  /** job-commit reconcile of mode("overwrite"): delete every live object
    * whose current meta predates the watermark — i.e. every name the job
    * did NOT re-put. Runs on the driver AFTER all tasks committed, so the
    * bucket's prior contents are only removed once the new contents are
    * fully durable (the staged-write analog of a rename-into-place). The
    * stale set is collected before deleting (O(superseded names) driver
    * memory) so the index walk never races its own tombstones. */
  def reconcileOverwrite(watermark: Long): Unit = {
    val store = driverStore
    val stale = store.entriesIterator()
      .collect { case (m, seq) if seq <= watermark => (m.name, m.mtimeNs) }
      .toArray
    stale.foreach { case (name, mtime) =>
      TransportRetry.withRetry(store.delete(name, mtime))
    }
  }

  /** driver-side orphan reclamation (bulk overwrite's commit epilogue) */
  def sweepOrphans(): Unit = {
    TransportRetry.withRetry(driverStore.sweepOrphans())
    ()
  }

  def newWriter(): DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private val store = new ObjectStore(
      TransportPool.get(url, connectTimeoutMs, auth), bucket, chunkSize,
      retainHistory)
    // loader path: one window of (name, bytes, mtime) buffered per task
    private val buf =
      scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte], Long)]
    override def write(r: InternalRow): Unit = {
      val name = r.getUTF8String(nameIdx).toString
      val data = r.getBinary(dataIdx)
      val mtime = if (mtimeIdx >= 0) r.getLong(mtimeIdx) else 0L
      if (isBulk) {
        buf += ((name, data, mtime))
        if (buf.length >= bulkWindow) flush()
      } else {
        TransportRetry.withRetry(store.put(name, data, mtime))
        ()
      }
    }
    private def flush(): Unit = if (buf.nonEmpty) {
      // putBulk reclaims its own chunks on a torn window, so a retry of
      // the whole window is clean; already-flushed windows re-put
      // idempotently on a task retry (meta rollup, Msg-Id chunk dedup)
      TransportRetry.withRetry(store.putBulk(buf.iterator, bulkWindow))
      buf.clear()
    }
    override def commit(): WriterCommitMessage = {
      flush()
      new WriterCommitMessage {}
    }
    override def abort(): Unit = buf.clear()
    override def close(): Unit = ()
  }
}

/** the one factory both write flavors ship to tasks (factories ARE the
  * serialized closure — a named class avoids an outer-instance capture) */
final class ObjectStoreWriterFactory(writers: ObjectStoreRowWriters)
    extends DataWriterFactory
    with org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    writers.newWriter()
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    writers.newWriter()
}

final class ObjectStoreBatchWrite(writers: ObjectStoreRowWriters,
                                  truncateFirst: Boolean)
    extends BatchWrite with Serializable {
  // driver-only: set when the factory is created, read at commit
  @transient private var watermark = -1L

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // overwrite semantics are "bucket = exactly this dataframe", but the
    // prior contents must survive a failed job — so record a sequence
    // watermark now and reconcile at COMMIT, never purge up front
    if (truncateFirst) watermark = writers.bucketLastSeq()
    new ObjectStoreWriterFactory(writers)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    if (truncateFirst) {
      writers.reconcileOverwrite(watermark)
      // the bulk path skips per-name prior-chunk reclamation (no prior
      // lookup per put) — an overwrite job finishes the story here, so
      // same-name rewrites never leak superseded chunk subjects
      if (writers.isBulk) writers.sweepOrphans()
    }
  // a failed overwrite leaves prior contents intact except names already
  // re-put by completed tasks (partial overwrite, documented) — there is
  // nothing transactional to roll back on a log-structured store
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Streaming flavor: every micro-batch epoch puts its rows. Epoch replay
  * after a crash re-puts the same objects — the meta rollup collapses the
  * duplicates, so the bucket converges to the same state (object-level
  * idempotence, the analog of the message sink's Msg-Id dedup). */
final class ObjectStoreStreamingWrite(writers: ObjectStoreRowWriters)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new ObjectStoreWriterFactory(writers)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}
