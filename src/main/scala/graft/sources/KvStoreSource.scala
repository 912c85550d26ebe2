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

import graft.transport.{KvEntry, KvStore, TransportAuth, TransportPool, TransportRetry}

/** DSv2 binding for the [[graft.transport.KvStore]] (ADR-8 key-value over
  * JetStream): `spark.read.format("nats_kv")` scans a bucket's CURRENT
  * state as `(key, value, revision, ts_nats)`; the write direction puts
  * `(key, value[, ts_nats])` rows.
  *
  * 100 TB posture: the scan pages the server's per-subject index LAZILY
  * (one 2048-entry page per task in memory, never the shard) — wire
  * volume O(live keys), NEVER O(writes ever made) — across `shards`
  * FNV-1a key shards (independent tasks, same sharding the facade and the
  * message scan's `kv_buckets` use). `key` =/IN pushdown collapses to
  * targeted index lookups (a grammar-invalid pushed key matches zero
  * rows, it does not error); `startswith(key, p)` narrows the index walk
  * SERVER-side at the prefix's last complete token boundary
  * (`$$KV.<bucket>.app.>` for `app.`), the partial-token residual
  * filtering client-side before values decode. */
class KvStoreSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "nats_kv"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (options.getBoolean("watch", false)) KvStoreSource.watchSchema
    else KvStoreSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KvStoreTable(properties.asScala.toMap)
}

object KvStoreSource {
  /** current-state envelope: revision = the entry's stream seq; ts_nats =
    * publish time truncated to µs (the engine's envelope convention) */
  val schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", BinaryType, nullable = false),
    StructField("revision", LongType, nullable = false),
    StructField("ts_nats", TimestampType, nullable = false)))

  /** `watch=true` changelog envelope: one row per retained key write in
    * stream order; `op` = PUT/DEL/PURGE (tombstones carry value = null) */
  val watchSchema: StructType = StructType(Seq(
    StructField("revision", LongType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("value", BinaryType, nullable = true),
    StructField("ts_nats", TimestampType, nullable = false),
    StructField("op", StringType, nullable = false)))
}

final class KvStoreTable(rawProps: Map[String, String])
    extends Table with SupportsRead with SupportsWrite {
  private val props = graft.transport.ConnectionProfiles.resolve(rawProps)

  private[sources] val url = props.getOrElse("url",
    sys.error("nats_kv: 'url' option required (a KV bucket is a live " +
      "JetStream surface; there is no directory mode)"))
  private[sources] val bucket = props.getOrElse("bucket",
    sys.error("nats_kv: 'bucket' option required"))
  private[sources] val shards = props.getOrElse("shards", "16").toInt
  private[sources] val history =
    props.getOrElse("history", "1").toInt
  /** write option: LOADER path — buffer this many rows per task and ship
    * them through [[graft.transport.KvStore.putBulk]] windows (one
    * pipelined round-trip per window instead of a conversation per key;
    * history trims once per distinct key per window). 0 = per-key puts. */
  private[sources] val bulkWindow =
    props.getOrElse("bulk_window", "0").toInt
  locally {
    if (shards < 1) sys.error(s"nats_kv: shards must be >= 1, got $shards")
    graft.transport.ObjectStore.requireValidBucket(bucket)
    if (history < 0 || history > 64)
      sys.error(s"nats_kv: history must be in [0, 64], got $history")
    if (bulkWindow < 0)
      sys.error(s"nats_kv: bulk_window must be >= 0, got $bulkWindow")
  }
  private[sources] val connectTimeoutMs = props.getOrElse("connect_timeout_ms",
    graft.transport.Transport.DefaultTimeoutMs.toString).toLong
  private[sources] val auth: TransportAuth = TransportAuth.fromOptions(
    credsFile = props.get("user_creds"), nkeySeed = props.get("nkey_seed"),
    tls = props.get("tls"), tlsCaFile = props.get("tls_ca"),
    tlsInsecure = props.get("tls_insecure"))

  private def boolOpt(name: String): Boolean = props.get(name).map {
    case "true" => true
    case "false" => false
    case other => sys.error(s"nats_kv: $name must be 'true' or 'false', got '$other'")
  }.getOrElse(false)
  /** changelog mode: streaming watch over the bucket's key writes */
  private[sources] val watch = boolOpt("watch")
  private[sources] val watchUpdatesOnly = boolOpt("watch_updates_only")
  /** watch option: drop DEL/PURGE markers (the clients' IgnoreDeletes) */
  private[sources] val ignoreDeletes = boolOpt("ignore_deletes")
  /** watch option: record-level key prefix filter */
  private[sources] val watchPrefix = props.get("key_prefix")
  /** watch option: durable ack-floor handoff across unrelated jobs */
  private[sources] val durable = props.get("durable")
  /** watch admission control, STREAM-SEQUENCE units */
  private[sources] val maxPerBatch =
    props.getOrElse("max_msgs_per_batch", Long.MaxValue.toString).toLong
  locally {
    if (maxPerBatch < 1) sys.error(
      s"nats_kv: max_msgs_per_batch must be >= 1, got $maxPerBatch")
    if ((watchUpdatesOnly || ignoreDeletes || watchPrefix.isDefined ||
        durable.isDefined) && !watch) sys.error(
      "nats_kv: watch_updates_only/ignore_deletes/key_prefix/durable are " +
        "watch-mode options — add watch=true (the streaming changelog " +
        "surface)")
    if (durable.isDefined && watchUpdatesOnly) sys.error(
      "nats_kv: durable and watch_updates_only are mutually exclusive — " +
        "a durable resumes at its ack floor; updates_only starts at the " +
        "current head")
  }

  override def name(): String = s"nats_kv($bucket @ $url)"
  override def schema(): StructType =
    if (watch) KvStoreSource.watchSchema else KvStoreSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvScanBuilder(this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new KvWriteBuilder(this, info)
}

final class KvScanBuilder(t: KvStoreTable)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = t.schema()
  private var exactKeys: Option[Seq[String]] = None
  private var keyPrefix: Option[String] = None
  private var pushed: Array[Filter] = Array.empty

  /** successive exact-key filters are CONJUNCTS: `key = 'a' AND key IN
    * ('b','c')` can only match their intersection, so each constraint set
    * narrows the plan (an empty intersection plans zero lookups). A union
    * here would stay correct (all filters are residual) but fetch rows the
    * predicate excludes. */
  private def narrowTo(next: Seq[String]): Unit =
    exactKeys = Some(exactKeys.fold(next)(prev => prev.filter(next.toSet)))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val p = Array.newBuilder[Filter]
    filters.foreach {
      case f @ EqualTo("key", v: String) => narrowTo(Seq(v)); p += f
      case f @ In("key", vs) if vs.forall(_.isInstanceOf[String]) =>
        narrowTo(vs.toSeq.map(_.asInstanceOf[String])); p += f
      case f @ StringStartsWith("key", pre) =>
        keyPrefix = Some(pre); p += f
      case _ => ()
    }
    pushed = p.result()
    filters // all residual: Spark re-applies (belt and braces)
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required =
      if (requiredSchema.fields.isEmpty)
        StructType(t.schema().fields.filter(_.name == "key"))
      else requiredSchema

  override def build(): Scan =
    new KvScan(t, required, exactKeys.map(_.distinct), keyPrefix)
}

final class KvScan(t: KvStoreTable, required: StructType,
                   exactKeys: Option[Seq[String]], keyPrefix: Option[String])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = {
    if (t.watch) throw new UnsupportedOperationException(
      "nats_kv: watch=true is the streaming changelog surface " +
        "(spark.readStream) — batch scans read current state without it")
    this
  }

  /** the KV watch: seq-offset micro-batches of the bucket's key writes */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    if (!t.watch) throw new UnsupportedOperationException(
      "nats_kv: streaming reads are the bucket watch — add " +
        "option(\"watch\", \"true\") (the schema becomes the changelog " +
        "envelope with revision/op columns)")
    new graft.streaming.KvWatchStream(t.url, t.bucket, required = required,
      shards = t.shards, updatesOnly = t.watchUpdatesOnly,
      ignoreDeletes = t.ignoreDeletes, maxPerBatch = t.maxPerBatch,
      connectTimeoutMs = t.connectTimeoutMs, auth = t.auth,
      keyPrefix = t.watchPrefix, durable = t.durable)
  }
  override def description(): String =
    s"nats_kv(${t.bucket}) cols=[${required.fieldNames.mkString(",")}]" +
      exactKeys.map(k => s" keys=${k.mkString("|")}").getOrElse("") +
      keyPrefix.map(p => s" prefix=$p").getOrElse("")

  override def planInputPartitions(): Array[InputPartition] =
    exactKeys match {
      case Some(keys) => // targeted lookups: one partition, zero paging
        Array(KvKeysPartition(t.url, t.bucket, keys))
      case None =>
        (0 until t.shards).map(i =>
          KvShardPartition(t.url, t.bucket, i, t.shards)).toArray
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new KvReaderFactory(required, keyPrefix, t.connectTimeoutMs, t.auth)

  override def supportedCustomMetrics(): Array[CustomMetric] = Array(
    new ScanMetrics.FetchRpcsMetric, new ScanMetrics.MsgsEmittedMetric,
    new ScanMetrics.MsgsFilteredMetric)
}

final case class KvShardPartition(url: String, bucket: String,
                                  shard: Int, nShards: Int)
    extends InputPartition
final case class KvKeysPartition(url: String, bucket: String,
                                 keys: Seq[String])
    extends InputPartition

final class KvReaderFactory(required: StructType, keyPrefix: Option[String],
                            connectTimeoutMs: Long, auth: TransportAuth)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new KvReader(p, required, keyPrefix, connectTimeoutMs, auth)
}

/** Pages its shard of the per-subject index (or resolves its exact keys)
  * and emits live entries — markers filtered, prefix applied key-side. */
final class KvReader(p: InputPartition, required: StructType,
                     keyPrefix: Option[String],
                     connectTimeoutMs: Long, auth: TransportAuth)
    extends PartitionReader[InternalRow] {

  private val (url, bucket) = p match {
    case s: KvShardPartition => (s.url, s.bucket)
    case k: KvKeysPartition => (k.url, k.bucket)
  }
  private val store =
    new KvStore(TransportPool.get(url, connectTimeoutMs, auth), bucket)

  private var it: Iterator[KvEntry] = _
  private var current: InternalRow = _
  private var nRpcs = 0L
  private var nEmitted = 0L
  private var nFiltered = 0L

  private def init(): Unit = if (it == null) {
    it = p match {
      case s: KvShardPartition =>
        // LAZY page walk: one 2048-entry index page in task memory at a
        // time (never the whole shard's values); the prefix narrows the
        // walk server-side at the last complete token boundary
        store.entriesIterator(s.shard, s.nShards, keyPrefix,
          onPage = () => nRpcs += 1L)
      case k: KvKeysPartition =>
        k.keys.iterator.flatMap { key =>
          nRpcs += 1L
          // a pushed key the grammar rejects MATCHES NO ROWS — it must
          // not abort the query (WHERE key = 'a b' is empty, not an error)
          try TransportRetry.withRetry(store.get(key)).iterator
          catch { case _: IllegalArgumentException => Iterator.empty }
        }
    }
  }

  override def next(): Boolean = {
    init()
    while (it.hasNext) {
      val e = it.next()
      if (keyPrefix.forall(e.key.startsWith(_))) {
        current = toRow(e)
        nEmitted += 1L
        return true
      } else nFiltered += 1L
    }
    false
  }

  private def toRow(e: KvEntry): InternalRow = {
    val vals = required.fieldNames.map {
      case "key" => UTF8String.fromString(e.key)
      case "value" => e.value
      case "revision" => e.revision
      case "ts_nats" => e.tsNs / 1000L // ns → µs, the envelope convention
      case other => sys.error(s"nats_kv: unknown column $other")
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def currentMetricsValues(): Array[CustomTaskMetric] =
    ScanMetrics.taskValues(nRpcs, nEmitted, nFiltered)

  override def get(): InternalRow = current
  override def close(): Unit = () // pooled transport outlives the reader
}

// ---------------- write direction ----------------

/** `df.write.format("nats_kv")`: each row is one put. Required columns
  * `key` (string) + `value` (binary); optional `ts_nats` (timestamp).
  * Last write per key wins (KV semantics); the bucket's `history` option
  * bounds retained revisions per key. Task retries re-put the same
  * (key, value) — state-idempotent. */
final class KvWriteBuilder(t: KvStoreTable, info: LogicalWriteInfo)
    extends WriteBuilder {
  override def build(): Write = {
    val s = info.schema()
    def col(n: String, dt: DataType): Int = {
      val i = s.fieldIndex(n)
      if (s.fields(i).dataType != dt)
        sys.error(s"nats_kv write: column '$n' must be $dt, got ${s.fields(i).dataType}")
      i
    }
    val keyIdx = col("key", StringType)
    val valIdx = col("value", BinaryType)
    val tsIdx = if (s.fieldNames.contains("ts_nats"))
      col("ts_nats", TimestampType) else -1
    val writers = new KvRowWriters(t.url, t.bucket, t.history,
      t.connectTimeoutMs, t.auth, keyIdx, valIdx, tsIdx, t.bulkWindow)
    new Write {
      override def toBatch: BatchWrite = new KvBatchWrite(writers)
      // STREAMING UPSERTS — the live feature-store shape: every micro-
      // batch epoch puts its rows; a replayed epoch re-puts the same
      // (key, value) revisions and the bucket CONVERGES (last-write-wins
      // + the history bound) — the KV analog of the object sink's
      // rollup-collapsed re-puts. Complete mode would need a per-epoch
      // bucket truncation, which is not transactional over a live bucket
      // — Update/Append modes only.
      override def toStreaming
          : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
        new KvStreamingWrite(writers)
    }
  }
}

/** the one factory both write flavors ship to tasks (a named class avoids
  * an outer-instance capture — the factory IS the serialized closure) */
final class KvWriterFactory(writers: KvRowWriters)
    extends DataWriterFactory
    with org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    writers.newWriter()
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    writers.newWriter()
}

final class KvStreamingWrite(writers: KvRowWriters)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new KvWriterFactory(writers)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

final class KvRowWriters(url: String, bucket: String, history: Int,
                         connectTimeoutMs: Long, auth: TransportAuth,
                         keyIdx: Int, valIdx: Int, tsIdx: Int,
                         bulkWindow: Int = 0)
    extends Serializable {
  def newWriter(): DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private val store = new KvStore(
      TransportPool.get(url, connectTimeoutMs, auth), bucket, history)
    // loader path: one window of (key, value, ts) buffered per task
    private val buf =
      scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte], Long)]
    override def write(r: InternalRow): Unit = {
      val key = r.getUTF8String(keyIdx).toString
      val value = r.getBinary(valIdx)
      val ts = if (tsIdx >= 0) r.getLong(tsIdx) * 1000L else 0L // µs → ns
      if (bulkWindow > 0) {
        buf += ((key, value, ts))
        if (buf.length >= bulkWindow) flush()
      } else {
        TransportRetry.withRetry(store.put(key, value, ts))
        ()
      }
    }
    private def flush(): Unit = if (buf.nonEmpty) {
      // a retried window re-puts the same revisions idempotently at the
      // KV level (last-write-wins; history trim keeps depth bounded)
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

final class KvBatchWrite(writers: KvRowWriters)
    extends BatchWrite with Serializable {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new KvWriterFactory(writers)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}
