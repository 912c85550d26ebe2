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
    ObjectStoreSource.schema
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
  private[sources] val connectTimeoutMs = props.getOrElse("connect_timeout_ms",
    graft.transport.Transport.DefaultTimeoutMs.toString).toLong
  private[sources] val auth: TransportAuth = TransportAuth.fromOptions(
    credsFile = props.get("user_creds"), nkeySeed = props.get("nkey_seed"),
    tls = props.get("tls"), tlsCaFile = props.get("tls_ca"),
    tlsInsecure = props.get("tls_insecure"))

  override def name(): String = s"nats_obj($bucket @ $url)"
  override def schema(): StructType = ObjectStoreSource.schema
  override def capabilities(): util.Set[TableCapability] =
    // ACCEPT_ANY_SCHEMA: the write direction's row shape (name, data
    // [, mtime_ns]) is narrower than the read envelope; the builder
    // validates the columns it needs by name+type at bind
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ObjectStoreScanBuilder(this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ObjectStoreWriteBuilder(this, info)
}

final class ObjectStoreScanBuilder(t: ObjectStoreTable)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = ObjectStoreSource.schema
  private var exactNames: Option[Seq[String]] = None
  private var namePrefix: Option[String] = None
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val p = Array.newBuilder[Filter]
    filters.foreach {
      case f @ EqualTo("name", v: String) =>
        exactNames = Some(exactNames.getOrElse(Seq.empty) :+ v); p += f
      case f @ In("name", vs) if vs.forall(_.isInstanceOf[String]) =>
        exactNames = Some(exactNames.getOrElse(Seq.empty) ++
          vs.map(_.asInstanceOf[String])); p += f
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
        StructType(ObjectStoreSource.schema.fields.take(1))
      else requiredSchema

  override def build(): Scan = new ObjectStoreScan(t, required,
    exactNames.map(_.distinct), namePrefix)
}

final class ObjectStoreScan(t: ObjectStoreTable, required: StructType,
                            exactNames: Option[Seq[String]],
                            namePrefix: Option[String])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
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
        // one facade list() = ceil(objects/2048) index pages, zero data
        val all = TransportRetry.withRetry(store.list(s.shard, s.nShards))
        nRpcs += (all.size / ObjectStore.MetaPage) + 1L
        all.iterator
      case n: ObjectStoreNamesPartition =>
        n.names.iterator.flatMap { nm =>
          nRpcs += 1L
          TransportRetry.withRetry(store.info(nm)).iterator
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

/** `df.write.format("nats_obj")`: each row becomes one object put. Required
  * columns `name` (string) + `data` (binary); optional `mtime_ns` (long,
  * defaults 0). Task retries re-put the same (name, bytes) — object-level
  * idempotent (the meta rollup keeps the last put; identical content,
  * orphaned chunk history until a store purge). */
final class ObjectStoreWriteBuilder(t: ObjectStoreTable, info: LogicalWriteInfo)
    extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val s = info.schema()
      def col(n: String, dt: DataType): Int = {
        val i = s.fieldIndex(n)
        if (s.fields(i).dataType != dt)
          sys.error(s"nats_obj write: column '$n' must be $dt, got ${s.fields(i).dataType}")
        i
      }
      val nameIdx = col("name", StringType)
      val dataIdx = col("data", BinaryType)
      val mtimeIdx = if (s.fieldNames.contains("mtime_ns"))
        col("mtime_ns", LongType) else -1
      new ObjectStoreBatchWrite(t.url, t.bucket, t.chunkSize,
        t.connectTimeoutMs, t.auth, nameIdx, dataIdx, mtimeIdx)
    }
  }
}

final class ObjectStoreBatchWrite(url: String, bucket: String, chunkSize: Int,
                                  connectTimeoutMs: Long, auth: TransportAuth,
                                  nameIdx: Int, dataIdx: Int, mtimeIdx: Int)
    extends BatchWrite with Serializable {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new DataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
        new DataWriter[InternalRow] {
          private val store = new ObjectStore(
            TransportPool.get(url, connectTimeoutMs, auth), bucket, chunkSize)
          override def write(r: InternalRow): Unit = {
            val name = r.getUTF8String(nameIdx).toString
            val data = r.getBinary(dataIdx)
            val mtime = if (mtimeIdx >= 0) r.getLong(mtimeIdx) else 0L
            TransportRetry.withRetry(store.put(name, data, mtime))
            ()
          }
          override def commit(): WriterCommitMessage =
            new WriterCommitMessage {}
          override def abort(): Unit = ()
          override def close(): Unit = ()
        }
    }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}
