package graft.sources

import java.io.File
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.MessageTypeParser
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType

/** Batch write path for the `nats_scan` source — the "publish" direction the
  * reference lacks entirely (its extension is a read-only table function;
  * /root/reference/src/nats_scan.cpp registers no sink). Envelope rows are
  * persisted as a *native message store*: a `$dir/$stream.msgs/` directory of
  * parquet part files carrying the envelope columns verbatim
  * (subject STRING, seq INT64, ts_nats TIMESTAMP(MICROS), payload BINARY).
  * [[NatsScanScan]] reads that layout back with the same row-group pruning it
  * applies to fixture files — but directly on `seq`/`ts_nats` statistics.
  *
  * Commit protocol: every task writes one part file into a staging directory;
  * the driver moves staged files into the store on commit (after wiping the
  * store when the write was a truncate) and deletes staging on abort. Renames
  * on one filesystem are atomic per file, so a failed job never leaves
  * half-written part files in the store. At cluster scale the same shape runs
  * on a DFS via a FileCommitProtocol; one file per task, no driver data path.
  */
final class NatsScanWriteBuilder(dir: String, stream: String,
                                 info: LogicalWriteInfo,
                                 url: Option[String] = None,
                                 connectTimeoutMs: Long =
                                   graft.transport.Transport.DefaultTimeoutMs,
                                 auth: graft.transport.TransportAuth =
                                   graft.transport.TransportAuth.anonymous)
    extends WriteBuilder with SupportsTruncate {

  private var truncateFirst = false

  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  override def build(): Write = new Write
      with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
    // ENFORCE the store's seq-sorted invariant at the planner: Spark sorts
    // each write task's rows by seq before they reach the writer, so part
    // files are always ascending within row groups. The scan stack DEPENDS
    // on this — row-group seq-stats pruning and the top-n early-stop
    // (SupportsPushDownTopN) both read "first rows = lowest seqs". An
    // unordered distribution is fine (files are independent); only the
    // within-partition order matters.
    import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
    override def requiredDistribution()
        : org.apache.spark.sql.connector.distributions.Distribution =
      org.apache.spark.sql.connector.distributions.Distributions.unspecified()
    override def requiredOrdering()
        : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
      Array(Expressions.sort(Expressions.column("seq"),
        SortDirection.ASCENDING))
    override def toBatch: BatchWrite =
      new NatsScanBatchWrite(dir, stream, info.schema(), truncateFirst)
    override def toStreaming: StreamingWrite = url match {
      // PUBLISH direction over the transport: each row becomes a JetStream
      // publish with a deterministic Nats-Msg-Id, so replayed epochs dedup
      // server-side (exactly-once without any sink-side state)
      case Some(u) =>
        new NatsTransportStreamingWrite(u, stream, info.schema(),
          connectTimeoutMs, auth)
      case None => new NatsScanStreamingWrite(dir, stream, info.schema())
    }
  }
}

/** Streaming flavor: one epoch = one committed batch of part files. The
  * FINAL name is deterministic per (epoch, partition) — task attempt ids are
  * deliberately excluded — so a replayed epoch (failure after commit but
  * before the checkpoint records it) renames over its own previous files
  * instead of duplicating them: idempotent re-commit, which is what turns an
  * at-least-once sink effectively exactly-once. Staged names DO carry the
  * attempt id so parallel attempts never write the same file. */
final class NatsScanStreamingWrite(dir: String, stream: String,
                                   schema: StructType)
    extends StreamingWrite {

  private val storeDir = s"$dir/$stream.msgs"

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory = {
    val f = new File(storeDir)
    require(f.isDirectory || f.mkdirs(), s"cannot create store dir $storeDir")
    new NatsScanStreamingWriterFactory(storeDir, schema)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val store = new File(storeDir)
    val claimMarker = !StoreLayout.unvouchedParts(store)
    messages.foreach {
      case NatsScanCommit(staged, finalName) =>
        val src = new File(storeDir, staged)
        if (src.exists()) {
          val dst = new File(storeDir, finalName)
          dst.delete() // epoch replay: replace our own previous commit
          require(src.renameTo(dst), s"commit rename failed: $src -> $dst")
        }
        new File(storeDir, s".$staged.crc").delete() // hadoop checksum sibling
      case other => sys.error(s"unexpected commit message $other")
    }
    if (claimMarker) StoreLayout.write(store)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    new File(storeDir).listFiles()
      .filter(f => f.getName.startsWith("_inprogress_") ||
        f.getName.startsWith("._inprogress_"))
      .foreach(_.delete())
}

/** Streaming publish through the transport seam — the live analog of the
  * parquet-store sink. Rows publish with `Nats-Msg-Id = epoch-partition-row`
  * (deterministic for a deterministic batch), so a replayed epoch's
  * publishes are server-side no-ops: JetStream's own dedup window provides
  * the exactly-once the file sink gets from deterministic epoch filenames.
  * The incoming `seq` column is ignored — the SERVER assigns sequences on
  * publish, exactly as a real JetStream ack does. */
final class NatsTransportStreamingWrite(url: String, stream: String,
                                        schema: StructType,
                                        connectTimeoutMs: Long,
                                        auth: graft.transport.TransportAuth =
                                          graft.transport.TransportAuth.anonymous)
    extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    new NatsTransportWriterFactory(url, stream, schema, connectTimeoutMs, auth)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

final class NatsTransportWriterFactory(url: String, stream: String,
                                       schema: StructType,
                                       connectTimeoutMs: Long,
                                       auth: graft.transport.TransportAuth =
                                         graft.transport.TransportAuth.anonymous)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    new NatsTransportPublisher(url, stream, schema, partitionId, epochId,
      connectTimeoutMs, auth)
}

final class NatsTransportPublisher(url: String, stream: String,
                                   schema: StructType, partitionId: Int,
                                   epochId: Long, connectTimeoutMs: Long,
                                   auth: graft.transport.TransportAuth =
                                     graft.transport.TransportAuth.anonymous)
    extends DataWriter[InternalRow] {
  private val transport =
    graft.transport.Transport.connect(url, connectTimeoutMs, auth)
  private val iSubject = schema.fieldIndex("subject")
  private val iTs = schema.fieldIndex("ts_nats")
  private val iPayload = schema.fieldIndex("payload")
  private var rowIdx = 0L
  private var published = 0L

  /** PIPELINED publish window: rows buffer here and ship as ONE
    * [[graft.transport.JetStreamTransport.publishBatch]] burst — a sync
    * per-row publish caps a writer task at 1/RTT msgs/s against a real
    * server (1 ms RTT = 1 k rows/s/task); pipelining removes the RTT term.
    * 1024 bounds buffered bytes per task; the deterministic per-row
    * `Nats-Msg-Id` is unchanged, so replayed epochs dedup identically. */
  private val FlushRows = 1024
  private val buf =
    new scala.collection.mutable.ArrayBuffer[graft.transport.PublishEntry](FlushRows)

  private def flush(): Unit = if (buf.nonEmpty) {
    // transient wire faults retry the WHOLE window: re-publishing the same
    // Nats-Msg-Ids is a server-side no-op returning the original
    // sequences, so a torn conversation heals without duplicates
    graft.transport.TransportRetry.withRetry(
      transport.publishBatch(stream, buf.toArray))
    published += buf.length
    buf.clear()
  }

  override def write(row: InternalRow): Unit = {
    val subject =
      if (row.isNullAt(iSubject)) null else row.getUTF8String(iSubject).toString
    require(!row.isNullAt(iTs),
      "nats_scan publisher: ts_nats is required (got NULL)")
    val tsNs = Math.multiplyExact(row.getLong(iTs), 1000L) // µs → ns
    val payload = if (row.isNullAt(iPayload)) Array.emptyByteArray
                  else row.getBinary(iPayload)
    buf += graft.transport.PublishEntry(subject, tsNs, payload,
      msgId = s"graft-$epochId-$partitionId-$rowIdx")
    rowIdx += 1
    if (buf.length >= FlushRows) flush()
  }

  override def commit(): WriterCommitMessage = {
    flush()
    transport.close()
    NatsScanCommit(s"published-$published", s"published-$published")
  }
  override def abort(): Unit = transport.close() // publishes already dedup'd
  override def close(): Unit = ()
}

final class NatsScanStreamingWriterFactory(storeDir: String, schema: StructType)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    new NatsScanDataWriter(storeDir, schema,
      writeName = f"_inprogress_epoch-$epochId%06d-part-$partitionId%05d-$taskId.parquet",
      finalName = f"epoch-$epochId%06d-part-$partitionId%05d.parquet")
}

final class NatsScanBatchWrite(dir: String, stream: String,
                               schema: StructType, truncate: Boolean)
    extends BatchWrite {

  private val storeDir = s"$dir/$stream.msgs"
  // per-job unique token: it names the staging dir AND is embedded in every
  // final part-file name, so append jobs from different applications (whose
  // partition/task ids restart from zero) can never rename over each
  // other's committed files
  private val jobToken = UUID.randomUUID().toString.take(8)
  private val stagingDir = s"$storeDir/_staging_$jobToken"

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    val f = new File(stagingDir)
    require(f.isDirectory || f.mkdirs(), s"cannot create staging dir $stagingDir")
    new NatsScanWriterFactory(stagingDir, schema, jobToken)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val store = new File(storeDir)
    if (truncate)
      store.listFiles(f => f.getName.endsWith(".parquet")).foreach(_.delete())
    // decide BEFORE the renames: after a truncate (or into a fresh/marked
    // store) every part file is one this sorted write produced, so the
    // layout marker may be (re)claimed; appending next to unvouched foreign
    // files must NOT mark the store sorted
    val claimMarker = truncate || !StoreLayout.unvouchedParts(store)
    messages.foreach {
      case NatsScanCommit(staged, finalName) =>
        val src = new File(stagingDir, staged)
        val dst = new File(store, finalName)
        require(!dst.exists(), s"commit collision: $dst already exists")
        require(src.renameTo(dst), s"commit rename failed: $src -> $dst")
      case other => sys.error(s"unexpected commit message $other")
    }
    if (claimMarker) StoreLayout.write(store)
    deleteRecursively(new File(stagingDir))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    deleteRecursively(new File(stagingDir))

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete()
  }
}

/** Store-layout marker, written at COMMIT alongside the part files and read
  * at plan time to version-gate optimizations that depend on write-time
  * invariants. Today one invariant matters: rows within every part file
  * ascend by `seq` (enforced by the write's RequiresDistributionAndOrdering
  * sort) — the top-n early-stop (SupportsPushDownTopN) is only sound when
  * "first rows = lowest seqs" holds per file. A store written by a build
  * that predates the marker, or any externally produced directory, has no
  * marker: seq-order-dependent pushdowns are DECLINED for it rather than
  * trusted (Spark then runs the full sort above the scan — slower, correct).
  *
  * The marker only vouches for files the sorted write path produced, so a
  * commit may claim it ONLY when the store held no unvouched part files
  * beforehand (empty/fresh store, truncate, or marker already present). */
object StoreLayout {
  val MarkerName = "_layout.json"       // '_' prefix: planner skips it
  val Version = 1

  def write(storeDir: File): Unit = {
    val tmp = new File(storeDir, s"_layout.${UUID.randomUUID().toString.take(8)}.tmp")
    val w = new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(tmp), "UTF-8")
    try w.write(s"""{"version":$Version,"seqSorted":true}""") finally w.close()
    val dst = new File(storeDir, MarkerName)
    if (!tmp.renameTo(dst)) { // marker already present: keep theirs
      tmp.delete()
      require(dst.exists(), s"cannot write layout marker $dst")
    }
  }

  def seqSorted(storeDir: File): Boolean = {
    val f = new File(storeDir, MarkerName)
    f.isFile && {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      val txt = try src.mkString finally src.close()
      txt.contains("\"seqSorted\":true")
    }
  }

  /** committed part files that predate this job — files the current write
    * cannot vouch for */
  def unvouchedParts(storeDir: File): Boolean =
    !seqSorted(storeDir) &&
      Option(storeDir.listFiles((f: File) => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("_") && !f.getName.startsWith(".")))
        .exists(_.nonEmpty)
}

/** staged = the file the task wrote; finalName = the committed name the
  * driver renames it to (deterministic where idempotent replay matters). */
final case class NatsScanCommit(staged: String, finalName: String)
    extends WriterCommitMessage

final class NatsScanWriterFactory(stagingDir: String, schema: StructType,
                                  jobToken: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] = {
    // staged name embeds the task attempt id: a speculative or retried
    // attempt must never open the same staging path as a crashed attempt's
    // leftover partial file (which never ran abort()). The committed name
    // stays deterministic per (partition, job) so replay is idempotent.
    val finalName = f"part-$partitionId%05d-$jobToken.parquet"
    new NatsScanDataWriter(stagingDir, schema,
      writeName = f"part-$partitionId%05d-$jobToken-t$taskId.parquet",
      finalName = finalName)
  }
}

/** One parquet part file per task, example-Group API (same family the read
  * path uses). The incoming row is the envelope; the constant `stream` echo
  * column is not materialized — it is implied by the store location.
  * Writes `dir/writeName`; the commit message tells the driver to publish it
  * as `finalName`. */
final class NatsScanDataWriter(dir: String, schema: StructType,
                               writeName: String, finalName: String)
    extends DataWriter[InternalRow] {

  private val parquetSchema = MessageTypeParser.parseMessageType(
    """message nats_envelope {
      |  optional binary subject (STRING);
      |  optional int64 seq;
      |  optional int64 ts_nats (TIMESTAMP(MICROS,true));
      |  optional binary payload;
      |}""".stripMargin)

  private val factory = new SimpleGroupFactory(parquetSchema)

  private val writer = {
    val conf = new Configuration()
    GroupWriteSupport.setSchema(parquetSchema, conf)
    ExampleParquetWriter
      .builder(new Path(s"$dir/$writeName"))
      .withConf(conf)
      .withType(parquetSchema)
      .build()
  }

  // envelope slot indexes in the incoming schema (write schema == table schema)
  private val iSubject = schema.fieldIndex("subject")
  private val iSeq = schema.fieldIndex("seq")
  private val iTs = schema.fieldIndex("ts_nats")
  private val iPayload = schema.fieldIndex("payload")

  override def write(row: InternalRow): Unit = {
    val g = factory.newGroup()
    if (!row.isNullAt(iSubject))
      g.append("subject", row.getUTF8String(iSubject).toString)
    // seq and ts_nats are MANDATORY offset columns: the read path pushes
    // gtEq/ltEq parquet filters and row-group pruning on them, and the
    // streaming offset axis is seq — a null would be silently unreachable.
    // Reject at write time instead (JetStream itself never emits null
    // seq/ts either, /root/reference/src/nats_scan.cpp:747-776).
    require(!row.isNullAt(iSeq),
      "nats_scan writer: seq is a required offset column (got NULL)")
    require(!row.isNullAt(iTs),
      "nats_scan writer: ts_nats is a required offset column (got NULL)")
    g.append("seq", row.getLong(iSeq))
    g.append("ts_nats", row.getLong(iTs)) // already µs
    if (!row.isNullAt(iPayload))
      g.append("payload", Binary.fromConstantByteArray(row.getBinary(iPayload)))
    writer.write(g)
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    NatsScanCommit(writeName, finalName)
  }

  override def abort(): Unit = {
    // a failed attempt must leave nothing a reader (or a later commit)
    // could mistake for data
    writer.close()
    new java.io.File(dir, writeName).delete()
    new java.io.File(dir, s".$writeName.crc").delete()
  }
  override def close(): Unit = ()
}
