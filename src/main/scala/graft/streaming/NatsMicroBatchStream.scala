package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import graft.sources.{NatsScanPartition, NatsScanReaderFactory, NatsScanSource}

/** Seq-based micro-batch stream over the message store — the superset the
  * reference only roadmaps ("live tail", /root/reference/docs/GUIDE.md:479-482;
  * durable consumers :461-464). Offsets are JetStream sequence positions, so
  * checkpoint/recovery semantics are exactly "resume after seq N" — what a
  * durable consumer would give a live NATS deployment.
  *
  * Each micro-batch serves the seq range (lastOffset, thisOffset] through the
  * same partition readers as the batch source; `max_msgs_per_batch` caps
  * batch size (backpressure knob, like JetStream pull-consumer batch sizes).
  */
final class NatsMicroBatchStream(dir: String, stream: String,
                                 maxPerBatch: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val file = s"$dir/$stream.parquet"

  private lazy val maxSeq: Long = {
    val in = HadoopInputFile.fromPath(new Path(file), new Configuration())
    val r = ParquetFileReader.open(in)
    try {
      r.getRowGroups.asScala.flatMap { rg =>
        rg.getColumns.asScala.find(_.getPath.toDotString == "event_id")
          .flatMap { c =>
            val st = c.getStatistics
            if (st == null || !st.hasNonNullValue) None
            else Some(st.genericGetMax.asInstanceOf[java.lang.Long].longValue() + 1L)
          }
      }.maxOption.getOrElse(0L)
    } finally r.close()
  }

  override def initialOffset(): Offset = SeqOffset(0L)

  override def latestOffset(): Offset = SeqOffset(maxSeq)

  // admission control: each micro-batch admits at most maxPerBatch messages
  // (the pull-consumer batch-size analog)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    SeqOffset(nextOffset(start.asInstanceOf[SeqOffset].seq))

  override def reportLatestOffset(): Offset = SeqOffset(maxSeq)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  // Trigger.AvailableNow: drain up to the offset captured at query start,
  // still in maxPerBatch-sized micro-batches
  override def prepareForTriggerAvailableNow(): Unit = { val _ = maxSeq }

  override def deserializeOffset(json: String): Offset =
    SeqOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[SeqOffset].seq + 1
    val hi = end.asInstanceOf[SeqOffset].seq
    if (hi < lo) Array.empty
    else Array(StreamBatch(file, lo, hi))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new StreamReaderFactory(stream)

  /** cap the next batch at maxPerBatch messages (AdmissionControl-style) */
  def nextOffset(current: Long): Long = math.min(maxSeq, current + maxPerBatch)
}

final case class SeqOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

final case class StreamBatch(file: String, seqLo: Long, seqHi: Long)
    extends InputPartition

final class StreamReaderFactory(stream: String) extends PartitionReaderFactory {
  override def createReader(p: InputPartition) = {
    val b = p.asInstanceOf[StreamBatch]
    new NatsScanReaderFactory(NatsScanSource.envelopeSchema, b.seqLo, b.seqHi,
      Long.MinValue, Long.MaxValue, Nil, stream)
      .createReader(NatsScanPartition(b.file, 0L, Long.MaxValue))
  }
}
