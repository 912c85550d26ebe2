package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Physical scan: one InputPartition per parquet row group, each reader a
  * bounded pull over its byte range (the distributed analog of the
  * reference's bounded Direct Get cursor, /root/reference/src/nats_scan.cpp:713-723).
  *
  * Plan-time pruning: row groups whose event_id / ts statistics fall outside
  * the pushed seq/ts bounds are never planned at all; record-level residue is
  * re-checked per message in the reader (gap-skip analog :725-729 is a no-op
  * on columnar storage).
  */
final class NatsScanScan(file: String, dir: String, stream: String,
                         required: StructType,
                         seqLo: Long, seqHi: Long, tsLoNs: Long, tsHiNs: Long,
                         subjectContains: List[String], maxPerBatch: Long)
    extends Scan with Batch {

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new graft.streaming.NatsMicroBatchStream(dir, stream, maxPerBatch)

  override def description(): String =
    s"nats_scan stream=$stream seq=[$seqLo,$seqHi] tsNs=[$tsLoNs,$tsHiNs] " +
      s"subjectContains=$subjectContains cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new Configuration()
    val in = HadoopInputFile.fromPath(new Path(file), conf)
    val reader = ParquetFileReader.open(in)
    try {
      reader.getRowGroups.asScala.zipWithIndex.flatMap { case (rg, i) =>
        // row-group pruning on event_id (seq = event_id + 1) stats
        val idCol = rg.getColumns.asScala
          .find(_.getPath.toDotString == "event_id")
        val tsCol = rg.getColumns.asScala
          .find(_.getPath.toDotString == "ts")
        val keepBySeq = idCol.forall { c =>
          val st = c.getStatistics
          if (st == null || !st.hasNonNullValue) true
          else {
            val mn = st.genericGetMin.asInstanceOf[java.lang.Long] + 1
            val mx = st.genericGetMax.asInstanceOf[java.lang.Long] + 1
            mx >= seqLo && mn <= seqHi
          }
        }
        val keepByTs = tsCol.forall { c =>
          val st = c.getStatistics
          if (st == null || !st.hasNonNullValue) true
          else {
            val mn = st.genericGetMin.asInstanceOf[java.lang.Long].longValue()
            val mx = st.genericGetMax.asInstanceOf[java.lang.Long].longValue()
            mx >= tsLoNs && mn <= tsHiNs
          }
        }
        if (keepBySeq && keepByTs)
          Some(NatsScanPartition(file, rg.getStartingPos,
            rg.getStartingPos + rg.getTotalByteSize): InputPartition)
        else None
      }.toArray
    } finally reader.close()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NatsScanReaderFactory(required, seqLo, seqHi, tsLoNs, tsHiNs,
      subjectContains, stream)
}

final case class NatsScanPartition(file: String, rangeStart: Long,
                                   rangeEnd: Long) extends InputPartition

final class NatsScanReaderFactory(required: StructType, seqLo: Long,
                                  seqHi: Long, tsLoNs: Long, tsHiNs: Long,
                                  subjectContains: List[String], stream: String)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new NatsScanReader(p.asInstanceOf[NatsScanPartition], required,
      seqLo, seqHi, tsLoNs, tsHiNs, subjectContains, stream)
}

/** Per-partition reader: parquet Group API over the partition's byte range,
  * with record-level seq/ts filters delegated to parquet (page skipping) and
  * only the parquet columns backing the required envelope columns read. */
final class NatsScanReader(p: NatsScanPartition, required: StructType,
                           seqLo: Long, seqHi: Long, tsLoNs: Long,
                           tsHiNs: Long, subjectContains: List[String],
                           stream: String)
    extends PartitionReader[InternalRow] {

  private val needed: Set[String] = required.fieldNames.toSet
  private val parquetCols: Seq[String] = {
    val m = Seq(
      "subject" -> Seq("event_type", "user_id"),
      "seq" -> Seq("event_id"),
      "ts_nats" -> Seq("ts"),
      "payload" -> Seq("props"))
    val cols = m.collect { case (env, pc) if needed.contains(env) => pc }.flatten
    // always keep event_id/ts when a bound is pushed, for the record filter
    val extra =
      (if (seqLo > 1L || seqHi < Long.MaxValue) Seq("event_id") else Nil) ++
      (if (tsLoNs > Long.MinValue || tsHiNs < Long.MaxValue) Seq("ts") else Nil)
    (cols ++ extra).distinct
  }

  private val reader: ParquetReader[org.apache.parquet.example.data.Group] = {
    val conf = new Configuration()
    val projection =
      if (parquetCols.isEmpty) None
      else Some {
        val fields = parquetCols.map {
          case "event_id" => "optional int64 event_id;"
          case "ts" => "optional int64 ts (TIMESTAMP(NANOS,false));"
          case "user_id" => "optional int64 user_id;"
          case "event_type" => "optional binary event_type (STRING);"
          case "props" => "optional binary props (STRING);"
        }.mkString("\n")
        s"message spark_schema {\n$fields\n}"
      }
    projection.foreach(s => conf.set("parquet.read.schema", s))

    var pred: org.apache.parquet.filter2.predicate.FilterPredicate = null
    def and(p2: org.apache.parquet.filter2.predicate.FilterPredicate): Unit =
      pred = if (pred == null) p2 else FilterApi.and(pred, p2)
    val idc = FilterApi.longColumn("event_id")
    val tsc = FilterApi.longColumn("ts")
    if (seqLo > 1L) and(FilterApi.gtEq(idc, java.lang.Long.valueOf(seqLo - 1)))
    if (seqHi < Long.MaxValue) and(FilterApi.ltEq(idc, java.lang.Long.valueOf(seqHi - 1)))
    if (tsLoNs > Long.MinValue) and(FilterApi.gtEq(tsc, java.lang.Long.valueOf(tsLoNs)))
    if (tsHiNs < Long.MaxValue) and(FilterApi.ltEq(tsc, java.lang.Long.valueOf(tsHiNs)))

    var b = ParquetReader
      .builder(new GroupReadSupport(), new Path(p.file))
      .withConf(conf)
      .withFileRange(p.rangeStart, p.rangeEnd)
    if (pred != null) b = b.withFilter(FilterCompat.get(pred))
    b.build()
  }

  private var current: InternalRow = _

  override def next(): Boolean = {
    while (true) {
      val g = reader.read()
      if (g == null) return false
      val row = toRow(g)
      if (row != null) { current = row; return true }
    }
    false
  }

  private def toRow(g: org.apache.parquet.example.data.Group): InternalRow = {
    def has(c: String): Boolean = g.getType.containsField(c) &&
      g.getFieldRepetitionCount(c) > 0
    // subject substring filter (reference semantics: substring, not wildcard,
    // /root/reference/src/nats_scan.cpp:741-746)
    lazy val subject: String =
      if (has("event_type") && has("user_id"))
        s"events.${g.getString("event_type", 0)}.${g.getLong("user_id", 0)}"
      else null
    if (subjectContains.nonEmpty &&
        (subject == null || !subjectContains.forall(subject.contains(_))))
      return null
    val vals = required.fieldNames.map {
      case "stream" => UTF8String.fromString(stream)
      case "subject" => if (subject == null) null else UTF8String.fromString(subject)
      case "seq" => if (has("event_id")) g.getLong("event_id", 0) + 1L else null
      case "ts_nats" =>
        if (has("ts")) g.getLong("ts", 0) / 1000L else null // ns → µs truncation
      case "payload" =>
        if (has("props")) g.getString("props", 0).getBytes("UTF-8") else null
      case other => sys.error(s"unknown envelope column $other")
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
