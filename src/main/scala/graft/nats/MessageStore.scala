package graft.nats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A bounded, replayable message store: `read` returns the 5-column message
  * envelope for a named stream. This abstracts what the reference obtains from
  * JetStream Direct Get (/root/reference/src/nats_scan.cpp:713-723); swapping
  * in a live-NATS DataSource V2 implementation changes nothing above it.
  *
  * Envelope schema (mirrors /root/reference/src/nats_scan.cpp:366-385):
  *   stream  STRING   — stream name echoed per row
  *   subject STRING   — hierarchical subject
  *   seq     LONG     — monotonically increasing sequence (UBIGINT narrowed,
  *                      documented in SURVEY.md §1.5)
  *   ts_nats TIMESTAMP— publish time, ns → µs truncation
  *   payload BINARY   — raw message bytes
  */
trait MessageStore {
  def read(spark: SparkSession, stream: String): DataFrame
}

/** Parquet-backed store over the driver fixtures: `events.parquet` plays the
  * JetStream stream (FIXTURES.md §6):
  *   seq      = event_id + 1            (JetStream seqs start at 1)
  *   subject  = events.<event_type>.<user_id>
  *   ts_nats  = ts (ns, truncated to µs)
  *   payload  = props JSON text as UTF-8 bytes
  */
final class ParquetMessageStore(dir: String) extends MessageStore {
  override def read(spark: SparkSession, stream: String): DataFrame = {
    require(stream == "events", s"unknown stream '$stream' (store has: events)")
    graft.Tables.load(spark, dir, "events").select(
      lit("events").as("stream"),
      concat(lit("events."), col("event_type"), lit("."),
        col("user_id").cast("string")).as("subject"),
      (col("event_id") + 1L).as("seq"),
      timestamp_micros(expr("ts div 1000")).as("ts_nats"),
      col("props").cast("binary").as("payload"))
  }
}
