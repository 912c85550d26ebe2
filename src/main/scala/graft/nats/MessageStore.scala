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
/** Bounds the source can prune with, in envelope terms: inclusive seq range
  * and inclusive ts_nats µs range. Stores translate them to raw storage
  * predicates so they reach the parquet scan as PushedFilters — filters on
  * the *computed* envelope columns (seq = event_id+1, ts_nats = µs(ts))
  * cannot be pushed through the projection by Catalyst. */
final case class ScanPruning(
    seqLo: Option[Long] = None, seqHi: Option[Long] = None,
    tsLoMicros: Option[Long] = None, tsHiMicros: Option[Long] = None)

trait MessageStore {
  def read(spark: SparkSession, stream: String): DataFrame =
    read(spark, stream, ScanPruning())

  /** bounded read; implementations SHOULD turn the bounds into storage-level
    * pruning (the envelope-level filters are re-applied above regardless,
    * so a store may ignore them without breaking correctness) */
  def read(spark: SparkSession, stream: String, pruning: ScanPruning): DataFrame
}

/** Parquet-backed store over the driver fixtures: `events.parquet` plays the
  * JetStream stream (FIXTURES.md §6):
  *   seq      = event_id + 1            (JetStream seqs start at 1)
  *   subject  = events.<event_type>.<user_id>
  *   ts_nats  = ts (parquet TIMESTAMP(MICROS); µs is already the envelope
  *              granularity — the reference's ns→µs truncation is a no-op)
  *   payload  = props JSON text as UTF-8 bytes
  */
final class ParquetMessageStore(dir: String) extends MessageStore {
  override def read(spark: SparkSession, stream: String,
                    pruning: ScanPruning): DataFrame = {
    require(stream == "events", s"unknown stream '$stream' (store has: events)")
    var raw = graft.Tables.loadEventsRaw(spark, dir)
    // raw-column predicates — these reach the parquet scan as PushedFilters
    // (row-group + page pruning), the columnar analog of the reference's
    // binary search (/root/reference/src/nats_scan.cpp:548-595).
    // seq = event_id + 1; ts is the parquet TIMESTAMP_NTZ(µs) column, so the
    // µs bounds compare directly as timestamp literals (pushable; a bound on
    // a computed epoch-ns column would not be).
    pruning.seqLo.foreach(lo => raw = raw.filter(col("event_id") >= lo - 1))
    pruning.seqHi.foreach(hi => raw = raw.filter(col("event_id") <= hi - 1))
    pruning.tsLoMicros.foreach(lo =>
      raw = raw.filter(col("ts") >= graft.Tables.ntzMicros(lo)))
    pruning.tsHiMicros.foreach(hi =>
      raw = raw.filter(col("ts") <= graft.Tables.ntzMicros(hi)))
    raw.select(
      lit("events").as("stream"),
      concat(lit("events."), col("event_type"), lit("."),
        col("user_id").cast("string")).as("subject"),
      (col("event_id") + 1L).as("seq"),
      timestamp_micros(expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"))
        .as("ts_nats"),
      col("props").cast("binary").as("payload"))
  }
}
