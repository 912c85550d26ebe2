package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.nats.{MessageStore, NatsScan, NatsScanOptions}

/** MessagePack / CBOR payload extraction (the remaining payload formats of
  * the reference roadmap, /root/reference/docs/GUIDE.md:472-475) — the
  * same round-trip oracle pattern as the proto/Avro queries: a store
  * manufactures wire payloads deterministically from the event row, the
  * scan extracts dotted paths, and the oracle recomputes every value from
  * the source columns (codec asymmetry = hash mismatch).
  *
  * Both formats are schemaless, so extraction is STRINGLY (the reference's
  * json_extract semantics): numbers come back as text and the query casts
  * where a typed comparison is wanted. Map-side expression work only.
  */
object WireQueries {

  /** the shared deterministic record both encoders pack */
  private def record(): Column = struct(
    concat(lit("d"), col("user_id").cast("string")).as("device"),
    col("event_type").as("kind"),
    (col("value") * 0.5).as("reading"),
    (col("event_id") % 89).as("cnt"),
    (col("event_id") % 2 === 0).as("ok"),
    (-col("event_id") - 7L).as("neg"),
    when(col("event_id") % 5 === 0, lit(null).cast("string"))
      .otherwise(concat(lit("n"), col("user_id").cast("string"))).as("note"),
    struct(col("event_type").as("zone"),
      (col("user_id") % 6).cast("int").as("rack")).as("pos"),
    array(col("event_type"), lit("wire")).as("tags"))

  private final class PackedStore(dir: String, cbor: Boolean)
      extends MessageStore {
    override def read(spark: SparkSession, stream: String,
                      pruning: graft.nats.ScanPruning): DataFrame = {
      val raw = graft.Tables.load(spark, dir, "events")
      val payload =
        if (cbor) graft.wire.CborDecode.encode(record())
        else graft.wire.MsgPackDecode.encode(record())
      raw.select(
        lit("events").as("stream"),
        concat(lit("events."), col("event_type"), lit("."),
          col("user_id").cast("string")).as("subject"),
        (col("event_id") + 1L).as("seq"),
        timestamp_micros(expr("ts div 1000")).as("ts_nats"),
        payload.as("payload"))
    }
  }

  private val paths = Seq("device", "kind", "reading", "cnt", "ok", "neg",
    "note", "pos.zone", "pos.rack")

  private def extractQuery(s: SparkSession, dir: String,
                           cbor: Boolean): DataFrame = {
    val opts =
      if (cbor) NatsScanOptions(cborExtract = paths)
      else NatsScanOptions(msgpackExtract = paths)
    NatsScan.scan(s, "events", opts, new PackedStore(dir, cbor))
      .select(col("seq"),
        col("device"), col("kind"),
        round(col("reading").cast("double"), 6).as("reading"),
        col("cnt").cast("bigint").as("cnt"),
        col("ok"), // "true"/"false" text
        col("neg").cast("bigint").as("neg"),
        col("note"),
        col("pos_zone"),
        col("pos_rack").cast("int").as("pos_rack"))
      .orderBy("seq")
  }

  private val extractOracle = """
      SELECT event_id + 1 AS seq,
             'd' || CAST(user_id AS VARCHAR) AS device,
             event_type AS kind,
             round(value * 0.5, 6) AS reading,
             event_id % 89 AS cnt,
             CASE WHEN event_id % 2 = 0 THEN 'true' ELSE 'false' END AS ok,
             -event_id - 7 AS neg,
             CASE WHEN event_id % 5 = 0 THEN NULL
                  ELSE 'n' || CAST(user_id AS VARCHAR) END AS note,
             event_type AS pos_zone,
             CAST(user_id % 6 AS INTEGER) AS pos_rack
      FROM events ORDER BY seq"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nats_msgpack_extract" -> ((s, dir) => extractQuery(s, dir, cbor = false)),
    "nats_cbor_extract" -> ((s, dir) => extractQuery(s, dir, cbor = true)))

  def oracleSql: Map[String, String] = Map(
    "nats_msgpack_extract" -> extractOracle,
    "nats_cbor_extract" -> extractOracle)
}
