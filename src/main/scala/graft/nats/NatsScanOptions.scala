package graft.nats

import java.time.Instant

/** Query-scoped scan configuration — the Spark analog of the reference's
  * bind-time parameters (`NatsScanBind`, /root/reference/src/nats_scan.cpp:207-423).
  *
  * Validation reproduces the reference's mutual-exclusion rules
  * (/root/reference/src/nats_scan.cpp:267-285) with matching error messages:
  *   - sequence range × time range are mutually exclusive
  *   - `json_extract` × `proto_extract` are mutually exclusive
  *   - `proto_file` / `proto_message` / `proto_extract` are co-required
  *
  * Ranges are inclusive on both ends (`[start_seq, end_seq]`,
  * /root/reference/src/nats_scan.cpp:703-707; time semantics use the clean
  * `ts_nats <= end_time` predicate — a documented divergence from the
  * reference's first-message-at-or-after-end quirk, see SURVEY.md §7).
  */
final case class NatsScanOptions(
    subjectContains: Option[String] = None,
    url: Option[String] = None,
    startSeq: Option[Long] = None,
    endSeq: Option[Long] = None,
    startTime: Option[Instant] = None,
    endTime: Option[Instant] = None,
    jsonExtract: Seq[String] = Nil,
    protoFile: Option[String] = None,
    protoMessage: Option[String] = None,
    protoExtract: Seq[String] = Nil,
    /** schema-registry wire format for protobuf payloads (magic byte +
      * int32 schema id + message-index varints + body): names a resolver
      * registered via [[graft.proto.ProtoRegistry]]. The `proto_file` /
      * `proto_message` pair stays the READER schema; the header is
      * validated per payload (unknown id = loud, foreign message = NULL). */
    protoRegistry: Option[String] = None,
    /** Avro payloads (reference roadmap, docs/GUIDE.md:472-474): `.avsc`
      * schema file + dotted extraction paths, mirroring the proto surface */
    avroFile: Option[String] = None,
    avroExtract: Seq[String] = Nil,
    /** schema-registry wire format (magic byte + int32 schema id + body):
      * names a resolver registered via [[graft.avro.AvroRegistry]]. The
      * `.avsc` file stays the READER schema; per-payload writer schemas
      * resolve by id with full Avro schema resolution. */
    avroRegistry: Option[String] = None,
    /** MessagePack / CBOR payloads (roadmap :472-475): schemaless like
      * JSON, so the surface is the stringly json_extract one — dotted
      * paths over a top-level map, STRING columns, missing → NULL */
    msgpackExtract: Seq[String] = Nil,
    cborExtract: Seq[String] = Nil,
    /** strict reference fidelity for extracted JSON NUMBERS: render as
      * fixed 6-decimal text the way the reference's `std::to_string(double)`
      * does — `42.5` → `"42.500000"` (/root/reference/src/nats_scan.cpp:797-800).
      * Default keeps the engine's documented divergence (JSON-literal text,
      * SURVEY.md §7.3). */
    jsonNumbersToString: Boolean = false) {

  def hasSeqRange: Boolean = startSeq.isDefined || endSeq.isDefined
  def hasTimeRange: Boolean = startTime.isDefined || endTime.isDefined
  def usesProto: Boolean =
    protoFile.isDefined || protoMessage.isDefined || protoExtract.nonEmpty
  def usesAvro: Boolean = avroFile.isDefined || avroExtract.nonEmpty

  /** payload column type: binary unless json extraction is requested
    * (/root/reference/src/nats_scan.cpp:379-385). */
  def payloadIsString: Boolean = jsonExtract.nonEmpty

  def validate(): Unit = {
    if (hasSeqRange && hasTimeRange)
      throw new IllegalArgumentException(
        "Cannot specify both sequence range (start_seq/end_seq) and time range (start_time/end_time)")
    // conflict outranks co-requirement: the reference's E6 shape
    // (test_connection_errors.sql:194-199) passes json_extract plus
    // proto_file/proto_message WITHOUT proto_extract — the user's mistake
    // is mixing decoders, so that is the error to surface
    if (jsonExtract.nonEmpty && usesProto)
      throw new IllegalArgumentException(
        "Cannot specify both json_extract and proto_extract " +
          "(proto_file/proto_message/proto_extract)")
    if (usesProto && (protoFile.isEmpty || protoMessage.isEmpty || protoExtract.isEmpty))
      throw new IllegalArgumentException(
        "proto_file, proto_message, and proto_extract must all be specified together")
    if (usesAvro && (jsonExtract.nonEmpty || usesProto))
      throw new IllegalArgumentException(
        "Cannot combine avro_extract with json_extract or proto_extract")
    if (usesAvro && (avroFile.isEmpty || avroExtract.isEmpty))
      throw new IllegalArgumentException(
        "avro_file and avro_extract must be specified together")
    if (avroRegistry.isDefined && !usesAvro)
      throw new IllegalArgumentException(
        "avro_registry requires avro_file (the reader schema) and avro_extract")
    if (protoRegistry.isDefined && !usesProto)
      throw new IllegalArgumentException(
        "proto_registry requires proto_file/proto_message (the reader " +
          "schema) and proto_extract")
    locally {
      val decoders = Seq(
        jsonExtract.nonEmpty, usesProto, usesAvro,
        msgpackExtract.nonEmpty, cborExtract.nonEmpty).count(identity)
      if (decoders > 1)
        throw new IllegalArgumentException(
          "Only one payload decoder may be specified " +
            "(json_extract / proto_extract / avro_extract / " +
            "msgpack_extract / cbor_extract)")
    }
    for (s <- startSeq; e <- endSeq)
      if (s > e)
        throw new IllegalArgumentException(
          s"start_seq ($s) cannot be greater than end_seq ($e)")
  }
}

object NatsScanOptions {
  /** Parse an ISO-8601 UTC instant such as "2024-01-02T00:00:00Z". */
  def ts(iso: String): Option[Instant] = Some(Instant.parse(iso))
}
