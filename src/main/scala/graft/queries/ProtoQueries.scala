package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.nats.{MessageStore, NatsScan, NatsScanOptions, ParquetMessageStore}
import graft.proto.{ProtoDecode, ProtoSchema}

/** Protobuf extraction surface (SURVEY.md §2 Layer A, proto rows).
  *
  * The fixture parquet has no protobuf payloads, so the store below
  * manufactures them deterministically: each event's fields are packed into a
  * wire-format message by our encoder expression, and the scan decodes them
  * back with `proto_extract` dot-paths. The oracle computes the same values
  * straight from the source columns — any codec asymmetry (encode≠decode)
  * or type-mapping error breaks the hash match.
  *
  * At scale both encode and decode are per-row expressions inside the scan
  * stage — no shuffle, no driver involvement.
  */
object ProtoQueries {

  val structProtoPath = "/root/repo/proto/struct_event.proto"
  val deviceProtoPath = "/root/repo/proto/device_event.proto"
  val typesProtoPath = "/root/repo/proto/all_types.proto"
  val batchProtoPath = "/root/repo/proto/batch.proto"
  val mapOneofProtoPath = "/root/repo/proto/map_oneof.proto"
  val factoryProtoPath = "/root/repo/proto/factory_event.proto"
  val sensorAvscPath = "/root/repo/avro/sensor_reading.avsc"

  /** Store whose payload is a binary Avro SensorReading built from the
    * event row — the Avro sibling of [[DeviceProtoStore]]. */
  final class SensorAvroStore(dir: String) extends MessageStore {
    override def read(spark: SparkSession, stream: String,
                      pruning: graft.nats.ScanPruning): DataFrame = {
      val schemaJson = graft.avro.AvroDecode.schemaFromFile(sensorAvscPath)
      val raw = graft.Tables.load(spark, dir, "events")
      val msg: Column = struct(
        concat(lit("d"), col("user_id").cast("string")).as("device"),
        col("event_type").as("kind"),
        (col("value") * 0.25).as("reading"),
        (col("event_id") % 97).as("cnt"),
        (col("event_id") % 2 === 0).as("ok"),
        timestamp_micros(expr("ts div 1000")).as("observed"),
        when(col("event_id") % 5 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("n"), col("user_id").cast("string"))).as("note"),
        struct(col("event_type").as("zone"),
          (col("user_id") % 6).cast("int").as("rack")).as("pos"),
        array(col("event_type"), lit("fleet")).as("tags"),
        when(col("event_id") % 3 === 0, "IDLE")
          .when(col("event_id") % 3 === 1, "RUN")
          .otherwise("HALT").as("mode"))
      raw.select(
        lit("events").as("stream"),
        concat(lit("events."), col("event_type"), lit("."),
          col("user_id").cast("string")).as("subject"),
        (col("event_id") + 1L).as("seq"),
        timestamp_micros(expr("ts div 1000")).as("ts_nats"),
        graft.avro.AvroDecode.encode(msg, schemaJson).as("payload"))
    }
  }

  val registryAvscPath = "/root/repo/avro/registry_reading.avsc"

  /** Schema-registry framed fixture: payloads alternate between TWO writer
    * schema versions (different field order, v2 adds fields), each framed
    * as 0x00 + int32 BE schema id + Avro body — the public registry wire
    * format. The reader schema ([[registryAvscPath]]) bridges both via
    * Avro schema resolution, so the scan's relational shape is version-
    * independent; broken resolution misaligns v2's values and the oracle
    * hash catches it. */
  object RegistryAvroFixture {
    val ResolverName = "graft-test-registry"
    val V1Id = 1
    val V2Id = 7
    val V1Json: String =
      """{"type":"record","name":"Reading","namespace":"graft.fixtures","fields":[
        |{"name":"device","type":"string"},
        |{"name":"reading","type":"double"},
        |{"name":"cnt","type":"long"}]}""".stripMargin
    val V2Json: String =
      """{"type":"record","name":"Reading","namespace":"graft.fixtures","fields":[
        |{"name":"device","type":"string"},
        |{"name":"note","type":["null","string"],"default":null},
        |{"name":"reading","type":"double"},
        |{"name":"cnt","type":"long"},
        |{"name":"extra","type":"long"}]}""".stripMargin

    def registerResolver(): Unit =
      graft.avro.AvroRegistry.register(ResolverName, {
        case V1Id => Some(V1Json)
        case V2Id => Some(V2Json)
        case _ => None
      })
  }

  final class RegistryAvroStore(dir: String) extends MessageStore {
    import RegistryAvroFixture._
    override def read(spark: SparkSession, stream: String,
                      pruning: graft.nats.ScanPruning): DataFrame = {
      val raw = graft.Tables.load(spark, dir, "events")
      val device = concat(lit("d"), col("user_id").cast("string"))
      val reading = col("value") * 0.25
      val cnt = col("event_id") % 97
      val v1 = graft.avro.AvroDecode.encodeRegistry(
        struct(device.as("device"), reading.as("reading"), cnt.as("cnt")),
        V1Json, V1Id)
      val v2 = graft.avro.AvroDecode.encodeRegistry(
        struct(device.as("device"),
          when(col("event_id") % 3 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("n"), col("user_id").cast("string"))).as("note"),
          reading.as("reading"), cnt.as("cnt"),
          (col("event_id") * 2L).as("extra")),
        V2Json, V2Id)
      raw.select(
        lit("events").as("stream"),
        concat(lit("events."), col("event_type"), lit("."),
          col("user_id").cast("string")).as("subject"),
        (col("event_id") + 1L).as("seq"),
        timestamp_micros(expr("ts div 1000")).as("ts_nats"),
        when(col("event_id") % 2 === 0, v1).otherwise(v2).as("payload"))
    }
  }

  val registryProtoPath = "/root/repo/proto/registry_reading.proto"

  /** Registry-framed PROTOBUF fixture — the protobuf sibling of
    * [[RegistryAvroFixture]]. Payloads alternate between two writer schema
    * versions on one stream, each framed with the public Confluent protobuf
    * header (0x00 + int32 BE id + message-index varints):
    *   - v1 (id 3, indexes [0] → the optimized single-0 form): a Reading
    *     WITHOUT the note field — reader-side decode defaults it to ""
    *     (proto3 absent-scalar semantics, the wire format's own bridging)
    *   - v2 (id 9, indexes [1, 0] → first nested message of the SECOND
    *     top-level message, exercising real tree navigation): adds note
    *     and an extra field the reader doesn't know (skipped by number)
    * The oracle is version-blind except for v1's defaulted note, so a
    * broken frame parse, index navigation, or version bridge all land as
    * hash mismatches. */
  object RegistryProtoFixture {
    val ResolverName = "graft-test-proto-registry"
    val V1Id = 3
    val V2Id = 9
    val V1Src: String =
      """syntax = "proto3";
        |message Reading {
        |  string device = 1;
        |  double reading = 2;
        |  int64 cnt = 3;
        |}""".stripMargin
    val V2Src: String =
      """syntax = "proto3";
        |message Heartbeat { int64 beat = 1; }
        |message Env {
        |  message Reading {
        |    string device = 1;
        |    double reading = 2;
        |    int64 cnt = 3;
        |    string note = 4;
        |    int64 extra = 5;
        |  }
        |  Reading r = 1;
        |}""".stripMargin

    def registerResolver(): Unit =
      graft.proto.ProtoRegistry.register(ResolverName, {
        case V1Id => Some(V1Src)
        case V2Id => Some(V2Src)
        case _ => None
      })
  }

  final class RegistryProtoStore(dir: String) extends MessageStore {
    import RegistryProtoFixture._
    override def read(spark: SparkSession, stream: String,
                      pruning: graft.nats.ScanPruning): DataFrame = {
      val v1Def = ProtoSchema.parse(V1Src, "Reading")
      val v2Def = ProtoSchema.parse(V2Src, "Reading") // nested def, hoisted
      val raw = graft.Tables.load(spark, dir, "events")
      val device = concat(lit("d"), col("user_id").cast("string"))
      val reading = col("value") * 0.25
      val cnt = col("event_id") % 97
      val v1 = graft.proto.ProtoRegistry.encodeRegistry(
        struct(device.as("device"), reading.as("reading"), cnt.as("cnt")),
        v1Def, V1Id) // indexes [0] → single-0 optimized header
      val v2 = graft.proto.ProtoRegistry.encodeRegistry(
        struct(device.as("device"), reading.as("reading"), cnt.as("cnt"),
          concat(lit("n"), col("user_id").cast("string")).as("note"),
          (col("event_id") * 2L).as("extra")),
        v2Def, V2Id, Seq(1, 0))
      raw.select(
        lit("events").as("stream"),
        concat(lit("events."), col("event_type"), lit("."),
          col("user_id").cast("string")).as("subject"),
        (col("event_id") + 1L).as("seq"),
        timestamp_micros(expr("ts div 1000")).as("ts_nats"),
        when(col("event_id") % 2 === 0, v1).otherwise(v2).as("payload"))
    }
  }

  /** Store whose payload is a wire-format DeviceEvent built from the event
    * row: device_id "u<user_id>", ts event_id, position(zone=event_type,
    * rack="r<user_id % 3>", building="b1"), reading(kw=value, pf=value/200,
    * voltage=480.0), online = value > 100, firmware "v2.1.<user_id % 2>". */
  final class DeviceProtoStore(dir: String) extends MessageStore {
    override def read(spark: SparkSession, stream: String,
                      pruning: graft.nats.ScanPruning): DataFrame = {
      val schema = ProtoSchema.parseFile(deviceProtoPath, "DeviceEvent")
      val raw = graft.Tables.load(spark, dir, "events")
      val msg: Column = struct(
        concat(lit("u"), col("user_id").cast("string")).as("device_id"),
        col("event_id").as("ts"),
        struct(
          col("event_type").as("zone"),
          concat(lit("r"), (col("user_id") % 3).cast("string")).as("rack"),
          lit("b1").as("building")).as("position"),
        struct(
          col("value").as("kw"),
          (col("value") / 200.0).as("pf"),
          lit(480.0).as("voltage")).as("reading"),
        (col("value") > 100.0).as("online"),
        concat(lit("v2.1."), (col("user_id") % 2).cast("string")).as("firmware"))
      raw.select(
        lit("events").as("stream"),
        concat(lit("events."), col("event_type"), lit("."),
          col("user_id").cast("string")).as("subject"),
        (col("event_id") + 1L).as("seq"),
        timestamp_micros(expr("ts div 1000")).as("ts_nats"),
        ProtoDecode.encode(msg, schema).as("payload"))
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // nested dot-path extraction + dots→underscores mangling
    "proto_extract_nested" -> ((s, dir) =>
      NatsScan.scan(s, "events",
          NatsScanOptions(
            protoFile = Some(deviceProtoPath),
            protoMessage = Some("DeviceEvent"),
            protoExtract = Seq("device_id", "ts", "position.zone",
              "position.rack", "reading.kw", "reading.pf", "online", "firmware")),
          new DeviceProtoStore(dir))
        .select(col("seq"), col("device_id"), col("ts"),
          col("position_zone"), col("position_rack"),
          round(col("reading_kw"), 4).as("kw"),
          round(col("reading_pf"), 6).as("pf"),
          col("online"), col("firmware"))
        .orderBy("seq")),

    // proto extraction feeding relational ops: filter + group + agg
    "proto_filter_agg" -> ((s, dir) =>
      NatsScan.scan(s, "events",
          NatsScanOptions(
            protoFile = Some(deviceProtoPath),
            protoMessage = Some("DeviceEvent"),
            protoExtract = Seq("position.zone", "reading.kw", "online")),
          new DeviceProtoStore(dir))
        .filter(col("online") === true && col("reading_kw") > 50.0)
        .groupBy("position_zone")
        .agg(count(lit(1)).as("n"),
          sum(col("reading_kw").cast("decimal(18,2)")).as("skw"),
          max("seq").as("max_seq"))
        .select(col("position_zone"), col("n"),
          round(col("skw").cast("double") / col("n"), 4).as("avg_kw"),
          col("max_seq"))
        .orderBy("position_zone")),

    // repeated fields: packed varint/fixed64/zigzag + per-element strings.
    // Output reduces the decoded arrays to scalars (size/sum/first) so the
    // oracle needs no array hashing — any packing/unpacking asymmetry still
    // breaks the match.
    "proto_repeated" -> ((s, dir) => {
      val schema = ProtoSchema.parseFile(batchProtoPath, "Batch")
      val raw = graft.Tables.load(s, dir, "events").filter(col("event_id") < 2000)
      val msg = struct(
        col("event_type").as("tag"),
        array(col("event_id"), col("event_id") + 1L, col("event_id") * 2L).as("ids"),
        array(col("value"), col("value") / 2.0).as("temps"),
        array(col("event_type"), lit("x"), concat(lit("u"),
          col("user_id").cast("string"))).as("labels"),
        array((-col("event_id")).cast("int"), lit(7).cast("int")).as("deltas"))
      val d = ProtoDecode.decode(ProtoDecode.encode(msg, schema), schema).as("d")
      raw.select(col("event_id"), d)
        .select(
          col("event_id"),
          col("d.tag"),
          size(col("d.ids")).as("n_ids"),
          expr("aggregate(d.ids, CAST(0 AS BIGINT), (a, x) -> a + x)").as("sum_ids"),
          round(expr("aggregate(d.temps, CAST(0 AS DOUBLE), (a, x) -> a + x)"), 6).as("sum_temps"),
          expr("array_join(d.labels, ',')").as("labels_joined"),
          expr("aggregate(d.deltas, CAST(0 AS BIGINT), (a, x) -> a + CAST(x AS BIGINT))").as("sum_deltas"))
        .orderBy("event_id")
    }),

    // schema-registry framing: two writer schema VERSIONS on one stream
    // (v2 reorders fields and adds two), resolved per payload by id and
    // bridged onto the one reader schema — the oracle is version-blind, so
    // any resolution misalignment (or a broken frame parse) breaks the hash
    "nats_avro_registry" -> ((s, dir) => {
      RegistryAvroFixture.registerResolver()
      NatsScan.scan(s, "events",
          NatsScanOptions(
            avroFile = Some(registryAvscPath),
            avroExtract = Seq("device", "reading", "cnt"),
            avroRegistry = Some(RegistryAvroFixture.ResolverName)),
          new RegistryAvroStore(dir))
        .select(col("seq"), col("device"),
          round(col("reading"), 6).as("reading"), col("cnt"))
        .orderBy("seq")
    }),

    // registry framing for PROTOBUF: two writer versions on one stream
    // (v1 lacks note → proto3-defaulted ""; v2 adds fields, lives at
    // message-indexes [1,0] → real tree navigation), resolved per payload
    // by id and decoded reader-shaped. The oracle recomputes every value
    // from the source columns, so a frame-parse or bridging bug breaks
    // the hash; the defaulted-note column pins the proto3 semantics.
    "nats_proto_registry" -> ((s, dir) => {
      RegistryProtoFixture.registerResolver()
      NatsScan.scan(s, "events",
          NatsScanOptions(
            protoFile = Some(registryProtoPath),
            protoMessage = Some("Reading"),
            protoExtract = Seq("device", "reading", "cnt", "note"),
            protoRegistry = Some(RegistryProtoFixture.ResolverName)),
          new RegistryProtoStore(dir))
        .select(col("seq"), col("device"),
          round(col("reading"), 6).as("reading"), col("cnt"), col("note"))
        .orderBy("seq")
    }),

    // google.protobuf.Struct / Value: dynamic JSON-shaped properties decode
    // to canonical JSON text, then Spark's codegen'd JSON toolbox extracts
    // typed values — the oracle recomputes every extracted value straight
    // from the source columns, so any wire/JSON asymmetry breaks the hash
    "proto_struct" -> ((s, dir) => {
      val encSchema = ProtoSchema.parseFile(structProtoPath, "StructEventRaw")
      val decSchema = ProtoSchema.parseFile(structProtoPath, "StructEvent")
      val raw = graft.Tables.load(s, dir, "events").filter(col("event_id") < 3000)
      // dynamic JSON properties manufactured from the event row: nested
      // object, mixed-type array with a null, boolean, numbers
      val propsJson = concat(
        lit("{\"uid\":"), col("user_id"),
        lit(",\"etype\":\""), col("event_type"),
        lit("\",\"ok\":"), when(col("event_id") % 2 === 0, "true").otherwise("false"),
        lit(",\"nested\":{\"n\":"), col("event_id") % 7,
        lit("},\"tags\":[\"a\",null,"), col("event_id") % 3, lit("]}"))
      val extraJson = when(col("event_id") % 5 === 0, lit("null"))
        .otherwise(concat(lit("[\"x\","), col("user_id") % 10, lit("]")))
      val msg = struct(
        col("event_type").as("etype"),
        propsJson.as("props"),
        extraJson.as("extra"),
        lit(null).cast("struct<type_url:string,value:binary>").as("detail"))
      val d = ProtoDecode.decode(ProtoDecode.encode(msg, encSchema), decSchema)
        .as("d")
      raw.select(d)
        .select(col("d.etype").as("etype"),
          get_json_object(col("d.props"), "$.uid").cast("long").as("uid"),
          get_json_object(col("d.props"), "$.ok").cast("boolean").as("ok"),
          get_json_object(col("d.props"), "$.nested.n").cast("long").as("n7"),
          get_json_object(col("d.props"), "$.tags[2]").cast("long").as("t3"),
          col("d.extra").as("extra_json"),
          get_json_object(col("d.extra"), "$[1]").cast("long").as("x1"))
        .groupBy("etype")
        .agg(count(lit(1)).as("n"),
          sum("uid").as("sum_uid"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"),
          sum("n7").as("sum_n7"),
          sum("t3").as("sum_t3"),
          sum(when(col("extra_json") === "null", 1L).otherwise(0L)).as("n_null_extra"),
          sum(coalesce(col("x1"), lit(0L))).as("sum_x1"))
        .orderBy("etype")
    }),

    // Struct decode compared as RAW JSON TEXT: DuckDB reconstructs the
    // exact canonical string character-for-character (key order = wire
    // order, integral numbers without decimal point), so any drift in the
    // wire→JSON rendering — escaping, number formatting, ordering —
    // hash-fails even where typed extraction would still pass
    "proto_struct_text" -> ((s, dir) => {
      val encSchema = ProtoSchema.parseFile(structProtoPath, "StructEventRaw")
      val decSchema = ProtoSchema.parseFile(structProtoPath, "StructEvent")
      val raw = graft.Tables.load(s, dir, "events").filter(col("event_id") < 2000)
      val propsJson = concat(
        lit("{\"uid\":"), col("user_id"),
        lit(",\"q\":\"a\\\"b\\\\c\""), // escapes survive the round trip
        lit(",\"ok\":"), when(col("event_id") % 2 === 0, "true").otherwise("false"),
        lit(",\"nested\":{\"n\":"), col("event_id") % 7,
        lit("},\"tags\":[null,"), col("event_id") % 3, lit("]}"))
      val msg = struct(
        col("event_type").as("etype"),
        propsJson.as("props"),
        lit(null).cast("string").as("extra"),
        lit(null).cast("struct<type_url:string,value:binary>").as("detail"))
      val d = ProtoDecode.decode(ProtoDecode.encode(msg, encSchema), decSchema)
        .as("d")
      raw.select((col("event_id") + 1L).as("seq"), d)
        .select(col("seq"), col("d.etype").as("etype"),
          col("d.props").as("props_json"))
        .orderBy("seq")
    }),

    // google.protobuf.Any: per-row type_url resolves against the parsed
    // file set — resolvable rows decode the embedded Pos payload to JSON,
    // unresolvable type URLs surface as NULL value_json (data, not error).
    // Encoded through the AnyRaw wire-shape twin (decoded Anys are not
    // re-encodable), which is the real publisher/consumer asymmetry.
    "proto_any" -> ((s, dir) => {
      val encSchema = ProtoSchema.parseFile(structProtoPath, "StructEventRaw")
      val decSchema = ProtoSchema.parseFile(structProtoPath, "StructEvent")
      val posSchema = ProtoSchema.parseFile(structProtoPath, "Pos")
      val raw = graft.Tables.load(s, dir, "events").filter(col("event_id") < 3000)
      val posBytes = ProtoDecode.encode(
        struct(col("event_type").as("zone"),
          (col("user_id") % 6).cast("int").as("rack")), posSchema)
      val typeUrl = when(col("event_id") % 3 === 0,
          lit("type.googleapis.com/Retired")) // not in the file set → NULL
        .otherwise(lit("type.googleapis.com/Pos"))
      val msg = struct(
        col("event_type").as("etype"),
        lit(null).cast("string").as("props"),
        lit(null).cast("string").as("extra"),
        struct(typeUrl.as("type_url"), posBytes.as("value")).as("detail"))
      val d = ProtoDecode.decode(ProtoDecode.encode(msg, encSchema), decSchema)
        .as("d")
      raw.select(d)
        .select(col("d.etype").as("etype"),
          col("d.detail.type_url").as("type_url"),
          col("d.detail.value_json").as("vj"),
          get_json_object(col("d.detail.value_json"), "$.zone").as("zone"),
          get_json_object(col("d.detail.value_json"), "$.rack")
            .cast("long").as("rack"))
        .groupBy("etype")
        .agg(count(lit(1)).as("n"),
          sum(when(col("vj").isNull, 1L).otherwise(0L)).as("n_unresolved"),
          sum(when(col("zone") === col("etype"), 1L).otherwise(0L)).as("n_zone_ok"),
          sum(coalesce(col("rack"), lit(0L))).as("sum_rack"))
        .orderBy("etype")
    }),

    // all 17 scalar types + enum round-trip through the wire format
    "proto_all_types" -> ((s, dir) => {
      val schema = ProtoSchema.parseFile(typesProtoPath, "AllTypes")
      val raw = graft.Tables.load(s, dir, "events")
        .filter(col("event_id") < 500)
      val msg = struct(
        concat(lit("s"), col("event_id").cast("string")).as("f_string"),
        col("event_type").cast("binary").as("f_bytes"),
        (col("event_id") * 3 - 1000).cast("int").as("f_int32"),
        (col("event_id") * 1000000L - 123L).as("f_int64"),
        (col("event_id") + 7L).as("f_uint32"),
        col("event_id").cast("decimal(20,0)").as("f_uint64"),
        (-col("event_id") - 1).cast("int").as("f_sint32"),
        (col("event_id") * -999L).as("f_sint64"),
        (col("event_id") + 13L).as("f_fixed32"),
        (col("event_id") + 17L).cast("decimal(20,0)").as("f_fixed64"),
        (col("event_id") - 500).cast("int").as("f_sfixed32"),
        (col("event_id") * -31L).as("f_sfixed64"),
        col("value").cast("float").as("f_float"),
        (col("value") * 1.5).as("f_double"),
        (col("event_id") % 2 === 0).as("f_bool"),
        when(col("event_id") % 3 === 0, "IDLE")
          .when(col("event_id") % 3 === 1, "RUN")
          .otherwise("HALT").as("f_mode"))
      val payload = ProtoDecode.encode(msg, schema)
      val decoded = ProtoDecode.decode(payload, schema).as("d")
      raw.select(col("event_id"), decoded)
        .select(
          col("event_id"),
          col("d.f_string"), col("d.f_int32"), col("d.f_int64"),
          col("d.f_uint32"),
          // uint64 decodes to DECIMAL(20,0) (full unsigned range); emit its
          // digits as STRING so no consumer re-renders the scale-0 decimal
          col("d.f_uint64").cast("string").as("f_uint64"),
          col("d.f_sint32"),
          col("d.f_sint64"), col("d.f_fixed32"),
          col("d.f_fixed64").cast("string").as("f_fixed64"),
          col("d.f_sfixed32"), col("d.f_sfixed64"),
          col("d.f_float").cast("double").as("f_float"),
          col("d.f_double"), col("d.f_bool"), col("d.f_mode"),
          length(col("d.f_bytes").cast("string")).as("bytes_len"))
        .orderBy("event_id")
    }),

    // Avro wire-format extraction through the scan facade: binary
    // single-record payloads, schema from the .avsc option, typed columns
    // per dotted path (nested record + nullable union + enum + the
    // timestamp-micros logical type). The oracle recomputes every value
    // from the source columns — any codec asymmetry breaks the hash.
    "nats_avro_extract" -> ((s, dir) =>
      NatsScan.scan(s, "events",
          NatsScanOptions(
            avroFile = Some(sensorAvscPath),
            avroExtract = Seq("device", "kind", "reading", "cnt", "ok",
              "observed", "note", "pos.zone", "pos.rack", "mode")),
          new SensorAvroStore(dir))
        .select(col("seq"), col("device"), col("kind"),
          round(col("reading"), 6).as("reading"),
          col("cnt"), col("ok"), col("observed"), col("note"),
          col("pos_zone"), col("pos_rack"), col("mode"))
        .orderBy("seq")),

    // multi-file schema (import resolution, DiskSourceTree analog) + the
    // Timestamp/Duration well-known types. The imported message and enum
    // resolve across files; observed decodes to a real TimestampType column
    // (µs, same truncation as ts_nats), uptime to a DayTimeIntervalType
    // surfaced as whole seconds. The oracle recomputes every value from the
    // source columns — a broken import link or WKT codec shows as a hash
    // mismatch, a broken bind as an error.
    "proto_imported" -> ((s, dir) => {
      val schema = ProtoSchema.parseFile(factoryProtoPath, "FactoryEvent")
      val raw = graft.Tables.load(s, dir, "events").filter(col("event_id") < 1000)
      val msg = struct(
        concat(lit("L"), (col("user_id") % 4).cast("string")).as("line"),
        struct(
          col("event_type").as("kind"),
          (col("event_id") % 16).cast("int").as("channel"),
          when(col("event_id") % 4 === 0, "OK")
            .when(col("event_id") % 4 === 1, "DEGRADED")
            .when(col("event_id") % 4 === 2, "OFFLINE")
            .otherwise("STATUS_UNKNOWN").as("status")).as("sensor"),
        timestamp_micros(expr("ts div 1000")).as("observed"),
        expr("make_dt_interval(0, 0, 0, event_id * 3)").as("uptime"))
      val d = ProtoDecode.decode(ProtoDecode.encode(msg, schema), schema).as("d")
      raw.select(col("event_id"), d)
        .select(
          col("event_id"),
          col("d.line").as("line"),
          col("d.sensor.kind").as("sensor_kind"),
          col("d.sensor.channel").as("sensor_channel"),
          col("d.sensor.status").as("sensor_status"),
          col("d.observed").as("observed"),
          col("d.uptime").cast("long").as("uptime_s"))
        .orderBy("event_id")
    }),

    // map<K,V> + oneof round-trip: maps come back as Spark MapType (entry
    // messages on the wire, last key wins), oneof members as a presence
    // group (exactly one non-NULL per row). Output reduces to scalars via
    // element_at/size so the oracle recomputes expectations directly from
    // the source columns — no map hashing, but any codec asymmetry or a
    // presence bug (extra non-NULL member) still breaks the match.
    "proto_map_oneof" -> ((s, dir) => {
      val schema = ProtoSchema.parseFile(mapOneofProtoPath, "Telemetry")
      val raw = graft.Tables.load(s, dir, "events").filter(col("event_id") < 1000)
      val msg = struct(
        concat(lit("d"), col("user_id").cast("string")).as("device"),
        map(lit("clicks"), col("event_id"),
            lit("errs"), col("event_id") % 7).as("counters"),
        map((col("user_id") % 5).cast("int"), col("event_type")).as("names"),
        when(col("event_id") % 3 === 0, col("event_type")).as("text"),
        when(col("event_id") % 3 === 1, col("event_id") * 11).as("code"),
        when(col("event_id") % 3 === 2,
          struct(lit("kw").as("unit"), col("user_id").as("scale"))).as("attr"),
        col("value").as("reading"))
      val d = ProtoDecode.decode(ProtoDecode.encode(msg, schema), schema).as("d")
      raw.select(col("event_id"), col("user_id"), d)
        .select(
          col("event_id"),
          col("d.device").as("device"),
          element_at(col("d.counters"), "clicks").as("c_clicks"),
          element_at(col("d.counters"), "errs").as("c_errs"),
          size(col("d.counters")).as("n_counters"),
          element_at(col("d.names"), (col("user_id") % 5).cast("int")).as("name_val"),
          col("d.text").as("o_text"),
          col("d.code").as("o_code"),
          col("d.attr.unit").as("o_unit"),
          col("d.attr.scale").as("o_scale"),
          col("d.reading").as("reading"))
        .orderBy("event_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "nats_avro_registry" -> """
      SELECT event_id + 1 AS seq,
             'd' || CAST(user_id AS VARCHAR) AS device,
             round(value * 0.25, 6) AS reading,
             event_id % 97 AS cnt
      FROM events ORDER BY seq""",

    "nats_proto_registry" -> """
      SELECT event_id + 1 AS seq,
             'd' || CAST(user_id AS VARCHAR) AS device,
             round(value * 0.25, 6) AS reading,
             event_id % 97 AS cnt,
             CASE WHEN event_id % 2 = 0 THEN ''
                  ELSE 'n' || CAST(user_id AS VARCHAR) END AS note
      FROM events ORDER BY seq""",

    "proto_struct" -> """
      SELECT event_type AS etype, count(*) AS n,
             CAST(sum(user_id) AS BIGINT) AS sum_uid,
             CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
             CAST(sum(event_id % 7) AS BIGINT) AS sum_n7,
             CAST(sum(event_id % 3) AS BIGINT) AS sum_t3,
             CAST(sum(CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_null_extra,
             CAST(sum(CASE WHEN event_id % 5 = 0 THEN 0 ELSE user_id % 10 END) AS BIGINT) AS sum_x1
      FROM events WHERE event_id < 3000
      GROUP BY event_type ORDER BY etype""",

    "proto_struct_text" -> """
      SELECT event_id + 1 AS seq, event_type AS etype,
             '{"uid":' || CAST(user_id AS VARCHAR)
               || ',"q":"a\"b\\c"'
               || ',"ok":' || CASE WHEN event_id % 2 = 0 THEN 'true' ELSE 'false' END
               || ',"nested":{"n":' || CAST(event_id % 7 AS VARCHAR)
               || '},"tags":[null,' || CAST(event_id % 3 AS VARCHAR) || ']}'
               AS props_json
      FROM events WHERE event_id < 2000 ORDER BY seq""",

    "proto_any" -> """
      SELECT event_type AS etype, count(*) AS n,
             CAST(sum(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unresolved,
             CAST(sum(CASE WHEN event_id % 3 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_zone_ok,
             CAST(sum(CASE WHEN event_id % 3 = 0 THEN 0 ELSE user_id % 6 END) AS BIGINT) AS sum_rack
      FROM events WHERE event_id < 3000
      GROUP BY event_type ORDER BY etype""",

    "proto_extract_nested" -> """
      SELECT event_id + 1 AS seq,
             'u' || CAST(user_id AS VARCHAR) AS device_id,
             event_id AS ts,
             event_type AS position_zone,
             'r' || CAST(user_id % 3 AS VARCHAR) AS position_rack,
             round(value, 4) AS kw,
             round(value / 200.0, 6) AS pf,
             value > 100.0 AS online,
             'v2.1.' || CAST(user_id % 2 AS VARCHAR) AS firmware
      FROM events ORDER BY seq""",

    "proto_filter_agg" -> """
      SELECT event_type AS position_zone, count(*) AS n,
             round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_kw,
             max(event_id + 1) AS max_seq
      FROM events
      WHERE value > 100.0 AND value > 50.0
      GROUP BY event_type ORDER BY position_zone""",

    "proto_repeated" -> """
      SELECT event_id, event_type AS tag,
             3 AS n_ids,
             event_id + (event_id + 1) + (event_id * 2) AS sum_ids,
             round(value + value / 2.0, 6) AS sum_temps,
             event_type || ',x,u' || CAST(user_id AS VARCHAR) AS labels_joined,
             -event_id + 7 AS sum_deltas
      FROM events WHERE event_id < 2000 ORDER BY event_id""",

    "nats_avro_extract" -> """
      SELECT event_id + 1 AS seq,
             'd' || CAST(user_id AS VARCHAR) AS device,
             event_type AS kind,
             round(value * 0.25, 6) AS reading,
             event_id % 97 AS cnt,
             event_id % 2 = 0 AS ok,
             CAST(ts AS TIMESTAMP) AS observed,
             CASE WHEN event_id % 5 = 0 THEN NULL
                  ELSE 'n' || CAST(user_id AS VARCHAR) END AS note,
             event_type AS pos_zone,
             CAST(user_id % 6 AS INTEGER) AS pos_rack,
             CASE WHEN event_id % 3 = 0 THEN 'IDLE'
                  WHEN event_id % 3 = 1 THEN 'RUN'
                  ELSE 'HALT' END AS mode
      FROM events ORDER BY seq""",

    "proto_imported" -> """
      SELECT event_id,
             'L' || CAST(user_id % 4 AS VARCHAR) AS line,
             event_type AS sensor_kind,
             CAST(event_id % 16 AS INTEGER) AS sensor_channel,
             CASE WHEN event_id % 4 = 0 THEN 'OK'
                  WHEN event_id % 4 = 1 THEN 'DEGRADED'
                  WHEN event_id % 4 = 2 THEN 'OFFLINE'
                  ELSE 'STATUS_UNKNOWN' END AS sensor_status,
             CAST(ts AS TIMESTAMP) AS observed,
             event_id * 3 AS uptime_s
      FROM events WHERE event_id < 1000 ORDER BY event_id""",

    "proto_map_oneof" -> """
      SELECT event_id,
             'd' || CAST(user_id AS VARCHAR) AS device,
             event_id AS c_clicks,
             event_id % 7 AS c_errs,
             2 AS n_counters,
             event_type AS name_val,
             CASE WHEN event_id % 3 = 0 THEN event_type END AS o_text,
             CASE WHEN event_id % 3 = 1 THEN event_id * 11 END AS o_code,
             CASE WHEN event_id % 3 = 2 THEN 'kw' END AS o_unit,
             CASE WHEN event_id % 3 = 2 THEN user_id END AS o_scale,
             value AS reading
      FROM events WHERE event_id < 1000 ORDER BY event_id""",

    "proto_all_types" -> """
      SELECT event_id,
             's' || CAST(event_id AS VARCHAR) AS f_string,
             CAST(event_id * 3 - 1000 AS INTEGER) AS f_int32,
             event_id * 1000000 - 123 AS f_int64,
             event_id + 7 AS f_uint32,
             CAST(CAST(event_id AS DECIMAL(20,0)) AS VARCHAR) AS f_uint64,
             CAST(-event_id - 1 AS INTEGER) AS f_sint32,
             event_id * -999 AS f_sint64,
             event_id + 13 AS f_fixed32,
             CAST(CAST(event_id + 17 AS DECIMAL(20,0)) AS VARCHAR) AS f_fixed64,
             CAST(event_id - 500 AS INTEGER) AS f_sfixed32,
             event_id * -31 AS f_sfixed64,
             CAST(CAST(value AS REAL) AS DOUBLE) AS f_float,
             value * 1.5 AS f_double,
             event_id % 2 = 0 AS f_bool,
             CASE WHEN event_id % 3 = 0 THEN 'IDLE'
                  WHEN event_id % 3 = 1 THEN 'RUN'
                  ELSE 'HALT' END AS f_mode,
             CAST(length(event_type) AS INTEGER) AS bytes_len
      FROM events WHERE event_id < 500 ORDER BY event_id"""
  )
}
