package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.nats.{NatsScan, NatsScanOptions}
import graft.queries.ProtoQueries

/** Negative paths mirroring the reference's error suites
  * (test/sql/test_protobuf_errors.sql:14-101 — 8 cases — and the
  * parameter-conflict cases in test_connection_errors.sql:188-199). */
class NatsScanErrorSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def store = new graft.nats.ParquetMessageStore(dir)

  override def afterAll(): Unit = spark.stop()

  test("nonexistent proto file → bind-time error") {
    val e = intercept[Exception] {
      NatsScan.scan(spark, "events", NatsScanOptions(
        protoFile = Some("/nope/missing.proto"),
        protoMessage = Some("M"), protoExtract = Seq("a")), store)
    }
    assert(e.isInstanceOf[java.nio.file.NoSuchFileException] ||
      e.getMessage.contains("missing.proto"))
  }

  test("invalid message name → 'not found in proto file'") {
    val e = intercept[IllegalArgumentException] {
      NatsScan.scan(spark, "events", NatsScanOptions(
        protoFile = Some(ProtoQueries.deviceProtoPath),
        protoMessage = Some("NoSuchMessage"), protoExtract = Seq("a")), store)
    }
    assert(e.getMessage.contains("NoSuchMessage"))
    assert(e.getMessage.contains("not found"))
  }

  test("invalid field path → bind-time validation error naming the field") {
    val e = intercept[IllegalArgumentException] {
      NatsScan.scan(spark, "events", NatsScanOptions(
        protoFile = Some(ProtoQueries.deviceProtoPath),
        protoMessage = Some("DeviceEvent"),
        protoExtract = Seq("position.nope")), store)
    }
    assert(e.getMessage.contains("nope"))
  }

  test("scalar field used as message in path → 'is not a message type'") {
    val e = intercept[IllegalArgumentException] {
      NatsScan.scan(spark, "events", NatsScanOptions(
        protoFile = Some(ProtoQueries.deviceProtoPath),
        protoMessage = Some("DeviceEvent"),
        protoExtract = Seq("device_id.zone")), store)
    }
    assert(e.getMessage.contains("not a message type"))
  }

  test("import of a missing file → reference-style bind error naming both files") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_proto_err")
    val main = tmp.resolve("main.proto")
    java.nio.file.Files.write(main,
      "syntax = \"proto3\";\nimport \"gone.proto\";\nmessage M { Inner a = 1; }\n"
        .getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      graft.proto.ProtoSchema.parseFile(main.toString, "M")
    }
    assert(e.getMessage.contains("Failed to import protobuf schema file"), e.getMessage)
    assert(e.getMessage.contains("gone.proto: File not found."), e.getMessage)
  }

  test("import cycle → bind error naming the cycle, no infinite loop") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_proto_cycle")
    java.nio.file.Files.write(tmp.resolve("a.proto"),
      "syntax = \"proto3\";\nimport \"b.proto\";\nmessage A { int32 x = 1; }\n"
        .getBytes("UTF-8"))
    java.nio.file.Files.write(tmp.resolve("b.proto"),
      "syntax = \"proto3\";\nimport \"a.proto\";\nmessage B { int32 y = 1; }\n"
        .getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      graft.proto.ProtoSchema.parseFile(tmp.resolve("a.proto").toString, "A")
    }
    assert(e.getMessage.contains("import cycle"), e.getMessage)
  }

  test("diamond import parses once; imported types resolve") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_proto_diamond")
    java.nio.file.Files.write(tmp.resolve("base.proto"),
      "syntax = \"proto3\";\nmessage Leaf { string v = 1; }\n".getBytes("UTF-8"))
    java.nio.file.Files.write(tmp.resolve("l.proto"),
      "syntax = \"proto3\";\nimport \"base.proto\";\nmessage L { Leaf lv = 1; }\n"
        .getBytes("UTF-8"))
    java.nio.file.Files.write(tmp.resolve("r.proto"),
      "syntax = \"proto3\";\nimport \"base.proto\";\nmessage R { Leaf rv = 1; }\n"
        .getBytes("UTF-8"))
    java.nio.file.Files.write(tmp.resolve("top.proto"),
      ("syntax = \"proto3\";\nimport \"l.proto\";\nimport \"r.proto\";\n" +
        "message Top { L left = 1; R right = 2; }\n").getBytes("UTF-8"))
    val md = graft.proto.ProtoSchema.parseFile(tmp.resolve("top.proto").toString, "Top")
    assert(md.resolve("left.lv.v").name == "v")
    assert(md.resolve("right.rv.v").name == "v")
  }

  test("inline proto source with an import → hard error, never a silent skip") {
    val e = intercept[IllegalArgumentException] {
      graft.proto.ProtoSchema.parse(
        "syntax = \"proto3\";\nimport \"x.proto\";\nmessage M { int32 a = 1; }",
        "M")
    }
    assert(e.getMessage.contains("import"), e.getMessage)
  }

  test("unsupported well-known-type import → named bind error") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_proto_wkt")
    val main = tmp.resolve("main.proto")
    // field_mask.proto stays unsupported (timestamp/duration/wrappers/
    // struct/any are the supported WKT set as of round 8)
    java.nio.file.Files.write(main,
      ("syntax = \"proto3\";\nimport \"google/protobuf/field_mask.proto\";\n" +
        "message M { int32 a = 1; }\n").getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      graft.proto.ProtoSchema.parseFile(main.toString, "M")
    }
    assert(e.getMessage.contains("field_mask.proto"), e.getMessage)
  }

  test("avro: missing schema file / bad path / option conflicts → bind errors") {
    val e1 = intercept[IllegalArgumentException] {
      NatsScan.scan(spark, "events", NatsScanOptions(
        avroFile = Some("/nope/missing.avsc"), avroExtract = Seq("a")), store)
    }
    assert(e1.getMessage.contains("missing.avsc"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      NatsScan.scan(spark, "events", NatsScanOptions(
        avroFile = Some(ProtoQueries.sensorAvscPath),
        avroExtract = Seq("pos.nope")), store)
    }
    assert(e2.getMessage.contains("nope"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      NatsScanOptions(avroFile = Some(ProtoQueries.sensorAvscPath),
        avroExtract = Seq("device"), jsonExtract = Seq("k")).validate()
    }
    assert(e3.getMessage.contains("avro_extract"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      NatsScanOptions(avroFile = Some(ProtoQueries.sensorAvscPath)).validate()
    }
    assert(e4.getMessage.contains("avro_file and avro_extract"), e4.getMessage)
  }

  test("avro: corrupt payloads decode to NULL struct, never crash the scan") {
    import org.apache.spark.sql.functions._
    val json = graft.avro.AvroDecode.schemaFromFile(ProtoQueries.sensorAvscPath)
    val df = spark.range(3).select(
      when(col("id") === 0, lit(Array[Byte](1, 2, 3)))
        .otherwise(lit(null).cast("binary")).as("payload"))
    val out = df.select(
      graft.avro.AvroDecode.decode(col("payload"), json).as("d")).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("avro registry: unknown schema id is a LOUD error; framing faults are NULL data") {
    import org.apache.spark.sql.functions._
    val readerJson = graft.avro.AvroDecode.schemaFromFile(
      ProtoQueries.registryAvscPath)
    ProtoQueries.RegistryAvroFixture.registerResolver()
    // a registry-framed payload with an id the resolver cannot answer:
    // CONFIGURATION error, loud — silently nulling a whole schema
    // generation would be data loss
    val unknownId = Array[Byte](0x00, 0x00, 0x00, 0x00, 99, 0x02)
    val e = intercept[Exception] {
      spark.range(1).select(lit(unknownId).as("payload"))
        .select(graft.avro.AvroDecode.decodeRegistry(
          col("payload"), readerJson,
          ProtoQueries.RegistryAvroFixture.ResolverName).as("d"))
        .collect()
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(e).contains("unknown schema id 99"), chain(e))
    // unregistered resolver NAME → loud too
    val e2 = intercept[Exception] {
      spark.range(1).select(lit(unknownId).as("payload"))
        .select(graft.avro.AvroDecode.decodeRegistry(
          col("payload"), readerJson, "no-such-resolver").as("d"))
        .collect()
    }
    assert(chain(e2).contains("no schema resolver registered"), chain(e2))
    // mis-framed payloads (wrong magic / truncated) and corrupt bodies are
    // DATA → NULL rows, same policy as the other decode paths
    val bad = Seq(
      Array[Byte](1, 0, 0, 0, 1, 0x02),                    // wrong magic
      Array[Byte](0x00, 0x00),                             // truncated header
      Array[Byte](0x00, 0x00, 0x00, 0x00, 1, -1, -1, -1))  // corrupt body (id 1)
    bad.foreach { payload =>
      val out = spark.range(1).select(lit(payload).as("payload"))
        .select(graft.avro.AvroDecode.decodeRegistry(
          col("payload"), readerJson,
          ProtoQueries.RegistryAvroFixture.ResolverName).as("d"))
        .collect()
      assert(out.forall(_.isNullAt(0)), s"expected NULL for ${payload.toSeq}")
    }
    // bind-time option validation: avro_registry needs the avro surface
    val e3 = intercept[IllegalArgumentException](
      NatsScanOptions(avroRegistry = Some("r")).validate())
    assert(e3.getMessage.contains("avro_registry requires"))
  }

  test("unknown stream name is rejected by the store") {
    val e = intercept[IllegalArgumentException] {
      NatsScan.scan(spark, "telemetry", NatsScanOptions(), store)
    }
    assert(e.getMessage.contains("telemetry"))
  }

  test("corrupt payloads decode to NULL struct, never crash the scan") {
    import org.apache.spark.sql.functions._
    val schema = graft.proto.ProtoSchema.parseFile(
      ProtoQueries.deviceProtoPath, "DeviceEvent")
    val df = spark.range(3).select(
      lit(Array[Byte](0x08, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1)).as("payload"))
    val decoded = df.select(
      graft.proto.ProtoDecode.decode(col("payload"), schema).as("d"))
    assert(decoded.collect().forall(_.isNullAt(0)))
  }
}
