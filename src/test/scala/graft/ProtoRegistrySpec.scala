package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.nats.{NatsScan, NatsScanOptions}
import graft.proto.{ProtoRegistry, ProtoSchema}
import graft.queries.ProtoQueries.RegistryProtoFixture

/** Confluent-framed protobuf registry decode: header grammar, version
  * bridging, and the loud-vs-NULL failure split (configuration errors loud,
  * data errors NULL — the same policy boundary the Avro registry path pins).
  */
class ProtoRegistrySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    // the TVF test drives the SQL face; extensions must ride the session
    // this spec creates (getOrCreate reuses an active session and ignores
    // late extension configs)
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val readerDef =
    ProtoSchema.parseFile("/root/repo/proto/registry_reading.proto", "Reading")

  private def decodeBytes(payloads: Seq[Array[Byte]]): Seq[Row] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(payloads.map(Row(_)), 1),
      StructType(Seq(StructField("payload", BinaryType))))
    df.select(ProtoRegistry.decodeRegistry(col("payload"), readerDef,
      RegistryProtoFixture.ResolverName).as("d"))
      .select(col("d.device"), col("d.reading"), col("d.cnt"), col("d.note"),
        col("d").isNull.as("corrupt"))
      .collect().toSeq
  }

  private def v1Payload(device: String, reading: Double, cnt: Long): Array[Byte] = {
    val v1Def = ProtoSchema.parse(RegistryProtoFixture.V1Src, "Reading")
    val df = spark.range(1).select(
      ProtoRegistry.encodeRegistry(
        struct(lit(device).as("device"), lit(reading).as("reading"),
          lit(cnt).as("cnt")),
        v1Def, RegistryProtoFixture.V1Id).as("p"))
    df.collect()(0).getAs[Array[Byte]](0)
  }

  private def v2Payload(device: String, note: String): Array[Byte] = {
    val v2Def = ProtoSchema.parse(RegistryProtoFixture.V2Src, "Reading")
    val df = spark.range(1).select(
      ProtoRegistry.encodeRegistry(
        struct(lit(device).as("device"), lit(1.5).as("reading"),
          lit(7L).as("cnt"), lit(note).as("note"), lit(99L).as("extra")),
        v2Def, RegistryProtoFixture.V2Id, Seq(1, 0)).as("p"))
    df.collect()(0).getAs[Array[Byte]](0)
  }

  test("header: indexes [0] collapses to the single-0 optimized form") {
    val h = ProtoRegistry.header(3, Seq(0))
    assert(h.toSeq == Seq[Byte](0, 0, 0, 0, 3, 0))
  }

  test("header: indexes [1,0] zigzag-varint encoded (count 2 → 4, 1 → 2, 0 → 0)") {
    val h = ProtoRegistry.header(9, Seq(1, 0))
    assert(h.toSeq == Seq[Byte](0, 0, 0, 0, 9, 4, 2, 0))
  }

  test("v1 payload decodes reader-shaped with note defaulted to '' (proto3)") {
    RegistryProtoFixture.registerResolver()
    val rows = decodeBytes(Seq(v1Payload("d1", 2.25, 42L)))
    assert(rows.head.getString(0) == "d1")
    assert(rows.head.getDouble(1) == 2.25)
    assert(rows.head.getLong(2) == 42L)
    assert(rows.head.getString(3) == "") // absent scalar → proto3 default
  }

  test("v2 payload navigates indexes [1,0], bridges note, skips unknown extra") {
    RegistryProtoFixture.registerResolver()
    val rows = decodeBytes(Seq(v2Payload("d2", "hello")))
    assert(rows.head.getString(0) == "d2")
    assert(rows.head.getString(3) == "hello")
  }

  test("mis-framed payloads are DATA → NULL row (no magic, truncated, garbage indexes)") {
    RegistryProtoFixture.registerResolver()
    val good = v1Payload("d1", 1.0, 1L)
    val noMagic = good.clone(); noMagic(0) = 0x17
    val truncated = good.take(4)
    // count varint says 3 indexes but the frame ends — varint read overruns
    val badIndexes = Array[Byte](0, 0, 0, 0, 3, 6)
    val rows = decodeBytes(Seq(noMagic, truncated, badIndexes))
    assert(rows.forall(_.getBoolean(4)), s"expected all NULL, got $rows")
  }

  test("message index out of range / foreign message name are DATA → NULL") {
    RegistryProtoFixture.registerResolver()
    val body = v1Payload("d1", 1.0, 1L).drop(6) // strip v1 header
    // v2 schema, indexes [0] → Heartbeat: resolvable but not our message
    val foreign = ProtoRegistry.header(RegistryProtoFixture.V2Id, Seq(0)) ++ body
    // v2 schema, indexes [5] → out of range
    val oob = ProtoRegistry.header(RegistryProtoFixture.V2Id, Seq(5)) ++ body
    val rows = decodeBytes(Seq(foreign, oob))
    assert(rows.forall(_.getBoolean(4)), s"expected all NULL, got $rows")
  }

  test("unknown schema id is CONFIGURATION → loud error") {
    RegistryProtoFixture.registerResolver()
    val body = v1Payload("d1", 1.0, 1L).drop(6)
    val unknownId = ProtoRegistry.header(12345, Seq(0)) ++ body
    val e = intercept[Exception] { decodeBytes(Seq(unknownId)) }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("unknown schema id 12345"), s"got: $msg")
  }

  test("unregistered resolver name is CONFIGURATION → loud error") {
    ProtoRegistry.clear()
    val body = v1Payload("d1", 1.0, 1L)
    try {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(body)), 1),
        StructType(Seq(StructField("payload", BinaryType))))
      val e = intercept[Exception] {
        df.select(ProtoRegistry.decodeRegistry(col("payload"), readerDef,
          "no-such-resolver")).collect()
      }
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("no schema resolver registered"), s"got: $msg")
    } finally RegistryProtoFixture.registerResolver()
  }

  test("writer whose shared field number changes wire encoding is loud") {
    // field 2 is double (fixed64) in the reader but sint64 (zigzag varint)
    // in this writer — decoding would silently produce garbage, so the
    // compat check must refuse
    ProtoRegistry.register("proto-compat-test", {
      case 11 => Some(
        """syntax = "proto3";
          |message Reading {
          |  string device = 1;
          |  sint64 reading = 2;
          |}""".stripMargin)
      case _ => None
    })
    val incompatDef = ProtoSchema.parse(
      """syntax = "proto3";
        |message Reading {
        |  string device = 1;
        |  sint64 reading = 2;
        |}""".stripMargin, "Reading")
    val p = spark.range(1).select(
      ProtoRegistry.encodeRegistry(
        struct(lit("d").as("device"), lit(5L).as("reading")),
        incompatDef, 11).as("p")).collect()(0).getAs[Array[Byte]](0)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(p)), 1),
      StructType(Seq(StructField("payload", BinaryType))))
    val e = intercept[Exception] {
      df.select(ProtoRegistry.decodeRegistry(col("payload"), readerDef,
        "proto-compat-test")).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("disagree about the wire format"), s"got: $msg")
  }

  test("writer whose NESTED field number changes wire encoding is loud too") {
    // both sides' top-level field 2 is a message (LenDelim = LenDelim), so
    // a top-level-only check passes — but the nested field 1 is double
    // (fixed64) in the reader and sint64 (zigzag) in the writer: decoding
    // would silently produce garbage. The round-13 recursive check must
    // refuse (ADVICE round 12).
    val nestedReader = ProtoSchema.parse(
      """syntax = "proto3";
        |message Reading {
        |  string device = 1;
        |  message Inner { double v = 1; }
        |  Inner inner = 2;
        |}""".stripMargin, "Reading")
    val nestedWriterSrc =
      """syntax = "proto3";
        |message Reading {
        |  string device = 1;
        |  message Inner { sint64 v = 1; }
        |  Inner inner = 2;
        |}""".stripMargin
    ProtoRegistry.register("proto-nested-compat-test", {
      case 21 => Some(nestedWriterSrc)
      case _ => None
    })
    val writerDef = ProtoSchema.parse(nestedWriterSrc, "Reading")
    val p = spark.range(1).select(
      ProtoRegistry.encodeRegistry(
        struct(lit("d").as("device"),
          struct(lit(5L).as("v")).as("inner")),
        writerDef, 21).as("p")).collect()(0).getAs[Array[Byte]](0)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(p)), 1),
      StructType(Seq(StructField("payload", BinaryType))))
    val e = intercept[Exception] {
      df.select(ProtoRegistry.decodeRegistry(col("payload"), nestedReader,
        "proto-nested-compat-test")).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("disagree about the wire format") &&
      msg.contains("inner.v"), s"got: $msg")
  }

  test("nested-COMPATIBLE writer still decodes (recursion has no false positives)") {
    // same nested shape, writer merely renames the nested field — numbers
    // and encodings agree at every depth, so the recursive check passes and
    // the payload decodes reader-shaped. (True message-type recursion can't
    // reach the compat check: ProtoSchema.parse rejects recursive messages
    // at bind time; the visited set is a depth guard, not a product path.)
    val nestedReader = ProtoSchema.parse(
      """syntax = "proto3";
        |message Reading {
        |  string device = 1;
        |  message Inner { double v = 1; }
        |  Inner inner = 2;
        |}""".stripMargin, "Reading")
    val compatWriterSrc =
      """syntax = "proto3";
        |message Reading {
        |  string device = 1;
        |  message Inner { double volts = 1; }
        |  Inner inner = 2;
        |}""".stripMargin
    ProtoRegistry.register("proto-nested-ok-test", {
      case 31 => Some(compatWriterSrc)
      case _ => None
    })
    val writerDef = ProtoSchema.parse(compatWriterSrc, "Reading")
    val p = spark.range(1).select(
      ProtoRegistry.encodeRegistry(
        struct(lit("d9").as("device"),
          struct(lit(2.5).as("volts")).as("inner")),
        writerDef, 31).as("p")).collect()(0).getAs[Array[Byte]](0)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(p)), 1),
      StructType(Seq(StructField("payload", BinaryType))))
    val rows = df.select(ProtoRegistry.decodeRegistry(col("payload"),
      nestedReader, "proto-nested-ok-test").as("d"))
      .select(col("d.device"), col("d.inner.v")).collect()
    assert(rows.head.getString(0) == "d9")
    assert(rows.head.getDouble(1) == 2.5)
  }

  test("byte fuzz: 20k random/mutated frames decode to a row or NULL — " +
    "never an uncaught parser exception (resolver answers every id)") {
    // with every id resolvable and wire-compatible, the ONLY acceptable
    // outcomes are a decoded row or the NULL data verdict; any exception
    // is a parser hole (the loud paths — unknown id, wire conflict — are
    // configuration states this resolver can't produce)
    ProtoRegistry.register("proto-fuzz-all", _ => Some(RegistryProtoFixture.V1Src))
    val expr = graft.proto.ProtoRegistryDecodeExpression(
      org.apache.spark.sql.catalyst.expressions.Literal(
        Array.emptyByteArray, BinaryType),
      readerDef, "proto-fuzz-all")
    val rnd = new scala.util.Random(0xBEEF)
    val validBody = {
      val v1Def = ProtoSchema.parse(RegistryProtoFixture.V1Src, "Reading")
      graft.proto.ProtoWire.encodeMessage(
        org.apache.spark.sql.catalyst.InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString("d1"), 1.5, 7L),
        v1Def)
    }
    var decoded = 0
    var nulled = 0
    (1 to 20000).foreach { i =>
      val frame: Array[Byte] = rnd.nextInt(4) match {
        case 0 => // pure noise
          Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
        case 1 => // valid header (random id), random tail
          ProtoRegistry.header(rnd.nextInt(1000), Seq(0)) ++
            Array.fill(rnd.nextInt(48))(rnd.nextInt(256).toByte)
        case 2 => // valid frame with one random byte flipped
          val f = ProtoRegistry.header(3, Seq(0)) ++ validBody
          val at = rnd.nextInt(f.length)
          f(at) = (f(at) ^ (1 << rnd.nextInt(8))).toByte
          f
        case _ => // valid header + random index list + valid body
          val hdr = ProtoRegistry.header(3,
            Seq.fill(rnd.nextInt(4))(rnd.nextInt(8) - 2))
          hdr ++ validBody
      }
      val out = try expr.decodeRow(frame)
      catch { case e: Throwable =>
        fail(s"trial $i: ${e.getClass.getName}: ${e.getMessage} | " +
          s"frame=${frame.take(40).map(b => f"$b%02x").mkString}")
      }
      if (out == null) nulled += 1 else decoded += 1
    }
    // both verdicts must actually occur — a fuzzer that only ever NULLs
    // (or only ever decodes) isn't exercising the boundary
    assert(decoded > 0 && nulled > 0, s"decoded=$decoded nulled=$nulled")
  }

  test("proto_registry without proto reader schema → bind-time option error") {
    val e = intercept[IllegalArgumentException] {
      NatsScanOptions(protoRegistry = Some("x")).validate()
    }
    assert(e.getMessage.contains("proto_registry requires"))
  }

  test("proto_registry through the SQL TVF: registry-framed payloads in a " +
    "native store decode via the same option surface") {
    RegistryProtoFixture.registerResolver()
    val ext = spark
    val out = java.nio.file.Files
      .createTempDirectory("graft_proto_reg_tvf").toString
    val v1Def = ProtoSchema.parse(RegistryProtoFixture.V1Src, "Reading")
    ext.range(1, 21).select(
      lit("events").as("stream"),
      concat(lit("events.click."), col("id")).as("subject"),
      col("id").as("seq"),
      timestamp_micros(col("id") * 1000000L).as("ts_nats"),
      ProtoRegistry.encodeRegistry(
        struct(concat(lit("d"), col("id")).as("device"),
          (col("id") * 0.5).as("reading"), col("id").as("cnt")),
        v1Def, RegistryProtoFixture.V1Id).as("payload"))
      .write.format("nats_scan").option("dir", out)
      .mode("overwrite").save()
    val rows = ext.sql(
      s"""SELECT seq, device, reading, cnt, note
         |FROM nats_scan('events', 'dir', '$out',
         |  proto_file => '/root/repo/proto/registry_reading.proto',
         |  proto_message => 'Reading',
         |  proto_extract => array('device', 'reading', 'cnt', 'note'),
         |  proto_registry => '${RegistryProtoFixture.ResolverName}')
         |ORDER BY seq""".stripMargin).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val seq = r.getLong(0)
      assert(r.getString(1) == s"d$seq")
      assert(r.getDouble(2) == seq * 0.5)
      assert(r.getLong(3) == seq)
      assert(r.getString(4) == "") // v1 lacks note → proto3 default
    }
  }

  test("scan facade end-to-end: mixed-version stream decodes version-blind") {
    RegistryProtoFixture.registerResolver()
    val dir = "/root/testdata/sf0.001"
    val df = NatsScan.scan(spark, "events",
      NatsScanOptions(
        protoFile = Some("/root/repo/proto/registry_reading.proto"),
        protoMessage = Some("Reading"),
        protoExtract = Seq("device", "reading", "cnt", "note"),
        protoRegistry = Some(RegistryProtoFixture.ResolverName)),
      new graft.queries.ProtoQueries.RegistryProtoStore(dir))
    val rows = df.select("seq", "device", "note").orderBy("seq").limit(4).collect()
    assert(rows.length == 4)
    // seq = event_id + 1: odd seq = v1 (note ''), even seq = v2 (note n<uid>)
    rows.foreach { r =>
      val note = r.getString(2)
      if ((r.getLong(0) - 1) % 2 == 0) assert(note == "")
      else assert(note.startsWith("n"))
    }
  }
}
