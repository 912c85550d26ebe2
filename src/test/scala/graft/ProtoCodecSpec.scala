package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.proto._

class ProtoCodecSpec extends AnyFunSuite {

  /** deterministic property loop (scalatestplus bridge not on offline
    * classpath; plain scalacheck Gen + fixed seeds is equivalent here) */
  private def forAll[A](gen: Gen[A], n: Int = 100)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private val allTypes =
    ProtoSchema.parseFile("/root/repo/proto/all_types.proto", "AllTypes")
  private val deviceEvent =
    ProtoSchema.parseFile("/root/repo/proto/device_event.proto", "DeviceEvent")

  test("parser: all 17 scalar types map to the §1.3 Spark types") {
    val s = allTypes.sparkSchema
    assert(s("f_string").dataType == StringType)
    assert(s("f_bytes").dataType == BinaryType)
    assert(s("f_int32").dataType == IntegerType)
    assert(s("f_int64").dataType == LongType)
    assert(s("f_uint32").dataType == LongType)
    assert(s("f_uint64").dataType == DecimalType(20, 0))
    assert(s("f_sint32").dataType == IntegerType)
    assert(s("f_sint64").dataType == LongType)
    assert(s("f_fixed32").dataType == LongType)
    assert(s("f_fixed64").dataType == DecimalType(20, 0))
    assert(s("f_sfixed32").dataType == IntegerType)
    assert(s("f_sfixed64").dataType == LongType)
    assert(s("f_float").dataType == FloatType)
    assert(s("f_double").dataType == DoubleType)
    assert(s("f_bool").dataType == BooleanType)
    assert(s("f_mode").dataType == StringType) // enum → name
  }

  test("parser: nested message navigation + bad-path errors") {
    assert(deviceEvent.resolve("position.zone").ptype == PType.PString)
    assert(deviceEvent.resolve("reading.kw").ptype == PType.PDouble)
    val e1 = intercept[IllegalArgumentException](deviceEvent.resolve("position.nope"))
    assert(e1.getMessage.contains("not found in message"))
    val e2 = intercept[IllegalArgumentException](deviceEvent.resolve("device_id.zone"))
    assert(e2.getMessage.contains("is not a message type"))
  }

  private def rt(md: MessageDef, row: InternalRow): InternalRow =
    ProtoWire.decodeMessage(ProtoWire.encodeMessage(row, md), md)

  test("roundtrip: property over all scalar types") {
    val gen = for {
      s <- Gen.alphaNumStr
      i32 <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
      i64 <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      u32 <- Gen.chooseNum(0L, 0xFFFFFFFFL)
      si32 <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
      si64 <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      f <- Gen.chooseNum(-1e30f, 1e30f)
      d <- Gen.chooseNum(-1e200, 1e200)
      b <- Gen.oneOf(true, false)
      mode <- Gen.oneOf("IDLE", "RUN", "HALT")
    } yield InternalRow(
      UTF8String.fromString(s), Array[Byte](1, 2, 3), i32, i64, u32,
      Decimal(BigDecimal(u32), 20, 0), si32, si64, u32,
      Decimal(BigDecimal(i64).abs, 20, 0), i32, i64, f, d, b,
      UTF8String.fromString(mode))
    forAll(gen) { row =>
      val back = rt(allTypes, row)
      (0 until 16).foreach { i =>
        val a = row.get(i, allTypes.sparkSchema(i).dataType)
        val b = back.get(i, allTypes.sparkSchema(i).dataType)
        (a, b) match {
          case (x: Array[Byte], y: Array[Byte]) => assert(x.sameElements(y))
          case _ => assert(a == b, s"field $i: $a != $b")
        }
      }
    }
  }

  private val factory =
    ProtoSchema.parseFile("/root/repo/proto/factory_event.proto", "FactoryEvent")

  test("imports: cross-file message/enum resolve; WKT fields map to Spark leaves") {
    val s = factory.sparkSchema
    assert(s("sensor").dataType.isInstanceOf[StructType]) // from common_types
    assert(factory.resolve("sensor.status").ptype.isInstanceOf[PType.PEnum])
    assert(s("observed").dataType == TimestampType)
    assert(s("uptime").dataType == DayTimeIntervalType())
  }

  test("WKT roundtrip: timestamps (incl. pre-epoch) and signed durations") {
    val gen = for {
      // ±~30000 years in µs — covers pre-epoch floor-split and sign handling
      tsUs <- Gen.chooseNum(-1000000000000000L, 1000000000000000L)
      durUs <- Gen.chooseNum(-1000000000000000L, 1000000000000000L)
    } yield (tsUs, durUs)
    forAll(gen) { case (tsUs, durUs) =>
      val row = InternalRow(UTF8String.fromString("L1"), null, tsUs, durUs)
      val back = rt(factory, row)
      assert(back.getLong(2) == tsUs, s"timestamp $tsUs")
      assert(back.getLong(3) == durUs, s"duration $durUs")
      assert(back.isNullAt(1)) // unset imported message stays NULL
    }
  }

  test("WKT presence: unset Timestamp/Duration decode to NULL, epoch zero survives") {
    val empty = ProtoWire.decodeMessage(Array.emptyByteArray, factory)
    assert(empty.isNullAt(2) && empty.isNullAt(3))
    // present-but-epoch: zero micros encodes as an empty message, not absence
    val row = InternalRow(UTF8String.fromString(""), null, 0L, 0L)
    val back = rt(factory, row)
    assert(!back.isNullAt(2) && back.getLong(2) == 0L)
    assert(!back.isNullAt(3) && back.getLong(3) == 0L)
  }

  test("wrapper WKTs: nullable scalars — unset → NULL, defaults survive, roundtrip") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_proto_wrap")
    val main = tmp.resolve("wrap.proto")
    java.nio.file.Files.write(main,
      ("""syntax = "proto3";
         |import "google/protobuf/wrappers.proto";
         |message W {
         |  google.protobuf.Int32Value a = 1;
         |  google.protobuf.StringValue b = 2;
         |  google.protobuf.DoubleValue c = 3;
         |  google.protobuf.BoolValue d = 4;
         |  google.protobuf.UInt64Value e = 5;
         |}
         |""".stripMargin).getBytes("UTF-8"))
    val md = ProtoSchema.parseFile(main.toString, "W")
    val s = md.sparkSchema
    assert(s("a").dataType == IntegerType)
    assert(s("b").dataType == StringType)
    assert(s("c").dataType == DoubleType)
    assert(s("d").dataType == BooleanType)
    assert(s("e").dataType == DecimalType(20, 0))
    // unset wrappers → NULL, not zero — the distinction wrappers exist for
    val empty = ProtoWire.decodeMessage(Array.emptyByteArray, md)
    (0 until 5).foreach(i => assert(empty.isNullAt(i), s"slot $i"))
    // roundtrip incl. explicit defaults (0 / "" / false): a present wrapper
    // holding the default value must stay present
    val row = InternalRow(0, UTF8String.fromString(""), 2.5, false,
      Decimal(BigDecimal(123456789L), 20, 0))
    val back = rt(md, row)
    assert(!back.isNullAt(0) && back.getInt(0) == 0)
    assert(!back.isNullAt(1) && back.getUTF8String(1).toString == "")
    assert(back.getDouble(2) == 2.5)
    assert(!back.isNullAt(3) && !back.getBoolean(3))
    assert(back.getDecimal(4, 20, 0).toLong == 123456789L)
    // mixed present/absent
    val back2 = rt(md, InternalRow(7, null, null, true, null))
    assert(back2.getInt(0) == 7 && back2.isNullAt(1) && back2.isNullAt(2))
    assert(back2.getBoolean(3) && back2.isNullAt(4))
  }

  test("proto3 defaults: empty message decodes to zero values, null submessage") {
    val empty = ProtoWire.decodeMessage(Array.emptyByteArray, deviceEvent)
    assert(empty.getUTF8String(0).toString == "")     // device_id
    assert(empty.getLong(1) == 0L)                     // ts
    assert(empty.isNullAt(2))                          // position (message)
    assert(empty.isNullAt(3))                          // reading (message)
    assert(!empty.getBoolean(4))                       // online
  }

  test("unknown fields on the wire are skipped") {
    // encode AllTypes, decode as DeviceEvent-shaped subset: field numbers
    // 1 (string) and 2 (bytes→skipped len-delim as 'ts'? no: wire type
    // mismatch would corrupt). Use a schema with only field 1.
    val sub = MessageDef("OnlyString",
      Seq(FieldDef("f_string", 1, PType.PString, Enc.LenDelim)))
    val full = InternalRow(
      UTF8String.fromString("hello"), Array[Byte](9), 42, 42L, 42L,
      Decimal(BigDecimal(42), 20, 0), -42, -42L, 7L,
      Decimal(BigDecimal(7), 20, 0), 1, 2L, 1.5f, 2.5, true,
      UTF8String.fromString("RUN"))
    val bytes = ProtoWire.encodeMessage(full, allTypes)
    val decoded = ProtoWire.decodeMessage(bytes, sub)
    assert(decoded.getUTF8String(0).toString == "hello")
  }

  test("decode expression: unparseable payload → null (reference :823-829)") {
    val expr = ProtoDecodeExpression(
      Literal(Array[Byte](0x08, -1), BinaryType), deviceEvent) // truncated varint
    assert(expr.eval(InternalRow.empty) == null)
  }

  test("repeated fields: ArrayType schema, empty-message → empty arrays") {
    val batch = ProtoSchema.parseFile("/root/repo/proto/batch.proto", "Batch")
    val s = batch.sparkSchema
    assert(s("ids").dataType == ArrayType(LongType, containsNull = false))
    assert(s("labels").dataType == ArrayType(StringType, containsNull = false))
    val empty = ProtoWire.decodeMessage(Array.emptyByteArray, batch)
    assert(empty.getArray(1).numElements() == 0)   // ids: [] not null
    assert(empty.getArray(3).numElements() == 0)   // labels
    // element path through a repeated field is rejected at bind time
    val e = intercept[IllegalArgumentException](
      MessageDef("M", Seq(FieldDef("b", 1, PType.PMessage(batch), Enc.LenDelim,
        repeated = true))).resolve("b.tag"))
    assert(e.getMessage.contains("repeated"))
  }

  test("nested submessage roundtrip") {
    val row = InternalRow(
      UTF8String.fromString("dev1"), 123456789L,
      InternalRow(UTF8String.fromString("z1"), UTF8String.fromString("r2"),
        UTF8String.fromString("b3")),
      InternalRow(70.5, 0.93, 480.1),
      true, UTF8String.fromString("v2.2.0"))
    val back = rt(deviceEvent, row)
    assert(back.getStruct(2, 3).getUTF8String(1).toString == "r2")
    assert(back.getStruct(3, 3).getDouble(0) == 70.5)
    assert(back.getBoolean(4))
  }

  // --- map<K,V> + oneof (beyond-reference proto3 surface) ---

  private val telemetry =
    ProtoSchema.parseFile("/root/repo/proto/map_oneof.proto", "Telemetry")

  // field slots: device(0) counters(1) names(2) text(3) code(4) attr(5) reading(6)
  private def mkMap(kv: (Any, Any)*) =
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(kv.map(_._1).toArray),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(kv.map(_._2).toArray))

  test("parser: map → MapType, oneof members presence-grouped") {
    val s = telemetry.sparkSchema
    assert(s("counters").dataType ==
      MapType(StringType, LongType, valueContainsNull = false))
    assert(s("names").dataType ==
      MapType(IntegerType, StringType, valueContainsNull = false))
    assert(s("attr").dataType.isInstanceOf[StructType])
    val ti = telemetry.fields.indexWhere(_.name == "text")
    val ci = telemetry.fields.indexWhere(_.name == "code")
    val ai = telemetry.fields.indexWhere(_.name == "attr")
    assert(telemetry.oneofSiblings(ti).toSet == Set(ci, ai))
    assert(telemetry.oneofSiblings(ci).toSet == Set(ti, ai))
    // map keys must be integral/bool/string
    val bad = intercept[IllegalArgumentException](ProtoSchema.parse(
      "syntax = \"proto3\"; message M { map<double, int64> m = 1; }", "M"))
    assert(bad.getMessage.contains("not allowed"))
    // maps inside oneof are illegal proto3 — reject at parse time
    val bad2 = intercept[IllegalArgumentException](ProtoSchema.parse(
      "syntax = \"proto3\"; message M { oneof p { map<string, int64> m = 1; } }", "M"))
    assert(bad2.getMessage.contains("oneof"))
  }

  test("map roundtrip; merged wire bytes: last duplicate key wins") {
    val row = InternalRow(
      UTF8String.fromString("dev1"),
      mkMap(UTF8String.fromString("a") -> 1L, UTF8String.fromString("b") -> 2L),
      mkMap(Integer.valueOf(3) -> UTF8String.fromString("x")),
      null, 42L, null, 1.25)
    val out = rt(telemetry, row)
    assert(out.getMap(1).numElements() == 2)
    assert(out.getMap(1).valueArray().getLong(1) == 2L)
    assert(out.getMap(2).keyArray().getInt(0) == 3)
    assert(out.getLong(4) == 42L)
    assert(out.getDouble(6) == 1.25)
    // concatenated messages merge; duplicate map key → later entry wins
    val first = ProtoWire.encodeMessage(InternalRow(null,
      mkMap(UTF8String.fromString("k") -> 1L), null, null, null, null, null),
      telemetry)
    val second = ProtoWire.encodeMessage(InternalRow(null,
      mkMap(UTF8String.fromString("k") -> 9L), null, null, null, null, null),
      telemetry)
    val merged = ProtoWire.decodeMessage(first ++ second, telemetry)
    assert(merged.getMap(1).numElements() == 1)
    assert(merged.getMap(1).valueArray().getLong(0) == 9L)
    // absent map decodes as empty, not null (proto3)
    val empty = ProtoWire.decodeMessage(Array.emptyByteArray, telemetry)
    assert(!empty.isNullAt(1) && empty.getMap(1).numElements() == 0)
  }

  test("field options are skipped; wire semantics unchanged") {
    val md = ProtoSchema.parse(
      """syntax = "proto3";
        |message M {
        |  string name = 1 [deprecated = true, json_name = "n"];
        |  repeated int64 xs = 2 [packed = true];
        |  map<string, int64> kv = 3 [deprecated = true];
        |}""".stripMargin, "M")
    assert(md.fields.map(_.name) == Seq("name", "xs", "kv"))
    assert(md.fields(1).repeated && md.fields(2).isMap)
    val row = InternalRow(UTF8String.fromString("a"),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](1L, 2L)),
      mkMap(UTF8String.fromString("k") -> 9L))
    val back = rt(md, row)
    assert(back.getUTF8String(0).toString == "a")
    assert(back.getArray(1).toLongArray().toSeq == Seq(1L, 2L))
    assert(back.getMap(2).valueArray().getLong(0) == 9L)
  }

  test("recursive message types are rejected at bind time") {
    val e = intercept[IllegalArgumentException](ProtoSchema.parse(
      """syntax = "proto3";
        |message Node { string name = 1; Node next = 2; }""".stripMargin, "Node"))
    assert(e.getMessage.contains("recursive"))
    val e2 = intercept[IllegalArgumentException](ProtoSchema.parse(
      """syntax = "proto3";
        |message A { B b = 1; }
        |message B { A a = 1; }""".stripMargin, "A"))
    assert(e2.getMessage.contains("recursive"))
  }

  test("oneof: unset members NULL; last member on the wire wins") {
    val withText = ProtoWire.encodeMessage(InternalRow(null, null, null,
      UTF8String.fromString("hello"), null, null, null), telemetry)
    val withCode = ProtoWire.encodeMessage(InternalRow(null, null, null,
      null, 7L, null, null), telemetry)
    val d = ProtoWire.decodeMessage(withText ++ withCode, telemetry)
    assert(d.isNullAt(3))       // text cleared by later code
    assert(d.getLong(4) == 7L)
    assert(d.isNullAt(5))       // attr never present
    val d2 = ProtoWire.decodeMessage(withCode ++ withText, telemetry)
    assert(d2.getUTF8String(3).toString == "hello")
    assert(d2.isNullAt(4))
  }

  // --- google.protobuf.Struct / Value / ListValue / Any ---

  private val structEvent =
    ProtoSchema.parseFile("/root/repo/proto/struct_event.proto", "StructEvent")
  private val structEventRaw =
    ProtoSchema.parseFile("/root/repo/proto/struct_event.proto", "StructEventRaw")
  private val posMsg =
    ProtoSchema.parseFile("/root/repo/proto/struct_event.proto", "Pos")

  test("Struct/Value WKTs surface as JSON-text columns; Any as (url, json)") {
    val sch = structEvent.sparkSchema
    assert(sch("props").dataType == StringType)
    assert(sch("extra").dataType == StringType)
    assert(sch("detail").dataType == StructType(Seq(
      StructField("type_url", StringType, nullable = true),
      StructField("value_json", StringType, nullable = true))))
    // unset WKT messages → NULL (message presence, like Timestamp/wrappers)
    val empty = ProtoWire.decodeMessage(Array.emptyByteArray, structEvent)
    assert(empty.isNullAt(1) && empty.isNullAt(2) && empty.isNullAt(3))
  }

  test("Struct/Value roundtrip fuzz: canonical JSON survives wire both ways") {
    def leaf: Gen[String] = Gen.oneOf(
      Gen.const("null"), Gen.const("true"), Gen.const("false"),
      Gen.chooseNum(-1e6, 1e6).map(ProtoJson.fmtNum),
      Gen.chooseNum(-999999999L, 999999999L).map(l => ProtoJson.fmtNum(l.toDouble)),
      Gen.alphaNumStr.map(ProtoJson.quote),
      Gen.oneOf("a\"b", "c\\d", "e\nf", "tab\tx", "héllo ☃")
        .map(ProtoJson.quote))
    def value(depth: Int): Gen[String] =
      if (depth <= 0) leaf
      else Gen.frequency(3 -> leaf, 1 -> list(depth - 1), 1 -> obj(depth - 1))
    def list(depth: Int): Gen[String] =
      Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, value(depth)))
        .map(_.mkString("[", ",", "]"))
    def obj(depth: Int): Gen[String] =
      Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, value(depth))).map { vs =>
        // distinct keys: duplicates would canonicalize last-wins and break
        // the textual comparison (last-wins itself is pinned below)
        vs.zipWithIndex.map { case (v, i) => s""""k$i":$v""" }
          .mkString("{", ",", "}")
      }
    forAll(obj(2), n = 150) { json =>
      val wire = ProtoJson.jsonToStructWire(json)
      assert(ProtoJson.structJson(wire, 0, wire.length) == json)
    }
    forAll(value(2), n = 150) { json =>
      val wire = ProtoJson.jsonToValueWire(json)
      assert(ProtoJson.valueJson(wire, 0, wire.length) == json)
    }
    forAll(list(2), n = 100) { json =>
      val wire = ProtoJson.jsonToListWire(json)
      assert(ProtoJson.listJson(wire, 0, wire.length) == json)
    }
    // edges: empty object/array, unicode escape decode
    assert(ProtoJson.structJson(ProtoJson.jsonToStructWire("{}"), 0,
      ProtoJson.jsonToStructWire("{}").length) == "{}")
    val uw = ProtoJson.jsonToValueWire("\"\\u0041\"")
    assert(ProtoJson.valueJson(uw, 0, uw.length) == "\"A\"")
    // malformed JSON fails the encode loudly
    intercept[IllegalArgumentException](ProtoJson.jsonToStructWire("{\"a\":}"))
    intercept[IllegalArgumentException](ProtoJson.jsonToStructWire("[1]"))
  }

  test("Struct through the full expression path: duplicate keys last-wins") {
    // two entries with the same key on the wire (legal: map semantics)
    val w1 = ProtoJson.jsonToStructWire("""{"a":1,"b":2}""")
    val w2 = ProtoJson.jsonToStructWire("""{"a":9}""")
    val merged = w1 ++ w2 // concatenated message bytes merge fields
    // last value wins AND the key moves to its last occurrence — the same
    // re-insert convention as the map<K,V> decode path
    assert(ProtoJson.structJson(merged, 0, merged.length) == """{"b":2,"a":9}""")
  }

  test("Any: type_url resolves against the parsed file set; miss/corrupt → NULL") {
    val posBytes = ProtoWire.encodeMessage(
      InternalRow(UTF8String.fromString("z9"), 4), posMsg)
    def viaWire(url: String, value: Array[Byte]): InternalRow = {
      val raw = InternalRow(UTF8String.fromString("t"), null, null,
        InternalRow(UTF8String.fromString(url), value))
      ProtoWire.decodeMessage(
        ProtoWire.encodeMessage(raw, structEventRaw), structEvent)
    }
    // positive: the url's last segment names a message in the file set
    val hit = viaWire("type.googleapis.com/Pos", posBytes).getStruct(3, 2)
    assert(hit.getUTF8String(0).toString == "type.googleapis.com/Pos")
    assert(hit.getUTF8String(1).toString == """{"zone":"z9","rack":4}""")
    // negative: unknown type → value_json NULL, url preserved (data, not error)
    val miss = viaWire("type.googleapis.com/Retired", posBytes).getStruct(3, 2)
    assert(miss.getUTF8String(0).toString == "type.googleapis.com/Retired")
    assert(miss.isNullAt(1))
    // negative: resolvable type, undecodable payload → NULL value_json
    val corrupt = viaWire("type.googleapis.com/Pos",
      Array[Byte](-1, -1, -1, -1)).getStruct(3, 2)
    assert(corrupt.isNullAt(1))
    // a decoded Any cannot re-encode (JSON text is not typed wire bytes)
    val decoded = viaWire("type.googleapis.com/Pos", posBytes)
    val e = intercept[IllegalArgumentException](
      ProtoWire.encodeMessage(decoded, structEvent))
    assert(e.getMessage.contains("wire shape"))
  }

  test("schema cache: repeat parseFile is a lookup; edits invalidate; " +
    "errors never cache") {
    val dir = java.nio.file.Files.createTempDirectory("graft-schema-cache")
    def write(name: String, src: String): java.nio.file.Path =
      java.nio.file.Files.write(dir.resolve(name),
        src.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    write("inner.proto",
      """syntax = "proto3"; message Inner { string tag = 1; }""")
    val root = write("root.proto",
      """syntax = "proto3"; import "inner.proto";
        |message Root { Inner inner = 1; int32 n = 2; }""".stripMargin)

    val before = ProtoSchema.fileParses.get()
    val first = ProtoSchema.parseFile(root.toString, "Root")
    assert(ProtoSchema.fileParses.get() == before + 1)
    // warm hit: no new parse, the SAME immutable MessageDef comes back
    assert(ProtoSchema.parseFile(root.toString, "Root") eq first)
    assert(ProtoSchema.fileParses.get() == before + 1)

    // editing the IMPORTED file (not the root) must invalidate — stamps
    // cover every contributing file, not just the key path
    write("inner.proto",
      """syntax = "proto3"; message Inner { string tag = 1; int64 extra = 2; }""")
    val reparsed = ProtoSchema.parseFile(root.toString, "Root")
    assert(ProtoSchema.fileParses.get() == before + 2)
    assert(reparsed.sparkSchema("inner").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.contains("extra"))

    // a failed parse (missing import) is not cached: fixing the file
    // succeeds on the next call instead of replaying a stale error
    val broken = write("broken.proto",
      """syntax = "proto3"; import "missing.proto"; message B { int32 x = 1; }""")
    intercept[IllegalArgumentException](
      ProtoSchema.parseFile(broken.toString, "B"))
    write("missing.proto", """syntax = "proto3"; message M { int32 y = 1; }""")
    assert(ProtoSchema.parseFile(broken.toString, "B")
      .sparkSchema.fieldNames.contains("x"))
  }
}
