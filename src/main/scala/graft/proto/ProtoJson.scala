package graft.proto

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types.Decimal
import org.apache.spark.unsafe.types.UTF8String

/** JSON text codec for the open-schema well-known types
  * (google.protobuf.Struct / Value / ListValue) and the generic
  * message→JSON printer behind google.protobuf.Any's typed decode.
  *
  * Wire shapes (struct.proto / any.proto, public definitions):
  *   Struct    = { map<string, Value> fields = 1 }
  *   Value     = { oneof kind: null_value=1 (enum, varint),
  *                 number_value=2 (double), string_value=3, bool_value=4,
  *                 struct_value=5 (Struct), list_value=6 (ListValue) }
  *   ListValue = { repeated Value values = 1 }
  *   Any       = { string type_url = 1, bytes value = 2 }
  *
  * JSON canonicalization (ours, deterministic both directions): object keys
  * keep WIRE/INPUT order (proto map semantics: last duplicate wins),
  * integral doubles below 1e15 print without a decimal point, strings
  * escape `"` `\\` and control characters. The message printer
  * ([[rowJson]]) emits every field (null for unset messages), bytes as
  * base64, enums by name, Timestamp/Duration as epoch-µs / µs numbers —
  * the same µs surface the columnar schema uses. */
object ProtoJson {

  // ---------- decode: wire → JSON text ----------

  import ProtoWire.{readVarint, skipField}

  def structJson(b: Array[Byte], start: Int, end: Int): String = {
    // LinkedHashMap: wire order preserved, duplicate keys last-wins
    val fields = new java.util.LinkedHashMap[String, String]()
    var pos = start
    while (pos < end) {
      val (tag, p1) = readVarint(b, pos)
      pos = p1
      if ((tag >>> 3).toInt == 1 && (tag & 7).toInt == 2) {
        val (len, p2) = readVarint(b, pos)
        val (k, v) = entryJson(b, p2, p2 + len.toInt)
        fields.remove(k); fields.put(k, v)
        ()
        pos = p2 + len.toInt
      } else pos = skipField(b, pos, (tag & 7).toInt)
    }
    val sb = new java.lang.StringBuilder("{")
    val it = fields.entrySet().iterator()
    var first = true
    while (it.hasNext) {
      val e = it.next()
      if (!first) sb.append(',')
      first = false
      sb.append(quote(e.getKey)).append(':').append(e.getValue)
    }
    sb.append('}').toString
  }

  /** one FieldsEntry {1: key, 2: Value} — proto3 scalar/message absence
    * means an EMPTY entry still decodes (key "" with a JSON null value),
    * the same defaulting protobuf-java's Struct parser applies */
  private def entryJson(b: Array[Byte], start: Int,
                        end: Int): (String, String) = {
    var key = ""
    var value = "null" // absent Value in an entry → JSON null
    var pos = start
    while (pos < end) {
      val (tag, p1) = readVarint(b, pos)
      pos = p1
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) =>
          val (len, p2) = readVarint(b, pos)
          key = new String(b, p2, len.toInt, "UTF-8")
          pos = p2 + len.toInt
        case (2, 2) =>
          val (len, p2) = readVarint(b, pos)
          value = valueJson(b, p2, p2 + len.toInt)
          pos = p2 + len.toInt
        case (_, wt) => pos = skipField(b, pos, wt)
      }
    }
    (key, value)
  }

  /** one Value message; empty message (no kind set) → JSON null, repeated
    * kind fields → last wins (proto3 oneof) */
  def valueJson(b: Array[Byte], start: Int, end: Int): String = {
    var out = "null"
    var pos = start
    while (pos < end) {
      val (tag, p1) = readVarint(b, pos)
      pos = p1
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (1, 0) => // null_value enum
          val (_, p2) = readVarint(b, pos); out = "null"; pos = p2
        case (2, 1) => // number_value double
          val v = java.lang.Double.longBitsToDouble(readFixed64(b, pos))
          out = fmtNum(v); pos += 8
        case (3, 2) => // string_value
          val (len, p2) = readVarint(b, pos)
          out = quote(new String(b, p2, len.toInt, "UTF-8"))
          pos = p2 + len.toInt
        case (4, 0) => // bool_value
          val (v, p2) = readVarint(b, pos)
          out = if (v != 0L) "true" else "false"; pos = p2
        case (5, 2) => // struct_value
          val (len, p2) = readVarint(b, pos)
          out = structJson(b, p2, p2 + len.toInt); pos = p2 + len.toInt
        case (6, 2) => // list_value
          val (len, p2) = readVarint(b, pos)
          out = listJson(b, p2, p2 + len.toInt); pos = p2 + len.toInt
        case (_, wt) => pos = skipField(b, pos, wt)
      }
    }
    out
  }

  def listJson(b: Array[Byte], start: Int, end: Int): String = {
    val sb = new java.lang.StringBuilder("[")
    var first = true
    var pos = start
    while (pos < end) {
      val (tag, p1) = readVarint(b, pos)
      pos = p1
      if ((tag >>> 3).toInt == 1 && (tag & 7).toInt == 2) {
        val (len, p2) = readVarint(b, pos)
        if (!first) sb.append(',')
        first = false
        sb.append(valueJson(b, p2, p2 + len.toInt))
        pos = p2 + len.toInt
      } else pos = skipField(b, pos, (tag & 7).toInt)
    }
    sb.append(']').toString
  }

  /** google.protobuf.Any → (type_url, value_json | NULL). The URL's last
    * '/'-segment resolves against the parsed file set; a miss — or an
    * embedded payload the resolved schema cannot decode — yields NULL
    * value_json with the type_url preserved (unresolvable Anys are DATA,
    * not errors: streams outlive schemas). */
  def anyRow(b: Array[Byte], start: Int, end: Int,
             registry: AnyRegistry): InternalRow = {
    var url = ""
    var vStart = -1
    var vEnd = -1
    var pos = start
    while (pos < end) {
      val (tag, p1) = readVarint(b, pos)
      pos = p1
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) =>
          val (len, p2) = readVarint(b, pos)
          url = new String(b, p2, len.toInt, "UTF-8")
          pos = p2 + len.toInt
        case (2, 2) =>
          val (len, p2) = readVarint(b, pos)
          vStart = p2; vEnd = p2 + len.toInt
          pos = p2 + len.toInt
        case (_, wt) => pos = skipField(b, pos, wt)
      }
    }
    val short = url.substring(url.lastIndexOf('/') + 1)
    val json: UTF8String = registry.messages.get(short) match {
      case Some(md) if vStart >= 0 =>
        try UTF8String.fromString(
          rowJson(md, ProtoWire.decodeMessage(
            java.util.Arrays.copyOfRange(b, vStart, vEnd), md)))
        catch { case _: Exception => null }
      case Some(md) => // resolvable type, absent payload = empty message
        UTF8String.fromString(rowJson(md, ProtoWire.decodeMessage(
          Array.emptyByteArray, md)))
      case None => null
    }
    new GenericInternalRow(Array[Any](UTF8String.fromString(url), json))
  }

  // ---------- generic message → JSON (Any's typed surface) ----------

  def rowJson(md: MessageDef, row: InternalRow): String = {
    val sb = new java.lang.StringBuilder("{")
    var i = 0
    while (i < md.fields.length) {
      val f = md.fields(i)
      if (i > 0) sb.append(',')
      sb.append(quote(f.name)).append(':')
      if (row.isNullAt(i)) sb.append("null")
      else if (f.isMap) mapJson(sb, f, row.getMap(i))
      else if (f.repeated) arrayJson(sb, f, row.getArray(i))
      else leafJson(sb, f.ptype, row, i)
      i += 1
    }
    sb.append('}').toString
  }

  private def mapJson(sb: java.lang.StringBuilder, f: FieldDef,
                      m: MapData): Unit = {
    val entry = f.mapEntry
    val kt = entry.fields(0).ptype
    val vt = entry.fields(1).ptype
    val keys = m.keyArray()
    val vals = m.valueArray()
    sb.append('{')
    var i = 0
    while (i < m.numElements()) {
      if (i > 0) sb.append(',')
      // JSON object keys are strings regardless of the proto key type
      val keyText = new java.lang.StringBuilder()
      leafJson(keyText, kt, keys, i)
      val kts = keyText.toString
      sb.append(if (kts.startsWith("\"")) kts else quote(kts))
      sb.append(':')
      if (vals.isNullAt(i)) sb.append("null") else leafJson(sb, vt, vals, i)
      i += 1
    }
    sb.append('}')
    ()
  }

  private def arrayJson(sb: java.lang.StringBuilder, f: FieldDef,
                        a: ArrayData): Unit = {
    sb.append('[')
    var i = 0
    while (i < a.numElements()) {
      if (i > 0) sb.append(',')
      if (a.isNullAt(i)) sb.append("null") else leafJson(sb, f.ptype, a, i)
      i += 1
    }
    sb.append(']')
    ()
  }

  /** one leaf slot from either an InternalRow or ArrayData accessor */
  private def leafJson(sb: java.lang.StringBuilder, pt: PType,
                       src: Any, i: Int): Unit = {
    import PType._
    def getLong = src match {
      case r: InternalRow => r.getLong(i); case a: ArrayData => a.getLong(i)
    }
    def getInt = src match {
      case r: InternalRow => r.getInt(i); case a: ArrayData => a.getInt(i)
    }
    def getStr = src match {
      case r: InternalRow => r.getUTF8String(i)
      case a: ArrayData => a.getUTF8String(i)
    }
    def getStruct(n: Int) = src match {
      case r: InternalRow => r.getStruct(i, n); case a: ArrayData => a.getStruct(i, n)
    }
    val out: String = pt match {
      case PString => quote(getStr.toString)
      case PBytes =>
        val bytes = src match {
          case r: InternalRow => r.getBinary(i); case a: ArrayData => a.getBinary(i)
        }
        quote(java.util.Base64.getEncoder.encodeToString(bytes))
      case PInt32 => getInt.toString
      case PInt64 => getLong.toString
      case PUInt32 => getLong.toString
      case PUInt64 =>
        (src match {
          case r: InternalRow => r.getDecimal(i, 20, 0)
          case a: ArrayData => a.get(i, org.apache.spark.sql.types.DecimalType(20, 0))
            .asInstanceOf[Decimal]
        }).toJavaBigDecimal.toBigInteger.toString
      case PFloat => fmtNum((src match {
        case r: InternalRow => r.getFloat(i); case a: ArrayData => a.getFloat(i)
      }).toDouble)
      case PDouble => fmtNum(src match {
        case r: InternalRow => r.getDouble(i); case a: ArrayData => a.getDouble(i)
      })
      case PBool =>
        val b = src match {
          case r: InternalRow => r.getBoolean(i); case a: ArrayData => a.getBoolean(i)
        }
        if (b) "true" else "false"
      case PEnum(_, _) => quote(getStr.toString)
      case PMessage(inner) => rowJson(inner, getStruct(inner.fields.length))
      case PTimestamp | PDuration => getLong.toString // epoch-µs / µs
      case PWrapper(inner, _) => { leafJson(sb, inner, src, i); return }
      case PStruct | PValue | PListValue => getStr.toString // already JSON
      case _: PAny =>
        val r = getStruct(2)
        val url = if (r.isNullAt(0)) "null" else quote(r.getUTF8String(0).toString)
        val vj = if (r.isNullAt(1)) "null" else r.getUTF8String(1).toString
        s"""{"type_url":$url,"value_json":$vj}"""
    }
    sb.append(out)
    ()
  }

  // ---------- encode: JSON text → wire ----------

  /** Struct wire bytes from a JSON OBJECT (bind-checked). */
  def jsonToStructWire(json: String): Array[Byte] = {
    val p = new Parser(json)
    p.skipWs()
    val out = p.parseObjectWire()
    p.skipWs()
    p.requireEnd()
    out
  }

  /** Value wire bytes from any JSON value. */
  def jsonToValueWire(json: String): Array[Byte] = {
    val p = new Parser(json)
    p.skipWs()
    val out = p.parseValueWire()
    p.skipWs()
    p.requireEnd()
    out
  }

  /** ListValue wire bytes from a JSON ARRAY (bind-checked). */
  def jsonToListWire(json: String): Array[Byte] = {
    val p = new Parser(json)
    p.skipWs()
    val out = p.parseArrayWire()
    p.skipWs()
    p.requireEnd()
    out
  }

  /** minimal JSON parser emitting Struct/Value/ListValue wire directly */
  private final class Parser(s: String) {
    private var pos = 0

    def skipWs(): Unit = {
      while (pos < s.length && Character.isWhitespace(s.charAt(pos))) pos += 1
    }
    def requireEnd(): Unit =
      if (pos < s.length)
        fail(s"trailing content at offset $pos")
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"google.protobuf.Struct: invalid JSON — $msg")
    private def expect(c: Char): Unit = {
      if (pos >= s.length || s.charAt(pos) != c)
        fail(s"expected '$c' at offset $pos")
      pos += 1
    }

    /** Value message bytes for the next JSON value */
    def parseValueWire(): Array[Byte] = {
      skipWs()
      if (pos >= s.length) fail("unexpected end of input")
      val out = new java.io.ByteArrayOutputStream()
      s.charAt(pos) match {
        case 'n' =>
          literal("null"); varintField(out, 1, 0L)
        case 't' =>
          literal("true"); varintField(out, 4, 1L)
        case 'f' =>
          literal("false"); varintField(out, 4, 0L)
        case '"' =>
          val str = parseString()
          val bytes = str.getBytes("UTF-8")
          tag(out, 3, 2); varint(out, bytes.length.toLong); out.write(bytes, 0, bytes.length)
        case '{' =>
          val struct = parseObjectWire()
          tag(out, 5, 2); varint(out, struct.length.toLong); out.write(struct, 0, struct.length)
        case '[' =>
          val list = parseArrayWire()
          tag(out, 6, 2); varint(out, list.length.toLong); out.write(list, 0, list.length)
        case _ =>
          val d = parseNumber()
          tag(out, 2, 1)
          val bits = java.lang.Double.doubleToLongBits(d)
          var j = 0
          while (j < 8) { out.write(((bits >>> (8 * j)) & 0xFF).toInt); j += 1 }
      }
      out.toByteArray
    }

    /** Struct message bytes for the next JSON object */
    def parseObjectWire(): Array[Byte] = {
      skipWs()
      expect('{')
      val out = new java.io.ByteArrayOutputStream()
      skipWs()
      if (pos < s.length && s.charAt(pos) == '}') { pos += 1; return out.toByteArray }
      var done = false
      while (!done) {
        skipWs()
        val key = parseString()
        skipWs()
        expect(':')
        val value = parseValueWire()
        // FieldsEntry {1: key, 2: value}
        val entry = new java.io.ByteArrayOutputStream()
        val kb = key.getBytes("UTF-8")
        tag(entry, 1, 2); varint(entry, kb.length.toLong); entry.write(kb, 0, kb.length)
        tag(entry, 2, 2); varint(entry, value.length.toLong); entry.write(value, 0, value.length)
        val eb = entry.toByteArray
        tag(out, 1, 2); varint(out, eb.length.toLong); out.write(eb, 0, eb.length)
        skipWs()
        if (pos < s.length && s.charAt(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      out.toByteArray
    }

    /** ListValue message bytes for the next JSON array */
    def parseArrayWire(): Array[Byte] = {
      skipWs()
      expect('[')
      val out = new java.io.ByteArrayOutputStream()
      skipWs()
      if (pos < s.length && s.charAt(pos) == ']') { pos += 1; return out.toByteArray }
      var done = false
      while (!done) {
        val v = parseValueWire()
        tag(out, 1, 2); varint(out, v.length.toLong); out.write(v, 0, v.length)
        skipWs()
        if (pos < s.length && s.charAt(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      out.toByteArray
    }

    private def literal(lit: String): Unit = {
      if (!s.startsWith(lit, pos)) fail(s"expected '$lit' at offset $pos")
      pos += lit.length
    }

    private def parseString(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder()
      while (pos < s.length && s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          if (pos >= s.length) fail("unterminated escape")
          s.charAt(pos) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'u' =>
              if (pos + 4 >= s.length) fail("truncated \\u escape")
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 4
            case other => fail(s"bad escape '\\$other'")
          }
        } else sb.append(c)
        pos += 1
      }
      expect('"')
      sb.toString
    }

    private def parseNumber(): Double = {
      val start = pos
      while (pos < s.length && "+-0123456789.eE".indexOf(s.charAt(pos)) >= 0) pos += 1
      if (pos == start) fail(s"expected a value at offset $pos")
      try s.substring(start, pos).toDouble
      catch { case _: NumberFormatException => fail(s"bad number at offset $start") }
    }

    private def tag(out: java.io.ByteArrayOutputStream, field: Int, wt: Int): Unit =
      varint(out, (field.toLong << 3) | wt.toLong)
    private def varintField(out: java.io.ByteArrayOutputStream, field: Int,
                            v: Long): Unit = {
      // zero varints still emit: Value's oneof needs the kind tag present
      tag(out, field, 0); varint(out, v)
    }
    private def varint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v = v >>> 7 }
      out.write((v & 0x7F).toInt)
    }
  }

  // ---------- shared text helpers ----------

  private def readFixed64(b: Array[Byte], p: Int): Long = {
    var v = 0L
    var j = 0
    while (j < 8) { v |= (b(p + j).toLong & 0xFF) << (8 * j); j += 1 }
    v
  }

  /** canonical number text: integral doubles below 1e15 print as integers
    * (both codec directions use this, so round trips are textually stable) */
  def fmtNum(d: Double): String =
    if (d.isNaN) "\"NaN\""
    else if (d.isInfinite) { if (d > 0) "\"Infinity\"" else "\"-Infinity\"" }
    else if (d == Math.rint(d) && Math.abs(d) < 1e15d) d.toLong.toString
    else d.toString

  def quote(s: String): String = {
    val sb = new java.lang.StringBuilder("\"")
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case x if x < ' ' => sb.append(f"\\u${x.toInt}%04x")
        case x => sb.append(x)
      }
      i += 1
    }
    sb.append('"').toString
  }
}
