package graft.proto

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Protobuf wire-format decode as a native Catalyst expression — the Spark
  * analog of the reference's per-message `ParseFromArray` + reflection walk
  * (/root/reference/src/nats_scan.cpp:833-862, :456-544). The schema
  * (`MessageDef`) is resolved once at bind time and captured in the expression
  * — mirroring the reference's one-time `DynamicMessageFactory` prototype
  * (/root/reference/src/nats_scan.cpp:439-443); per-row work is a single pass
  * over the wire bytes.
  *
  * proto3 presence semantics reproduced exactly
  * (/root/reference/src/nats_scan.cpp:497-499): unset nested message → NULL,
  * unset scalar → type default (0 / "" / false / enum name of 0).
  * Unparseable payload → NULL struct (all extraction columns NULL, matching
  * the JSON path's behavior :823-829).
  */
final case class ProtoDecodeExpression(child: Expression, schemaDef: MessageDef)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = schemaDef.sparkSchema
  override def nullable: Boolean = true
  override def prettyName: String = "proto_decode"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override def nullSafeEval(input: Any): Any =
    try ProtoWire.decodeMessage(input.asInstanceOf[Array[Byte]], schemaDef)
    catch { case _: Exception => null }

  /** Native codegen (not CodegenFallback): a static call into the same
    * [[ProtoWire.decodeMessage]] the interpreted path uses — bit-identical
    * results, no per-row boxing of the input row, and the expression stays
    * inside the surrounding whole-stage-codegen span. The bound schema rides
    * along as a codegen reference object. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addReferenceObj("protoSchemaDef", schemaDef,
      classOf[MessageDef].getName)
    nullSafeCodeGen(ctx, ev, input => s"""
      |try {
      |  ${ev.value} = graft.proto.ProtoWire.decodeMessage($input, $md);
      |} catch (java.lang.Exception e) {
      |  // unparseable payload -> NULL struct (same contract as eval)
      |  ${ev.isNull} = true;
      |}""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Inverse of [[ProtoDecodeExpression]] — encodes a struct to wire bytes.
  * Not part of the reference surface (it only reads); used by our tests and
  * round-trip oracle queries to manufacture payloads deterministically. */
final case class ProtoEncodeExpression(child: Expression, schemaDef: MessageDef)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "proto_encode"
  // analyzer coerces the input struct to the wire schema's Spark shape
  // (e.g. SQL decimal literals → double) before the codec sees it
  override def inputTypes: Seq[DataType] = Seq(schemaDef.sparkSchema)

  override def nullSafeEval(input: Any): Any =
    ProtoWire.encodeMessage(input.asInstanceOf[InternalRow], schemaDef)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addReferenceObj("protoSchemaDef", schemaDef,
      classOf[MessageDef].getName)
    defineCodeGen(ctx, ev, input =>
      s"graft.proto.ProtoWire.encodeMessage($input, $md)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ProtoDecode {
  /** Decode `payload` (binary) into a struct column typed per `schema`. */
  def decode(payload: Column, schema: MessageDef): Column =
    GraftSql.column(
      ProtoDecodeExpression(GraftSql.expression(payload), schema))

  /** Encode a struct column into wire bytes per `schema`. */
  def encode(struct: Column, schema: MessageDef): Column =
    GraftSql.column(
      ProtoEncodeExpression(GraftSql.expression(struct), schema))

  /** Navigate a dotted field path on a decoded struct; validates the path at
    * bind time with reference-style errors
    * (/root/reference/src/nats_scan.cpp:316-357). */
  def field(decoded: Column, schema: MessageDef, path: String): Column = {
    schema.resolve(path) // throws on invalid path — bind-time validation
    path.split('.').foldLeft(decoded)((c, p) => c.getField(p))
  }
}

/** Wire-format codec core (varint / zigzag / fixed32 / fixed64 /
  * length-delimited, nested submessage recursion). */
object ProtoWire {
  import PType._

  /** Decode one message; returns an InternalRow shaped by `md.sparkSchema`.
    * Scalars default-initialized (proto3), messages null. */
  def decodeMessage(bytes: Array[Byte], md: MessageDef): InternalRow =
    decodeRange(bytes, 0, bytes.length, md)

  /** Range decode for framed payloads (registry header + body in one byte
    * array — no per-row copy of the body slice). */
  def decodeMessage(bytes: Array[Byte], start: Int, end: Int,
                    md: MessageDef): InternalRow =
    decodeRange(bytes, start, end, md)

  private def decodeRange(b: Array[Byte], start: Int, end: Int,
                          md: MessageDef): InternalRow = {
    val slots = new Array[Any](md.fields.length)
    var i = 0
    while (i < md.fields.length) {
      val f = md.fields(i)
      slots(i) =
        if (f.repeated) new scala.collection.mutable.ArrayBuffer[Any]()
        else if (f.oneofGroup.isDefined) null // oneof member: absent unless set
        else defaultValue(f)
      i += 1
    }
    def put(idx: Int, v: Any): Unit = slots(idx) match {
      case buf: scala.collection.mutable.ArrayBuffer[Any @unchecked] => buf += v
      case _ =>
        slots(idx) = v
        // proto3 oneof: setting one member clears the others (last wins)
        md.oneofSiblings.get(idx).foreach(_.foreach(j => slots(j) = null))
    }
    val byNumber = md.indexByNumber
    var pos = start
    while (pos < end) {
      val (tag, p1) = readVarint(b, pos)
      pos = p1
      val fieldNum = (tag >>> 3).toInt
      val wireType = (tag & 7).toInt
      byNumber.get(fieldNum) match {
        case Some(idx) =>
          val f = md.fields(idx)
          wireType match {
            case 0 =>
              val (v, p2) = readVarint(b, pos); pos = p2
              put(idx, varintValue(v, f))
            case 1 =>
              val v = readFixed64(b, pos); pos += 8
              put(idx, fixed64Value(v, f))
            case 5 =>
              val v = readFixed32(b, pos); pos += 4
              put(idx, fixed32Value(v, f))
            case 2 =>
              val (len, p2) = readVarint(b, pos)
              val l = len.toInt
              f.ptype match {
                case PString => put(idx, UTF8String.fromBytes(b, p2, l))
                case PBytes  => put(idx, java.util.Arrays.copyOfRange(b, p2, p2 + l))
                case PMessage(inner) => put(idx, decodeRange(b, p2, p2 + l, inner))
                case PTimestamp | PDuration => put(idx, wktMicros(b, p2, p2 + l))
                case PStruct =>
                  put(idx, UTF8String.fromString(ProtoJson.structJson(b, p2, p2 + l)))
                case PValue =>
                  put(idx, UTF8String.fromString(ProtoJson.valueJson(b, p2, p2 + l)))
                case PListValue =>
                  put(idx, UTF8String.fromString(ProtoJson.listJson(b, p2, p2 + l)))
                case pa: PAny => put(idx, ProtoJson.anyRow(b, p2, p2 + l, pa.registry))
                case PWrapper(_, wmd) =>
                  // decode the one-field wrapper message, surface its value
                  // slot (an empty message → the inner scalar's default,
                  // exactly the proto3 wrapper contract)
                  put(idx, decodeRange(b, p2, p2 + l, wmd)
                    .asInstanceOf[org.apache.spark.sql.catalyst.expressions
                      .GenericInternalRow].values(0))
                case _ if f.packable =>
                  // proto3 packed repeated scalars: consecutive values
                  var q = p2
                  val stop = p2 + l
                  while (q < stop) f.enc match {
                    case Enc.Varint | Enc.ZigZag =>
                      val (v, q2) = readVarint(b, q); q = q2
                      put(idx, varintValue(v, f))
                    case Enc.Fixed32 =>
                      put(idx, fixed32Value(readFixed32(b, q), f)); q += 4
                    case Enc.Fixed64 =>
                      put(idx, fixed64Value(readFixed64(b, q), f)); q += 8
                    case Enc.LenDelim => throw new IllegalStateException("unreachable")
                  }
                case _ => () // len-delim for a non-repeated scalar — skip
              }
              pos = p2 + l
            case other =>
              throw new IllegalArgumentException(s"unsupported wire type $other")
          }
        case None => pos = skipField(b, pos, wireType)
      }
    }
    i = 0
    while (i < slots.length) {
      slots(i) = slots(i) match {
        case buf: scala.collection.mutable.ArrayBuffer[Any @unchecked]
            if md.fields(i).isMap =>
          // entry rows → MapData; duplicate keys: last entry wins (proto3)
          val m = new java.util.LinkedHashMap[Any, Any]()
          buf.foreach { e =>
            val r = e.asInstanceOf[
              org.apache.spark.sql.catalyst.expressions.GenericInternalRow]
            m.remove(r.values(0)) // re-insert moves the key to entry order
            m.put(r.values(0), r.values(1))
          }
          val keys = new Array[Any](m.size)
          val vals = new Array[Any](m.size)
          val it = m.entrySet().iterator()
          var j = 0
          while (it.hasNext) {
            val en = it.next(); keys(j) = en.getKey; vals(j) = en.getValue; j += 1
          }
          new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(keys),
            new org.apache.spark.sql.catalyst.util.GenericArrayData(vals))
        case buf: scala.collection.mutable.ArrayBuffer[Any @unchecked] =>
          new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.toArray)
        case v => v
      }
      i += 1
    }
    InternalRow.fromSeq(slots.toIndexedSeq)
  }

  private def defaultValue(f: FieldDef): Any = f.ptype match {
    case PString => UTF8String.EMPTY_UTF8
    case PBytes  => Array.emptyByteArray
    case PInt32  => 0
    case PInt64  => 0L
    case PUInt32 => 0L
    case PUInt64 => Decimal(0L)
    case PFloat  => 0.0f
    case PDouble => 0.0d
    case PBool   => false
    case PEnum(_, values) => UTF8String.fromString(values.getOrElse(0, "0"))
    case _: PMessage => null
    case PTimestamp | PDuration => null // message presence: unset → NULL
    case _: PWrapper => null            // unset wrapper → NULL (its point)
    case PStruct | PValue | PListValue => null // unset WKT message → NULL
    case _: PAny => null
  }

  /** {seconds=1 varint, nanos=2 varint} → µs (Spark's internal long for
    * both TimestampType and DayTimeIntervalType). Works for either sign
    * convention: Timestamp carries nanos ∈ [0, 1e9), Duration same-sign
    * seconds/nanos — seconds·1e6 + nanos/1e3 is exact for both. */
  private def wktMicros(b: Array[Byte], start: Int, end: Int): Long = {
    var seconds = 0L
    var nanos = 0L
    var pos = start
    while (pos < end) {
      val (tag, p1) = readVarint(b, pos)
      pos = p1
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (1, 0) => val (v, p2) = readVarint(b, pos); seconds = v; pos = p2
        case (2, 0) => val (v, p2) = readVarint(b, pos); nanos = v; pos = p2
        case (_, wt) => pos = skipField(b, pos, wt)
      }
    }
    seconds * 1000000L + nanos / 1000L
  }

  /** µs → {seconds, nanos} wire payload. Timestamp splits by floor (nanos
    * always non-negative, per the proto spec); Duration splits toward zero
    * (seconds and nanos share a sign). Zero fields are omitted (proto3). */
  private def wktPayload(micros: Long, timestamp: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val (secs, nanos) =
      if (timestamp)
        (Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
      else
        (micros / 1000000L, (micros % 1000000L) * 1000L)
    if (secs != 0L) { writeVarint(out, (1L << 3) | 0L); writeVarint(out, secs) }
    if (nanos != 0L) { writeVarint(out, (2L << 3) | 0L); writeVarint(out, nanos) }
    out.toByteArray
  }

  private def varintValue(v: Long, f: FieldDef): Any = (f.ptype, f.enc) match {
    case (PInt32, Enc.ZigZag)  => zigzag32(v)
    case (PInt64, Enc.ZigZag)  => zigzag64(v)
    case (PInt32, _)  => v.toInt
    case (PInt64, _)  => v
    case (PUInt32, _) => v & 0xFFFFFFFFL
    case (PUInt64, _) => unsignedDecimal(v)
    case (PBool, _)   => v != 0L
    case (PEnum(_, values), _) =>
      UTF8String.fromString(values.getOrElse(v.toInt, v.toString))
    case other => throw new IllegalArgumentException(s"bad varint field $other")
  }

  private def fixed32Value(v: Int, f: FieldDef): Any = f.ptype match {
    case PFloat  => java.lang.Float.intBitsToFloat(v)
    case PInt32  => v                      // sfixed32
    case PUInt32 => v.toLong & 0xFFFFFFFFL // fixed32
    case other => throw new IllegalArgumentException(s"bad fixed32 field $other")
  }

  private def fixed64Value(v: Long, f: FieldDef): Any = f.ptype match {
    case PDouble => java.lang.Double.longBitsToDouble(v)
    case PInt64  => v                  // sfixed64
    case PUInt64 => unsignedDecimal(v) // fixed64
    case other => throw new IllegalArgumentException(s"bad fixed64 field $other")
  }

  private def unsignedDecimal(v: Long): Decimal =
    Decimal(BigDecimal(java.lang.Long.toUnsignedString(v)), 20, 0)

  def zigzag32(v: Long): Int = { val n = v.toInt; (n >>> 1) ^ -(n & 1) }
  def zigzag64(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  def readVarint(b: Array[Byte], start: Int): (Long, Int) = {
    var result = 0L
    var shift = 0
    var pos = start
    while (true) {
      val by = b(pos)
      result |= (by & 0x7FL) << shift
      pos += 1
      if ((by & 0x80) == 0) return (result, pos)
      shift += 7
      if (shift > 63) throw new IllegalArgumentException("varint too long")
    }
    throw new IllegalStateException("unreachable")
  }

  private def readFixed32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
    ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)

  private def readFixed64(b: Array[Byte], p: Int): Long =
    (readFixed32(b, p).toLong & 0xFFFFFFFFL) |
    ((readFixed32(b, p + 4).toLong & 0xFFFFFFFFL) << 32)

  private[proto] def skipField(b: Array[Byte], pos: Int, wireType: Int): Int =
    wireType match {
      case 0 => readVarint(b, pos)._2
      case 1 => pos + 8
      case 5 => pos + 4
      case 2 => val (len, p2) = readVarint(b, pos); p2 + len.toInt
      case other =>
        throw new IllegalArgumentException(s"unsupported wire type $other")
    }

  // ---------- encoder (tests / fixture manufacture only) ----------

  def encodeMessage(row: InternalRow, md: MessageDef): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    encodeTo(out, row, md)
    out.toByteArray
  }

  private def encodeTo(out: java.io.ByteArrayOutputStream, row: InternalRow,
                       md: MessageDef): Unit = {
    md.fields.zipWithIndex.foreach { case (f, idx) =>
      if (!row.isNullAt(idx)) {
        if (f.isMap) encodeMap(out, row, idx, f)
        else if (f.repeated) encodeRepeated(out, row, idx, f)
        else f.enc match {
          case Enc.Varint =>
            writeVarint(out, (f.number.toLong << 3) | 0)
            writeVarint(out, varintOf(row, idx, f))
          case Enc.ZigZag =>
            writeVarint(out, (f.number.toLong << 3) | 0)
            f.ptype match {
              case PInt32 => val n = row.getInt(idx)
                writeVarint(out, ((n << 1) ^ (n >> 31)).toLong & 0xFFFFFFFFL)
              case _ => val n = row.getLong(idx)
                writeVarint(out, (n << 1) ^ (n >> 63))
            }
          case Enc.Fixed32 =>
            writeVarint(out, (f.number.toLong << 3) | 5)
            val bits = f.ptype match {
              case PFloat => java.lang.Float.floatToIntBits(row.getFloat(idx))
              case PUInt32 => row.getLong(idx).toInt
              case _ => row.getInt(idx)
            }
            writeFixed32(out, bits)
          case Enc.Fixed64 =>
            writeVarint(out, (f.number.toLong << 3) | 1)
            val bits = f.ptype match {
              case PDouble => java.lang.Double.doubleToLongBits(row.getDouble(idx))
              case PUInt64 => // unsigned 64-bit bit pattern, wraps past 2^63
                row.getDecimal(idx, 20, 0).toJavaBigDecimal.toBigInteger.longValue()
              case _ => row.getLong(idx)
            }
            writeFixed64(out, bits)
          case Enc.LenDelim =>
            val payload: Array[Byte] = f.ptype match {
              case PString => row.getUTF8String(idx).getBytes
              case PBytes  => row.getBinary(idx)
              case PMessage(inner) =>
                encodeMessage(row.getStruct(idx, inner.fields.length), inner)
              case PTimestamp => wktPayload(row.getLong(idx), timestamp = true)
              case PDuration  => wktPayload(row.getLong(idx), timestamp = false)
              case PWrapper(inner, wmd) =>
                encodeMessage(new org.apache.spark.sql.catalyst.expressions
                  .GenericInternalRow(
                    Array[Any](row.get(idx, ProtoSchema.sparkType(inner)))),
                  wmd)
              case PStruct =>
                ProtoJson.jsonToStructWire(row.getUTF8String(idx).toString)
              case PValue =>
                ProtoJson.jsonToValueWire(row.getUTF8String(idx).toString)
              case PListValue =>
                ProtoJson.jsonToListWire(row.getUTF8String(idx).toString)
              case _: PAny =>
                // decoded Any is (type_url, value_json) — JSON text cannot
                // round-trip to typed wire bytes without a JSON→message
                // builder; publishers use a plain message with Any's wire
                // shape instead (string type_url = 1, bytes value = 2)
                throw new IllegalArgumentException(
                  "google.protobuf.Any cannot be re-encoded from its " +
                    "decoded form; encode through a message with Any's " +
                    "wire shape (string type_url = 1, bytes value = 2)")
              case other =>
                throw new IllegalArgumentException(s"bad len-delim field $other")
            }
            writeVarint(out, (f.number.toLong << 3) | 2)
            writeVarint(out, payload.length.toLong)
            out.write(payload, 0, payload.length)
        }
      }
    }
  }

  /** map field: one tagged entry message per key/value pair (the proto3
    * wire representation of map<K, V>) */
  private def encodeMap(out: java.io.ByteArrayOutputStream,
                        row: InternalRow, idx: Int, f: FieldDef): Unit = {
    val entry = f.mapEntry
    val kt = ProtoSchema.sparkType(entry.fields(0).ptype)
    val vt = ProtoSchema.sparkType(entry.fields(1).ptype)
    val m = row.getMap(idx)
    val ka = m.keyArray()
    val va = m.valueArray()
    var i = 0
    while (i < m.numElements()) {
      val entryRow = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](ka.get(i, kt), va.get(i, vt)))
      val payload = encodeMessage(entryRow, entry)
      writeVarint(out, (f.number.toLong << 3) | 2)
      writeVarint(out, payload.length.toLong)
      out.write(payload, 0, payload.length)
      i += 1
    }
  }

  /** repeated field: packed for scalar encodings (proto3 default),
    * one tagged element at a time for strings/bytes/messages */
  private def encodeRepeated(out: java.io.ByteArrayOutputStream,
                             row: InternalRow, idx: Int, f: FieldDef): Unit = {
    val elemType = ProtoSchema.sparkType(f.ptype)
    val arr = row.getArray(idx)
    if (arr.numElements() == 0) return
    if (f.packable) {
      val tmp = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < arr.numElements()) {
        val v = arr.get(i, elemType)
        f.enc match {
          case Enc.Varint => writeVarint(tmp, scalarVarint(v, f))
          case Enc.ZigZag => f.ptype match {
            case PInt32 => val n = v.asInstanceOf[Int]
              writeVarint(tmp, ((n << 1) ^ (n >> 31)).toLong & 0xFFFFFFFFL)
            case _ => val n = v.asInstanceOf[Long]
              writeVarint(tmp, (n << 1) ^ (n >> 63))
          }
          case Enc.Fixed32 => f.ptype match {
            case PFloat => writeFixed32(tmp, java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
            case PUInt32 => writeFixed32(tmp, v.asInstanceOf[Long].toInt)
            case _ => writeFixed32(tmp, v.asInstanceOf[Int])
          }
          case Enc.Fixed64 => f.ptype match {
            case PDouble => writeFixed64(tmp, java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
            case PUInt64 => writeFixed64(tmp,
              v.asInstanceOf[Decimal].toJavaBigDecimal.toBigInteger.longValue())
            case _ => writeFixed64(tmp, v.asInstanceOf[Long])
          }
          case Enc.LenDelim => throw new IllegalStateException("unreachable")
        }
        i += 1
      }
      val payload = tmp.toByteArray
      writeVarint(out, (f.number.toLong << 3) | 2)
      writeVarint(out, payload.length.toLong)
      out.write(payload, 0, payload.length)
    } else {
      var i = 0
      while (i < arr.numElements()) {
        val payload: Array[Byte] = f.ptype match {
          case PString => arr.getUTF8String(i).getBytes
          case PBytes  => arr.getBinary(i)
          case PMessage(inner) =>
            encodeMessage(arr.getStruct(i, inner.fields.length), inner)
          case PTimestamp => wktPayload(arr.getLong(i), timestamp = true)
          case PDuration  => wktPayload(arr.getLong(i), timestamp = false)
          case PWrapper(inner, wmd) =>
            encodeMessage(new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(
                Array[Any](arr.get(i, ProtoSchema.sparkType(inner)))),
              wmd)
          case PStruct => ProtoJson.jsonToStructWire(arr.getUTF8String(i).toString)
          case PValue => ProtoJson.jsonToValueWire(arr.getUTF8String(i).toString)
          case PListValue => ProtoJson.jsonToListWire(arr.getUTF8String(i).toString)
          case _: PAny =>
            throw new IllegalArgumentException(
              "google.protobuf.Any cannot be re-encoded from its decoded " +
                "form; encode through a message with Any's wire shape")
          case other =>
            throw new IllegalArgumentException(s"bad repeated len-delim $other")
        }
        writeVarint(out, (f.number.toLong << 3) | 2)
        writeVarint(out, payload.length.toLong)
        out.write(payload, 0, payload.length)
        i += 1
      }
    }
  }

  private def scalarVarint(v: Any, f: FieldDef): Long = f.ptype match {
    case PInt32  => v.asInstanceOf[Int].toLong
    case PInt64  => v.asInstanceOf[Long]
    case PUInt32 => v.asInstanceOf[Long]
    case PUInt64 => v.asInstanceOf[Decimal].toJavaBigDecimal.toBigInteger.longValue()
    case PBool   => if (v.asInstanceOf[Boolean]) 1L else 0L
    case PEnum(_, values) =>
      val name = v.asInstanceOf[UTF8String].toString
      values.collectFirst { case (n, nm) if nm == name => n.toLong }
        .getOrElse(name.toLong)
    case other => throw new IllegalArgumentException(s"bad varint value $other")
  }

  private def varintOf(row: InternalRow, idx: Int, f: FieldDef): Long =
    f.ptype match {
      case PInt32  => row.getInt(idx).toLong
      case PInt64  => row.getLong(idx)
      case PUInt32 => row.getLong(idx)
      case PUInt64 =>
        row.getDecimal(idx, 20, 0).toJavaBigDecimal.toBigInteger.longValue()
      case PBool   => if (row.getBoolean(idx)) 1L else 0L
      case PEnum(_, values) =>
        val name = row.getUTF8String(idx).toString
        values.collectFirst { case (n, v) if v == name => n.toLong }
          .getOrElse(name.toLong)
      case other => throw new IllegalArgumentException(s"bad varint field $other")
    }

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v = v >>> 7
    }
    out.write((v & 0x7F).toInt)
  }

  private def writeFixed32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
    out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
  }

  private def writeFixed64(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    writeFixed32(out, v.toInt); writeFixed32(out, (v >>> 32).toInt)
  }
}
