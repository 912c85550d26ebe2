package graft.wire

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MessagePack payload extraction — third wire format of the reference's
  * roadmap (/root/reference/docs/GUIDE.md:472-475), surfaced like the JSON
  * path: `msgpack_extract` dotted paths over a top-level map payload, one
  * STRING column per path, missing key → NULL (the reference's stringly
  * json_extract semantics, nats_scan.cpp:379-385 — MessagePack is
  * schemaless like JSON, so the stringly surface is the faithful one; the
  * schema-ful formats, proto and Avro, get typed columns instead).
  *
  * Self-contained codec over the public MessagePack spec (no library):
  * nil/bool, all int widths (fix/8/16/32/64, signed + unsigned), float32/64,
  * str (fix/8/16/32), bin (8/16/32), array (fix/16/32), map (fix/16/32).
  *
  * Value rendering: strings verbatim; bools `true`/`false`; ints as decimal
  * text (uint64 unsigned); floats via `Double.toString` (shortest
  * round-trip text — consumers cast back to DOUBLE, which is exact);
  * nil → NULL; composite leaves (map/array at the end of a path) → NULL
  * (documented divergence: the JSON path returns nested literal text, a
  * schemaless reconstruction msgpack does not keep). Unparseable payload →
  * NULL, never an error (reference :823-829 parity).
  */
object MsgPack {

  /** cursor over one payload */
  private final class Reader(b: Array[Byte]) {
    var pos = 0
    def peek: Int = b(pos) & 0xFF
    def u8(): Int = { val v = b(pos) & 0xFF; pos += 1; v }
    def u16(): Int = { (u8() << 8) | u8() }
    def u32(): Long = { ((u16().toLong) << 16) | u16().toLong }
    def u64(): Long = { (u32() << 32) | u32() }
    def bytes(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; out
    }
  }

  private def str(r: Reader, n: Int): String =
    new String(r.bytes(n), java.nio.charset.StandardCharsets.UTF_8)

  /** decoded leaf values for rendering; composites decode to markers */
  private sealed trait V
  private case object VNil extends V
  private final case class VBool(v: Boolean) extends V
  private final case class VLong(v: Long) extends V
  private final case class VULong(v: Long) extends V // unsigned 64-bit bits
  private final case class VDouble(v: Double) extends V
  private final case class VStr(v: String) extends V
  private final case class VBin(v: Array[Byte]) extends V
  private case object VComposite extends V

  /** structurally consume one value */
  private def skip(r: Reader): Unit = { decode(r); () }

  /** decode ONE value, fully consuming it (composites decode to a marker
    * after their contents are structurally consumed) */
  private def decode(r: Reader): V = {
    val t = r.u8()
    t match {
      case x if x <= 0x7f => VLong(x.toLong)                 // positive fixint
      case x if x >= 0xe0 => VLong((x - 256).toLong)         // negative fixint
      case x if x >= 0x80 && x <= 0x8f => consumeMap(r, x - 0x80)
      case x if x >= 0x90 && x <= 0x9f => consumeArr(r, x - 0x90)
      case x if x >= 0xa0 && x <= 0xbf => VStr(str(r, x - 0xa0)) // fixstr
      case 0xc0 => VNil
      case 0xc2 => VBool(false)
      case 0xc3 => VBool(true)
      case 0xc4 => VBin(r.bytes(r.u8()))
      case 0xc5 => VBin(r.bytes(r.u16()))
      case 0xc6 => VBin(r.bytes(r.u32().toInt))
      case 0xca => VDouble(java.lang.Float.intBitsToFloat(r.u32().toInt).toDouble)
      case 0xcb => VDouble(java.lang.Double.longBitsToDouble(r.u64()))
      case 0xcc => VLong(r.u8().toLong)
      case 0xcd => VLong(r.u16().toLong)
      case 0xce => VLong(r.u32())
      case 0xcf => VULong(r.u64())
      case 0xd0 => VLong(r.u8().toByte.toLong)
      case 0xd1 => VLong(r.u16().toShort.toLong)
      case 0xd2 => VLong(r.u32().toInt.toLong)
      case 0xd3 => VLong(r.u64())
      case 0xd9 => VStr(str(r, r.u8()))
      case 0xda => VStr(str(r, r.u16()))
      case 0xdb => VStr(str(r, r.u32().toInt))
      case 0xdc => consumeArr(r, r.u16())
      case 0xdd => consumeArr(r, r.u32().toInt)
      case 0xde => consumeMap(r, r.u16())
      case 0xdf => consumeMap(r, r.u32().toInt)
      case other =>
        throw new IllegalArgumentException(f"unsupported msgpack byte 0x$other%02x")
    }
  }

  private def consumeMap(r: Reader, n: Int): V = {
    var i = 0
    while (i < n) { skip(r); skip(r); i += 1 }
    VComposite
  }
  private def consumeArr(r: Reader, n: Int): V = {
    var i = 0
    while (i < n) { skip(r); i += 1 }
    VComposite
  }

  /** Navigate `parts` through nested maps; always consumes EXACTLY one
    * value from the reader (whatever it is), so callers' stream positions
    * stay aligned. First matching key wins (json_extract semantics). */
  private def find(r: Reader, parts: Array[String], depth: Int): Option[V] = {
    val p = r.peek
    val isMap = (p >= 0x80 && p <= 0x8f) || p == 0xde || p == 0xdf
    if (!isMap) { skip(r); return None } // path steps into a non-map
    val t = r.u8()
    val n = t match {
      case x if x >= 0x80 && x <= 0x8f => x - 0x80
      case 0xde => r.u16()
      case _ => r.u32().toInt
    }
    var i = 0
    var res: Option[V] = None
    while (i < n) {
      val key = decode(r) match {
        case VStr(s) => s
        case _ => null // non-string key: value still must be consumed
      }
      if (res.isEmpty && key != null && key == parts(depth)) {
        if (depth == parts.length - 1) res = Some(decode(r))
        else res = find(r, parts, depth + 1).orElse(Some(VNil)) // consumed
      } else skip(r)
      i += 1
    }
    res
  }

  /** one dotted-path extraction over a top-level map payload */
  def extract(payload: Array[Byte], path: String): UTF8String = {
    val r = new Reader(payload)
    find(r, path.split('.'), 0) match {
      case None | Some(VNil) | Some(VComposite) => null
      case Some(VBool(v)) => UTF8String.fromString(if (v) "true" else "false")
      case Some(VLong(v)) => UTF8String.fromString(java.lang.Long.toString(v))
      case Some(VULong(v)) =>
        UTF8String.fromString(java.lang.Long.toUnsignedString(v))
      case Some(VDouble(v)) => UTF8String.fromString(java.lang.Double.toString(v))
      case Some(VStr(v)) => UTF8String.fromString(v)
      case Some(VBin(v)) => UTF8String.fromBytes(v) // utf-8 attempt
    }
  }

  // ---------- encoder (fixture manufacture / tests only) ----------

  def writeValue(out: java.io.ByteArrayOutputStream, v: Any): Unit = v match {
    case null => out.write(0xc0)
    case b: Boolean => out.write(if (b) 0xc3 else 0xc2)
    case i: Int => writeLong(out, i.toLong)
    case l: Long => writeLong(out, l)
    case d: Double =>
      out.write(0xcb)
      writeU64(out, java.lang.Double.doubleToLongBits(d))
    case f: Float =>
      out.write(0xca)
      writeU32(out, java.lang.Float.floatToIntBits(f))
    case s: String =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (b.length <= 31) out.write(0xa0 | b.length)
      else if (b.length <= 0xFF) { out.write(0xd9); out.write(b.length) }
      else { out.write(0xda); writeU16(out, b.length) }
      out.write(b, 0, b.length)
    case bytes: Array[Byte] =>
      if (bytes.length <= 0xFF) { out.write(0xc4); out.write(bytes.length) }
      else { out.write(0xc5); writeU16(out, bytes.length) }
      out.write(bytes, 0, bytes.length)
    case m: Seq[(String, Any) @unchecked] =>
      if (m.length <= 15) out.write(0x80 | m.length)
      else { out.write(0xde); writeU16(out, m.length) }
      m.foreach { case (k, mv) => writeValue(out, k); writeValue(out, mv) }
    case arr: Array[Any] =>
      if (arr.length <= 15) out.write(0x90 | arr.length)
      else { out.write(0xdc); writeU16(out, arr.length) }
      arr.foreach(writeValue(out, _))
    case other =>
      throw new IllegalArgumentException(s"unsupported msgpack value $other")
  }

  private def writeLong(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    if (v >= 0 && v <= 0x7f) out.write(v.toInt)
    else if (v < 0 && v >= -32) out.write((v & 0xFF).toInt)
    else if (v >= Byte.MinValue && v <= Byte.MaxValue) {
      out.write(0xd0); out.write((v & 0xFF).toInt)
    } else if (v >= Short.MinValue && v <= Short.MaxValue) {
      out.write(0xd1); writeU16(out, v.toInt)
    } else if (v >= Int.MinValue && v <= Int.MaxValue) {
      out.write(0xd2); writeU32(out, v.toInt)
    } else { out.write(0xd3); writeU64(out, v) }
  }
  private def writeU16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
  }
  private def writeU32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    writeU16(out, v >>> 16); writeU16(out, v & 0xFFFF)
  }
  private def writeU64(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    writeU32(out, (v >>> 32).toInt); writeU32(out, (v & 0xFFFFFFFFL).toInt)
  }

  /** encode a Catalyst struct as a msgpack map (field name → value);
    * null fields encode as nil, nested structs as nested maps, arrays of
    * strings as msgpack arrays */
  def encodeStruct(row: InternalRow, schema: StructType): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeStruct(out, row, schema)
    out.toByteArray
  }

  private def writeStruct(out: java.io.ByteArrayOutputStream, row: InternalRow,
                          schema: StructType): Unit = {
    val n = schema.fields.length
    if (n <= 15) out.write(0x80 | n)
    else { out.write(0xde); writeU16(out, n) }
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      writeValue(out, f.name)
      if (row.isNullAt(i)) out.write(0xc0)
      else f.dataType match {
        case StringType => writeValue(out, row.getUTF8String(i).toString)
        case LongType => writeValue(out, row.getLong(i))
        case IntegerType => writeValue(out, row.getInt(i))
        case DoubleType => writeValue(out, row.getDouble(i))
        case FloatType => writeValue(out, row.getFloat(i))
        case BooleanType => writeValue(out, row.getBoolean(i))
        case BinaryType => writeValue(out, row.getBinary(i))
        case st: StructType => writeStruct(out, row.getStruct(i, st.size), st)
        case ArrayType(StringType, _) =>
          val a: ArrayData = row.getArray(i)
          val vals = new Array[Any](a.numElements())
          (0 until a.numElements()).foreach(j =>
            vals(j) = a.getUTF8String(j).toString)
          writeValue(out, vals)
        case other =>
          throw new IllegalArgumentException(s"unsupported struct field $other")
      }
    }
  }
}

/** one extracted path as a STRING column (stringly json_extract semantics) */
final case class MsgPackExtractExpression(child: Expression, path: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "msgpack_extract"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override def nullSafeEval(input: Any): Any =
    try MsgPack.extract(input.asInstanceOf[Array[Byte]], path)
    catch { case _: Exception => null }

  /** Static call into the same [[MsgPack.extract]] as eval — corrupt payload
    * or missing path → NULL, and the expression stays codegen'd. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("msgpackPath", path, "java.lang.String")
    nullSafeCodeGen(ctx, ev, input => s"""
      |try {
      |  ${ev.value} = graft.wire.MsgPack.extract($input, $p);
      |} catch (java.lang.Exception e) {
      |  ${ev.value} = null;
      |}
      |${ev.isNull} = (${ev.value} == null);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** struct → msgpack map bytes (fixture manufacture / tests) */
final case class MsgPackEncodeExpression(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "msgpack_encode"

  override def nullSafeEval(input: Any): Any =
    MsgPack.encodeStruct(input.asInstanceOf[InternalRow],
      child.dataType.asInstanceOf[StructType])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val st = ctx.addReferenceObj("msgpackSchema",
      child.dataType.asInstanceOf[StructType],
      classOf[StructType].getName)
    defineCodeGen(ctx, ev, input =>
      s"graft.wire.MsgPack.encodeStruct($input, $st)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MsgPackDecode {
  def extract(payload: Column, path: String): Column =
    GraftSql.column(
      MsgPackExtractExpression(GraftSql.expression(payload), path))
  def encode(struct: Column): Column =
    GraftSql.column(MsgPackEncodeExpression(GraftSql.expression(struct)))
}
