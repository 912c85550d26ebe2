package graft.wire

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CBOR (RFC 8949) payload extraction — the last payload format of the
  * reference's roadmap (/root/reference/docs/GUIDE.md:472-475). Same
  * stringly surface as [[MsgPack]]: `cbor_extract` dotted paths over a
  * top-level map, one STRING column per path, missing key → NULL,
  * unparseable payload → NULL.
  *
  * Self-contained codec over the public spec: majors 0/1 (ints, all
  * widths), 2 (bytes), 3 (text), 4 (array), 5 (map), 6 (tags —
  * transparent: the tagged item decodes as itself), 7 (false/true/null/
  * undefined, float16/32/64). Definite lengths only; indefinite-length
  * items are rejected (→ NULL through the expression's error contract) —
  * streaming encoders that emit them are out of scope for single-record
  * message payloads.
  */
object Cbor {

  private final class Reader(b: Array[Byte]) {
    var pos = 0
    def peek: Int = b(pos) & 0xFF
    def u8(): Int = { val v = b(pos) & 0xFF; pos += 1; v }
    def u16(): Int = (u8() << 8) | u8()
    def u32(): Long = ((u16().toLong) << 16) | u16().toLong
    def u64(): Long = (u32() << 32) | u32()
    def bytes(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; out
    }
  }

  /** additional-info → unsigned argument (definite lengths only) */
  private def arg(r: Reader, ai: Int): Long = ai match {
    case x if x < 24 => x.toLong
    case 24 => r.u8().toLong
    case 25 => r.u16().toLong
    case 26 => r.u32()
    case 27 => r.u64()
    case 31 => throw new IllegalArgumentException("indefinite length unsupported")
    case other => throw new IllegalArgumentException(s"reserved additional info $other")
  }

  private sealed trait V
  private case object VNil extends V
  private final case class VBool(v: Boolean) extends V
  private final case class VLong(v: Long) extends V
  private final case class VULong(v: Long) extends V
  private final case class VDouble(v: Double) extends V
  private final case class VStr(v: String) extends V
  private final case class VBin(v: Array[Byte]) extends V
  private case object VComposite extends V

  private def skip(r: Reader): Unit = { decode(r); () }

  private def decode(r: Reader): V = {
    val ib = r.u8()
    val major = ib >>> 5
    val ai = ib & 0x1f
    major match {
      case 0 =>
        val v = arg(r, ai)
        if (ai == 27 && v < 0) VULong(v) else VLong(v) // 2^63..2^64-1 unsigned
      case 1 => VLong(-1L - arg(r, ai))
      case 2 => VBin(r.bytes(arg(r, ai).toInt))
      case 3 => VStr(new String(r.bytes(arg(r, ai).toInt),
        java.nio.charset.StandardCharsets.UTF_8))
      case 4 =>
        val n = arg(r, ai).toInt
        var i = 0
        while (i < n) { skip(r); i += 1 }
        VComposite
      case 5 =>
        val n = arg(r, ai).toInt
        var i = 0
        while (i < n) { skip(r); skip(r); i += 1 }
        VComposite
      case 6 => // tag: transparent — the tagged item is the value
        arg(r, ai)
        decode(r)
      case 7 => ai match {
        case 20 => VBool(false)
        case 21 => VBool(true)
        case 22 | 23 => VNil // null / undefined
        case 25 => VDouble(float16(r.u16()))
        case 26 => VDouble(java.lang.Float.intBitsToFloat(r.u32().toInt).toDouble)
        case 27 => VDouble(java.lang.Double.longBitsToDouble(r.u64()))
        case x if x < 20 => VLong(x.toLong) // simple values 0-19 as ints
        case 24 => VLong(r.u8().toLong)    // simple value 32-255
        case other =>
          throw new IllegalArgumentException(s"unsupported simple/float ai $other")
      }
      case other =>
        throw new IllegalArgumentException(s"bad major $other")
    }
  }

  /** IEEE 754 half-precision → double (RFC 8949 appendix D) */
  private def float16(h: Int): Double = {
    val exp = (h >> 10) & 0x1f
    val mant = h & 0x3ff
    val mag =
      if (exp == 0) math.pow(2, -24) * mant
      else if (exp != 31) math.pow(2, exp - 25) * (mant + 1024)
      else if (mant == 0) Double.PositiveInfinity
      else Double.NaN
    if ((h & 0x8000) != 0) -mag else mag
  }

  /** Navigate `parts` through nested maps; consumes exactly one value. */
  private def find(r: Reader, parts: Array[String], depth: Int): Option[V] = {
    val p = r.peek
    if ((p >>> 5) == 6) { // tags in the path are transparent
      val ib = r.u8(); arg(r, ib & 0x1f)
      return find(r, parts, depth)
    }
    if ((p >>> 5) != 5) { skip(r); return None } // not a map
    val ib = r.u8()
    val n = arg(r, ib & 0x1f).toInt
    var i = 0
    var res: Option[V] = None
    while (i < n) {
      val key = decode(r) match {
        case VStr(s) => s
        case _ => null
      }
      if (res.isEmpty && key != null && key == parts(depth)) {
        if (depth == parts.length - 1) res = Some(decode(r))
        else res = find(r, parts, depth + 1).orElse(Some(VNil))
      } else skip(r)
      i += 1
    }
    res
  }

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
      case Some(VBin(v)) => UTF8String.fromBytes(v)
    }
  }

  // ---------- encoder (fixture manufacture / tests only) ----------

  private def writeTypeArg(out: java.io.ByteArrayOutputStream, major: Int,
                           v: Long): Unit = {
    val m = major << 5
    if (v >= 0 && v < 24) out.write(m | v.toInt)
    else if (v >= 0 && v <= 0xFF) { out.write(m | 24); out.write(v.toInt) }
    else if (v >= 0 && v <= 0xFFFF) {
      out.write(m | 25); out.write((v >>> 8).toInt); out.write((v & 0xFF).toInt)
    } else if (v >= 0 && v <= 0xFFFFFFFFL) {
      out.write(m | 26)
      (3 to 0 by -1).foreach(i => out.write(((v >>> (8 * i)) & 0xFF).toInt))
    } else {
      out.write(m | 27)
      (7 to 0 by -1).foreach(i => out.write(((v >>> (8 * i)) & 0xFF).toInt))
    }
  }

  def writeValue(out: java.io.ByteArrayOutputStream, v: Any): Unit = v match {
    case null => out.write(0xf6)
    case b: Boolean => out.write(if (b) 0xf5 else 0xf4)
    case i: Int => writeLong(out, i.toLong)
    case l: Long => writeLong(out, l)
    case d: Double =>
      out.write(0xfb)
      val bits = java.lang.Double.doubleToLongBits(d)
      (7 to 0 by -1).foreach(i => out.write(((bits >>> (8 * i)) & 0xFF).toInt))
    case f: Float =>
      out.write(0xfa)
      val bits = java.lang.Float.floatToIntBits(f)
      (3 to 0 by -1).foreach(i => out.write(((bits >>> (8 * i)) & 0xFF).toInt))
    case s: String =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      writeTypeArg(out, 3, b.length.toLong)
      out.write(b, 0, b.length)
    case bytes: Array[Byte] =>
      writeTypeArg(out, 2, bytes.length.toLong)
      out.write(bytes, 0, bytes.length)
    case m: Seq[(String, Any) @unchecked] =>
      writeTypeArg(out, 5, m.length.toLong)
      m.foreach { case (k, mv) => writeValue(out, k); writeValue(out, mv) }
    case arr: Array[Any] =>
      writeTypeArg(out, 4, arr.length.toLong)
      arr.foreach(writeValue(out, _))
    case other =>
      throw new IllegalArgumentException(s"unsupported cbor value $other")
  }

  private def writeLong(out: java.io.ByteArrayOutputStream, v: Long): Unit =
    if (v >= 0) writeTypeArg(out, 0, v) else writeTypeArg(out, 1, -1L - v)

  def encodeStruct(row: InternalRow, schema: StructType): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeStruct(out, row, schema)
    out.toByteArray
  }

  private def writeStruct(out: java.io.ByteArrayOutputStream, row: InternalRow,
                          schema: StructType): Unit = {
    writeTypeArg(out, 5, schema.fields.length.toLong)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      writeValue(out, f.name)
      if (row.isNullAt(i)) out.write(0xf6)
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

final case class CborExtractExpression(child: Expression, path: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "cbor_extract"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override def nullSafeEval(input: Any): Any =
    try Cbor.extract(input.asInstanceOf[Array[Byte]], path)
    catch { case _: Exception => null }

  /** Static call into the same [[Cbor.extract]] as eval — corrupt payload
    * or missing path → NULL, and the expression stays codegen'd. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("cborPath", path, "java.lang.String")
    nullSafeCodeGen(ctx, ev, input => s"""
      |try {
      |  ${ev.value} = graft.wire.Cbor.extract($input, $p);
      |} catch (java.lang.Exception e) {
      |  ${ev.value} = null;
      |}
      |${ev.isNull} = (${ev.value} == null);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

final case class CborEncodeExpression(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "cbor_encode"

  override def nullSafeEval(input: Any): Any =
    Cbor.encodeStruct(input.asInstanceOf[InternalRow],
      child.dataType.asInstanceOf[StructType])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val st = ctx.addReferenceObj("cborSchema",
      child.dataType.asInstanceOf[StructType],
      classOf[StructType].getName)
    defineCodeGen(ctx, ev, input => s"graft.wire.Cbor.encodeStruct($input, $st)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CborDecode {
  def extract(payload: Column, path: String): Column =
    GraftSql.column(CborExtractExpression(GraftSql.expression(payload), path))
  def encode(struct: Column): Column =
    GraftSql.column(CborEncodeExpression(GraftSql.expression(struct)))
}
