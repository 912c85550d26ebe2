package graft.avro

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericFixed, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro single-record payload decode — the second wire format of the
  * reference's roadmap (/root/reference/docs/GUIDE.md:472-474), mirroring the
  * proto surface: schema from an `.avsc` file at bind time, a native
  * expression decoding each payload in one pass, dotted extraction paths
  * validated at bind.
  *
  * Payloads are RAW binary-encoded records (what a NATS publisher emits per
  * message), not Avro object-container files — there is no per-message
  * schema, which is why the scan takes the schema as an option. The parsing
  * itself delegates to avro-core (on every Spark classpath); this layer owns
  * the Spark type mapping and the Catalyst integration.
  *
  * Type mapping: string→String, bytes/fixed→Binary, int→Integer, long→Long
  * (logicalType timestamp-micros→Timestamp), float/double/boolean direct,
  * enum→String (symbol name, like the proto enum mapping), record→Struct,
  * array→Array, map→Map(String,·), union["null", T]→nullable T. Other unions
  * are rejected at bind time (no natural relational shape).
  */
object AvroCodec {

  def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG =>
      if (s.getLogicalType != null &&
          s.getLogicalType.getName == "timestamp-micros") TimestampType
      else LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.ENUM => StringType
    case Schema.Type.RECORD => StructType(s.getFields.asScala.toSeq.map(f =>
      StructField(f.name(), sparkType(f.schema()), nullable = true)))
    case Schema.Type.ARRAY =>
      ArrayType(sparkType(s.getElementType), containsNull = nullableUnion(s.getElementType).isDefined)
    case Schema.Type.MAP =>
      MapType(StringType, sparkType(s.getValueType),
        valueContainsNull = nullableUnion(s.getValueType).isDefined)
    case Schema.Type.UNION => nullableUnion(s) match {
      case Some(inner) => sparkType(inner)
      case None => throw new IllegalArgumentException(
        s"unsupported avro union ${s}: only [\"null\", T] unions map to a column")
    }
    case other => throw new IllegalArgumentException(s"unsupported avro type $other")
  }

  /** Some(branch) for a 2-branch ["null", T] union */
  def nullableUnion(s: Schema): Option[Schema] =
    if (s.getType != Schema.Type.UNION) None
    else {
      val ts = s.getTypes.asScala.toSeq
      if (ts.length == 2 && ts.exists(_.getType == Schema.Type.NULL))
        ts.find(_.getType != Schema.Type.NULL)
      else None
    }

  /** avro runtime value → Catalyst value (per the mapping above) */
  def toCatalyst(v: Any, s: Schema): Any = {
    if (v == null) return null
    s.getType match {
      case Schema.Type.UNION => toCatalyst(v, nullableUnion(s).getOrElse(
        throw new IllegalArgumentException(s"unsupported avro union $s")))
      case Schema.Type.STRING => UTF8String.fromString(v.toString)
      case Schema.Type.ENUM => UTF8String.fromString(v.toString)
      case Schema.Type.BYTES =>
        val bb = v.asInstanceOf[ByteBuffer]
        val out = new Array[Byte](bb.remaining())
        bb.duplicate().get(out)
        out
      case Schema.Type.FIXED => v.asInstanceOf[GenericFixed].bytes().clone()
      case Schema.Type.INT | Schema.Type.LONG | Schema.Type.FLOAT |
           Schema.Type.DOUBLE | Schema.Type.BOOLEAN => v
      case Schema.Type.RECORD =>
        val rec = v.asInstanceOf[GenericRecord]
        val fields = s.getFields.asScala.toSeq
        new GenericInternalRow(
          fields.map(f => toCatalyst(rec.get(f.pos()), f.schema())).toArray)
      case Schema.Type.ARRAY =>
        val items = v.asInstanceOf[java.util.List[Any]].asScala
        new GenericArrayData(items.map(toCatalyst(_, s.getElementType)).toArray)
      case Schema.Type.MAP =>
        val m = v.asInstanceOf[java.util.Map[Any, Any]].asScala.toSeq
        new ArrayBasedMapData(
          new GenericArrayData(m.map(e => UTF8String.fromString(e._1.toString)).toArray),
          new GenericArrayData(m.map(e => toCatalyst(e._2, s.getValueType)).toArray))
      case other => throw new IllegalArgumentException(s"unsupported avro type $other")
    }
  }

  /** Catalyst value → avro runtime value (fixture manufacture / tests) */
  def fromCatalyst(v: Any, s: Schema): Any = {
    if (v == null) return null
    s.getType match {
      case Schema.Type.UNION => fromCatalyst(v, nullableUnion(s).getOrElse(
        throw new IllegalArgumentException(s"unsupported avro union $s")))
      case Schema.Type.STRING => v.toString
      case Schema.Type.ENUM => new GenericData.EnumSymbol(s, v.toString)
      case Schema.Type.BYTES => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case Schema.Type.FIXED =>
        new GenericData.Fixed(s, v.asInstanceOf[Array[Byte]])
      case Schema.Type.INT | Schema.Type.LONG | Schema.Type.FLOAT |
           Schema.Type.DOUBLE | Schema.Type.BOOLEAN => v
      case Schema.Type.RECORD =>
        val row = v.asInstanceOf[InternalRow]
        val rec = new GenericData.Record(s)
        val fields = s.getFields.asScala.toSeq
        fields.zipWithIndex.foreach { case (f, i) =>
          val cv =
            if (row.isNullAt(i)) null
            else row.get(i, sparkType(f.schema()))
          rec.put(i, fromCatalyst(cv, f.schema()))
        }
        rec
      case Schema.Type.ARRAY =>
        val arr = v.asInstanceOf[ArrayData]
        val et = sparkType(s.getElementType)
        val out = new java.util.ArrayList[Any](arr.numElements())
        (0 until arr.numElements()).foreach { i =>
          out.add(fromCatalyst(
            if (arr.isNullAt(i)) null else arr.get(i, et), s.getElementType))
        }
        out
      case Schema.Type.MAP =>
        val m = v.asInstanceOf[MapData]
        val vt = sparkType(s.getValueType)
        val out = new java.util.LinkedHashMap[String, Any]()
        val ka = m.keyArray(); val va = m.valueArray()
        (0 until m.numElements()).foreach { i =>
          out.put(ka.getUTF8String(i).toString, fromCatalyst(
            if (va.isNullAt(i)) null else va.get(i, vt), s.getValueType))
        }
        out
      case other => throw new IllegalArgumentException(s"unsupported avro type $other")
    }
  }

  /** Navigate a dotted path through record schemas; bind-time errors match
    * the proto path's style. Returns the leaf field schema. */
  def resolve(schema: Schema, path: String): Schema = {
    var cur = schema
    var prev = "<root>"
    path.split('.').foreach { p =>
      val rec = nullableUnion(cur).getOrElse(cur)
      if (rec.getType != Schema.Type.RECORD)
        throw new IllegalArgumentException(
          s"Field '$prev' in path '$path' is not a record type")
      val f = Option(rec.getField(p)).getOrElse(
        throw new IllegalArgumentException(
          s"Field '$p' not found in record '${rec.getName}' (path '$path')"))
      cur = f.schema()
      prev = p
    }
    cur
  }
}

/** Decode a binary-encoded Avro record into a struct column. Unparseable
  * payload → NULL struct (same contract as the proto/JSON paths). */
final case class AvroDecodeExpression(child: Expression, schemaJson: String)
    extends UnaryExpression with ImplicitCastInputTypes {

  @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val reader =
    new GenericDatumReader[GenericRecord](schema)
  // decoder/record reuse across rows (the spark-avro pattern): expressions
  // are deserialized per task, so these are task-local, never shared.
  @transient private var decoder: org.apache.avro.io.BinaryDecoder = _
  @transient private var record: GenericRecord = _

  override def dataType: DataType = AvroCodec.sparkType(schema)
  override def nullable: Boolean = true
  override def prettyName: String = "avro_decode"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  /** One row's decode — shared verbatim by the interpreted path and the
    * generated code (which calls it through a reference object, keeping the
    * decoder/record reuse without boxing the input row). Null = corrupt. */
  def decodeRow(bytes: Array[Byte]): InternalRow =
    try {
      decoder = DecoderFactory.get().binaryDecoder(bytes, decoder)
      record = reader.read(record, decoder)
      // trailing garbage = not a clean single-record payload → NULL
      if (!decoder.isEnd) null
      else AvroCodec.toCatalyst(record, schema).asInstanceOf[InternalRow]
    } catch { case _: Exception => null }

  override def nullSafeEval(input: Any): Any =
    decodeRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("avroDecoder", this,
      classOf[AvroDecodeExpression].getName)
    nullSafeCodeGen(ctx, ev, input => s"""
      |${ev.value} = $self.decodeRow($input);
      |${ev.isNull} = (${ev.value} == null);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Inverse — encodes a struct to a single binary Avro record (fixture
  * manufacture and round-trip tests; the reference surface only reads). */
final case class AvroEncodeExpression(child: Expression, schemaJson: String)
    extends UnaryExpression with ImplicitCastInputTypes {

  @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val writer =
    new GenericDatumWriter[GenericRecord](schema)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "avro_encode"
  override def inputTypes: Seq[DataType] =
    Seq(AvroCodec.sparkType(schema))

  // stream/encoder reuse across rows (task-local, like the decode side)
  @transient private lazy val out = new java.io.ByteArrayOutputStream()
  @transient private var encoder: org.apache.avro.io.BinaryEncoder = _

  /** One row's encode — shared by eval and generated code. */
  def encodeRow(input: InternalRow): Array[Byte] = {
    val rec = AvroCodec.fromCatalyst(input, schema)
      .asInstanceOf[GenericRecord]
    out.reset()
    encoder = EncoderFactory.get().binaryEncoder(out, encoder)
    writer.write(rec, encoder)
    encoder.flush()
    out.toByteArray
  }

  override def nullSafeEval(input: Any): Any =
    encodeRow(input.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("avroEncoder", this,
      classOf[AvroEncodeExpression].getName)
    defineCodeGen(ctx, ev, input => s"$self.encodeRow($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Pluggable schema-id → writer-schema resolution for the REGISTRY wire
  * format (the public Confluent framing: one 0x00 magic byte, a 4-byte
  * big-endian schema id, then the Avro binary body). Resolvers register
  * process-wide under a NAME, and the decode expression ships only the
  * name — the same indirection a live cluster needs, where each executor
  * initializes a registry-client-backed resolver (with its own cache) at
  * JVM start and the task closure must not capture a connection. Tests
  * register a local map. */
object AvroRegistry {
  type Resolver = Int => Option[String]

  private val resolvers =
    new scala.collection.concurrent.TrieMap[String, Resolver]()

  def register(name: String, r: Resolver): Unit = { resolvers.put(name, r); () }

  /** id → writer schema JSON. Unknown resolver NAME is a configuration
    * error and throws; an id the resolver cannot answer returns None (the
    * caller decides — the decode expression makes it a loud error too,
    * since a registry id that was valid at publish time must resolve). */
  def resolve(name: String, id: Int): Option[String] =
    resolvers.get(name) match {
      case Some(r) => r(id)
      case None => throw new IllegalArgumentException(
        s"Failed to decode Avro registry payload: no schema resolver " +
          s"registered under '$name'")
    }

  def clear(): Unit = resolvers.clear()
}

/** Registry-framed Avro decode: validates the magic byte, resolves the
  * writer schema by id, and reads the body through Avro SCHEMA RESOLUTION
  * against the bind-time reader schema — so payloads written under several
  * schema versions (added fields, reordered fields) all decode to the one
  * relational shape the query declared. Per-id resolving readers are
  * cached task-locally.
  *
  * Failure surface: a mis-framed or corrupt payload is DATA → NULL row
  * (same policy as the JSON/proto decode paths); an UNRESOLVABLE id is
  * CONFIGURATION → loud error (the id was valid when published, so a miss
  * means this consumer's resolver is wrong — silently nulling entire
  * schema generations would be data loss). */
final case class AvroRegistryDecodeExpression(child: Expression,
                                              readerSchemaJson: String,
                                              resolverName: String)
    extends UnaryExpression with ImplicitCastInputTypes {

  @transient private lazy val readerSchema =
    new Schema.Parser().parse(readerSchemaJson)
  @transient private lazy val readersById =
    new java.util.HashMap[Int, GenericDatumReader[GenericRecord]]()
  @transient private var decoder: org.apache.avro.io.BinaryDecoder = _

  override def dataType: DataType = AvroCodec.sparkType(readerSchema)
  override def nullable: Boolean = true
  override def prettyName: String = "avro_registry_decode"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  /** One row's decode — shared by eval and generated code. Null = corrupt
    * DATA; unresolvable id stays a loud CONFIGURATION error. */
  def decodeRow(bytes: Array[Byte]): InternalRow = {
    if (bytes.length < 5 || bytes(0) != 0x00) return null // mis-framed = data
    val id = ((bytes(1) & 0xFF) << 24) | ((bytes(2) & 0xFF) << 16) |
      ((bytes(3) & 0xFF) << 8) | (bytes(4) & 0xFF)
    var reader = readersById.get(id)
    if (reader == null) {
      val writerJson = AvroRegistry.resolve(resolverName, id).getOrElse(
        throw new IllegalArgumentException(
          s"Failed to decode Avro registry payload: unknown schema id $id " +
            s"(resolver '$resolverName')"))
      reader = new GenericDatumReader[GenericRecord](
        new Schema.Parser().parse(writerJson), readerSchema)
      readersById.put(id, reader)
    }
    try {
      decoder = DecoderFactory.get()
        .binaryDecoder(bytes, 5, bytes.length - 5, decoder)
      val record = reader.read(null, decoder)
      if (!decoder.isEnd) null // trailing garbage = data
      else AvroCodec.toCatalyst(record, readerSchema).asInstanceOf[InternalRow]
    } catch {
      case e: IllegalArgumentException => throw e // unknown id stays loud
      case _: Exception => null                   // corrupt body = data
    }
  }

  override def nullSafeEval(input: Any): Any =
    decodeRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("avroRegistryDecoder", this,
      classOf[AvroRegistryDecodeExpression].getName)
    nullSafeCodeGen(ctx, ev, input => s"""
      |${ev.value} = $self.decodeRow($input);
      |${ev.isNull} = (${ev.value} == null);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AvroDecode {
  def schemaFromFile(path: String): String = {
    if (!java.nio.file.Files.isReadable(java.nio.file.Paths.get(path)))
      throw new IllegalArgumentException(
        s"Failed to read avro schema file: $path")
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  def decode(payload: Column, schemaJson: String): Column =
    GraftSql.column(
      AvroDecodeExpression(GraftSql.expression(payload), schemaJson))

  /** Registry-framed decode (0x00 + int32 BE id + body) with schema
    * resolution onto `readerSchemaJson`; `resolverName` indexes a resolver
    * registered via [[AvroRegistry.register]]. */
  def decodeRegistry(payload: Column, readerSchemaJson: String,
                     resolverName: String): Column =
    GraftSql.column(AvroRegistryDecodeExpression(
      GraftSql.expression(payload), readerSchemaJson, resolverName))

  /** Registry frame bytes for a struct: the fixture/publisher direction.
    * `concat` of the 5-byte header and the plain Avro body. */
  def encodeRegistry(struct: Column, writerSchemaJson: String,
                     id: Int): Column = {
    val header = Array[Byte](0x00,
      ((id >>> 24) & 0xFF).toByte, ((id >>> 16) & 0xFF).toByte,
      ((id >>> 8) & 0xFF).toByte, (id & 0xFF).toByte)
    org.apache.spark.sql.functions.concat(
      org.apache.spark.sql.functions.lit(header),
      encode(struct, writerSchemaJson))
  }

  def encode(struct: Column, schemaJson: String): Column =
    GraftSql.column(
      AvroEncodeExpression(GraftSql.expression(struct), schemaJson))

  /** Dotted field path on a decoded struct, bind-time validated. */
  def field(decoded: Column, schemaJson: String, path: String): Column = {
    AvroCodec.resolve(new Schema.Parser().parse(schemaJson), path) // throws
    path.split('.').foldLeft(decoded)((c, p) => c.getField(p))
  }
}
