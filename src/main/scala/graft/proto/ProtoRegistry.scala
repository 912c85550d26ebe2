package graft.proto

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types._

/** Schema-registry framed protobuf — the protobuf sibling of
  * [[graft.avro.AvroRegistry]], covering the reference roadmap's registry
  * integration bullet (/root/reference/docs/GUIDE.md:474-477) for its other
  * first-class wire format.
  *
  * Wire framing is the PUBLIC Confluent protobuf format: one 0x00 magic
  * byte, a 4-byte big-endian schema id, then a MESSAGE-INDEX list (zigzag
  * varints: count, then one index per nesting level, navigating the .proto
  * file's declaration-order message tree), then the protobuf body. The
  * common indexes `[0]` (first top-level message) are optimized to the
  * single byte 0x00 — count 0 means "default [0]".
  *
  * Resolution semantics differ from Avro BY DESIGN, and the difference is
  * protobuf's: an Avro body is unreadable without its writer schema, so the
  * registry id drives Avro schema resolution; a protobuf body is
  * self-framing per field number, so cross-version reads (added fields
  * skipped, missing fields defaulted) are what the wire format itself
  * prescribes — decoding with the READER schema is the correct resolution.
  * The registry header is therefore used for what it can actually assert:
  *   - unknown schema id       → loud error (CONFIGURATION: the id was
  *     valid at publish time, so a miss means this consumer's resolver is
  *     wrong; silently nulling whole schema generations would be data loss)
  *   - message-index path resolving to a DIFFERENT message name than the
  *     query declared → NULL row (DATA: streams can carry several message
  *     types; rows of other types are simply not ours)
  *   - a writer schema whose shared field NUMBERS use different wire
  *     encodings than the reader's → loud error (CONFIGURATION: the two
  *     schemas disagree about the wire, reader-side decode would produce
  *     garbage, not nulls)
  *   - mis-framed / truncated / corrupt payload → NULL row (DATA, the same
  *     policy as every other decode path)
  */
object ProtoRegistry {
  /** id → .proto source text of the writer schema (inline source — imports
    * are a bind-time error, same constraint as [[ProtoSchema.parse]]). */
  type Resolver = Int => Option[String]

  private val resolvers =
    new scala.collection.concurrent.TrieMap[String, Resolver]()

  def register(name: String, r: Resolver): Unit = { resolvers.put(name, r); () }

  def resolve(name: String, id: Int): Option[String] =
    resolvers.get(name) match {
      case Some(r) => r(id)
      case None => throw new IllegalArgumentException(
        s"Failed to decode protobuf registry payload: no schema resolver " +
          s"registered under '$name'")
    }

  def clear(): Unit = resolvers.clear()

  /** Registry frame header: magic + int32 BE id + zigzag-varint message
    * indexes (count then values; `[0]` collapses to the single byte 0). */
  def header(id: Int, indexes: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x00)
    out.write((id >>> 24) & 0xFF); out.write((id >>> 16) & 0xFF)
    out.write((id >>> 8) & 0xFF); out.write(id & 0xFF)
    if (indexes == Seq(0)) out.write(0x00)
    else {
      writeZigZagVarint(out, indexes.length)
      indexes.foreach(writeZigZagVarint(out, _))
    }
    out.toByteArray
  }

  private def writeZigZagVarint(out: java.io.ByteArrayOutputStream,
                                n: Int): Unit = {
    var v = ((n << 1) ^ (n >> 31)).toLong & 0xFFFFFFFFL
    while ((v & ~0x7FL) != 0) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v = v >>> 7
    }
    out.write((v & 0x7F).toInt)
  }

  /** Registry-framed decode: header-validated, id-resolved, reader-shaped.
    * `reader` declares the relational output (and the expected message
    * name); `resolverName` indexes a resolver registered via [[register]]. */
  def decodeRegistry(payload: Column, reader: MessageDef,
                     resolverName: String): Column =
    GraftSql.column(ProtoRegistryDecodeExpression(
      GraftSql.expression(payload), reader, resolverName))

  /** Frame bytes for a struct under a given writer schema/id/indexes — the
    * fixture/publisher direction. */
  def encodeRegistry(struct: Column, writer: MessageDef, id: Int,
                     indexes: Seq[Int] = Seq(0)): Column =
    org.apache.spark.sql.functions.concat(
      org.apache.spark.sql.functions.lit(header(id, indexes)),
      ProtoDecode.encode(struct, writer))
}

/** Registry-framed protobuf decode expression. Per-id writer schemas parse
  * once per task and cache (`schemasById`); the per-(id, message) wire
  * compatibility verdict caches alongside, so steady-state rows pay one
  * header parse + one body decode. */
final case class ProtoRegistryDecodeExpression(child: Expression,
                                               reader: MessageDef,
                                               resolverName: String)
    extends UnaryExpression with ImplicitCastInputTypes {

  @transient private lazy val schemasById =
    new java.util.HashMap[Int, (Map[String, MessageDef], IndexedSeq[MsgNode])]()
  @transient private lazy val compatOk =
    new java.util.HashSet[Int]() // ids whose resolved writer passed compat

  override def dataType: DataType = reader.sparkSchema
  override def nullable: Boolean = true
  override def prettyName: String = "proto_registry_decode"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  /** One row's decode — shared by eval and generated code. Null = DATA
    * (mis-framed header, foreign message type, corrupt body); unresolvable
    * id / wire-incompatible writer stay loud CONFIGURATION errors. */
  def decodeRow(bytes: Array[Byte]): InternalRow = {
    if (bytes.length < 6 || bytes(0) != 0x00) return null // mis-framed = data
    val id = ((bytes(1) & 0xFF) << 24) | ((bytes(2) & 0xFF) << 16) |
      ((bytes(3) & 0xFF) << 8) | (bytes(4) & 0xFF)
    // message-index list: zigzag varints, count 0 ⇒ default [0]
    var pos = 5
    var count = 0
    try {
      val (c, p) = ProtoWire.readVarint(bytes, pos)
      count = ProtoWire.zigzag32(c); pos = p
    } catch { case _: Exception => return null }
    if (count < 0 || count > 128) return null // absurd nesting = mis-framing
    val indexes = new Array[Int](math.max(count, 1))
    if (count == 0) indexes(0) = 0
    else {
      var i = 0
      while (i < count) {
        try {
          val (v, p) = ProtoWire.readVarint(bytes, pos)
          indexes(i) = ProtoWire.zigzag32(v); pos = p
        } catch { case _: Exception => return null }
        if (indexes(i) < 0) return null
        i += 1
      }
    }
    // resolve the writer schema (cached per id; unknown id is loud)
    var schema = schemasById.get(id)
    if (schema == null) {
      val src = ProtoRegistry.resolve(resolverName, id).getOrElse(
        throw new IllegalArgumentException(
          s"Failed to decode protobuf registry payload: unknown schema " +
            s"id $id (resolver '$resolverName')"))
      schema = ProtoSchema.parseWithTree(src)
      schemasById.put(id, schema)
    }
    // navigate the declaration-order tree by the message indexes
    var level: IndexedSeq[MsgNode] = schema._2
    var node: MsgNode = null
    var d = 0
    val n = math.max(count, 1)
    while (d < n) {
      val idx = indexes(d)
      if (idx >= level.length) return null // out-of-range index = data
      node = level(idx)
      level = node.children
      d += 1
    }
    // a different message type on the stream is data we don't read
    if (node.name != reader.name) return null
    // one-time wire-compatibility check of writer vs reader field numbers.
    // RECURSIVE: a message-typed field is LenDelim on both sides at the top
    // level, so the documented "schemas disagree about the wire → loud
    // error" guarantee requires descending into shared message-typed fields
    // and comparing THEIR field encodings too (ADVICE round 12). A visited
    // set breaks mutually-recursive message pairs.
    if (!compatOk.contains(id)) {
      val writer = schema._1(node.name)
      val visited = scala.collection.mutable.Set.empty[(String, String)]
      def check(r: MessageDef, w: MessageDef, path: String): Unit = {
        if (!visited.add((r.name, w.name))) return
        r.fields.foreach { rf =>
          w.fields.find(_.number == rf.number).foreach { wf =>
            if (wf.enc != rf.enc)
              throw new IllegalArgumentException(
                s"Failed to decode protobuf registry payload: schema id $id " +
                  s"field ${rf.number} ('$path${rf.name}') uses wire " +
                  s"encoding ${wf.enc} but the reader schema declares " +
                  s"${rf.enc} — the schemas disagree about the wire format")
            (rf.ptype, wf.ptype) match {
              case (PType.PMessage(rm), PType.PMessage(wm)) =>
                check(rm, wm, s"$path${rf.name}.")
              case _ => () // scalar-vs-message mismatch is already an enc
                           // mismatch unless both are LenDelim (string vs
                           // message) — that decodes to NULL as data, the
                           // standard proto3 cross-version behavior
            }
          }
        }
      }
      check(reader, writer, "")
      compatOk.add(id)
    }
    // reader-shaped body decode: proto3's own cross-version semantics
    // (unknown field numbers skipped, absent scalars defaulted)
    try ProtoWire.decodeMessage(bytes, pos, bytes.length, reader)
    catch { case _: Exception => null } // corrupt body = data
  }

  override def nullSafeEval(input: Any): Any =
    decodeRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("protoRegistryDecoder", this,
      classOf[ProtoRegistryDecodeExpression].getName)
    nullSafeCodeGen(ctx, ev, input => s"""
      |${ev.value} = $self.decodeRow($input);
      |${ev.isNull} = (${ev.value} == null);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
