package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String
import graft.proto.{ProtoDecodeExpression, ProtoEncodeExpression, ProtoSchema}

/** Session-extension registration — the Spark analog of the reference's
  * `LOAD nats_js` extension entry point
  * (/root/reference/src/nats_js_extension.cpp:7-10, :25-28): installing the
  * extension makes the engine's custom functions available from plain SQL.
  *
  * Usage:
  *   spark.sql.extensions=graft.plans.GraftExtensions   (config), or
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *
  * Registered SQL functions:
  *   proto_decode(payload BINARY, proto_file STRING, message STRING) → STRUCT
  *   proto_encode(struct, proto_file STRING, message STRING) → BINARY
  *
  * The .proto file is parsed once at PLAN time (arguments 2-3 must be
  * literals, like the reference's bind-time schema import,
  * /root/reference/src/nats_scan.cpp:287-363) — per-row work is only the
  * wire-format codec.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litString(e: Expression, arg: String): String = e match {
    case Literal(s: UTF8String, _) => s.toString
    case other => throw new IllegalArgumentException(
      s"$arg must be a string literal (bind-time schema import), got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("proto_decode"),
      new ExpressionInfo(classOf[ProtoDecodeExpression].getName, "proto_decode"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "proto_decode(payload, proto_file, message_name) takes 3 arguments")
        val schema = ProtoSchema.parseFile(
          litString(args(1), "proto_file"), litString(args(2), "message_name"))
        ProtoDecodeExpression(args.head, schema)
      }))

    ext.injectFunction((
      new FunctionIdentifier("proto_encode"),
      new ExpressionInfo(classOf[ProtoEncodeExpression].getName, "proto_encode"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "proto_encode(struct, proto_file, message_name) takes 3 arguments")
        val schema = ProtoSchema.parseFile(
          litString(args(1), "proto_file"), litString(args(2), "message_name"))
        ProtoEncodeExpression(args.head, schema)
      }))
  }
}
