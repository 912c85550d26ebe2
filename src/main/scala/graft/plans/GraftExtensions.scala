package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.Similarity
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
  *   cosine_sim(a ARRAY, b ARRAY) → DOUBLE     (sequential-fold semantics)
  *   lsh_bucket(vec ARRAY, n_bits INT, dim INT) → BIGINT (plan-time signs)
  *   graft_hash60(s STRING) → BIGINT           (deterministic 60-bit md5)
  *
  * The similarity functions expand to the same built-in expression trees the
  * DataFrame builders produce (graft.functions.Similarity) — whole-stage
  * codegen applies, and SQL results are bit-identical to the Column API.
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

    def litInt(e: Expression, arg: String): Int = e match {
      case Literal(i: Int, _) => i
      case other => throw new IllegalArgumentException(
        s"$arg must be an integer literal, got $other")
    }

    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(Similarity.getClass.getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim(a, b) takes 2 arguments")
        GraftSql.resolvedExpression(
          Similarity.cosine(GraftSql.column(args(0)), GraftSql.column(args(1))))
      }))

    ext.injectFunction((
      new FunctionIdentifier("lsh_bucket"),
      new ExpressionInfo(Similarity.getClass.getName, "lsh_bucket"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "lsh_bucket(vec, n_bits, dim) takes 3 arguments")
        GraftSql.resolvedExpression(Similarity.lshBucket(GraftSql.column(args(0)),
          litInt(args(1), "n_bits"), litInt(args(2), "dim")))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_hash60"),
      new ExpressionInfo(Similarity.getClass.getName, "graft_hash60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_hash60(s) takes 1 argument")
        GraftSql.resolvedExpression(Similarity.hash60(GraftSql.column(args(0))))
      }))

    // THE reference API: `FROM nats_scan('stream', 'url', 'nats://…', …)`
    // (/root/reference/src/nats_scan.cpp:844-857 registers the DuckDB table
    // function; docs/GUIDE.md's every example query starts there). The TVF
    // resolves to the SAME DataSource-V2 relation `spark.read
    // .format("nats_scan")` builds — one bind path, one option grammar,
    // full pushdown (seq/ts/subject filters, column pruning) because the
    // analyzer sees a plain DSv2 relation. Options follow the scan option
    // vocabulary as ('key', 'value') literal pairs after the stream name —
    // bind-time literals, exactly like the reference's named parameters.
    ext.injectTableFunction((
      new FunctionIdentifier("nats_scan"),
      new ExpressionInfo(classOf[graft.sources.NatsScanSource].getName,
        "nats_scan"),
      (args: Seq[Expression]) => {
        // options arrive either as ('key', 'value') literal pairs (the
        // positional form) or as SQL named arguments (`dir => '…'` — the
        // reference's named-parameter style); both may mix after the
        // positional stream name. Named-argument values are TYPED like the
        // reference's named parameters (nats_scan.cpp:849-857): UBIGINT
        // seq bounds, TIMESTAMP time bounds, LIST(VARCHAR) extraction
        // paths — any atomic literal converts to its option-string form,
        // `array('a', 'b')` of string literals carries the extract lists.
        import org.apache.spark.sql.catalyst.expressions.{CreateArray, NamedArgumentExpression}
        import org.apache.spark.sql.types._
        // scalar literal → the option grammar's string form
        def litScalar(e: Expression, arg: String): String = e match {
          case Literal(s: UTF8String, StringType) => s.toString
          case Literal(v, ByteType | ShortType | IntegerType | LongType) =>
            v.toString
          case Literal(v, BooleanType) => v.toString
          case Literal(micros: Long, TimestampType) =>
            // TimestampType literal micros ARE UTC epoch micros → the
            // ISO-instant string start_time/end_time parse with Instant.parse
            java.time.Instant.EPOCH
              .plus(micros, java.time.temporal.ChronoUnit.MICROS).toString
          case Literal(micros: Long, TimestampNTZType) =>
            // NTZ micros are WALL-CLOCK (zoneless): resolve them in the
            // session timezone, not as UTC epoch micros — TIMESTAMP_NTZ
            // '2024-01-02 00:00' under Asia/Tokyo is 2024-01-01T15:00Z
            val zone = java.time.ZoneId.of(
              org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
            java.time.LocalDateTime.ofEpochSecond(
              Math.floorDiv(micros, 1000000L),
              (Math.floorMod(micros, 1000000L) * 1000L).toInt,
              java.time.ZoneOffset.UTC).atZone(zone).toInstant.toString
          case other => throw new IllegalArgumentException(
            s"$arg must be a string/integer/timestamp literal (bind-time " +
              s"parameter, like the reference's named parameters), got $other")
        }
        def litStringList(e: Expression, arg: String): Seq[String] = e match {
          case CreateArray(children, _) =>
            children.map(c => litString(c, s"$arg element"))
          case Literal(s: UTF8String, StringType) => Seq(s.toString)
          case other => throw new IllegalArgumentException(
            s"$arg must be array(...) of string literals, got $other")
        }
        val ListOpts = Set("json_extract", "proto_extract", "avro_extract",
          "msgpack_extract", "cbor_extract")
        val (named, positional) = args.partition(_.isInstanceOf[NamedArgumentExpression])
        require(positional.nonEmpty && positional.length % 2 == 1,
          "nats_scan('stream'[, 'key', 'value']..., [key => value]...) " +
            "takes a stream name, then option key/value pairs (all string " +
            "literals) and/or named arguments")
        val strs = positional.zipWithIndex.map { case (e, i) =>
          litString(e, if (i == 0) "stream" else s"argument ${i + 1}")
        }
        var lists = Map.empty[String, Seq[String]]
        val pairOpts = strs.tail.grouped(2).map { case Seq(k, v) => k -> v }.toMap
        // list-valued options in the positional string-pair form carry their
        // paths comma-separated ('json_extract', 'a,b') — route them into the
        // extraction lists, same as the named array(...) form
        pairOpts.foreach { case (k, v) =>
          if (ListOpts(k))
            lists += k -> v.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        }
        val opts = pairOpts.filter { case (k, _) => !ListOpts(k) } ++
          named.flatMap { case NamedArgumentExpression(key, value) =>
            if (ListOpts(key)) {
              require(!lists.contains(key),
                s"nats_scan: option '$key' given both as a positional pair " +
                  "and a named argument")
              lists += key -> litStringList(value, s"named argument '$key'")
              None
            } else {
              require(!pairOpts.contains(key),
                s"nats_scan: option '$key' given both as a positional pair " +
                  "and a named argument")
              Some(key -> litScalar(value, s"named argument '$key'"))
            }
          }
        val spark = org.apache.spark.sql.SparkSession.active
        val base = spark.read.format("nats_scan")
          .options(opts + ("stream" -> strs.head)).load()
        // the reference TVF's bind-time parameters: validate the full
        // option set with the facade's bind rules, apply its range/subject
        // predicates (they reach the scan as pushed Catalyst filters —
        // same row-group pruning WHERE clauses get) and its extraction
        // chain — over the DSv2 relation, one semantics for both APIs
        val nOpts = graft.nats.NatsScanOptions(
          subjectContains = opts.get("subject"),
          startSeq = opts.get("start_seq").map(_.toLong),
          endSeq = opts.get("end_seq").map(_.toLong),
          startTime = opts.get("start_time").map(java.time.Instant.parse),
          endTime = opts.get("end_time").map(java.time.Instant.parse),
          jsonExtract = lists.getOrElse("json_extract", Nil),
          protoFile = opts.get("proto_file"),
          protoMessage = opts.get("proto_message"),
          protoExtract = lists.getOrElse("proto_extract", Nil),
          protoRegistry = opts.get("proto_registry"),
          avroFile = opts.get("avro_file"),
          avroExtract = lists.getOrElse("avro_extract", Nil),
          avroRegistry = opts.get("avro_registry"),
          msgpackExtract = lists.getOrElse("msgpack_extract", Nil),
          cborExtract = lists.getOrElse("cbor_extract", Nil),
          jsonNumbersToString =
            opts.get("json_numbers_to_string").exists(_.toBoolean))
        nOpts.validate()
        GraftSql.logicalPlan(graft.nats.NatsScan.applyExtractions(
          graft.nats.NatsScan.applyPredicates(base, nOpts), nOpts))
      }))

    // object-store TVF: `FROM nats_obj('bucket', 'url', 'nats://…', …)` —
    // the SQL face of the bucket scan, resolving to the SAME DSv2 relation
    // `spark.read.format("nats_obj")` builds (current-state read; name
    // pushdown and meta-only pruning apply because the analyzer sees a
    // plain batch relation). Same mixed positional-pair / named-argument
    // grammar as the nats_scan TVF; the watch is a streaming surface and
    // stays with readStream.
    ext.injectTableFunction((
      new FunctionIdentifier("nats_obj"),
      new ExpressionInfo(classOf[graft.sources.ObjectStoreSource].getName,
        "nats_obj"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.NamedArgumentExpression
        import org.apache.spark.sql.types._
        def litScalar(e: Expression, arg: String): String = e match {
          case Literal(s: UTF8String, StringType) => s.toString
          case Literal(v, ByteType | ShortType | IntegerType | LongType) =>
            v.toString
          case Literal(v, BooleanType) => v.toString
          case other => throw new IllegalArgumentException(
            s"$arg must be a string/integer/boolean literal (bind-time " +
              s"parameter), got $other")
        }
        val (named, positional) = args.partition(_.isInstanceOf[NamedArgumentExpression])
        require(positional.nonEmpty && positional.length % 2 == 1,
          "nats_obj('bucket'[, 'key', 'value']..., [key => value]...) " +
            "takes a bucket name, then option key/value pairs (string " +
            "literals) and/or named arguments")
        val strs = positional.zipWithIndex.map { case (e, i) =>
          litString(e, if (i == 0) "bucket" else s"argument ${i + 1}")
        }
        val pairOpts = strs.tail.grouped(2).map { case Seq(k, v) => k -> v }.toMap
        val opts = pairOpts ++
          named.map { case NamedArgumentExpression(key, value) =>
            require(!pairOpts.contains(key),
              s"nats_obj: option '$key' given both as a positional pair " +
                "and a named argument")
            key -> litScalar(value, s"named argument '$key'")
          }
        val spark = org.apache.spark.sql.SparkSession.active
        GraftSql.logicalPlan(spark.read.format("nats_obj")
          .options(opts + ("bucket" -> strs.head)).load())
      }))

    // KV TVF: `FROM nats_kv('bucket', 'url', …)` — current-state scan as
    // the same DSv2 relation `format("nats_kv")` builds (key =/IN/prefix
    // pushdown included); grammar identical to the other two TVFs
    ext.injectTableFunction((
      new FunctionIdentifier("nats_kv"),
      new ExpressionInfo(classOf[graft.sources.KvStoreSource].getName,
        "nats_kv"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.NamedArgumentExpression
        import org.apache.spark.sql.types._
        def litScalar(e: Expression, arg: String): String = e match {
          case Literal(s: UTF8String, StringType) => s.toString
          case Literal(v, ByteType | ShortType | IntegerType | LongType) =>
            v.toString
          case Literal(v, BooleanType) => v.toString
          case other => throw new IllegalArgumentException(
            s"$arg must be a string/integer/boolean literal (bind-time " +
              s"parameter), got $other")
        }
        val (named, positional) = args.partition(_.isInstanceOf[NamedArgumentExpression])
        require(positional.nonEmpty && positional.length % 2 == 1,
          "nats_kv('bucket'[, 'key', 'value']..., [key => value]...) " +
            "takes a bucket name, then option key/value pairs (string " +
            "literals) and/or named arguments")
        val strs = positional.zipWithIndex.map { case (e, i) =>
          litString(e, if (i == 0) "bucket" else s"argument ${i + 1}")
        }
        val pairOpts = strs.tail.grouped(2).map { case Seq(k, v) => k -> v }.toMap
        val opts = pairOpts ++
          named.map { case NamedArgumentExpression(key, value) =>
            require(!pairOpts.contains(key),
              s"nats_kv: option '$key' given both as a positional pair " +
                "and a named argument")
            key -> litScalar(value, s"named argument '$key'")
          }
        val spark = org.apache.spark.sql.SparkSession.active
        GraftSql.logicalPlan(spark.read.format("nats_kv")
          .options(opts + ("bucket" -> strs.head)).load())
      }))
  }
}
