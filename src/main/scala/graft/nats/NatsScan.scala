package graft.nats

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's entry point — Spark analog of the reference's single table
  * function `nats_scan` (/root/reference/src/nats_scan.cpp:879-897).
  *
  * Lifecycle mapping (SURVEY.md §3): option validation + schema resolution
  * here = the reference's bind step; the returned DataFrame is a declarative
  * logical plan, so Catalyst's predicate pushdown / column pruning replace the
  * reference's bind-time range parameters — range predicates land on the
  * parquet scan as PushedFilters and prune row groups via min/max stats, the
  * columnar equivalent of the reference's timestamp→seq binary search
  * (/root/reference/src/nats_scan.cpp:548-595).
  *
  * Semantics reproduced:
  *   - inclusive [start_seq, end_seq] (:703-707)
  *   - subject SUBSTRING match, not wildcard (:741-746)
  *   - json_extract: one STRING column per path, missing key → NULL; real
  *     nested dot-paths (documented superset of the reference's top-level-only
  *     implementation, SURVEY.md §1.3); payload becomes STRING (:379-385)
  *   - proto_extract: typed columns via wire-format decode, dots mangled to
  *     underscores (:396-399)
  */
object NatsScan {

  def scan(spark: SparkSession, stream: String,
           opts: NatsScanOptions = NatsScanOptions(),
           store: MessageStore): DataFrame = {
    opts.validate()
    def micros(i: java.time.Instant): Long =
      Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)
    // storage-level pruning bounds (stores translate to raw-column pushdown);
    // the envelope-level predicates below re-assert the same semantics
    val pruning = ScanPruning(opts.startSeq, opts.endSeq,
      opts.startTime.map(micros), opts.endTime.map(micros))
    applyExtractions(
      applyPredicates(store.read(spark, stream, pruning), opts), opts)
  }

  /** The envelope-level range + subject predicates of [[scan]] —
    * pushdown-friendly single filters, shared with the SQL table function
    * (whose DSv2 relation receives them as pushed Catalyst filters, the
    * same row-group pruning WHERE clauses get). */
  def applyPredicates(df: DataFrame, opts: NatsScanOptions): DataFrame = {
    val preds: Seq[Column] =
      opts.startSeq.map(s => col("seq") >= s).toSeq ++
      opts.endSeq.map(e => col("seq") <= e).toSeq ++
      opts.startTime.map(t => col("ts_nats") >= lit(t)).toSeq ++
      opts.endTime.map(t => col("ts_nats") <= lit(t)).toSeq ++
      opts.subjectContains.map(s => col("subject").contains(s)).toSeq
    if (preds.isEmpty) df else df.filter(preds.reduce(_ && _))
  }

  /** The payload-decode half of [[scan]]: the json/proto/avro/msgpack/cbor
    * extraction chain over any frame carrying the envelope's `payload`
    * column — shared by the facade scan and the SQL table function (which
    * applies it over the DataSource-V2 relation, keeping one extraction
    * semantics for both APIs). */
  def applyExtractions(df0: DataFrame, opts: NatsScanOptions): DataFrame = {
    var df = df0
    if (opts.jsonExtract.nonEmpty) {
      // payload polymorphism: STRING under json_extract
      df = df.withColumn("payload", col("payload").cast("string"))
      val extracted = opts.jsonExtract.map { path =>
        extractJson(path, opts.jsonNumbersToString).as(mangle(path))
      }
      df = df.select(df.columns.map(col).toIndexedSeq ++ extracted: _*)
    } else if (opts.protoExtract.nonEmpty) {
      val schema = graft.proto.ProtoSchema.parseFile(
        opts.protoFile.get, opts.protoMessage.get)
      // registry framing: per-payload header validated + writer resolved by
      // id; body decodes reader-shaped (protobuf's own version bridging)
      val decoded = opts.protoRegistry match {
        case Some(resolver) =>
          graft.proto.ProtoRegistry.decodeRegistry(col("payload"), schema, resolver)
        case None => graft.proto.ProtoDecode.decode(col("payload"), schema)
      }
      val extracted = opts.protoExtract.map { path =>
        graft.proto.ProtoDecode.field(decoded, schema, path).as(mangle(path))
      }
      df = df.select(df.columns.map(col).toIndexedSeq ++ extracted: _*)
    } else if (opts.avroExtract.nonEmpty) {
      // Avro single-record payloads (reference roadmap GUIDE.md:472-474):
      // schema from the .avsc option at bind time, typed columns per dotted
      // path, dots mangled like the proto surface
      val schemaJson = graft.avro.AvroDecode.schemaFromFile(opts.avroFile.get)
      // registry framing: writer schema per payload (by id), reader schema
      // from the option — Avro schema resolution bridges the versions
      val decoded = opts.avroRegistry match {
        case Some(resolver) =>
          graft.avro.AvroDecode.decodeRegistry(col("payload"), schemaJson, resolver)
        case None => graft.avro.AvroDecode.decode(col("payload"), schemaJson)
      }
      val extracted = opts.avroExtract.map { path =>
        graft.avro.AvroDecode.field(decoded, schemaJson, path).as(mangle(path))
      }
      df = df.select(df.columns.map(col).toIndexedSeq ++ extracted: _*)
    } else if (opts.msgpackExtract.nonEmpty) {
      // schemaless → stringly surface, like json_extract (GUIDE.md:472-475)
      val extracted = opts.msgpackExtract.map { path =>
        graft.wire.MsgPackDecode.extract(col("payload"), path).as(mangle(path))
      }
      df = df.select(df.columns.map(col).toIndexedSeq ++ extracted: _*)
    } else if (opts.cborExtract.nonEmpty) {
      val extracted = opts.cborExtract.map { path =>
        graft.wire.CborDecode.extract(col("payload"), path).as(mangle(path))
      }
      df = df.select(df.columns.map(col).toIndexedSeq ++ extracted: _*)
    }
    df
  }

  /** Convenience: scan the parquet-backed fixture store rooted at `dir`. */
  def scanDir(spark: SparkSession, dir: String, stream: String = "events",
              opts: NatsScanOptions = NatsScanOptions()): DataFrame =
    scan(spark, stream, opts, new ParquetMessageStore(dir))

  /** One extracted JSON field as STRING. Default = JSON-literal text.
    * Strict mode reproduces the reference's number rendering
    * (`std::to_string(double)` → fixed 6 decimals, nats_scan.cpp:797-800):
    * the value's JSON type comes from the VARIANT reader (`schema_of_variant`
    * — BIGINT/DOUBLE/DECIMAL ⟺ yyjson_is_num), numbers format through
    * DECIMAL(38,6) → STRING (same fixed-point text in Spark and DuckDB, so
    * the oracle can hash it); strings/bools/null keep the literal path. */
  private def extractJson(path: String, strict: Boolean): Column = {
    val literal = get_json_object(col("payload"), "$." + path)
    if (!strict) literal
    else {
      val v = s"variant_get(parse_json(payload), '$$.$path')"
      val vt = s"schema_of_variant($v)"
      expr(
        s"""CASE WHEN $vt = 'BIGINT' OR $vt = 'DOUBLE' OR $vt LIKE 'DECIMAL%'
           | THEN CAST(CAST(CAST($v AS DOUBLE) AS DECIMAL(38,6)) AS STRING)
           | ELSE get_json_object(payload, '$$.$path') END""".stripMargin)
    }
  }

  /** dots → underscores in extraction column names
    * (/root/reference/src/nats_scan.cpp:396-399). */
  def mangle(path: String): String = path.replace('.', '_')

  /** NATS wildcard subject predicate (`events.*.7`, `events.purchase.>`) as
    * a PUSHABLE Catalyst filter for the columnar paths — the capability the
    * reference rules out ("substring, NOT wildcard", nats_scan.cpp:741-746;
    * transport mode takes the same grammar as the `subject_filter` option,
    * where consumer `filter_subject` applies it server-side).
    *
    * Shape: `startswith(subject, <literal prefix>) AND subject RLIKE
    * <anchored regex>`. The prefix conjunct is the scale half — it pushes as
    * `StringStartsWith` and drives row-group min/max pruning on a
    * subject-clustered store (docs/SUBJECT_PRUNING.md); the rlike is exact,
    * codegen'd, and evaluated only on surviving rows. */
  def subjectWildcard(subject: Column, pattern: String): Column = {
    val prefix = graft.transport.SubjectFilter.literalPrefix(pattern)
    val exact = subject.rlike(graft.transport.SubjectFilter.toRegex(pattern))
    if (prefix.isEmpty) exact else subject.startsWith(prefix) && exact
  }
}
