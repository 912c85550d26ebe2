package graft.sources

import java.util

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Stream-discovery catalog (reference roadmap `SHOW STREAMS`,
  * /root/reference/docs/GUIDE.md:492): a V2 `TableCatalog` whose tables are
  * the NATS streams of one store directory or one server, each served by the
  * same [[NatsScanTable]] the `format("nats_scan")` path uses — identical
  * envelope schema, pushdown, vectorized readers, and write support.
  *
  * Registration (per session):
  * {{{
  *   spark.conf.set("spark.sql.catalog.nats", classOf[NatsCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.nats.dir", "/data/store")   // or .url
  *   spark.sql("SHOW TABLES IN nats")          // one row per stream
  *   spark.table("nats.events")                // scan via the catalog
  * }}}
  *
  * Discovery:
  *   - `dir` mode: every `<stream>.msgs` native store under the directory,
  *     plus the `events` fixture stream when `events.parquet` exists (the
  *     parquet-backed store holds exactly that one stream —
  *     [[graft.nats.ParquetMessageStore]]'s contract);
  *   - `url` mode: the server's stream list via the transport seam
  *     ([[graft.transport.JetStreamTransport.listStreams]]).
  *
  * Catalog DDL (create/alter/drop/rename) is rejected: streams are
  * provisioned on the server / by the writer path, not by Spark DDL — the
  * same posture as the reference (a scan extension, not a stream admin). */
final class NatsCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catalogName: String = _
  private var options: Map[String, String] = _

  override def initialize(name: String, opts: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    options = {
      import scala.jdk.CollectionConverters._
      opts.asCaseSensitiveMap().asScala.toMap
    }
    if (!options.contains("dir") && !options.contains("url"))
      throw new IllegalArgumentException(
        s"catalog '$name': set spark.sql.catalog.$name.dir (store directory) " +
          s"or .url (nats server)")
  }

  override def name(): String = catalogName

  private def streams(): Seq[String] = options.get("url") match {
    case Some(u) =>
      val t = graft.transport.Transport.connect(u,
        options.getOrElse("connect_timeout_ms",
          graft.transport.Transport.DefaultTimeoutMs.toString).toLong)
      try t.listStreams() finally t.close()
    case None =>
      val dir = new java.io.File(options("dir"))
      val native = Option(dir.listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.endsWith(".msgs"))
        .map(_.getName.stripSuffix(".msgs"))
      val fixture =
        if (new java.io.File(dir, "events.parquet").isFile) Seq("events")
        else Nil
      (native.toSeq ++ fixture).distinct.sorted
  }

  /** MATERIALIZED-API namespaces (`nats.obj.<bucket>` / `nats.kv.<bucket>`):
    * buckets are the `OBJ_`- / `KV_`-prefixed streams, served as [[ObjectStoreTable]] /
    * [[KvStoreTable]] — `SHOW TABLES IN nats.obj|nats.kv` is bucket
    * discovery, `spark.table("nats.obj.docs")` / `spark.table("nats.kv.cfg")`
    * the current-state scans, `df.writeTo(...).append()` the put
    * directions. The object WATCH stays on `readStream.format("nats_obj")`:
    * its schema is decided by table-level options (watch/watch_data),
    * which a catalog lookup cannot carry. Live servers only: a directory
    * store has no materialized layers. */
  private def objMode: Boolean = options.contains("url")
  private def isObjNs(ns: Array[String]): Boolean =
    ns.length == 1 && ns(0).equalsIgnoreCase("obj")
  private def isKvNs(ns: Array[String]): Boolean =
    ns.length == 1 && ns(0).equalsIgnoreCase("kv")
  private def buckets(prefix: String): Seq[String] =
    streams().filter(_.startsWith(prefix)).map(_.stripPrefix(prefix))

  /** tables live in the catalog's root namespace (`nats.events`) or, in
    * url mode, the `obj`/`kv` bucket namespaces */
  private def checkNs(ns: Array[String]): Unit =
    if (ns.nonEmpty && !(objMode && (isObjNs(ns) || isKvNs(ns))))
      throw new NoSuchNamespaceException(ns)

  override def listTables(ns: Array[String]): Array[Identifier] = {
    checkNs(ns)
    if (objMode && isObjNs(ns))
      buckets("OBJ_").map(b => Identifier.of(ns, b)).toArray
    else if (objMode && isKvNs(ns))
      buckets("KV_").map(b => Identifier.of(ns, b)).toArray
    else
      streams().map(s => Identifier.of(Array.empty, s)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    checkNs(ident.namespace())
    if (objMode && isObjNs(ident.namespace())) {
      if (!buckets("OBJ_").contains(ident.name()))
        throw new NoSuchTableException(ident)
      new ObjectStoreTable(options + ("bucket" -> ident.name()))
    } else if (objMode && isKvNs(ident.namespace())) {
      if (!buckets("KV_").contains(ident.name()))
        throw new NoSuchTableException(ident)
      new KvStoreTable(options + ("bucket" -> ident.name()))
    } else {
      if (!streams().contains(ident.name()))
        throw new NoSuchTableException(ident)
      new NatsScanTable(options + ("stream" -> ident.name()))
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    (ident.namespace().isEmpty && streams().contains(ident.name())) ||
      (objMode && isObjNs(ident.namespace()) &&
        buckets("OBJ_").contains(ident.name())) ||
      (objMode && isKvNs(ident.namespace()) &&
        buckets("KV_").contains(ident.name()))

  private def unsupported(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"nats catalog: $op is not supported — streams are provisioned by the " +
        "server / writer path, not Spark DDL")

  override def createTable(ident: Identifier,
                           schema: org.apache.spark.sql.types.StructType,
                           partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
                           properties: util.Map[String, String]): Table =
    unsupported("CREATE TABLE")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    unsupported("ALTER TABLE")
  override def dropTable(ident: Identifier): Boolean =
    unsupported("DROP TABLE")
  override def renameTable(from: Identifier, to: Identifier): Unit =
    unsupported("RENAME TABLE")

  // --- ProcedureCatalog: maintenance surfaces as SQL CALL ---------------
  // `CALL nats.obj.sweep_orphans(bucket => 'docs')` — the object store's
  // garbage-collection pass (ObjectStore.sweepOrphans: reclaim chunk
  // subjects no meta references — torn puts killed with no exception
  // path, racing-put losers). A compaction job a pipeline schedules, so
  // it belongs on the SQL face next to the buckets it maintains.
  override def loadProcedure(ident: Identifier): org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    if (objMode && isObjNs(ident.namespace()) &&
        ident.name().equalsIgnoreCase("sweep_orphans"))
      new SweepOrphansProcedure(options)
    else throw new UnsupportedOperationException(
      s"nats catalog: unknown procedure ${ident.namespace().mkString(".")}" +
        s".${ident.name()} — available: obj.sweep_orphans (url mode)")
  }
  override def listProcedures(ns: Array[String]): Array[Identifier] =
    if (objMode && isObjNs(ns)) Array(Identifier.of(ns, "sweep_orphans"))
    else Array.empty

  // --- SupportsNamespaces: the root plus (url mode) obj/kv buckets ---
  override def listNamespaces(): Array[Array[String]] =
    if (objMode) Array(Array("obj"), Array("kv")) else Array.empty
  override def listNamespaces(ns: Array[String]): Array[Array[String]] = {
    checkNs(ns); Array.empty
  }
  override def namespaceExists(ns: Array[String]): Boolean =
    ns.isEmpty || (objMode && (isObjNs(ns) || isKvNs(ns)))
  override def loadNamespaceMetadata(ns: Array[String]): util.Map[String, String] = {
    checkNs(ns); util.Collections.emptyMap()
  }
  override def createNamespace(ns: Array[String],
                               meta: util.Map[String, String]): Unit =
    unsupported("CREATE NAMESPACE")
  override def alterNamespace(ns: Array[String], changes: NamespaceChange*): Unit =
    unsupported("ALTER NAMESPACE")
  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean =
    unsupported("DROP NAMESPACE")
}

/** `CALL <catalog>.obj.sweep_orphans(bucket => '<bucket>')`: run the
  * object store's orphan-chunk reclamation and return one row
  * (bucket STRING, purged_chunk_subjects BIGINT). Driver-side by design —
  * the sweep is a metadata walk (subjects-only stats index + meta history,
  * zero chunk bytes), the same weight class as the catalog's own
  * discovery calls. */
final class SweepOrphansProcedure(options: Map[String, String])
    extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure {
  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}
  import org.apache.spark.sql.types._

  override def name(): String = "sweep_orphans"
  override def description(): String =
    "reclaim object-store chunk subjects unreferenced by any meta " +
      "(torn puts, racing-put losers)"

  override def bind(inputType: StructType): BoundProcedure =
    new BoundProcedure {
      override def name(): String = SweepOrphansProcedure.this.name()
      override def description(): String =
        SweepOrphansProcedure.this.description()
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("bucket", StringType)
          .comment("object-store bucket to sweep").build())
      override def isDeterministic: Boolean = false // mutates the stream
      override def call(input: org.apache.spark.sql.catalyst.InternalRow)
          : util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
        val bucket = input.getUTF8String(0).toString
        val url = options.getOrElse("url", throw new IllegalArgumentException(
          "obj.sweep_orphans needs a url-mode catalog (live server)"))
        val t = graft.transport.TransportPool.get(url,
          options.getOrElse("connect_timeout_ms",
            graft.transport.Transport.DefaultTimeoutMs.toString).toLong,
          graft.transport.TransportAuth.fromOptions(
            credsFile = options.get("user_creds"),
            nkeySeed = options.get("nkey_seed"),
            tls = options.get("tls"), tlsCaFile = options.get("tls_ca"),
            tlsInsecure = options.get("tls_insecure")))
        val purged = new graft.transport.ObjectStore(t, bucket).sweepOrphans()
        val out: org.apache.spark.sql.connector.read.Scan =
          new org.apache.spark.sql.connector.read.LocalScan {
            override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] =
              Array(org.apache.spark.sql.catalyst.InternalRow(
                org.apache.spark.unsafe.types.UTF8String.fromString(bucket),
                purged.toLong))
            override def readSchema(): StructType = StructType(Seq(
              StructField("bucket", StringType, nullable = false),
              StructField("purged_chunk_subjects", LongType, nullable = false)))
          }
        util.Collections.singletonList(out).iterator()
      }
    }
}
