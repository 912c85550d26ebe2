package graft.transport

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper

/** NATS JetStream OBJECT STORE (the public ADR-20 layering:
  * https://github.com/nats-io/nats-architecture-and-design/blob/main/adr/ADR-20.md)
  * as a pure facade over [[JetStreamTransport]] — large binaries chunked
  * into ordinary stream messages, with a per-object metadata record the
  * per-subject index serves as "current state".
  *
  * Wire layout (all from the ADR, nothing bespoke):
  *   - bucket `B` lives in stream `OBJ_B`;
  *   - object meta rides `$$O.B.M.<base64url(name)>` — one JSON ObjectInfo
  *     per put, the LATEST per subject is the object's truth (a real server
  *     pairs this with a `Nats-Rollup: sub` header so history is pruned;
  *     last-by-subject semantics are identical either way);
  *   - chunk data rides `$$O.B.C.<nuid>` — a fresh nuid per put, so an
  *     overwrite's chunks can never interleave with its predecessor's;
  *   - the digest field is `SHA-256=<base64url(sha256(data))>`, verified on
  *     every get (a torn read or server-side corruption fails LOUDLY, never
  *     returns truncated bytes);
  *   - a delete publishes a meta tombstone (`deleted: true`, size/chunks 0)
  *     and purges the version's chunk subject; an overwrite purges the
  *     superseded nuid's chunks once the new meta is durable — storage is
  *     O(current bucket), not O(all writes ever) (`retainHistory=true`
  *     opts out, keeping every version fetchable for the watch changelog).
  *
  * Because the facade speaks only the transport trait, the SAME code runs
  * against the in-JVM [[FakeJetStream]], [[MiniNatsServer]] over real
  * loopback sockets, and a live cluster through [[NatsWireClient]] —
  * chunked puts use the pipelined [[JetStreamTransport.publishBatch]] (one
  * round-trip per window, not per chunk), gets use a server-side-filtered
  * consumer on the object's chunk subject (wire volume = the object's own
  * bytes, never the bucket's), and listing pages the per-subject index in
  * O(objects) metadata messages with zero data bytes.
  *
  * Scale contract: one object's chunks flow through one reader, but
  * DISTINCT objects parallelize freely — the Spark source
  * ([[graft.sources.ObjectStoreSource]]) shards the meta namespace the
  * same way the KV scan shards subjects, so a million-object bucket scans
  * as 32 independent meta shards each fetching only its own objects'
  * chunks. The reference engine is message-scan only; this is the
  * binary-payload superset its multimodal columns need (SURVEY §2 layer A
  * payload polymorphism; cf. nats_scan.cpp:520-538 BLOB mode).
  */
final class ObjectStore(t: JetStreamTransport, val bucket: String,
                        val chunkSize: Int = ObjectStore.DefaultChunkSize,
                        /** keep superseded versions' chunks instead of
                          * purging them (time-travel for the watch's
                          * `watch_data` changelog). A real NATS client
                          * always reclaims — false is the ADR-faithful
                          * default. */
                        val retainHistory: Boolean = false) {
  require(chunkSize > 0, s"object store chunk_size must be > 0, got $chunkSize")
  ObjectStore.requireValidBucket(bucket)

  val stream: String = s"OBJ_$bucket"

  import ObjectStore._

  // ---------------- write path ----------------

  /** Store `data` under `name`: chunks first (pipelined), meta LAST — a
    * reader can never observe a meta whose chunks are not yet durable.
    * Returns the object's info. `mtimeNs` is caller-supplied (mirrors the
    * transport's explicit-timestamp publish surface; a live server would
    * stamp receive time).
    *
    * An OVERWRITE reclaims the superseded version's chunk subject via a
    * stream purge AFTER the new meta is durable (the nats.go Put shape —
    * readers resolve the new version before the old one vanishes; a reader
    * caught mid-get of the old version fails loudly on its chunk count,
    * the same race a live cluster has). `retainHistory=true` skips the
    * purge and keeps every version fetchable by its meta. */
  def put(name: String, data: Array[Byte], mtimeNs: Long): ObjectInfo = {
    requireName(name)
    val prior = priorMeta(name)
    val nuid = newNuid()
    val nChunks = if (data.isEmpty) 0 else (data.length - 1) / chunkSize + 1
    val chunkSubject = s"$$O.$bucket.C.$nuid"
    val entries = new Array[PublishEntry](nChunks)
    var i = 0
    while (i < nChunks) {
      val from = i * chunkSize
      val until = math.min(from + chunkSize, data.length)
      entries(i) = PublishEntry(chunkSubject, mtimeNs,
        java.util.Arrays.copyOfRange(data, from, until),
        msgId = s"$nuid/$i") // replayed window → exactly-once chunks
      i += 1
    }
    val info = ObjectInfo(name, bucket, nuid, data.length.toLong, nChunks,
      digestOf(data), mtimeNs, deleted = false)
    try {
      if (nChunks > 0) t.publishBatch(stream, entries)
      t.publish(stream, metaSubject(bucket, name), mtimeNs,
        metaJson(info).getBytes(UTF_8), msgId = s"$nuid/M",
        headers = rollupHeader)
    } catch {
      case scala.util.control.NonFatal(e) =>
        // a put torn between chunks and meta would orphan THIS nuid's
        // chunk subject forever (a retry takes a fresh nuid, and the
        // overwrite purge only ever targets the prior META's nuid) —
        // reclaim best-effort before surfacing the failure; the retry
        // then starts from a clean slate
        if (nChunks > 0)
          try purgeChunks(nuid) catch { case _: Exception => () }
        throw e
    }
    prior.filter(p => !p.deleted && p.chunks > 0 && p.nuid != nuid)
      .foreach(p => purgeChunks(p.nuid))
    info
  }

  /** BULK ingest — the loader path: pipeline the chunks and metas of
    * `window` objects per [[JetStreamTransport.publishBatch]] round-trip,
    * so a bucket load costs ~2 RTTs per WINDOW instead of 3 per OBJECT
    * (prior-meta lookup + chunk batch + meta publish). Returns the number
    * of objects stored.
    *
    * Per-object invariants are [[put]]'s: fresh nuid per object, chunks
    * durable BEFORE their meta (the whole window's chunk batch flushes
    * before its meta batch), rollup header on every meta (duplicate names
    * within a window collapse server-side, last wins — batch order is
    * preserved). The ONE difference: no per-name prior lookup, so a bulk
    * load over EXISTING names rolls their metas up but does not purge the
    * superseded versions' chunk subjects — run [[sweepOrphans]] after
    * bulk-overwriting live names; a fresh-bucket load has nothing to
    * reclaim. A window torn BEFORE its meta batch is handed to the
    * transport reclaims its own chunk subjects best-effort, like a torn
    * [[put]]; once meta publish has started the chunks are left in place
    * (the server may have applied any prefix of the pipelined metas, so
    * purging would corrupt live objects — [[sweepOrphans]] reclaims true
    * orphans later). */
  def putBulk(objs: Iterator[(String, Array[Byte], Long)],
              window: Int = BulkWindow): Long = {
    require(window > 0, s"bulk window must be > 0, got $window")
    var stored = 0L
    objs.grouped(window).foreach { grp =>
      val chunkEntries = Array.newBuilder[PublishEntry]
      val metaEntries = Array.newBuilder[PublishEntry]
      val nuids = Array.newBuilder[String]
      grp.foreach { case (name, data, mtimeNs) =>
        requireName(name)
        val nuid = newNuid()
        nuids += nuid
        val nChunks = if (data.isEmpty) 0 else (data.length - 1) / chunkSize + 1
        val chunkSubject = s"$$O.$bucket.C.$nuid"
        var i = 0
        while (i < nChunks) {
          val from = i * chunkSize
          val until = math.min(from + chunkSize, data.length)
          chunkEntries += PublishEntry(chunkSubject, mtimeNs,
            java.util.Arrays.copyOfRange(data, from, until),
            msgId = s"$nuid/$i")
          i += 1
        }
        val info = ObjectInfo(name, bucket, nuid, data.length.toLong,
          nChunks, digestOf(data), mtimeNs, deleted = false)
        metaEntries += PublishEntry(metaSubject(bucket, name), mtimeNs,
          metaJson(info).getBytes(UTF_8), msgId = s"$nuid/M",
          headers = rollupHeader)
      }
      val chunks = chunkEntries.result()
      // Torn-window recovery must distinguish WHERE the failure happened:
      // publishBatch is pipelined, so an exception during (or a local
      // timeout after) the META batch can leave some or all metas durable
      // server-side. Purging the window's chunk subjects then would gut
      // LIVE objects (metas referencing vanished chunks) — and because a
      // rollup meta has already replaced the prior version's meta, a bulk
      // overwrite of existing names would destroy the prior contents too.
      // So: reclaim chunks ONLY when the failure is provably pre-meta;
      // once the meta batch has been handed to the transport, leave the
      // chunks in place — an orphaned chunk subject is safe and
      // reclaimable by [[sweepOrphans]]; a purged live one is not.
      var metaPhase = false
      try {
        if (chunks.nonEmpty) t.publishBatch(stream, chunks)
        metaPhase = true
        t.publishBatch(stream, metaEntries.result())
      } catch {
        case scala.util.control.NonFatal(e) =>
          if (!metaPhase)
            nuids.result().foreach(n =>
              try purgeChunks(n) catch { case _: Exception => () })
          throw e
      }
      stored += grp.size
    }
    stored
  }

  /** Tombstone `name` (ADR delete shape: meta with `deleted: true`, zero
    * size/chunks, fresh nuid) and reclaim the deleted version's chunk
    * subject (what a real client's Delete does — purge after the
    * tombstone is durable). `retainHistory=true` keeps the chunks; either
    * way readers never see the object again, because gets resolve ONLY
    * through the current meta. */
  def delete(name: String, mtimeNs: Long): Unit = {
    requireName(name)
    val prior = priorMeta(name)
    val nuid = newNuid()
    val info = ObjectInfo(name, bucket, nuid, 0L, 0, digest = "",
      mtimeNs, deleted = true)
    t.publish(stream, metaSubject(bucket, name), mtimeNs,
      metaJson(info).getBytes(UTF_8), msgId = s"$nuid/M",
      headers = rollupHeader)
    prior.filter(p => !p.deleted && p.chunks > 0)
      .foreach(p => purgeChunks(p.nuid))
  }

  /** the meta a write supersedes, TOMBSTONES INCLUDED (a put over a
    * deleted name must still roll the tombstone up) — None under
    * retainHistory. The very first put targets a bucket whose stream does
    * not exist yet: "stream not found" IS "no prior", not an error (the
    * put itself creates it). */
  private def priorMeta(name: String): Option[ObjectInfo] =
    if (retainHistory) None
    else try {
      t.lastForSubjects(stream, Some(metaSubject(bucket, name)),
        bucket = 0, nBuckets = 1, afterSubject = None, max = 2)
        .headOption.map(m => parseMeta(new String(m.payload, UTF_8)))
    } catch { case _: NatsStreamNotFoundException => None }

  /** stream purge of one version's chunk subject — O(its own span) on the
    * fixture servers (the purge rides the per-subject index) */
  private def purgeChunks(nuid: String): Unit = {
    t.purgeSubject(stream, s"$$O.$bucket.C.$nuid")
    ()
  }

  /** meta ROLLUP: the ADR-20 `Nats-Rollup: sub` header on every meta
    * publish — the SERVER erases the subject's prior messages inside its
    * publish critical section, so even two racing fresh-name puts
    * collapse to one meta (a client-side follow-up purge could not close
    * that window, and cost an extra RPC per write). Without it meta
    * history grows O(writes ever made); with it a bucket's stream is
    * exactly current chunks + one meta per name (tombstones included, so
    * deletes stay visible to watches and re-puts). `retainHistory=true`
    * drops the header — the watch's full changelog is meta history by
    * definition. */
  private def rollupHeader: Map[String, String] =
    if (retainHistory) Map.empty else Map("Nats-Rollup" -> "sub")

  // ---------------- read path ----------------

  /** Current info for `name`: None if never stored OR tombstoned — a
    * bucket whose stream does not exist yet is an empty bucket, not an
    * error (the fixture servers return an empty page there; the wire
    * client surfaces the typed not-found, mapped here so both paths
    * agree). */
  def info(name: String): Option[ObjectInfo] = {
    requireName(name)
    val metas =
      try t.lastForSubjects(stream, Some(metaSubject(bucket, name)),
        bucket = 0, nBuckets = 1, afterSubject = None, max = 2)
      catch { case _: NatsStreamNotFoundException => Array.empty[TransportMsg] }
    metas.headOption.map(m => parseMeta(new String(m.payload, UTF_8)))
      .filterNot(_.deleted)
  }

  /** Fetch and digest-verify the full object. Loud failures: unknown or
    * deleted name, missing chunks, size or digest mismatch. */
  def get(name: String): Array[Byte] = {
    val meta = info(name).getOrElse(sys.error(
      s"object store '$bucket': no object named '$name'"))
    getByMeta(meta)
  }

  /** Fetch by an already-resolved meta (the scan path: list once, fetch
    * many — no second meta RPC per object). */
  def getByMeta(meta: ObjectInfo): Array[Byte] =
    tryGetByMeta(meta).getOrElse(sys.error(
      s"object store '$bucket': object '${meta.name}' incomplete — " +
        s"0/${meta.chunks} chunks, 0/${meta.size} bytes"))

  /** [[getByMeta]] that yields None when the version's chunks are ENTIRELY
    * absent — the reclaimed-history case (overwrite/delete purges the
    * whole chunk subject atomically, see [[put]]). A PARTIAL absence still
    * fails loudly: that is corruption or a torn read, never reclamation.
    * The watch's `watch_data` changelog uses this to emit null for
    * superseded versions whose content is gone. */
  def tryGetByMeta(meta: ObjectInfo): Option[Array[Byte]] = {
    if (meta.deleted) sys.error(
      s"object store '$bucket': object '${meta.name}' is deleted")
    val out = new Array[Byte](toIntSize(meta.size))
    var off = 0
    var got = 0
    if (meta.chunks > 0) {
      // server-side filter on THE object's chunk subject: only this
      // object's bytes cross the wire, in stream (= chunk) order
      val cur = t.consumer(stream, startSeq = 1L,
        filterSubject = Some(s"$$O.$bucket.C.${meta.nuid}"))
      try {
        var batch = cur.next(ChunkBatch)
        while (batch.nonEmpty) {
          var i = 0
          while (i < batch.length) {
            val c = batch(i).payload
            if (off + c.length > out.length) sys.error(
              s"object store '$bucket': object '${meta.name}' chunk overrun " +
                s"(${off + c.length} B > declared ${meta.size} B)")
            System.arraycopy(c, 0, out, off, c.length)
            off += c.length
            got += 1
            i += 1
          }
          batch = if (got >= meta.chunks) Array.empty else cur.next(ChunkBatch)
        }
      } finally cur.close()
    }
    if (got == 0 && meta.chunks > 0) return None // fully reclaimed version
    if (got != meta.chunks || off != out.length) sys.error(
      s"object store '$bucket': object '${meta.name}' incomplete — " +
        s"$got/${meta.chunks} chunks, $off/${meta.size} bytes")
    val d = digestOf(out)
    if (d != meta.digest) sys.error(
      s"object store '$bucket': digest mismatch for '${meta.name}' " +
        s"(stored ${meta.digest}, computed $d) — data corrupted")
    Some(out)
  }

  /** Page shard `shard` of `nShards` of the bucket's CURRENT objects
    * (tombstones excluded) — the per-subject index surface, O(objects)
    * metadata, zero chunk bytes. Shard = FNV-1a of the META SUBJECT
    * (the transport's subject-shard contract, [[SubjectFilter.shard]]). */
  def list(shard: Int = 0, nShards: Int = 1): Seq[ObjectInfo] =
    entriesIterator(shard, nShards).map(_._1).toSeq

  /** LAZILY-paged live (info, meta stream seq) of one shard — one index
    * page (2048 metas) in task memory at a time, NOT the whole shard, with
    * PER-PAGE retry (a transient error on page 400 of a multi-million-
    * object shard re-fetches one page, never the listing so far). The KV
    * reader's `entriesIterator` shape, mirrored here. The meta seq is the
    * object's current revision — the overwrite reconcile
    * ([[graft.sources.ObjectStoreBatchWrite]]) keys on it. `onPage` fires
    * once per index RPC (metrics hook). */
  def entriesIterator(shard: Int = 0, nShards: Int = 1,
                      onPage: () => Unit = () => ())
      : Iterator[(ObjectInfo, Long)] = {
    require(nShards >= 1 && shard >= 0 && shard < nShards,
      s"bad object-store shard $shard/$nShards")
    val pages = Iterator.unfold((Option.empty[String], false)) {
      case (_, true) => None
      case (after, _) =>
        onPage()
        // not-yet-created bucket = empty listing (wire parity with the fakes)
        val page =
          try TransportRetry.withRetry(
            t.lastForSubjects(stream, Some(s"$$O.$bucket.M.>"),
              shard, nShards, after, MetaPage))
          catch { case _: NatsStreamNotFoundException => Array.empty[TransportMsg] }
        if (page.isEmpty) None
        else Some((page,
          (Some(page.last.subject): Option[String], page.length < MetaPage)))
    }
    pages.flatten
      .map(m => (parseMeta(new String(m.payload, UTF_8)), m.seq))
      .filter(!_._1.deleted)
  }

  /** Maintenance sweep: purge chunk subjects whose nuid no META (live,
    * tombstone, or retained historical version) references — the garbage a
    * put torn between chunk publish and meta publish leaves when no
    * exception path runs (task killed outright), or the loser of two
    * racing puts to one name whose rolled-up meta vanished before its
    * purge-of-prior fired. Returns the number of chunk subjects reclaimed.
    *
    * Referenced nuids come from the FULL meta history (consumer from
    * seq 1, metadata-only messages), so under `retainHistory` every
    * fetchable version keeps its chunks; candidate nuids come from
    * [[JetStreamTransport.subjectStats]] over `$$O.<bucket>.C.>` — a
    * subjects-only index walk, ZERO chunk bytes cross the wire. Driver
    * memory is O(distinct nuids) 22-char strings; run it like any other
    * compaction job, not per query.
    *
    * CONCURRENT-WRITER SAFETY (a put publishes chunks BEFORE its meta by
    * design, so a naïve read-metas-then-walk-chunks sweep would purge an
    * in-flight put's chunks as "unreferenced"):
    *   1. the stream's `lastSeq` is recorded as a WATERMARK before the
    *      meta read — any chunk subject whose latest message is newer
    *      than the watermark belongs to a put that started after the
    *      sweep's snapshot and is skipped outright;
    *   2. candidates at or below the watermark are only purged after a
    *      SECOND meta read confirms they are still unreferenced — closing
    *      the window where a put's chunks landed just before the
    *      watermark but its meta landed during the (long) chunk walk.
    * The residual exposure is a writer that stalls between its chunk
    * batch and its meta publish for the entire duration of the sweep's
    * chunk walk + confirm pass — the same quiescence bound any
    * orphan-reclamation scheme over publish-chunks-first layouts has. */
  def sweepOrphans(): Int = {
    // watermark FIRST: in-flight puts that start after this point only
    // ever produce chunk messages with seq > watermark
    val watermark = lastSeq()
    if (watermark == 0L) return 0
    def referencedNuids(): scala.collection.mutable.HashSet[String] = {
      val referenced = scala.collection.mutable.HashSet.empty[String]
      val cur = t.consumer(stream, startSeq = 1L,
        filterSubject = Some(s"$$O.$bucket.M.>"))
      try {
        var batch = cur.next(MetaPage)
        while (batch.nonEmpty) {
          batch.foreach(m =>
            referenced += parseMeta(new String(m.payload, UTF_8)).nuid)
          batch = cur.next(MetaPage)
        }
      } finally cur.close()
      referenced
    }
    val referenced =
      try referencedNuids()
      catch { case _: NatsStreamNotFoundException => return 0 }
    val chunkPrefix = s"$$O.$bucket.C."
    val candidates = Vector.newBuilder[String] // subjects, ≤ watermark, pass-1 unreferenced
    var after: Option[String] = None
    var done = false
    while (!done) {
      val page = TransportRetry.withRetry(
        t.subjectStats(stream, Some(chunkPrefix + ">"), 0, 1, after, MetaPage))
      if (page.length < MetaPage) done = true
      if (page.nonEmpty) {
        after = Some(page.last.subject)
        page.foreach { s =>
          val nuid = s.subject.stripPrefix(chunkPrefix)
          if (s.lastSeq <= watermark && !referenced.contains(nuid))
            candidates += s.subject
        }
      }
    }
    val cand = candidates.result()
    if (cand.isEmpty) return 0
    // confirm pass: a meta that landed during the chunk walk rescues its put
    val confirmed = referencedNuids()
    var purged = 0
    cand.foreach { subject =>
      if (!confirmed.contains(subject.stripPrefix(chunkPrefix))) {
        t.purgeSubject(stream, subject)
        purged += 1
      }
    }
    purged
  }

  /** Last stream sequence of the bucket (0 = bucket not created yet) — the
    * overwrite reconcile's watermark: metas at or below it predate the
    * write job. */
  def lastSeq(): Long =
    try t.streamInfo(stream).lastSeq
    catch { case _: NatsStreamNotFoundException => 0L }

  private def requireName(name: String): Unit =
    require(name.nonEmpty, "object name must not be empty")

  private def toIntSize(sz: Long): Int = {
    require(sz >= 0L && sz <= Int.MaxValue.toLong,
      s"object size $sz B exceeds a single in-memory buffer; " +
        "stream chunks instead of get()")
    sz.toInt
  }
}

object ObjectStore {
  /** ADR-20 default chunk size (128 KiB). */
  val DefaultChunkSize: Int = 128 * 1024

  /** bucket names become stream/subject tokens — no '.'/'*'/'>'/whitespace */
  def requireValidBucket(bucket: String): Unit =
    require(bucket.nonEmpty && !bucket.exists(c => c == '.' || c == '*' ||
      c == '>' || Character.isWhitespace(c)),
      s"invalid object-store bucket name '$bucket'")
  /** chunks per fetch batch on the read path */
  val ChunkBatch = 64
  /** objects per pipelined publish window on the bulk-ingest path */
  val BulkWindow = 512
  /** meta messages per list page (same order as the KV reader's page) */
  val MetaPage = 2048

  private val mapper = new ObjectMapper()
  private val rnd = new java.security.SecureRandom()

  /** `$$O.<bucket>.M.<base64url-nopad(name)>` — the ADR meta subject (names
    * may contain `.`/`*`/`>`/spaces; encoding keeps the subject legal). */
  def metaSubject(bucket: String, name: String): String =
    "$O." + bucket + ".M." +
      Base64.getUrlEncoder.withoutPadding.encodeToString(name.getBytes(UTF_8))

  /** 22-char unique id for a put's chunk subject (the nuid role). */
  def newNuid(): String = {
    val b = new Array[Byte](16)
    rnd.nextBytes(b)
    Base64.getUrlEncoder.withoutPadding.encodeToString(b)
  }

  /** ADR digest field: `SHA-256=<base64url-nopad>` over the full object. */
  def digestOf(data: Array[Byte]): String =
    "SHA-256=" + Base64.getUrlEncoder.withoutPadding.encodeToString(
      MessageDigest.getInstance("SHA-256").digest(data))

  private[transport] def metaJson(i: ObjectInfo): String = {
    val n = mapper.createObjectNode()
    n.put("name", i.name).put("bucket", i.bucket).put("nuid", i.nuid)
      .put("size", i.size).put("chunks", i.chunks).put("digest", i.digest)
      .put("mtime_ns", i.mtimeNs)
    if (i.deleted) n.put("deleted", true)
    mapper.writeValueAsString(n)
  }

  private[graft] def parseMeta(json: String): ObjectInfo = {
    val n = mapper.readTree(json)
    def str(f: String) = Option(n.get(f)).map(_.asText).getOrElse(
      sys.error(s"object meta missing '$f': $json"))
    ObjectInfo(str("name"), str("bucket"), str("nuid"),
      Option(n.get("size")).map(_.asLong).getOrElse(0L),
      Option(n.get("chunks")).map(_.asInt).getOrElse(0),
      Option(n.get("digest")).map(_.asText).getOrElse(""),
      Option(n.get("mtime_ns")).map(_.asLong).getOrElse(0L),
      Option(n.get("deleted")).exists(_.asBoolean))
  }
}

/** One object's current metadata (the ADR ObjectInfo record). */
final case class ObjectInfo(name: String, bucket: String, nuid: String,
                            size: Long, chunks: Int, digest: String,
                            mtimeNs: Long, deleted: Boolean)
