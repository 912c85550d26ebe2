package graft.transport

import java.nio.charset.StandardCharsets.UTF_8

/** NATS JetStream KEY-VALUE store (the public ADR-8 layering:
  * https://github.com/nats-io/nats-architecture-and-design/blob/main/adr/ADR-8.md)
  * as a pure facade over [[JetStreamTransport]] — the OTHER materialized
  * API JetStream users lean on, beside the object store.
  *
  * Wire layout (all from the ADR, nothing bespoke):
  *   - bucket `B` lives in stream `KV_B`; key `k` rides subject
  *     `$$KV.B.<k>` (keys may be dotted — they ARE subject token paths);
  *   - a key's REVISION is its message's stream sequence; the newest
  *     message per subject is the key's current state (the same
  *     per-subject index the KV scan reads);
  *   - DELETE and PURGE are MARKER messages carrying a `KV-Operation`
  *     header (DEL keeps prior revisions readable in history; PURGE also
  *     reclaims them via a stream purge `keep=1`);
  *   - per-key history depth is the bucket's `history` property
  *     (`max_msgs_per_subject` on a real server; this facade enforces it
  *     at write time with a purge `keep=maxHistory` — same observable
  *     state);
  *   - `create`/`update` are the per-subject compare-and-set
  *     (`Nats-Expected-Last-Subject-Sequence`): optimistic concurrency
  *     with no read-modify-write race — the CHECK happens inside the
  *     server's publish critical section, never client-side.
  *
  * Because the facade speaks only the transport trait, the SAME code runs
  * against the in-JVM [[FakeJetStream]], [[MiniNatsServer]] over real
  * loopback sockets, and a live cluster through [[NatsWireClient]].
  *
  * Scale contract: `get` is one index lookup; `entries`/`keys` page the
  * per-subject index in O(keys) — never O(writes) — and shard exactly like
  * the KV scan (`SubjectFilter.shard`), so a million-key bucket reads as
  * independent shards. History stays O(maxHistory) per key by
  * construction. The reference engine reads KV state via
  * `last_by_subject` (SURVEY §2); this facade adds the write/CAS/history
  * surface a KV user needs.
  */
final class KvStore(t: JetStreamTransport, val bucket: String,
                    /** per-key history depth kept at write time (the
                      * bucket `history` property; real buckets default 1,
                      * cap 64). 0 = unlimited — no trim RPC per write. */
                    val maxHistory: Int = 1) {
  require(maxHistory >= 0 && maxHistory <= 64,
    s"kv history must be in [0, 64], got $maxHistory")
  ObjectStore.requireValidBucket(bucket)

  val stream: String = s"KV_$bucket"

  import KvStore._

  def subjectOf(key: String): String = {
    requireValidKey(key)
    s"$$KV.$bucket.$key"
  }

  // ---------------- write path ----------------

  /** unconditional set; returns the new revision */
  def put(key: String, value: Array[Byte], tsNs: Long): Long =
    write(key, value, tsNs, None, Map.empty)

  /** BULK ingest — the KV loader path: a window of puts pipelines through
    * ONE [[JetStreamTransport.publishBatch]] round-trip instead of one
    * conversation per key, and history trimming (maxHistory > 0) runs
    * once per DISTINCT key per window instead of once per write. Returns
    * the number of entries written. Semantics are [[put]]'s: last-write-
    * wins, batch order preserved (duplicate keys within a window are
    * successive revisions), fresh msgId per write. */
  def putBulk(entries: Iterator[(String, Array[Byte], Long)],
              window: Int = KvStore.BulkWindow): Long = {
    require(window > 0, s"bulk window must be > 0, got $window")
    var stored = 0L
    entries.grouped(window).foreach { grp =>
      val batch = grp.map { case (key, value, tsNs) =>
        PublishEntry(subjectOf(key), tsNs, value,
          msgId = s"kv-${ObjectStore.newNuid()}")
      }.toArray
      t.publishBatch(stream, batch)
      if (maxHistory > 0)
        grp.iterator.map(_._1).toSet.foreach { k: String =>
          t.purgeSubject(stream, subjectOf(k), keep = maxHistory); ()
        }
      stored += grp.size
    }
    stored
  }

  /** set ONLY IF the key has never existed or is currently deleted —
    * the CAS rides the marker's revision, so a concurrent resurrection
    * loses cleanly. Throws [[NatsWrongLastSequenceException]] when the
    * key exists (or appears mid-race). */
  def create(key: String, value: Array[Byte], tsNs: Long): Long = {
    val last = rawLast(key)
    last.filter(_.op == OpPut).foreach { e =>
      throw new NatsWrongLastSequenceException(
        s"kv '$bucket': key '$key' already exists (revision ${e.revision})",
        e.revision)
    }
    write(key, value, tsNs, Some(last.fold(0L)(_.revision)), Map.empty)
  }

  /** set ONLY IF the key's current revision is `expectedRev` — optimistic
    * concurrency. Throws [[NatsWrongLastSequenceException]] on conflict
    * (callers re-read and re-decide; never blind-retry). */
  def update(key: String, value: Array[Byte], expectedRev: Long,
             tsNs: Long): Long =
    write(key, value, tsNs, Some(expectedRev), Map.empty)

  /** tombstone the key (DEL marker): `get` turns None, prior revisions
    * stay readable in [[history]] up to the bucket depth */
  def delete(key: String, tsNs: Long): Long =
    write(key, Array.emptyByteArray, tsNs, None, Map(OpHeader -> OpDel))

  /** tombstone AND reclaim: PURGE marker, then every prior revision of
    * the key is purged — only the marker remains */
  def purge(key: String, tsNs: Long): Long = {
    val rev = write(key, Array.emptyByteArray, tsNs, None,
      Map(OpHeader -> OpPurge))
    t.purgeSubject(stream, subjectOf(key), keep = 1)
    rev
  }

  private def write(key: String, value: Array[Byte], tsNs: Long,
                    expect: Option[Long],
                    headers: Map[String, String]): Long = {
    val subj = subjectOf(key)
    // fresh msgId per write: KV semantics are last-write-wins, not
    // content-deduplicated (two identical puts ARE two revisions)
    val rev = t.publish(stream, subj, tsNs, value,
      msgId = s"kv-${ObjectStore.newNuid()}", headers = headers,
      expectLastSubjectSeq = expect)
    if (maxHistory > 0) t.purgeSubject(stream, subj, keep = maxHistory)
    rev
  }

  // ---------------- read path ----------------

  /** the key's newest record, markers included (None = never written) */
  private def rawLast(key: String): Option[KvEntry] =
    try {
      t.lastForSubjects(stream, Some(subjectOf(key)), bucket = 0,
        nBuckets = 1, afterSubject = None, max = 2)
        .headOption.map(entryOf)
    } catch { case _: NatsStreamNotFoundException => None }

  /** current value: None if never written, deleted, or purged */
  def get(key: String): Option[KvEntry] = rawLast(key).filter(_.op == OpPut)

  /** one revision by its stream sequence — None for a gap or a revision
    * that belongs to a DIFFERENT key (a misuse guard, not an error) */
  def getRevision(key: String, revision: Long): Option[KvEntry] = {
    val subj = subjectOf(key)
    t.directGet(stream, revision).filter(_.subject == subj).map(entryOf)
  }

  /** the key's retained revisions in order, markers included — depth is
    * bounded by the bucket's history property */
  def history(key: String): Seq[KvEntry] = {
    val cur = t.consumer(stream, startSeq = 1L,
      filterSubject = Some(subjectOf(key)))
    try {
      val out = Seq.newBuilder[KvEntry]
      var batch = cur.next(HistoryBatch)
      while (batch.nonEmpty) {
        batch.foreach(out += entryOf(_))
        batch = cur.next(HistoryBatch)
      }
      out.result()
    } finally cur.close()
  }

  /** shard `shard` of `nShards` of the LIVE keys (markers excluded),
    * sorted — O(keys) index pages, zero history volume */
  def keys(shard: Int = 0, nShards: Int = 1): Seq[String] =
    entries(shard, nShards).map(_.key)

  /** shard of the live (key → current entry) state, key-sorted */
  def entries(shard: Int = 0, nShards: Int = 1): Seq[KvEntry] =
    entriesIterator(shard, nShards).toSeq

  /** LAZILY-paged live entries of one shard — one index page in memory at
    * a time (a task scanning its shard of a 10M-key bucket holds 2048
    * entries, not the shard). `keyPrefix` narrows the INDEX walk: the
    * prefix's complete leading tokens ride the server-side subject filter
    * (`$$KV.b.app.>` for prefix `app.`), so non-matching subtrees never
    * cross the wire; a trailing partial token filters here before values
    * are decoded. A not-yet-created bucket iterates empty (wire parity
    * with the fixtures). `onPage` fires once per index RPC (metrics
    * hook). */
  def entriesIterator(shard: Int = 0, nShards: Int = 1,
                      keyPrefix: Option[String] = None,
                      onPage: () => Unit = () => ()): Iterator[KvEntry] = {
    require(nShards >= 1 && shard >= 0 && shard < nShards,
      s"bad kv shard $shard/$nShards")
    val prefix = s"$$KV.$bucket."
    val filter = prefix + keyPrefix.fold(">") { p =>
      val cut = p.lastIndexOf('.')
      if (cut < 0) ">" else p.substring(0, cut + 1) + ">"
    }
    val pages = Iterator.unfold((Option.empty[String], false)) {
      case (_, true) => None
      case (after, _) =>
        onPage()
        val page =
          try TransportRetry.withRetry(
            t.lastForSubjects(stream, Some(filter), shard, nShards,
              after, KeyPage))
          catch {
            case _: NatsStreamNotFoundException => Array.empty[TransportMsg]
          }
        if (page.isEmpty) None
        else Some((page,
          (Some(page.last.subject): Option[String], page.length < KeyPage)))
    }
    pages.flatten.map(entryOf).filter(e =>
      e.op == OpPut && keyPrefix.forall(e.key.startsWith(_)))
  }

  private def entryOf(m: TransportMsg): KvEntry =
    KvEntry(m.subject.stripPrefix(s"$$KV.$bucket."), m.payload, m.seq,
      m.tsNs, m.headers.getOrElse(OpHeader, OpPut))
}

object KvStore {
  /** the ADR marker header and its operations */
  val OpHeader = "KV-Operation"
  val OpPut = "PUT"
  val OpDel = "DEL"
  val OpPurge = "PURGE"

  val HistoryBatch = 256
  val KeyPage = 2048
  /** entries per pipelined publish window on the bulk-ingest path */
  val BulkWindow = 1024

  /** ADR-8 key grammar: `[-/_=a-zA-Z0-9]` tokens joined by '.', no empty
    * tokens (keys are subject paths; wildcards/spaces would corrupt
    * routing) */
  def requireValidKey(key: String): Unit = {
    require(key.nonEmpty && !key.startsWith(".") && !key.endsWith("."),
      s"invalid kv key '$key' (empty or leading/trailing '.')")
    require(key.forall(c => c == '.' || c == '-' || c == '/' || c == '_' ||
      c == '=' || Character.isLetterOrDigit(c)) && !key.contains(".."),
      s"invalid kv key '$key' (allowed: [-/_=a-zA-Z0-9] tokens joined by '.')")
  }
}

/** One key record: `revision` is the stream sequence; `op` is PUT for live
  * values, DEL/PURGE for tombstone markers (history() surfaces those). */
final case class KvEntry(key: String, value: Array[Byte], revision: Long,
                         tsNs: Long, op: String) {
  def valueUtf8: String = new String(value, UTF_8)
}
