package graft.transport

import java.util.concurrent.ConcurrentSkipListMap
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** In-JVM fake JetStream: a process-local "server" registry keyed by
  * host:port, each server holding streams as seq-ordered maps with real gap
  * semantics (deleted sequences answer NOT_FOUND, exactly what Direct Get
  * returns for compacted messages, nats_scan.cpp:725-729).
  *
  * This is the offline stand-in for a network JetStream cluster: everything
  * the reference exercises against a live server — lazy connect, connect
  * timeout, stream-not-found, per-seq Direct Get, NOT_FOUND gap skip,
  * timestamp binary search — runs for real against this fake, in-process.
  * It is intentionally NOT a mock: messages are stored, fetched and gap-
  * skipped through the same [[JetStreamTransport]] code paths a live client
  * would use. Only the wire is missing.
  */
final class FakeJetStreamServer {
  private val streams =
    new TrieMap[String, ConcurrentSkipListMap[Long, TransportMsg]]()

  // State.Bytes analog, maintained as a RUNNING counter at publish/delete —
  // streamInfo must stay O(1) (the live-tail poll and planner statistics
  // both call it per trigger/plan; walking the store would be O(n) each)
  // LongAdder, not AtomicLong: 32 executor threads bulk-loading a fixture
  // all CAS the same counter — striped adders keep the publish path from
  // serializing on one cache line (sum() is only read at streamInfo)
  private val streamBytes =
    new TrieMap[String, java.util.concurrent.atomic.LongAdder]()

  private def wireBytes(m: TransportMsg): Long =
    m.subject.getBytes("UTF-8").length.toLong + m.payload.length.toLong

  private def countPut(stream: String, prev: TransportMsg,
                       msg: TransportMsg): Unit = {
    val c = streamBytes.getOrElseUpdate(
      stream, new java.util.concurrent.atomic.LongAdder())
    c.add(wireBytes(msg) - (if (prev != null) wireBytes(prev) else 0L))
    ()
  }

  // per-subject LAST-seq index (JetStream keeps exactly this — it is what
  // answers DirectGet last_by_subj and enforces max_msgs_per_subject/KV),
  // maintained incrementally at publish so lastForSubjects never walks the
  // message log. subjectCounts is the StreamInfo `subjects` map (per-subject
  // message counts) — same incremental maintenance.
  private val lastBySubject =
    new TrieMap[String, ConcurrentSkipListMap[String, Long]]()
  private val subjectCounts =
    new TrieMap[String, ConcurrentSkipListMap[String, Long]]()
  // per-subject FIRST-seq index — the other half of the filestore's
  // per-subject info. Filtered consumers use (first, last) to SKIP-AHEAD:
  // a real server's LoadNextMsg never walks blocks that cannot contain the
  // filter subject, so a consumer filtered on one object's chunk subject
  // costs O(that object's span), not O(stream). Without this the object
  // store's bucket scan is quadratic (probe: 16k × 8 KiB objects = 200 s).
  private val firstBySubject =
    new TrieMap[String, ConcurrentSkipListMap[String, Long]]()

  /** `(first, last)` seq bounds for one EXACT subject, or None if the
    * stream currently has no message with it. */
  private[transport] def subjectBounds(stream: String,
                                       subject: String): Option[(Long, Long)] =
    for {
      lastIdx <- lastBySubject.get(stream)
      last = lastIdx.getOrDefault(subject, Long.MinValue)
      if last != Long.MinValue
      firstIdx <- firstBySubject.get(stream)
      first = firstIdx.getOrDefault(subject, Long.MinValue)
      if first != Long.MinValue
    } yield (first, last)

  /** Highest seq strictly below `seq` whose message carries `subject`, or
    * Long.MinValue — descending walk with early exit, used to re-point the
    * last-by-subject index when its current entry is removed/replaced. */
  private def firstBelowWithSubject(
      m: ConcurrentSkipListMap[Long, TransportMsg], seq: Long,
      subject: String): Long = {
    val it = m.headMap(seq, false).descendingMap().values().iterator()
    while (it.hasNext) {
      val x = it.next()
      if (x.subject == subject) return x.seq
    }
    Long.MinValue
  }

  /** Lowest seq strictly above `seq` whose message carries `subject`, or
    * Long.MinValue — ascending walk with early exit (re-points the
    * first-by-subject index when its current entry goes away). */
  private def firstAboveWithSubject(
      m: ConcurrentSkipListMap[Long, TransportMsg], seq: Long,
      subject: String): Long = {
    val it = m.tailMap(seq, false).values().iterator()
    while (it.hasNext) {
      val x = it.next()
      if (x.subject == subject) return x.seq
    }
    Long.MinValue
  }

  private def indexPut(stream: String, prev: TransportMsg,
                       msg: TransportMsg): Unit = {
    if (msg.subject != null) {
      val idx = lastBySubject.getOrElseUpdate(
        stream, new ConcurrentSkipListMap[String, Long]())
      idx.merge(msg.subject, msg.seq,
        (cur, s) => if (s > cur) s else cur)
      val fidx = firstBySubject.getOrElseUpdate(
        stream, new ConcurrentSkipListMap[String, Long]())
      fidx.merge(msg.subject, msg.seq,
        (cur, s) => if (s < cur) s else cur)
      ()
    }
    // a republish at an existing seq under a DIFFERENT subject (fixture-
    // loading only — a real server never reassigns a sequence) re-points
    // the old subject's last entry at its surviving predecessor
    if (prev != null && prev.subject != null &&
        (msg.subject == null || prev.subject != msg.subject)) {
      lastBySubject.get(stream).foreach { idx =>
        if (idx.getOrDefault(prev.subject, Long.MinValue) == msg.seq) {
          val replacement = streams.get(stream).fold(Long.MinValue)(
            firstBelowWithSubject(_, msg.seq, prev.subject))
          if (replacement == Long.MinValue) idx.remove(prev.subject)
          else idx.put(prev.subject, replacement)
          ()
        }
      }
      firstBySubject.get(stream).foreach { idx =>
        if (idx.getOrDefault(prev.subject, Long.MinValue) == msg.seq) {
          val replacement = streams.get(stream).fold(Long.MinValue)(
            firstAboveWithSubject(_, msg.seq, prev.subject))
          if (replacement == Long.MinValue) idx.remove(prev.subject)
          else idx.put(prev.subject, replacement)
          ()
        }
      }
    }
    val counts = subjectCounts.getOrElseUpdate(
      stream, new ConcurrentSkipListMap[String, Long]())
    // a publish at an existing seq REPLACES: the old subject loses a count,
    // and a count that drops to 0 loses its ENTRY (mirroring deleteMsg) so
    // subjectStatsPage never emits a phantom zero-count group
    if (prev != null && prev.subject != null) {
      val left = counts.merge(prev.subject, -1L, (a, b) => a + b)
      if (left <= 0L) counts.remove(prev.subject)
    }
    if (msg.subject != null) counts.merge(msg.subject, 1L, (a, b) => a + b)
    ()
  }

  def addStream(name: String): Unit = {
    require(name.nonEmpty, "stream name must not be empty")
    streams.putIfAbsent(name, new ConcurrentSkipListMap[Long, TransportMsg]())
    ()
  }

  /** publish at an explicit sequence (fixture loading). */
  def publish(stream: String, seq: Long, subject: String, tsNs: Long,
              payload: Array[Byte]): Unit = {
    addStream(stream)
    val msg = TransportMsg(subject, seq, tsNs, payload)
    val prev = streams(stream).put(seq, msg)
    countPut(stream, prev, msg)
    indexPut(stream, prev, msg)
  }

  /** delete one message — subsequent Direct Gets at `seq` answer NOT_FOUND
    * (how JetStream compaction/MsgDelete creates sequence gaps). */
  def deleteMsg(stream: String, seq: Long): Unit = {
    streams.get(stream).foreach { m =>
      val prev = m.remove(seq)
      if (prev != null) {
        streamBytes.get(stream).foreach(_.add(-wireBytes(prev)))
        if (prev.subject != null)
          subjectCounts.get(stream).foreach { c =>
            val left = c.merge(prev.subject, -1L, (a, b) => a + b)
            if (left <= 0L) c.remove(prev.subject)
            ()
          }
        // deleting a subject's CURRENT message re-points the index at the
        // survivor. The survivor is the NEAREST earlier same-subject
        // message (the index holds the max seq, so nothing later matches):
        // walk backward from the deleted seq and stop at the first hit —
        // O(inter-arrival gap), not O(stream) (a full-log rescan here made
        // bulk gap-punching quadratic: 6k deletes × 600k messages at sf0.1)
        if (prev.subject != null) {
          lastBySubject.get(stream).foreach { idx =>
            if (idx.getOrDefault(prev.subject, Long.MinValue) == seq) {
              val replacement = firstBelowWithSubject(m, seq, prev.subject)
              if (replacement == Long.MinValue) idx.remove(prev.subject)
              else idx.put(prev.subject, replacement)
              ()
            }
          }
          // same re-point for the FIRST index: the survivor is the nearest
          // LATER same-subject message (nothing earlier can match a min)
          firstBySubject.get(stream).foreach { idx =>
            if (idx.getOrDefault(prev.subject, Long.MinValue) == seq) {
              val replacement = firstAboveWithSubject(m, seq, prev.subject)
              if (replacement == Long.MinValue) idx.remove(prev.subject)
              else idx.put(prev.subject, replacement)
              ()
            }
          }
        }
      }
    }
  }

  /** purge every message matching `filter` (NATS wildcard grammar) except
    * the NEWEST `keep` — the JetStream purge-by-subject this fixture's
    * STREAM.PURGE API serves (`keep=1` on a meta subject is the rollup).
    * A LITERAL filter rides the per-subject (first, last) index, so
    * reclaiming one object's chunk subject costs O(its own span), never
    * O(stream); wildcards walk the log (a real server's filtered purge
    * also scans blocks there). Index/count/bytes bookkeeping all route
    * through [[deleteMsg]]. Returns the purged count. */
  def purgeSubject(stream: String, filter: String, keep: Int = 0): Long =
    streams.get(stream).fold(0L) { m =>
      val window: java.util.Map[Long, TransportMsg] =
        if (SubjectFilter.isLiteral(filter))
          subjectBounds(stream, filter) match {
            case None => java.util.Collections.emptyMap[Long, TransportMsg]()
            case Some((first, last)) => m.subMap(first, true, last, true)
          }
        else m
      val matcher = SubjectFilter.matcher(filter)
      val seqs = Array.newBuilder[Long]
      val it = window.values().iterator() // ascending seq (skip-list order)
      while (it.hasNext) {
        val msg = it.next()
        if (matcher.matches(msg.subject)) seqs += msg.seq
      }
      val all = seqs.result()
      val hit = if (keep > 0) all.dropRight(keep) else all
      hit.foreach(deleteMsg(stream, _))
      hit.length.toLong
    }

  private val msgIds = new TrieMap[(String, String), Long]()

  /** append-publish with `Nats-Msg-Id` dedup: a repeated id returns the
    * original sequence without storing a second copy. Synchronized so the
    * (check id, assign seq, store) step is atomic like a real server's —
    * which is also what makes `expectLastSubjectSeq` (the per-subject CAS,
    * `Nats-Expected-Last-Subject-Sequence`) race-free: the check against
    * the subject's current last seq and the append are one critical
    * section, exactly a real server's stream-lock semantics.
    *
    * `Nats-Rollup: sub` (ADR-20) is honored HERE, inside the same
    * critical section: the append erases every PRIOR message of its
    * subject — which is why the object store's meta rollup survives even
    * two racing fresh-name puts (a client-side purge could not). Reserved
    * transport keys are stripped before storage; app headers persist. */
  def publishAppend(stream: String, subject: String, tsNs: Long,
                    payload: Array[Byte], msgId: String,
                    headers: Map[String, String] = Map.empty,
                    expectLastSubjectSeq: Option[Long] = None): Long = synchronized {
    addStream(stream)
    msgIds.get((stream, msgId)) match {
      case Some(seq) => seq // duplicate inside the dedup window: no-op ack
      case None =>
        expectLastSubjectSeq.foreach { want =>
          val cur = lastBySubject.get(stream)
            .map(_.getOrDefault(subject, 0L)).getOrElse(0L)
          if (cur != want)
            throw new NatsWrongLastSequenceException(
              s"wrong last sequence: $cur", cur)
        }
        val rollup = headers.get("Nats-Rollup").contains("sub")
        val m = streams(stream)
        val seq = if (m.isEmpty) 1L else m.lastKey() + 1L
        val msg = TransportMsg(subject, seq, tsNs, payload,
          headers -- NatsWireClient.ReservedHeaders)
        val prev = m.put(seq, msg)
        countPut(stream, prev, msg)
        indexPut(stream, prev, msg)
        msgIds.put((stream, msgId), seq)
        if (rollup) {
          // erase every prior message of this subject (bookkeeping rides
          // deleteMsg); bounds read AFTER the append so first..seq-1 is
          // exactly the history
          subjectBounds(stream, subject).foreach { case (first, _) =>
            val it = m.subMap(first, true, seq, false).values().iterator()
            val priors = Array.newBuilder[Long]
            while (it.hasNext) {
              val x = it.next()
              if (x.subject == subject) priors += x.seq
            }
            priors.result().foreach(deleteMsg(stream, _))
          }
        }
        seq
    }
  }

  /** one page of the per-subject stats (StreamInfo `subjects` map + last
    * index): subjects ascending, sharded, strictly after `after`, filtered,
    * ≤ `max` (subject, count, lastSeq) entries. */
  private[transport] def subjectStatsPage(stream: String, filter: Option[String],
                                          bucket: Int, nBuckets: Int,
                                          after: Option[String], max: Int)
      : Array[SubjectStat] = {
    val counts = subjectCounts.get(stream)
    val lasts = lastBySubject.get(stream)
    if (counts.isEmpty) return Array.empty
    val m = filter.map(SubjectFilter.matcher)
    val tail: java.util.concurrent.ConcurrentNavigableMap[String, Long] =
      after.fold(counts.get: java.util.concurrent.ConcurrentNavigableMap[String, Long])(
        a => counts.get.tailMap(a, false))
    val out = Array.newBuilder[SubjectStat]
    var n = 0
    val it = tail.entrySet().iterator()
    while (it.hasNext && n < max) {
      val e = it.next()
      if (SubjectFilter.shard(e.getKey, nBuckets) == bucket &&
          m.forall(_.matches(e.getKey))) {
        val last = lasts.fold(0L)(_.getOrDefault(e.getKey, 0L))
        out += SubjectStat(e.getKey, e.getValue, last)
        n += 1
      }
    }
    out.result()
  }

  /** one page of the per-subject last-message index (see
    * [[JetStreamTransport.lastForSubjects]]): subjects ascending, sharded,
    * strictly after `after`, filtered, ≤ `max` CURRENT messages. */
  private[transport] def lastsPage(stream: String, filter: Option[String],
                                   bucket: Int, nBuckets: Int,
                                   after: Option[String], max: Int)
      : Array[TransportMsg] = {
    val idx = lastBySubject.get(stream)
    val log = streams.get(stream)
    if (idx.isEmpty || log.isEmpty) return Array.empty
    val m = filter.map(SubjectFilter.matcher)
    val tail: java.util.concurrent.ConcurrentNavigableMap[String, Long] =
      after.fold(idx.get: java.util.concurrent.ConcurrentNavigableMap[String, Long])(
        a => idx.get.tailMap(a, false))
    val out = Array.newBuilder[TransportMsg]
    var n = 0
    val it = tail.entrySet().iterator()
    while (it.hasNext && n < max) {
      val e = it.next()
      if (SubjectFilter.shard(e.getKey, nBuckets) == bucket &&
          m.forall(_.matches(e.getKey))) {
        val msg = log.get.get(e.getValue)
        // subject guard: a stale entry (raced delete/replace) must never
        // surface another subject's message under this key
        if (msg != null && msg.subject == e.getKey) { out += msg; n += 1 }
      }
    }
    out.result()
  }

  def hasStream(name: String): Boolean = streams.contains(name)

  /** sorted stream names — the "stream list" discovery API */
  def streamNames: Seq[String] = streams.keys.toSeq.sorted

  private[transport] def state(stream: String): Option[StreamState] =
    streams.get(stream).map { m =>
      if (m.isEmpty) StreamState(0L, 0L, 0L)
      else StreamState(m.firstKey(), m.lastKey(), m.size().toLong,
        math.max(streamBytes.get(stream).fold(0L)(_.sum()), 0L))
    }

  private[transport] def get(stream: String, seq: Long): Option[TransportMsg] =
    streams.get(stream).flatMap(m => Option(m.get(seq)))

  private[transport] def range(stream: String, from: Long, to: Long,
                               max: Int): Array[TransportMsg] =
    streams.get(stream) match {
      case None => Array.empty
      case Some(_) if from > to => Array.empty // drained past a bounded stop
      case Some(m) =>
        m.subMap(from, true, to, true).values().iterator().asScala
          .take(max).toArray
    }

  // --- durable consumers: cumulative (AckAll) ack floors per
  // (stream, durable), the server-side progress state that survives any
  // client's death ---
  private val durables =
    new TrieMap[(String, String), java.util.concurrent.atomic.AtomicLong]()

  private[transport] def durableFloor(stream: String, durable: String): Long =
    durables.get((stream, durable)).fold(0L)(_.get())

  private[transport] def durableAckAll(stream: String, durable: String,
                                       seq: Long): Unit = {
    val floor = durables.getOrElseUpdate((stream, durable),
      new java.util.concurrent.atomic.AtomicLong(0L))
    floor.getAndUpdate(cur => math.max(cur, seq)) // monotonic, never regresses
    ()
  }

  // --- consumer groups: QUEUE-GROUP delivery (the reference roadmap's
  // "Consumer groups — distributed processing across multiple workers",
  // /root/reference/docs/GUIDE.md:461-464). The SERVER splits delivery:
  // each message is claimed by exactly one member per delivery attempt;
  // members ack explicitly; a claim whose ack-wait lease expires (member
  // died, task retried) returns to the pool and is REDELIVERED to whichever
  // member asks next. Total delivery volume is O(messages), never
  // O(members × messages) — the wire-cost contrast with the deterministic
  // seq%n sharding, where every shard fetches the whole log. ---

  private final class GroupState(var cursor: Long,
                                 val filter: Option[SubjectFilter.Matcher],
                                 val filterPattern: Option[String]) {
    /** claimed-but-unacked: seq → (member, lease deadline ns) */
    val pending = new java.util.TreeMap[Long, (String, Long)]()
    /** expired claims awaiting redelivery, ascending */
    val redeliver = new java.util.TreeSet[Long]()
  }

  private val groups = new TrieMap[(String, String), GroupState]()

  /** Claim the next ≤ `max` deliverable messages with seq ≤ `maxSeq` for
    * `member`: expired leases first (redelivery), then fresh messages past
    * the group cursor, skipping gaps and non-matching subjects. Claimed
    * seqs hold a lease of `ackWaitMs`; an empty result with
    * [[groupPendingCount]] == 0 means the group is fully drained up to
    * `maxSeq`. The group is created on first touch with its cursor at the
    * stream's FirstSeq and `filterSubject` pinned (changing the filter of a
    * live consumer is a config error, as on a real server). */
  private[transport] def groupNext(stream: String, group: String,
                                   member: String, maxSeq: Long, max: Int,
                                   ackWaitMs: Long,
                                   filterSubject: Option[String])
      : Array[TransportMsg] = {
    val log = streams.get(stream).getOrElse(return Array.empty)
    val st = groups.getOrElseUpdate((stream, group), {
      val first = if (log.isEmpty) 1L else log.firstKey()
      new GroupState(first, filterSubject.map(SubjectFilter.matcher),
        filterSubject)
    })
    if (st.filterPattern != filterSubject)
      throw new IllegalArgumentException(
        s"consumer group '$group' exists with filter ${st.filterPattern}; " +
          s"cannot re-join with filter $filterSubject (delete the group or " +
          "use a new name)")
    st.synchronized {
      val now = System.nanoTime()
      // expire stale leases → redelivery pool
      val it = st.pending.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue._2 <= now) { st.redeliver.add(e.getKey); it.remove(); () }
      }
      val leaseNs = now + ackWaitMs * 1000000L
      val out = Array.newBuilder[TransportMsg]
      var n = 0
      // redeliveries first (they are the oldest obligations); entries past
      // maxSeq stay queued for a member whose window covers them
      while (n < max && !st.redeliver.isEmpty &&
          st.redeliver.first() <= maxSeq) {
        val seq = st.redeliver.pollFirst()
        val msg = log.get(seq)
        if (msg != null) { // deleted meanwhile → claim dissolves
          st.pending.put(seq, (member, leaseNs))
          out += msg
          n += 1
        }
      }
      // fresh deliveries: advance the group cursor through the log
      var more = n < max
      while (more) {
        val e = log.ceilingEntry(st.cursor)
        if (e == null || e.getKey > maxSeq) more = false
        else {
          val msg = e.getValue
          st.cursor = e.getKey + 1L
          if (st.filter.forall(_.matches(msg.subject))) {
            st.pending.put(e.getKey, (member, leaseNs))
            out += msg
            n += 1
            if (n >= max) more = false
          }
        }
      }
      out.result()
    }
  }

  /** Explicit per-message acks: settled claims leave the pending set. */
  private[transport] def groupAck(stream: String, group: String,
                                  seqs: Array[Long]): Unit =
    groups.get((stream, group)).foreach { st =>
      st.synchronized { seqs.foreach(st.pending.remove); () }
    }

  /** `+WPI` batch: refresh the lease deadline of each STILL-PENDING claim
    * (holder unchanged). Settled seqs, or claims already expired and
    * reclaimed by another member, are ignored — a late in-progress ack has
    * no authority, exactly as on a real server. */
  private[transport] def groupExtend(stream: String, group: String,
                                     seqs: Array[Long],
                                     ackWaitMs: Long): Unit =
    groups.get((stream, group)).foreach { st =>
      st.synchronized {
        val until = System.nanoTime() + ackWaitMs * 1000000L
        seqs.foreach { s =>
          val cur = st.pending.get(s)
          if (cur != null) { st.pending.put(s, (cur._1, until)); () }
        }
      }
    }

  /** Negative ack: the claim returns to the redelivery pool IMMEDIATELY
    * (no lease wait) — the wire protocol's `-NAK` verb. */
  private[transport] def groupNack(stream: String, group: String,
                                   seqs: Array[Long]): Unit =
    groups.get((stream, group)).foreach { st =>
      st.synchronized {
        seqs.foreach { s =>
          if (st.pending.remove(s) != null) { st.redeliver.add(s); () }
        }
      }
    }

  /** Delayed negative ack (`-NAK {"delay": ns}`): the claim stays PARKED —
    * held under a phantom lease expiring after `delayNs` — before it
    * re-enters the redelivery pool. What keeps a client's out-of-window
    * rejections from being re-claimed on the very next pull. */
  private[transport] def groupNackDelayed(stream: String, group: String,
                                          seqs: Array[Long],
                                          delayNs: Long): Unit =
    groups.get((stream, group)).foreach { st =>
      st.synchronized {
        val until = System.nanoTime() + delayNs
        seqs.foreach { s =>
          if (st.pending.remove(s) != null) {
            st.pending.put(s, ("__nak-delay", until)); ()
          }
        }
      }
    }

  /** Unsettled obligations (claimed-but-unacked + awaiting redelivery):
    * 0 together with an empty [[groupNext]] means fully drained. */
  private[transport] def groupPendingCount(stream: String, group: String): Long =
    groups.get((stream, group)).fold(0L) { st =>
      st.synchronized { (st.pending.size + st.redeliver.size).toLong }
    }

  // --- observability: successful dials against this server, so specs can
  // pin the connection topology (planning = 1 dial, readers ≤ 1 per task /
  // per pooled executor) the way rpcCount pins probe complexity ---
  private val dials = new java.util.concurrent.atomic.AtomicLong(0L)
  private[transport] def countDial(): Unit = { dials.incrementAndGet(); () }
  def connectCount: Long = dials.get()

  // server-wide RPC total across ALL connections — the per-transport
  // rpcCount blurs once connections are pooled and shared
  private val rpcTotal = new java.util.concurrent.atomic.AtomicLong(0L)
  private[transport] def countRpc(): Unit = { rpcTotal.incrementAndGet(); () }
  def rpcCountTotal: Long = rpcTotal.get()

  // --- fault injection: the next `n` data RPCs fail transiently (the
  // connection-dropped-mid-slice shape readers must retry through) ---
  private val faultBudget = new java.util.concurrent.atomic.AtomicInteger(0)

  def injectFaults(n: Int): Unit = { faultBudget.set(n); () }

  private[transport] def takeFault(): Boolean = {
    val left = faultBudget.getAndUpdate(v => if (v > 0) v - 1 else v)
    left > 0
  }
}

object FakeJetStream {
  private val registry = new TrieMap[String, FakeJetStreamServer]()
  private val blackholes = new TrieMap[String, Unit]()
  private val tokens = new TrieMap[String, String]()
  private val creds = new TrieMap[String, String]()   // addr → expected user JWT
  private val nkeys = new TrieMap[String, String]()   // addr → expected user seed
  private val tlsOnly = new TrieMap[String, Unit]()

  /** start (or reuse) a fake server listening at `host:port` (also accepts a
    * full nats:// URL for convenience). */
  def listen(address: String): FakeJetStreamServer =
    registry.getOrElseUpdate(normalize(address), new FakeJetStreamServer)

  /** require token auth on an address: dials whose URL userinfo does not
    * carry this token are rejected with the server's status text. */
  def requireToken(address: String, token: String): Unit = {
    tokens.put(normalize(address), token)
    ()
  }

  /** require JWT/creds auth: the dial must present this user JWT (what a
    * live server resolves from the account tree; the fake pins the one
    * expected identity). */
  def requireCreds(address: String, jwt: String): Unit = {
    creds.put(normalize(address), jwt)
    ()
  }

  /** require NKey auth. A real server stores the user's PUBLIC key and
    * verifies an ed25519 signature over its connect nonce; the fake pins
    * the seed and compares the derived identity directly — same
    * accept/reject surface, no crypto in the test loop. */
  def requireNkey(address: String, seed: String): Unit = {
    nkeys.put(normalize(address), seed)
    ()
  }

  /** require TLS: dials that do not request a TLS session fail the
    * handshake (a live server advertises `tls_required` in INFO and drops
    * plaintext CONNECTs). */
  def requireTls(address: String): Unit = {
    tlsOnly.put(normalize(address), ())
    ()
  }

  /** register an address that accepts the TCP dial but never completes the
    * NATS handshake — connects to it time out (error test E4's wrong-port /
    * unreachable-server shape). */
  def blackhole(address: String): Unit = {
    blackholes.put(normalize(address), ())
    ()
  }

  def reset(): Unit = {
    registry.clear(); blackholes.clear(); tokens.clear()
    creds.clear(); nkeys.clear(); tlsOnly.clear()
    TransportPool.clear() // pooled handles hold refs into the old registry
  }

  /** is any fixture (server, blackhole) registered at this address? —
    * [[Transport.connect]] routes here first, and to the REAL socket
    * client otherwise */
  private[transport] def knows(addr: String): Boolean =
    registry.contains(addr) || blackholes.contains(addr)

  private def normalize(address: String): String =
    if (address.startsWith("nats://")) {
      val u = new java.net.URI(address)
      s"${u.getHost}:${if (u.getPort < 0) 4222 else u.getPort}"
    } else address

  /** connect semantics (called by [[Transport.connect]]): resolves the
    * address against the in-JVM registry the way a dialer resolves a socket.
    * The blackhole branch really waits out the timeout — connect-timeout
    * handling is part of what the specs exercise. */
  private[transport] def dial(addr: String, timeoutMs: Long,
                              token: Option[String] = None,
                              auth: TransportAuth = TransportAuth.anonymous)
      : JetStreamTransport = {
    if (blackholes.contains(addr)) {
      Thread.sleep(math.max(0L, timeoutMs))
      throw new NatsConnectException("Failed to connect to NATS: Timeout")
    }
    val server = registry.getOrElse(addr,
      throw new NatsConnectException(
        "Failed to connect to NATS: No server available for connection"))
    // TLS gate first — on a live server the TLS upgrade happens right after
    // INFO, before any CONNECT credentials are read
    if (tlsOnly.contains(addr) && !auth.tls)
      throw new NatsConnectException(
        "Failed to connect to NATS: TLS handshake failure (server requires TLS)")
    // token auth (nats://<token>@host:port): reject missing/wrong creds
    // with the NATS server's own status text
    tokens.get(addr).foreach { want =>
      if (!token.contains(want))
        throw new NatsConnectException(
          "Failed to connect to NATS: Authorization Violation")
    }
    creds.get(addr).foreach { want =>
      if (!auth.credsJwt.contains(want))
        throw new NatsConnectException(
          "Failed to connect to NATS: Authorization Violation")
    }
    nkeys.get(addr).foreach { want =>
      if (!auth.nkeySeed.contains(want))
        throw new NatsConnectException(
          "Failed to connect to NATS: Authorization Violation")
    }
    server.countDial()
    new FakeTransport(server)
  }
}

/** Client handle over one fake server. Counts "RPCs" (one per Direct Get,
  * one per batched fetch, one per stream-info) so specs can assert the
  * transport topology: binary search ≈ log2(n) probes, bounded scans ≈
  * ceil(n/batch) fetches — not one call per message. */
final class FakeTransport(server: FakeJetStreamServer) extends JetStreamTransport {
  private val rpcs = new java.util.concurrent.atomic.AtomicLong(0L)
  def rpcCount: Long = rpcs.get()
  private def count(): Unit = { rpcs.incrementAndGet(); server.countRpc() }

  override def streamInfo(stream: String): StreamState = {
    count()
    if (stream.isEmpty)
      throw new NatsStreamNotFoundException(
        "Failed to get stream info: invalid stream name (empty)")
    server.state(stream).getOrElse(
      throw new NatsStreamNotFoundException(
        s"Failed to get stream info: stream not found ($stream)"))
  }

  /** injected transient faults surface on data RPCs, like a dropped
    * connection mid-slice */
  private def maybeFault(): Unit =
    if (server.takeFault())
      throw new NatsIOException(
        "Failed to fetch messages: Connection Closed (transient)")

  override def directGet(stream: String, seq: Long): Option[TransportMsg] = {
    count()
    maybeFault()
    server.get(stream, seq)
  }

  override def fetch(stream: String, fromSeq: Long, toSeq: Long,
                     max: Int): Array[TransportMsg] = {
    count()
    maybeFault()
    server.range(stream, fromSeq, toSeq, max)
  }

  override def listStreams(): Seq[String] = {
    count()
    server.streamNames
  }

  override def consumer(stream: String, startSeq: Long,
                        filterSubject: Option[String] = None): MessageCursor =
    new MessageCursor {
      // server-side cursor position: faults surface BEFORE the position
      // advances, so a retried next() re-delivers from the same place —
      // the ordered-consumer recreate-at-last-delivered contract
      private var cur = startSeq
      private val matcher = filterSubject.map(SubjectFilter.matcher)
      private val literal = filterSubject.filter(SubjectFilter.isLiteral)
      override def next(max: Int): Array[TransportMsg] = {
        count()
        maybeFault()
        matcher match {
          case None =>
            val out = server.range(stream, cur, Long.MaxValue, max)
            if (out.nonEmpty) cur = out.last.seq + 1L
            out
          case Some(m) =>
            // filtered consumer: the SERVER walks its log and delivers only
            // matching messages (filter_subject semantics) — the position
            // still advances past everything examined, so a sparse match
            // never stalls the cursor. Empty result ⟺ log exhausted.
            // A LITERAL filter rides the per-subject (first, last) index:
            // jump the cursor to the subject's span and stop past its end —
            // the filestore skip-ahead that keeps a chunk fetch O(its own
            // object), not O(stream). Bounds re-read per call: publishes
            // since the last page extend `last` and the cursor picks up.
            val stop = literal match {
              case Some(subj) => server.subjectBounds(stream, subj) match {
                case None => return Array.empty // subject has no messages
                case Some((first, last)) =>
                  if (first > cur) cur = first
                  if (cur > last) return Array.empty
                  last
              }
              case None => Long.MaxValue
            }
            val out = Array.newBuilder[TransportMsg]
            var n = 0
            var exhausted = false
            while (n < max && !exhausted) {
              val chunk = server.range(stream, cur, stop, max)
              if (chunk.isEmpty) exhausted = true
              else {
                // the position advances message-BY-message: filling the page
                // mid-chunk must not skip unexamined messages (they belong
                // to the next next())
                var i = 0
                while (i < chunk.length && n < max) {
                  val msg = chunk(i)
                  if (m.matches(msg.subject)) { out += msg; n += 1 }
                  cur = msg.seq + 1L
                  i += 1
                }
              }
            }
            out.result()
        }
      }
      override def close(): Unit = ()
    }

  override def lastForSubjects(stream: String, filterSubject: Option[String],
                               bucket: Int, nBuckets: Int,
                               afterSubject: Option[String], max: Int)
      : Array[TransportMsg] = {
    count()
    maybeFault()
    server.lastsPage(stream, filterSubject, bucket, nBuckets, afterSubject, max)
  }

  override def subjectStats(stream: String, filterSubject: Option[String],
                            bucket: Int, nBuckets: Int,
                            afterSubject: Option[String], max: Int)
      : Array[SubjectStat] = {
    count()
    maybeFault()
    server.subjectStatsPage(stream, filterSubject, bucket, nBuckets,
      afterSubject, max)
  }

  override def publish(stream: String, subject: String, tsNs: Long,
                       payload: Array[Byte], msgId: String,
                       headers: Map[String, String] = Map.empty,
                       expectLastSubjectSeq: Option[Long] = None): Long = {
    count()
    server.publishAppend(stream, subject, tsNs, payload, msgId, headers,
      expectLastSubjectSeq)
  }

  override def purgeSubject(stream: String, filter: String,
                            keep: Int = 0): Long = {
    count()
    maybeFault()
    server.purgeSubject(stream, filter, keep)
  }

  override def groupNext(stream: String, group: String, member: String,
                         maxSeq: Long, max: Int, ackWaitMs: Long,
                         filterSubject: Option[String]): Array[TransportMsg] = {
    count()
    maybeFault()
    server.groupNext(stream, group, member, maxSeq, max, ackWaitMs,
      filterSubject)
  }

  override def groupAck(stream: String, group: String,
                        seqs: Array[Long]): Unit = {
    count()
    server.groupAck(stream, group, seqs)
  }

  override def groupProgress(stream: String, group: String,
                             seqs: Array[Long], ackWaitMs: Long): Unit = {
    count()
    server.groupExtend(stream, group, seqs, ackWaitMs)
  }

  override def groupPending(stream: String, group: String): Long = {
    count()
    server.groupPendingCount(stream, group)
  }

  override def ackFloor(stream: String, durable: String): Long = {
    count()
    server.durableFloor(stream, durable)
  }

  override def ackAll(stream: String, durable: String, seq: Long): Unit = {
    count()
    server.durableAckAll(stream, durable, seq)
  }

  override def close(): Unit = ()
}
