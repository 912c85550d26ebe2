package graft.transport

/** The JetStream client surface the reference engine consumes — extracted as
  * a seam so the same Spark scan code runs against any wire implementation.
  *
  * The reference talks to JetStream through exactly four client touchpoints
  * (/root/reference/src/nats_scan.cpp):
  *   - connect with a 5 s timeout                      (:609-636)
  *   - stream info (FirstSeq/LastSeq)                  (:646-658)
  *   - Direct Get one message by sequence, NOT_FOUND
  *     meaning a gap to skip                           (:713-729)
  *   - timestamp→sequence binary search built from
  *     repeated Direct Gets                            (:548-595)
  * This trait is those touchpoints, nothing more. [[FakeJetStream]] provides
  * the in-JVM implementation (the sandbox has no network); a production
  * build would implement the same trait over jnats and change NOTHING above
  * this seam — `docs/LIVE_NATS.md` specifies that deployment (per-task
  * ordered consumers, batched fetch, pooled connections).
  */
trait JetStreamTransport extends AutoCloseable {

  /** FirstSeq/LastSeq of the stream — the analog of js_GetStreamInfo
    * (nats_scan.cpp:646-653). Throws [[NatsStreamNotFoundException]]. */
  def streamInfo(stream: String): StreamState

  /** Direct Get by sequence (nats_scan.cpp:713-723). `None` == NATS_NOT_FOUND:
    * a deleted/compacted message — callers skip to the next sequence
    * (:725-729), they do not fail. */
  def directGet(stream: String, seq: Long): Option[TransportMsg]

  /** Batched pull of `[fromSeq, toSeq]`, at most `max` messages, gaps
    * skipped. One "RPC" per call — the scale lever over the reference's
    * one-RPC-per-message loop (docs/LIVE_NATS.md: Fetch(batch=2048)).
    * Returns messages in sequence order. */
  def fetch(stream: String, fromSeq: Long, toSeq: Long, max: Int): Array[TransportMsg]

  /** Names of every stream on the server, sorted — the JetStream "stream
    * list" API backing catalog discovery (`SHOW TABLES` over a NATS
    * catalog; reference roadmap /root/reference/docs/GUIDE.md:492). */
  def listStreams(): Seq[String]

  /** Ordered ephemeral consumer starting at `startSeq` — the per-task
    * cursor of docs/LIVE_NATS.md ("one consumer per partition, batched
    * fetch"): each `next(max)` delivers the following messages in sequence
    * order, gaps skipped, server tracking the position. A live binding maps
    * this to an ordered consumer + `Fetch(batch)`; after a transient error
    * the cursor re-requests the SAME position (ordered consumers recreate
    * at the last delivered sequence), so reader retries are safe.
    *
    * `filterSubject` is the consumer's `filter_subject` (NATS wildcard
    * grammar, [[SubjectFilter]]): filtering happens SERVER-SIDE, so only
    * matching messages cross the wire — on a selective pattern over a fat
    * stream that is the difference between shipping the stream and shipping
    * the answer. */
  def consumer(stream: String, startSeq: Long,
               filterSubject: Option[String] = None): MessageCursor

  /** Last message PER SUBJECT — JetStream's per-subject index surface
    * (DirectGet `last_by_subj`, the machinery behind KV buckets, which are
    * streams with `max_msgs_per_subject=1`). Returns the CURRENT message of
    * each distinct subject matching `filterSubject` (None = all), restricted
    * to the hash shard `bucket` of `nBuckets` (shard = floorMod of the
    * subject's UTF-8 FNV-1a hash), subjects sorted ascending, strictly after
    * `afterSubject`, at most `max` per call (page cursor = last subject of
    * the previous page).
    *
    * The scale contract: wire volume is O(distinct subjects), NEVER
    * O(messages) — a "current state" query over a year-long stream returns
    * one message per key. Sharding lets each Spark task pull its own key
    * range so the KV scan parallelizes like any other. */
  def lastForSubjects(stream: String, filterSubject: Option[String],
                      bucket: Int, nBuckets: Int, afterSubject: Option[String],
                      max: Int): Array[TransportMsg]

  /** Per-subject statistics — the StreamInfo `subjects` map (subject →
    * message count, pageable with a subjects filter on a live server)
    * joined with the last-seq index. Same sharding/paging contract as
    * [[lastForSubjects]]. Backs the GROUP BY subject aggregate pushdown:
    * `SELECT subject, count(*), max(seq) … GROUP BY subject` answers from
    * this index in O(distinct subjects) without touching one message. */
  def subjectStats(stream: String, filterSubject: Option[String],
                   bucket: Int, nBuckets: Int, afterSubject: Option[String],
                   max: Int): Array[SubjectStat]

  /** DURABLE-consumer ack floor: the highest stream sequence the named
    * durable has cumulatively acknowledged (0 = new consumer / nothing
    * acked). The JetStream ConsumerInfo `ack_floor.stream_seq` — what lets
    * an UNRELATED job resume where the last one stopped, with no shared
    * Spark checkpoint (GUIDE.md roadmap "consumer groups / ack-based
    * distribution"). */
  def ackFloor(stream: String, durable: String): Long

  /** Cumulative acknowledge (JetStream AckAll): marks every sequence
    * ≤ `seq` consumed for the durable. Monotonic — a late/duplicate ack
    * for a lower seq never regresses the floor. */
  def ackAll(stream: String, durable: String, seq: Long): Unit

  /** QUEUE-GROUP (deliver-group) claim: the server hands `member` the next
    * ≤ `max` undelivered messages of `group` with seq ≤ `maxSeq` — expired
    * claims of dead members first (REDELIVERY), then fresh messages —
    * holding each under an `ackWaitMs` lease. This is JetStream's
    * work-queue consumption shape (a shared consumer whose clients split
    * delivery): total delivery volume is O(messages), never
    * O(members × messages), the wire-cost contrast with `continuous_shards`
    * where every shard fetches the full log. `filterSubject` is the group
    * consumer's `filter_subject`, pinned at group creation. */
  def groupNext(stream: String, group: String, member: String, maxSeq: Long,
                max: Int, ackWaitMs: Long,
                filterSubject: Option[String]): Array[TransportMsg]

  /** Explicit acks for claimed messages (AckExplicit): settled claims never
    * redeliver. Unacked claims redeliver to ANY member after their lease
    * expires — at-least-once on member death, exactly-once when every
    * delivered batch is acked. */
  def groupAck(stream: String, group: String, seqs: Array[Long]): Unit

  /** IN-PROGRESS ack — the public `+WPI` ack payload, batched over `seqs`:
    * resets each still-claimed message's ack-wait timer to a fresh lease
    * so a consumer holding claims across a drain longer than one lease
    * (the ack-on-drain-commit scan) never loses them to mid-task
    * redelivery. Settled or already-redelivered seqs are silently ignored,
    * like a late `+WPI` on a real server. `ackWaitMs` is the renewed lease
    * length (a real server renews to the consumer's configured `ack_wait`;
    * the wire client ignores the argument accordingly). */
  def groupProgress(stream: String, group: String, seqs: Array[Long],
                    ackWaitMs: Long): Unit

  /** Unsettled group obligations (claimed-but-unacked + awaiting
    * redelivery). An empty [[groupNext]] with 0 pending means the group has
    * drained every message ≤ the claim bound. */
  def groupPending(stream: String, group: String): Long

  /** STREAM PURGE restricted to one subject filter — JetStream's
    * purge-by-subject (`$JS.API.STREAM.PURGE.<stream>` with a `filter`
    * body field): removes every matching message except the NEWEST `keep`
    * (the request's `keep` field; 0 = remove all), returns the purged
    * count. NATS wildcard grammar applies ([[SubjectFilter]]). The object
    * store is the caller: a real NATS client reclaims a superseded or
    * deleted object's chunk subject (`$O.<bucket>.C.<nuid>`) this way on
    * every overwrite/delete, and `keep=1` on the meta subject is the
    * server-side effect of the ADR-20 `Nats-Rollup: sub` header (one
    * current meta per object, not a meta per write ever made). */
  def purgeSubject(stream: String, filter: String, keep: Int = 0): Long

  /** Publish one message; the server assigns the next sequence and returns
    * it (a JetStream PubAck). `msgId` is the `Nats-Msg-Id` deduplication
    * header: re-publishing an id inside the dedup window is a no-op
    * returning the original sequence — THE JetStream mechanism that makes a
    * replayed sink epoch exactly-once (docs/LIVE_NATS.md "Offsets, replay,
    * exactly-once"). The reference engine is read-only; this is the write
    * direction it lacks.
    *
    * `headers` are arbitrary app headers stored WITH the message and
    * returned on every read path (the KV layer's `KV-Operation` markers
    * ride here). `expectLastSubjectSeq` is JetStream's per-subject
    * compare-and-set (`Nats-Expected-Last-Subject-Sequence`): the publish
    * succeeds only if the SUBJECT's current last sequence equals the
    * expectation (0 = "subject must not exist yet"); otherwise
    * [[NatsWrongLastSequenceException]] — optimistic concurrency with
    * zero read-modify-write races, the primitive under KV create/update. */
  def publish(stream: String, subject: String, tsNs: Long,
              payload: Array[Byte], msgId: String,
              headers: Map[String, String] = Map.empty,
              expectLastSubjectSeq: Option[Long] = None): Long

  /** PIPELINED publish — the jnats `publishAsync` shape: all entries ship
    * before any PubAck is awaited, so a batch costs ~1 round-trip instead
    * of N (sync publish caps a writer task at 1/RTT msgs/s on a real
    * network; pipelining removes the RTT term entirely). Returns the
    * server-assigned sequence per entry, in entry order; `Nats-Msg-Id`
    * dedup applies per entry exactly as in [[publish]] (a replayed batch
    * returns the original sequences — the sink's exactly-once). Default
    * implementation loops [[publish]] (in-JVM fakes are RTT-free, so
    * pipelining buys nothing there); the wire client overrides. */
  def publishBatch(stream: String,
                   entries: Array[PublishEntry]): Array[Long] =
    entries.map(e =>
      publish(stream, e.subject, e.tsNs, e.payload, e.msgId, e.headers))

  def close(): Unit
}

/** One pipelined-publish entry ([[JetStreamTransport.publishBatch]]). */
final case class PublishEntry(subject: String, tsNs: Long,
                              payload: Array[Byte], msgId: String,
                              headers: Map[String, String] = Map.empty)

/** One message as the wire returns it: raw ns publish time (the envelope's
  * µs ts_nats truncation happens at the scan, same as the parquet path);
  * `headers` are the stored app headers (transport-reserved Nats-* keys
  * stripped). */
final case class TransportMsg(subject: String, seq: Long, tsNs: Long,
                              payload: Array[Byte],
                              headers: Map[String, String] = Map.empty)

/** One subject's index entry: message count (StreamInfo subjects map) and
  * the subject's current last sequence. */
final case class SubjectStat(subject: String, count: Long, lastSeq: Long)

/** js_GetStreamInfo subset the scan needs (State.FirstSeq / State.LastSeq;
  * `bytes` = State.Bytes, the stream's stored payload volume — drives the
  * scan's size estimate for Catalyst join planning; 0 when unknown). */
final case class StreamState(firstSeq: Long, lastSeq: Long, messages: Long,
                             bytes: Long = 0L)

/** Connect failures — message shapes mirror the reference's error surface
  * (nats_scan.cpp:633-635): "Failed to connect to NATS: <status text>". */
final class NatsConnectException(msg: String) extends RuntimeException(msg)

/** Unknown stream — "Failed to get stream info: <status text>"
  * (nats_scan.cpp:650-652). */
final class NatsStreamNotFoundException(msg: String) extends RuntimeException(msg)

/** TRANSIENT wire error (connection dropped mid-slice, fetch timeout):
  * readers retry with capped backoff, then fail the task — Spark re-runs
  * the slice, which is safe because slices are deterministic seq ranges
  * (docs/LIVE_NATS.md "Failure semantics"). */
final class NatsIOException(msg: String) extends RuntimeException(msg)

/** Per-subject compare-and-set failure (JetStream err_code 10071, "wrong
  * last sequence"): the subject's current last seq did not match the
  * publish's `Nats-Expected-Last-Subject-Sequence`. Deliberately NOT a
  * [[NatsIOException]] — retrying the same expectation can never succeed;
  * callers re-read and re-decide (optimistic-concurrency contract). */
final class NatsWrongLastSequenceException(msg: String, val currentSeq: Long)
    extends RuntimeException(msg)

/** NOBODY answers the request subject (server 503 status — e.g. JetStream
  * disabled, so nothing subscribes to `$JS.>`). A CONFIGURATION error:
  * deliberately NOT a [[NatsIOException]], because retrying can never
  * succeed — [[TransportRetry]] must fail fast, and data reads must
  * surface it instead of reporting a clean empty result. */
final class NatsNoRespondersException(msg: String) extends RuntimeException(msg)

/** Sequential message cursor over one stream (ordered consumer analog). */
trait MessageCursor extends AutoCloseable {
  /** the next ≤ `max` messages in sequence order; empty == end of stream */
  def next(max: Int): Array[TransportMsg]
  def close(): Unit
}

/** Client credential material for a transport dial — the NATS client option
  * surface the reference roadmap promises (GUIDE.md "JWT/NKeys auth, TLS"):
  * token-in-URL (`nats://token@host`), `user_creds` (a .creds file carrying
  * the user JWT + NKey seed), `nkey_seed` (a raw user seed), `tls`.
  *
  * The .creds file is parsed ONCE at bind on the driver; the extracted
  * strings ride the task closure to executors (the standard Spark pattern
  * for connection secrets — executors need no local creds file). A live
  * jnats binding maps these onto `Options.Builder.authHandler` /
  * `.secure()`; the fake server enforces them at dial, which is where a
  * real server checks too (CONNECT is the first client frame). */
final case class TransportAuth(credsJwt: Option[String] = None,
                               nkeySeed: Option[String] = None,
                               tls: Boolean = false,
                               /** PEM text of the trusted CA certificate(s)
                                 * — the `tls_ca` option, read ONCE at bind
                                 * on the driver (like the .creds file) so
                                 * executors need no local CA file. The
                                 * cnats analog is `natsOptions_SetSecure`
                                 * + CA file; real NATS deployments
                                 * overwhelmingly run private CAs. */
                               tlsCaPem: Option[String] = None,
                               /** trust-all mode (`tls_insecure=true`) —
                                 * fixture/test hook for self-signed
                                 * loopback servers, per-CONNECTION and
                                 * bind-validated (replaces the round-9
                                 * JVM-global system property). */
                               tlsInsecure: Boolean = false)
    extends Serializable

object TransportAuth {
  val anonymous: TransportAuth = TransportAuth()

  private def flag(name: String, v: Option[String]): Boolean = v.map {
    case "true" => true
    case "false" => false
    case other =>
      sys.error(s"nats_scan: $name must be 'true' or 'false', got '$other'")
  }.getOrElse(false)

  /** Bind-time option parsing + validation: errors fire at bind, before any
    * dial is attempted — same policy as the seq/time mutual exclusions. */
  def fromOptions(credsFile: Option[String], nkeySeed: Option[String],
                  tls: Option[String], tlsCaFile: Option[String] = None,
                  tlsInsecure: Option[String] = None): TransportAuth = {
    if (credsFile.isDefined && nkeySeed.isDefined)
      sys.error("nats_scan: user_creds and nkey_seed are mutually exclusive " +
        "(the .creds file already carries the seed)")
    val insecure = flag("tls_insecure", tlsInsecure)
    if (tlsCaFile.isDefined && insecure)
      sys.error("nats_scan: tls_ca and tls_insecure are mutually exclusive " +
        "(a pinned CA IS the verification tls_insecure disables)")
    val caPem = tlsCaFile.map(parseCaFile)
    // providing CA material or the insecure hook IS the TLS opt-in — a CA
    // with tls=false would silently never be consulted
    val tlsOn = flag("tls", tls) || caPem.isDefined || insecure
    nkeySeed.foreach { s =>
      if (!s.startsWith("SU"))
        sys.error("nats_scan: nkey_seed must be a USER seed " +
          "(NKeys user seeds start with 'SU')")
    }
    val parsed = credsFile.map(parseCredsFile)
    TransportAuth(credsJwt = parsed.map(_._1),
      nkeySeed = parsed.map(_._2).orElse(nkeySeed), tls = tlsOn,
      tlsCaPem = caPem, tlsInsecure = insecure)
  }

  /** Read + validate a PEM CA bundle at bind: must exist and contain at
    * least one parseable X.509 certificate (a typo'd path or a key file
    * fails the BIND, not the first executor dial). */
  def parseCaFile(path: String): String = {
    val f = new java.io.File(path)
    if (!f.isFile)
      sys.error(s"nats_scan: tls_ca file not found: $path")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    val pem = try src.mkString finally src.close()
    val certs =
      try caCertificates(pem)
      catch {
        case e: Exception =>
          sys.error(s"nats_scan: tls_ca file $path is not a PEM " +
            s"certificate bundle (${e.getMessage})")
      }
    if (certs.isEmpty)
      sys.error(s"nats_scan: tls_ca file $path contains no certificates")
    pem
  }

  /** the X.509 certificates of a PEM bundle */
  def caCertificates(pem: String)
      : Seq[java.security.cert.X509Certificate] = {
    import scala.jdk.CollectionConverters._
    java.security.cert.CertificateFactory.getInstance("X.509")
      .generateCertificates(new java.io.ByteArrayInputStream(
        pem.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      .asScala.toSeq.collect {
        case c: java.security.cert.X509Certificate => c
      }
  }

  /** TrustManagers trusting EXACTLY the bundle's certificates — what the
    * wire client hands its per-connection SSLContext when `tls_ca` is
    * set. */
  def trustManagersFor(pem: String): Array[javax.net.ssl.TrustManager] = {
    val ks = java.security.KeyStore.getInstance(
      java.security.KeyStore.getDefaultType)
    ks.load(null, null)
    caCertificates(pem).zipWithIndex.foreach { case (c, i) =>
      ks.setCertificateEntry(s"graft-ca-$i", c)
    }
    val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
      javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    tmf.getTrustManagers
  }

  /** The public .creds layout: BEGIN/END-guarded blocks for the user JWT
    * and the NKEY seed (what `nsc generate creds` emits). Returns
    * (jwt, seed); malformed files fail at bind with a pointed message. */
  def parseCredsFile(path: String): (String, String) = {
    val f = new java.io.File(path)
    if (!f.isFile)
      sys.error(s"nats_scan: user_creds file not found: $path")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    val txt = try src.mkString finally src.close()
    def block(label: String): String = {
      val m = ("(?s)-+BEGIN " + label + "-+\\s*(\\S+)\\s*-+END").r
      m.findFirstMatchIn(txt).map(_.group(1)).getOrElse(
        sys.error(s"nats_scan: user_creds file $path has no '$label' block"))
    }
    val seed = block("USER NKEY SEED")
    if (!seed.startsWith("SU"))
      sys.error(s"nats_scan: user_creds seed in $path is not a USER seed " +
        "(must start with 'SU')")
    (block("NATS USER JWT"), seed)
  }
}

/** THE transient-fault retry policy for transport readers (docs/LIVE_NATS.md
  * "Failure semantics"): 3 attempts with capped exponential backoff, then
  * rethrow — Spark re-runs the task, which is safe because every reader's
  * unit of work is deterministic (seq slice, index shard, cursor position
  * that only advances after a successful call). One definition so every
  * reader shape — slice fetch, consumer cursor, KV page, subject-stats
  * page, continuous tail — retries identically. */
object TransportRetry {
  val MaxRetries = 3
  val BackoffMs = 50L

  def withRetry[T](f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case e: NatsIOException =>
          attempt += 1
          if (attempt > MaxRetries) throw e
          Thread.sleep(math.min(BackoffMs << (attempt - 1), 1000L))
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Per-JVM connection cache — on a cluster, per-EXECUTOR: one live
  * connection per (url, credentials) reused by every partition reader that
  * lands on the executor, instead of one dial per task
  * (docs/LIVE_NATS.md "pooled connections"). NATS connections are
  * multiplexed and thread-safe (jnats serializes writes internally), so
  * per-slice fetches and ordered-consumer cursors from 32 concurrent tasks
  * ride one socket — exactly how a production NATS client is deployed; a
  * 1000-executor cluster then holds 1000 connections, not 1000 × tasks.
  *
  * Pooled handles are NEVER closed by readers (close() on the pool entry is
  * reserved for [[clear]]); connect FAILURES are not cached — each failed
  * get() re-dials, so a recovering server heals the pool naturally. A live
  * jnats binding would add its own reconnect/health logic inside the pooled
  * handle; the seam stays the same. */
object TransportPool {
  private val conns =
    new scala.collection.concurrent.TrieMap[(String, TransportAuth), JetStreamTransport]()

  def get(url: String, timeoutMs: Long,
          auth: TransportAuth = TransportAuth.anonymous): JetStreamTransport =
    // TrieMap.getOrElseUpdate is atomic: concurrent first-users of a url
    // race to ONE dial, losers reuse the winner's connection
    conns.getOrElseUpdate((url, auth), Transport.connect(url, timeoutMs, auth))

  /** drop (and close) every pooled connection — test isolation hook, called
    * by [[FakeJetStream.reset]] since pooled handles die with the registry */
  def clear(): Unit = {
    conns.values.foreach(t => try t.close() catch { case _: Exception => () })
    conns.clear()
  }
}

object Transport {

  /** Default connect timeout — the reference pins 5000 ms
    * (nats_scan.cpp:617-618). */
  val DefaultTimeoutMs = 5000L

  /** Lazy connect: resolve `url` to a transport, failing with the
    * reference's error shapes.
    *
    * Resolution order (zero configuration, like a DNS lookup):
    *   1. an in-JVM [[FakeJetStream]] server registered at the address —
    *      the test/fixture path (covers blackholes + auth fixtures too);
    *   2. otherwise a REAL TCP dial via [[NatsWireClient]] — the live path
    *      a user hits by pointing at `nats://prod:4222`. Same URL syntax,
    *      same timeout contract, same error text shapes.
    *
    *   - malformed / non-nats URL      → "Failed to connect to NATS: Invalid URL"
    *   - no server at the address      → "Failed to connect to NATS: No server available for connection"
    *   - unresponsive address          → after `timeoutMs`: "Failed to connect to NATS: Timeout"
    */
  def connect(url: String, timeoutMs: Long = DefaultTimeoutMs,
              auth: TransportAuth = TransportAuth.anonymous): JetStreamTransport = {
    // CLUSTER list (`nats://a:4222,b:4222` — every NATS client's server-list
    // syntax): try each in order, first success wins; AUTH failures abort
    // immediately (every cluster member shares the auth config — retrying
    // siblings would just burn lockout budget), availability failures fall
    // through to the next member
    val candidates = url.split(',').map(_.trim).filter(_.nonEmpty).map { part =>
      if (part.startsWith("nats://")) part
      // list tail entries may omit the scheme: nats://a:4222,b:4222
      else "nats://" + part
    }
    if (candidates.isEmpty)
      throw new NatsConnectException(s"Failed to connect to NATS: Invalid URL ($url)")
    var lastErr: NatsConnectException = null
    candidates.foreach { one =>
      try return connectOne(one, timeoutMs, auth)
      catch {
        case e: NatsConnectException
            if e.getMessage.contains("Authorization") ||
              e.getMessage.contains("TLS handshake") =>
          throw e // config error: identical on every member
        case e: NatsConnectException => lastErr = e
      }
    }
    throw lastErr
  }

  private def connectOne(url: String, timeoutMs: Long,
                         auth: TransportAuth): JetStreamTransport = {
    val parsed =
      try {
        val u = new java.net.URI(url)
        if (u.getScheme != "nats" || u.getHost == null) None else Some(u)
      } catch { case _: Exception => None }
    val u = parsed.getOrElse(
      throw new NatsConnectException(s"Failed to connect to NATS: Invalid URL ($url)"))
    val addr = s"${u.getHost}:${if (u.getPort < 0) 4222 else u.getPort}"
    // nats://<token>@host:port — token auth, the simplest NATS credential
    // form; a server requiring auth rejects missing/wrong tokens with the
    // server's own status text ("Authorization Violation")
    val token = Option(u.getUserInfo)
    if (FakeJetStream.knows(addr))
      FakeJetStream.dial(addr, timeoutMs, token, auth)
    else
      new NatsWireClient(u.getHost,
        if (u.getPort < 0) 4222 else u.getPort, timeoutMs, token, auth)
  }
}
