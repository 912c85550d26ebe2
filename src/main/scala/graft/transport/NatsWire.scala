package graft.transport

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream, OutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** REAL network binding for [[JetStreamTransport]]: a from-scratch TCP client
  * speaking the PUBLIC NATS client protocol (INFO/CONNECT/PING/PONG/SUB/
  * PUB/HPUB/MSG/HMSG — https://docs.nats.io/reference/reference-protocols/
  * nats-protocol) and the JetStream JSON API over request-reply
  * (`$JS.API.STREAM.INFO`, `DIRECT.GET` incl. ADR-31 batching,
  * `CONSUMER.*`, `$JS.ACK` acking). No client library required — the
  * offline build has no jnats jar, and the protocol is simple enough that
  * the dependency buys nothing but TLS conveniences.
  *
  * This is the class behind the reference's actual dial
  * (/root/reference/src/nats_scan.cpp:609-659 connect → JetStream context →
  * DirectGet): when [[Transport.connect]] finds no in-JVM fake registered at
  * the address it dials THIS client, so `spark.read.format("nats_scan")
  * .option("url", "nats://prod:4222")` works against a live server with
  * zero configuration. E2e tests run it against [[MiniNatsServer]] — the
  * same wire bytes over a real loopback socket.
  *
  * Concurrency: a small LANE pool (≤ [[NatsWireClient.MaxLanes]] sockets,
  * grown on demand, first lane dialed eagerly so connect errors surface at
  * construction). Each request checks a lane out, runs its own
  * request-reply conversation on it, and returns it — so 32 concurrent
  * slice readers drive up to 8 independent sockets instead of serializing
  * on one. jnats multiplexes many requests on one socket instead; the lane
  * pool reaches comparable parallelism with far simpler failure semantics
  * (a torn conversation dies with its lane, never corrupting another
  * request's stream position).
  *
  * Mapping notes (all public JetStream API):
  *   - `fetch(from,to,max)` → batched DIRECT.GET `{seq, batch, up_to_seq}`
  *     (ADR-31); one RPC per batch, EOB status ends the stream.
  *   - `consumer(...)` → ephemeral pull consumer (`CONSUMER.CREATE` with
  *     `deliver_policy: by_start_sequence`) + `MSG.NEXT {batch, no_wait}`;
  *     stream seq/timestamp parsed from the `$JS.ACK` reply subject.
  *   - `lastForSubjects`/`subjectStats` → `STREAM.INFO {subjects_filter}`
  *     + per-subject DIRECT.GET `{last_by_subj}`; sharding/paging is
  *     client-side over [[SubjectFilter.shard]] — the pinned FNV-1a
  *     cross-binding contract exists precisely so this client and the fake
  *     land subjects in identical buckets.
  *   - queue groups → ONE shared durable pull consumer per group
  *     (`CONSUMER.DURABLE.CREATE`, ack_policy explicit): `groupNext` is
  *     `MSG.NEXT` (the SERVER balances concurrent callers), claims past
  *     `maxSeq` are NAK'd back, `groupAck` publishes `+ACK` to the
  *     remembered ack subjects, `groupPending` reads CONSUMER.INFO.
  *   - `publish` → HPUB with `Nats-Msg-Id` (dedup) and
  *     `Nats-Expected-Stream`; the publish timestamp is SERVER-assigned on
  *     a real deployment (the fixture header `Graft-Pub-Time` carries the
  *     seam's tsNs; a live server ignores unknown headers and stamps
  *     receive time — documented divergence).
  *   - `ackAll(stream,durable,seq)` → `+ACK` published to the synthesized
  *     cumulative ack subject (`$JS.ACK.<stream>.<durable>.1.<seq>.<seq>.0.0`)
  *     of an ack_policy=all durable — the wire form of AckAll.
  *   - TLS (`auth.tls`) upgrades each socket after INFO, the standard NATS
  *     TLS handshake order. Trust source per connection: `tls_ca` pins a
  *     PEM CA bundle (private-CA deployments), `tls_insecure` trusts all
  *     (loopback fixtures), else the default JVM chain. E2e-tested against
  *     keytool-generated identities in WireTransportSpec.
  */
final class NatsWireClient(host: String, port: Int, timeoutMs: Long,
                           token: Option[String],
                           auth: TransportAuth) extends JetStreamTransport {

  import NatsWireClient.MaxLanes

  private val mapper = new ObjectMapper()
  private val sids = new java.util.concurrent.atomic.AtomicLong(0L)
  private val inboxes = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Cluster topology the SERVER advertises (`connect_urls` in INFO — sent
    * at connect and pushed asynchronously when membership changes). Real
    * clients merge these into their reconnect pool (jnats/cnats discovered
    * servers); without it a client pinned to one seed address goes dark
    * when that seed is rolled, even though its INFO named the survivors.
    * Bounded (8) and primary-excluded; every lane dial falls back through
    * it when the seed address refuses/times out. */
  private val discovered =
    new java.util.concurrent.CopyOnWriteArraySet[(String, Int)]()

  private def mergeDiscovered(info: JsonNode): Unit = {
    val urls = info.get("connect_urls")
    if (urls != null && urls.isArray) {
      val it = urls.elements()
      while (it.hasNext && discovered.size < 8) {
        val hp = it.next().asText("")
        val ci = hp.lastIndexOf(':')
        if (ci > 0) {
          // IPv6 entries arrive bracketed ("[::1]:4222") — strip for dial
          val raw = hp.substring(0, ci)
          val h = if (raw.startsWith("[") && raw.endsWith("]"))
            raw.substring(1, raw.length - 1) else raw
          val p = try hp.substring(ci + 1).toInt catch { case _: Exception => -1 }
          if (p > 0 && h.nonEmpty && !(h == host && p == port))
            discovered.add((h, p))
        }
      }
    }
  }
  /** Addresses that announced Lame Duck Mode (`"ldm":true` in an async
    * INFO — a real nats-server's graceful-shutdown signal, pushed before
    * it stops taking work). Real clients migrate PROACTIVELY: new
    * connections prefer non-draining siblings, existing ones finish their
    * conversation and move. Here: lane dials skip draining addresses when
    * an alternative exists, and a pooled lane parked on a draining server
    * retires (closes) when it comes home instead of being reused —
    * in-flight conversations are never interrupted. */
  private val draining =
    new java.util.concurrent.CopyOnWriteArraySet[(String, Int)]()

  private def infoMaxPayload(info: JsonNode): Option[Long] =
    Option(info.get("max_payload")).map(_.asLong(Long.MaxValue))
      .filter(_ > 0L)

  /** Merge topology, the payload cap, AND Lame Duck state from the server
    * at (h, p) — the address the announcing lane is dialed to. An INFO
    * WITHOUT ldm un-marks the address: a server restarted healthy at the
    * same host:port must not be avoided forever (real clients reset ldm
    * state per connection). */
  private def noteInfo(info: JsonNode, h: String, p: Int): Unit = {
    mergeDiscovered(info)
    if (Option(info.get("ldm")).exists(_.asBoolean(false))) draining.add((h, p))
    else draining.remove((h, p))
    ()
  }

  /** server-advertised sibling pool, as merged so far (test observability:
    * async INFO pushes land on socket buffers, so "the client has learned
    * the sibling" is a state to poll for, not an instant) */
  private[graft] def discoveredAddresses: Set[(String, Int)] =
    discovered.asScala.toSet

  /** spec hook: the addresses currently marked draining */
  private[graft] def drainingAddresses: Set[(String, Int)] =
    draining.asScala.toSet

  /** spec hook: live lanes (specs pin that a local refusal KEEPS its lane) */
  private[graft] def liveLanes: Int = laneCount.get()

  /** Is any known address NOT draining? (When everything is draining, the
    * pool keeps using what it has — a degraded server beats none.) */
  private def anyNonDraining(): Boolean =
    !draining.contains((host, port)) || {
      val it = discovered.iterator()
      var found = false
      while (!found && it.hasNext) found = !draining.contains(it.next())
      found
    }

  /** group claims awaiting ack: (stream, group, seq) → ack subject */
  private val ackSubjects =
    new scala.collection.concurrent.TrieMap[(String, String, Long), String]()

  // ---------------- frame model ----------------

  private sealed trait Frame
  private case class Info(json: JsonNode) extends Frame
  private case object Ping extends Frame
  private case object Pong extends Frame
  private case object Ok extends Frame
  private case class Err(msg: String) extends Frame
  private case class Msg(subject: String, sid: Long, reply: Option[String],
                         headers: Map[String, String], status: Int,
                         payload: Array[Byte]) extends Frame

  /** "NATS/1.0[ <code> <desc>]\r\nK: V\r\n...\r\n\r\n" → (headers, status) */
  private def parseHeaders(s: String): (Map[String, String], Int) = {
    val lines = s.split("\r\n").filter(_.nonEmpty)
    val status = lines.headOption.filter(_.startsWith("NATS/1.0 "))
      .map { l =>
        try l.substring(9).trim.split(' ')(0).toInt
        catch { case _: NumberFormatException =>
          throw new NatsIOException(
            s"protocol error: unparseable header status line '$l'")
        }
      }.getOrElse(0)
    val kvs = lines.drop(1).flatMap { l =>
      val i = l.indexOf(':')
      if (i < 0) None else Some(l.substring(0, i).trim -> l.substring(i + 1).trim)
    }.toMap
    (kvs, status)
  }

  // ---------------- one socket = one lane ----------------

  /** A dialed + authenticated socket with its frame codec. One request-
    * reply conversation runs on a lane at a time (the pool enforces it). */
  private final class Lane {
    private var socket: Socket = _
    private var in: InputStream = _
    private var out: OutputStream = _
    /** the address this lane actually landed on (primary, or a discovered
      * sibling after seed-failure fallback) — TLS upgrades use it */
    private var laneHost: String = host
    private var lanePort: Int = port
    /** where this lane is parked — the pool retires lanes whose server
      * announced Lame Duck Mode once an alternative exists */
    def addr: (String, Int) = (laneHost, lanePort)
    /** THIS lane's server's advertised `max_payload` (INFO; per-lane, not
      * client-global: in a mixed-cap cluster — e.g. a config rollout —
      * each lane must enforce the cap of the server it actually talks
      * to). Publishes larger than this are refused LOCALLY with a pointed
      * non-retryable error — a real server answers an oversize frame with
      * `-ERR 'Maximum Payload Violation'` and drops the connection, which
      * would surface here as a confusing torn-lane retry loop. */
    private var laneMaxPayload: Long = Long.MaxValue

    private def noteLaneInfo(j: JsonNode): Unit = {
      infoMaxPayload(j).foreach(laneMaxPayload = _)
      noteInfo(j, laneHost, lanePort)
    }

    /** HPUB counts the header block toward the framed total — check the
      * sum against this lane's cap before anything touches the socket.
      * Throws the LOCAL-refusal subtype so the pool knows the lane is
      * still healthy (nothing was written) and keeps it. */
    def requirePayloadFits(subject: String, totalBytes: Long): Unit =
      if (totalBytes > laneMaxPayload)
        throw new NatsWireClient.PayloadRefusedException(
          s"publish to '$subject': $totalBytes B (headers + payload) " +
            s"exceeds the server's advertised max_payload ($laneMaxPayload B)")

    locally {
      // dial the seed address first; when it refuses or times out, fall
      // back through the server-advertised `connect_urls` pool — the
      // standard NATS client reconnect behavior (a rolled seed node's
      // siblings keep the client alive). All-fail → the SEED's error shape.
      def dial(h: String, p: Int): Socket = {
        val s = new Socket()
        try { s.connect(new InetSocketAddress(h, p), timeoutMs.toInt); s }
        catch {
          case e: Exception =>
            (try s.close() catch { case _: Exception => () }): Unit
            throw e
        }
      }
      // Lame Duck: when the SEED announced ldm, NEW lanes prefer a
      // non-draining discovered sibling (proactive migration); the seed
      // stays reachable as the last resort so a single-server topology
      // still connects to its draining server rather than failing.
      var preDialed: Socket = null
      if (draining.contains((host, port))) {
        val it = discovered.iterator()
        while (preDialed == null && it.hasNext) {
          val (h, p) = it.next()
          if (!draining.contains((h, p)))
            try { preDialed = dial(h, p); laneHost = h; lanePort = p }
            catch { case _: Exception => () }
        }
      }
      // establish a lane as ONE per-candidate unit — dial, INFO greeting,
      // TLS, CONNECT/PING/PONG: a dying server can ACCEPT the dial and
      // then close at ANY point of the handshake (its stop races the
      // accept queue; round-13 full-suite runs caught EOFs both before
      // INFO and between INFO and PONG), so an EOF/IO failure anywhere in
      // the handshake is a CONNECT failure that falls back through the
      // discovered pool exactly like a refused dial — never escaping as a
      // raw EOFException from a half-open socket. A live server that
      // answers wrongly (-ERR auth, non-INFO frame, TLS certificate
      // failure) stays a loud NatsConnectException with NO failover: the
      // server is up, the configuration is broken, and siblings would
      // refuse the same credentials.
      def establish(h: String, p: Int, pre: Socket): JsonNode = {
        val s = if (pre != null) pre else dial(h, p)
        s.setSoTimeout(math.max(timeoutMs, 1000L).toInt)
        s.setTcpNoDelay(true)
        socket = s
        in = new BufferedInputStream(s.getInputStream, 1 << 16)
        out = new BufferedOutputStream(s.getOutputStream, 1 << 16)
        laneHost = h; lanePort = p
        // server speaks first: INFO {...}
        val info = readFrame() match {
          case Info(json) => json
          case other => throw new NatsConnectException(
            s"Failed to connect to NATS: protocol error (expected INFO, got $other)")
        }
        val tlsRequired = Option(info.get("tls_required")).exists(_.asBoolean(false))
        if (tlsRequired || auth.tls)
          try upgradeTls()
          catch {
            case e: java.io.IOException => throw new NatsConnectException(
              s"Failed to connect to NATS: TLS handshake failure (${e.getMessage})")
          }
        val connect = mapper.createObjectNode()
        connect.put("verbose", false).put("pedantic", false)
          .put("tls_required", auth.tls).put("lang", "scala-graft")
          .put("version", "0.1").put("protocol", 1)
          .put("headers", true)
          // opt into 503 status replies when a request subject has no
          // responders (e.g. JetStream disabled → nothing behind $JS.>):
          // an immediate pointed error beats a silent request timeout
          .put("no_responders", true)
        token.foreach(t => connect.put("auth_token", t))
        val nonce = Option(info.get("nonce")).map(_.asText("")).getOrElse("")
        auth.credsJwt match {
          case Some(jwt) =>
            // JWT/creds auth: identity comes from the user JWT; the .creds
            // file's seed signs the server nonce (the `sig` the server
            // verifies against the JWT's embedded public key)
            connect.put("jwt", jwt)
            auth.nkeySeed.foreach(seed =>
              connect.put("sig", NKeys.sign(seed, nonce.getBytes(UTF_8))))
            ()
          case None =>
            auth.nkeySeed.foreach { seed =>
              // REAL NKey auth: derive the public identity from the seed
              // and sign the nonce with the seed's ed25519 key — the full
              // protocol flow, verified server-side with the public key
              connect.put("nkey", NKeys.publicKeyFromSeed(seed))
              connect.put("sig", NKeys.sign(seed, nonce.getBytes(UTF_8)))
              ()
            }
        }
        send(s"CONNECT ${mapper.writeValueAsString(connect)}\r\nPING\r\n")
        readFrame() match {
          case Pong => ()
          case Err(msg) => throw new NatsConnectException(
            s"Failed to connect to NATS: $msg")
          case Ok => readFrame() match {
            case Pong => ()
            case Err(msg) => throw new NatsConnectException(
              s"Failed to connect to NATS: $msg")
            case other => throw new NatsConnectException(
              s"Failed to connect to NATS: protocol error ($other)")
          }
          case other => throw new NatsConnectException(
            s"Failed to connect to NATS: protocol error ($other)")
        }
        info
      }
      def closeQuietly(): Unit =
        if (socket != null) { try socket.close() catch { case _: Exception => () } }
      val info: JsonNode =
        try {
          if (preDialed != null) establish(laneHost, lanePort, preDialed)
          else establish(host, port, null)
        } catch {
          case e: NatsConnectException => throw e // live server, bad config
          case primaryErr: Exception =>
            closeQuietly()
            // non-draining siblings first, draining ones as last resort —
            // a lane parked on a draining address would be retired after
            // every conversation (per-request reconnect churn) while a
            // healthy sibling sat unused
            val (fresh, stale) = discovered.asScala.toSeq
              .partition(a => !draining.contains(a))
            var got: JsonNode = null
            val it = (fresh ++ stale).iterator
            while (got == null && it.hasNext) {
              val (h, p) = it.next()
              try got = establish(h, p, null)
              catch {
                case e: NatsConnectException => throw e
                case _: Exception => closeQuietly()
              }
            }
            if (got != null) got
            else primaryErr match {
              case _: java.net.SocketTimeoutException =>
                throw new NatsConnectException("Failed to connect to NATS: Timeout")
              case _ =>
                throw new NatsConnectException(
                  "Failed to connect to NATS: No server available for connection")
            }
        }
      noteLaneInfo(info)
    }

    private def upgradeTls(): Unit = {
      // trust source, per CONNECTION (bind-validated options, never a
      // JVM-global): tls_insecure → trust-all (fixture/test hook for
      // self-signed loopback servers); tls_ca → trust EXACTLY the pinned
      // CA bundle (the cnats natsOptions_SetSecure + CA-file shape private
      // deployments need); else the default JVM chain
      val f =
        if (auth.tlsInsecure) {
          val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
          ctx.init(null, Array[javax.net.ssl.TrustManager](
            new javax.net.ssl.X509TrustManager {
              override def checkClientTrusted(
                c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
              override def checkServerTrusted(
                c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
              override def getAcceptedIssuers: Array[java.security.cert.X509Certificate] =
                Array.empty
            }), null)
          ctx.getSocketFactory
        } else auth.tlsCaPem match {
          case Some(pem) =>
            val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
            ctx.init(null, TransportAuth.trustManagersFor(pem), null)
            ctx.getSocketFactory
          case None => javax.net.ssl.SSLSocketFactory.getDefault
            .asInstanceOf[javax.net.ssl.SSLSocketFactory]
        }
      val tls = f.createSocket(socket, laneHost, lanePort, true)
        .asInstanceOf[javax.net.ssl.SSLSocket]
      tls.startHandshake()
      socket = tls
      in = new BufferedInputStream(tls.getInputStream)
      out = new BufferedOutputStream(tls.getOutputStream)
    }

    private def readLine(): String = {
      val sb = new java.lang.StringBuilder(64)
      var prev = -1
      while (true) {
        val b = in.read()
        if (b < 0) throw new EOFException("connection closed by server")
        if (prev == '\r' && b == '\n') {
          sb.setLength(sb.length() - 1)
          return sb.toString
        }
        sb.append(b.toChar)
        // a control line that never terminates (garbage stream, or a
        // payload mis-read as a line) must fail loudly, not accumulate an
        // unbounded buffer until OOM — the doc caps control lines far
        // below this (server default max_control_line 4 KiB; we allow
        // INFO's connect_urls room)
        if (sb.length() > NatsWireClient.MaxControlLineBytes)
          throw new NatsIOException(
            "protocol error: control line exceeds " +
              s"${NatsWireClient.MaxControlLineBytes} bytes without CRLF")
        prev = b
      }
      throw new IllegalStateException("unreachable")
    }

    private def readN(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        if (r < 0) throw new EOFException("connection closed by server")
        off += r
      }
      buf
    }

    /** the mandatory CRLF after a MSG/HMSG payload — anything else means
      * the advertised length and the actual bytes disagree, and continuing
      * would mis-frame every later conversation on this socket */
    private def expectTrailingCrlf(verb: String): Unit = {
      val t = readN(2)
      if (t(0) != '\r' || t(1) != '\n')
        throw new NatsIOException(
          s"protocol error: $verb payload not followed by CRLF " +
            "(length/body mismatch)")
    }

    /** numeric control-line argument, validated: a malformed server frame
      * is a PROTOCOL error (typed, lane torn down), never a bare
      * NumberFormatException leaking into caller code */
    private def frameArg(verb: String, p: Array[String], i: Int): Long = {
      if (i >= p.length)
        throw new NatsIOException(
          s"protocol error: $verb control line missing argument ${i + 1}")
      try p(i).toLong
      catch { case _: NumberFormatException =>
        throw new NatsIOException(
          s"protocol error: $verb argument '${p(i)}' is not a number")
      }
    }

    /** payload-length argument: additionally bounded — negative or absurd
      * lengths would otherwise drive readN into a negative allocation or a
      * multi-GiB buffer from four corrupt bytes */
    private def frameLen(verb: String, p: Array[String], i: Int): Int = {
      val v = frameArg(verb, p, i)
      if (v < 0 || v > NatsWireClient.MaxFrameBytes)
        throw new NatsIOException(
          s"protocol error: $verb length $v outside " +
            s"[0, ${NatsWireClient.MaxFrameBytes}]")
      v.toInt
    }

    private def readFrame(): Frame = {
      val line = readLine()
      val sp = line.indexOf(' ')
      val verb = (if (sp < 0) line else line.substring(0, sp)).toUpperCase
      verb match {
        case "INFO" =>
          if (sp < 0)
            throw new NatsIOException("protocol error: INFO without payload")
          try Info(mapper.readTree(line.substring(sp + 1)))
          catch { case e: com.fasterxml.jackson.core.JacksonException =>
            throw new NatsIOException(
              s"protocol error: unparseable INFO JSON (${e.getMessage})")
          }
        case "PING" => Ping
        case "PONG" => Pong
        case "+OK" => Ok
        case "-ERR" =>
          Err(if (sp < 0) ""
              else line.substring(sp + 1).stripPrefix("'").stripSuffix("'"))
        case "MSG" =>
          // MSG <subject> <sid> [reply] <len>
          val p = if (sp < 0) Array.empty[String]
                  else line.substring(sp + 1).split(' ')
          if (p.length < 3 || p.length > 4)
            throw new NatsIOException(
              s"protocol error: MSG control line has ${p.length} arguments")
          val (subject, sid, reply, len) =
            if (p.length == 3) (p(0), frameArg("MSG", p, 1), None,
              frameLen("MSG", p, 2))
            else (p(0), frameArg("MSG", p, 1), Some(p(2)),
              frameLen("MSG", p, 3))
          val payload = readN(len); expectTrailingCrlf("MSG")
          Msg(subject, sid, reply, Map.empty, 0, payload)
        case "HMSG" =>
          // HMSG <subject> <sid> [reply] <hdrLen> <totLen>
          val p = if (sp < 0) Array.empty[String]
                  else line.substring(sp + 1).split(' ')
          if (p.length < 4 || p.length > 5)
            throw new NatsIOException(
              s"protocol error: HMSG control line has ${p.length} arguments")
          val (subject, sid, reply, hl, tl) =
            if (p.length == 4) (p(0), frameArg("HMSG", p, 1), None,
              frameLen("HMSG", p, 2), frameLen("HMSG", p, 3))
            else (p(0), frameArg("HMSG", p, 1), Some(p(2)),
              frameLen("HMSG", p, 3), frameLen("HMSG", p, 4))
          if (hl > tl)
            throw new NatsIOException(
              s"protocol error: HMSG header length $hl exceeds total $tl")
          val hdrBytes = readN(hl)
          val payload = readN(tl - hl); expectTrailingCrlf("HMSG")
          val (headers, status) = parseHeaders(new String(hdrBytes, UTF_8))
          Msg(subject, sid, reply, headers, status, payload)
        case other =>
          throw new NatsIOException(s"protocol error: unexpected frame '$other'")
      }
    }

    def send(s: String): Unit = { out.write(s.getBytes(UTF_8)); out.flush() }

    /** One JetStream API request on THIS lane: SUB fresh inbox, PUB with
      * reply, collect `expect` response messages (terminated early by a
      * status frame), UNSUB. `headerBytes` switches the request to HPUB. */
    def request(subject: String, payload: Array[Byte], expect: Int,
                headerBytes: Array[Byte] = null): Seq[Msg] = {
      val inbox = s"_INBOX.graft.${inboxes.incrementAndGet()}"
      val sid = sids.incrementAndGet()
      send(s"SUB $inbox $sid\r\n")
      if (headerBytes == null) {
        out.write(s"PUB $subject $inbox ${payload.length}\r\n".getBytes(UTF_8))
        out.write(payload)
      } else {
        out.write(s"HPUB $subject $inbox ${headerBytes.length} ${headerBytes.length + payload.length}\r\n"
          .getBytes(UTF_8))
        out.write(headerBytes); out.write(payload)
      }
      out.write('\r'); out.write('\n'); out.flush()
      val got = Seq.newBuilder[Msg]
      var n = 0
      var open = true
      while (open && n < expect) {
        readFrame() match {
          case Ping => send("PONG\r\n")
          case m: Msg if m.sid == sid =>
            // a status frame (EOB, 404 no-messages, 503 no-responders)
            // terminates the conversation; it RIDES ALONG in the result so
            // callers can distinguish "empty" from "nobody answered" —
            // data-consuming call sites all filter on status == 0
            if (m.status != 0) { got += m; open = false }
            else { got += m; n += 1 }
          case Err(msg) => throw new NatsIOException(s"server error: $msg")
          case Ok => ()
          case Info(j) => noteLaneInfo(j) // topology / ldm / cap push
          case _ => () // frames for dead sids (drained subscriptions)
        }
      }
      send(s"UNSUB $sid\r\n")
      got.result()
    }

    /** Pipelined publish on THIS lane: one SUB per entry's private reply
      * inbox, every HPUB written back-to-back, ONE flush, then the ack
      * read loop — correlation is by sid (each entry owns a subscription),
      * so out-of-order PubAcks cannot mismatch. ~1 round-trip per batch
      * vs N for the sync path. */
    def publishPipelined(stream: String,
                         entries: Array[PublishEntry]): Array[Long] = {
      val n = entries.length
      if (n == 0) return Array.emptyLongArray
      // build + size-check every frame BEFORE the first socket write: an
      // oversize entry must fail the batch locally, not leave a partial
      // publish window on the wire behind a server-side connection drop
      val hdrs = new Array[Array[Byte]](n)
      var i = 0
      while (i < n) {
        val e = entries(i)
        hdrs(i) = ("NATS/1.0\r\n" +
          s"Nats-Msg-Id: ${e.msgId}\r\n" +
          s"Nats-Expected-Stream: $stream\r\n" +
          customHeaderLines(e.headers) +
          s"Graft-Pub-Time: ${e.tsNs}\r\n\r\n").getBytes(UTF_8)
        requirePayloadFits(e.subject, hdrs(i).length.toLong + e.payload.length)
        i += 1
      }
      val baseSid = sids.getAndAdd(n.toLong) + 1L
      val baseInbox = inboxes.incrementAndGet()
      i = 0
      while (i < n) {
        val e = entries(i)
        val inbox = s"_INBOX.graft.pub.$baseInbox.$i"
        out.write(s"SUB $inbox ${baseSid + i}\r\n".getBytes(UTF_8))
        val hdr = hdrs(i)
        out.write(
          s"HPUB ${e.subject} $inbox ${hdr.length} ${hdr.length + e.payload.length}\r\n"
            .getBytes(UTF_8))
        out.write(hdr); out.write(e.payload)
        out.write('\r'); out.write('\n')
        i += 1
      }
      out.flush()
      val seqs = new Array[Long](n)
      var got = 0
      while (got < n) {
        readFrame() match {
          case Ping => send("PONG\r\n")
          case m: Msg if m.sid >= baseSid && m.sid < baseSid + n =>
            // a status frame instead of a PubAck: 503 = nothing behind
            // the subject (config error, fail fast); anything else is a
            // transient wire condition. Either way the ack JSON below
            // would be an empty payload — never parse it.
            failOnNoResponders(m :: Nil, "publish")
            if (m.status != 0)
              throw new NatsIOException(s"publish: status ${m.status}")
            val idx = (m.sid - baseSid).toInt
            val ack = mapper.readTree(new String(m.payload, UTF_8))
            Option(ack.get("error")).foreach(e => throw new NatsIOException(
              s"publish failed: ${Option(e.get("description"))
                .map(_.asText).getOrElse(e.toString)}"))
            seqs(idx) = ack.get("seq").asLong
            got += 1
          case Err(msg) => throw new NatsIOException(s"server error: $msg")
          case Ok => ()
          case Info(j) => noteLaneInfo(j) // topology / ldm / cap push
          case _ => () // frames for dead sids
        }
      }
      i = 0
      val unsub = new java.lang.StringBuilder(n * 12)
      while (i < n) {
        unsub.append("UNSUB ").append(baseSid + i).append("\r\n")
        i += 1
      }
      send(unsub.toString)
      seqs
    }

    def close(): Unit = try socket.close() catch { case _: Exception => () }
  }

  // ---------------- lane pool ----------------

  private val idle = new java.util.concurrent.LinkedBlockingQueue[Lane]()
  private val laneCount = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile private var closed = false

  // eager first lane: connect/auth failures surface at construction, the
  // contract every error-path spec pins
  locally { laneCount.incrementAndGet(); idle.put(new Lane) }

  private def withLane[T](f: Lane => T): T = {
    var lane = idle.poll()
    if (lane == null) {
      // grow up to MaxLanes, else wait for a busy lane to come home
      val n = laneCount.incrementAndGet()
      if (n <= MaxLanes)
        // a failed dial (server down during growth) must give its slot back:
        // otherwise MaxLanes failed growth attempts pin laneCount at the cap
        // with zero live lanes and every later request blocks in take()
        // forever instead of surfacing the retryable connect error
        try lane = new Lane
        catch { case e: Throwable => laneCount.decrementAndGet(); throw e }
      else { laneCount.decrementAndGet(); lane = idle.take() }
    }
    var ok = false
    try {
      val r =
        try f(lane)
        catch {
          // a LOCAL refusal (oversize publish) wrote nothing to the
          // socket: the lane is healthy, keep it — closing would make
          // every oversize attempt churn a full re-dial
          case e: NatsWireClient.PayloadRefusedException =>
            ok = true; throw e
          // a torn lane (server dropped an idle connection — e.g. missed
          // keepalive pings while parked — or a mid-conversation reset) is
          // TRANSIENT: surface it as the retryable wire error so
          // TransportRetry re-runs the call, which checks out a FRESH lane
          case e: java.io.IOException =>
            throw new NatsIOException(s"connection lost mid-request: $e")
        }
      ok = true
      r
    } finally {
      // a healthy lane goes home UNLESS its server announced Lame Duck and
      // a non-draining address exists — then it retires (the next checkout
      // dials fresh and prefers the sibling: graceful migration, no
      // conversation ever interrupted)
      if (ok && !closed &&
          !(draining.contains(lane.addr) && anyNonDraining()))
        idle.put(lane)
      else { lane.close(); laneCount.decrementAndGet() } // torn or draining
    }
  }

  /** wire conversations: request-reply exchanges + fire-and-forget flushes
    * — the unit the scale probes count (one lane checkout = one burst on
    * the socket; frame count within a flush is not a round-trip) */
  private val convs = new java.util.concurrent.atomic.AtomicLong(0L)
  def conversationCount: Long = convs.get()

  /** THE status-frame policy, in one place for every conversation kind:
    * 503 is never a legitimate data terminator (those are 204 EOB / 404
    * no-messages) — it means NOTHING subscribes to the request subject,
    * a configuration error that must fail loudly and without retry. */
  private def failOnNoResponders(resp: Seq[Msg], context: String): Unit =
    if (resp.exists(_.status == 503))
      throw new NatsNoRespondersException(
        s"no responders for $context — is JetStream enabled on the server?")

  private def request(subject: String, payload: Array[Byte],
                      expect: Int = 1): Seq[Msg] = {
    convs.incrementAndGet()
    val resp = withLane(_.request(subject, payload, expect))
    // central check so every data path (fetch, direct get, consumer next,
    // group claims, stream info) fails loudly instead of returning a
    // clean empty result against a JetStream-less server
    failOnNoResponders(resp, subject)
    resp
  }

  /** fire-and-forget publish (acks/naks) — no response conversation */
  private def fire(s: String): Unit = {
    convs.incrementAndGet()
    withLane(_.send(s))
  }

  private def api(subject: String, json: String): JsonNode = {
    val resp = request(subject, json.getBytes(UTF_8))
    if (resp.isEmpty) throw new NatsIOException(s"no response for $subject")
    val m = resp.head
    if (m.status != 0) // 503 already thrown centrally by request()
      throw new NatsIOException(s"status ${m.status} for $subject")
    try mapper.readTree(new String(m.payload, UTF_8))
    catch { case e: com.fasterxml.jackson.core.JacksonException =>
      throw new NatsIOException(
        s"protocol error: unparseable API response for $subject " +
          s"(${e.getMessage})")
    }
  }

  private def apiError(node: JsonNode): Option[String] =
    Option(node.get("error")).map(e =>
      Option(e.get("description")).map(_.asText).getOrElse(e.toString))

  // ---------------- seam implementation ----------------

  override def streamInfo(stream: String): StreamState = {
    if (stream.isEmpty)
      throw new NatsStreamNotFoundException(
        "Failed to get stream info: invalid stream name (empty)")
    val r = api(s"$$JS.API.STREAM.INFO.$stream", "{}")
    apiError(r).foreach(e =>
      throw new NatsStreamNotFoundException(s"Failed to get stream info: $e"))
    val st = r.get("state")
    StreamState(st.get("first_seq").asLong, st.get("last_seq").asLong,
      st.get("messages").asLong,
      Option(st.get("bytes")).map(_.asLong).getOrElse(0L))
  }

  private def msgOf(m: Msg): TransportMsg = {
    // DirectGet envelope headers are server-stamped — unparseable values
    // are a protocol violation (typed), not a caller-visible
    // NumberFormat/DateTimeParse leak
    val subject = m.headers.getOrElse("Nats-Subject", null)
    val seq =
      try m.headers.get("Nats-Sequence").map(_.toLong).getOrElse(0L)
      catch { case _: NumberFormatException =>
        throw new NatsIOException("protocol error: non-numeric " +
          s"Nats-Sequence '${m.headers("Nats-Sequence")}'")
      }
    val tsNs =
      try m.headers.get("Nats-Time-Stamp").map { iso =>
        val i = java.time.Instant.parse(iso)
        i.getEpochSecond * 1000000000L + i.getNano
      }.getOrElse(0L)
      catch { case _: java.time.format.DateTimeParseException =>
        throw new NatsIOException("protocol error: unparseable " +
          s"Nats-Time-Stamp '${m.headers("Nats-Time-Stamp")}'")
      }
    TransportMsg(subject, seq, tsNs, m.payload,
      m.headers -- NatsWireClient.ReservedHeaders)
  }

  override def directGet(stream: String, seq: Long): Option[TransportMsg] = {
    val resp = request(s"$$JS.API.DIRECT.GET.$stream",
      s"""{"seq":$seq}""".getBytes(UTF_8))
    resp.headOption.filter(_.status == 0).map(msgOf)
  }

  override def fetch(stream: String, fromSeq: Long, toSeq: Long,
                     max: Int): Array[TransportMsg] = {
    // ADR-31 batched direct get: one request, ≤ max messages, EOB status
    val resp = request(s"$$JS.API.DIRECT.GET.$stream",
      s"""{"seq":$fromSeq,"batch":$max,"up_to_seq":$toSeq}""".getBytes(UTF_8),
      expect = max)
    resp.filter(_.status == 0).map(msgOf).toArray
  }

  override def listStreams(): Seq[String] = {
    val r = api("$JS.API.STREAM.NAMES", "{}")
    Option(r.get("streams")).map { arr =>
      (0 until arr.size).map(arr.get(_).asText).sorted
    }.getOrElse(Seq.empty)
  }

  /** `$JS.API.STREAM.PURGE.<stream>` with the request's `filter` (and
    * optional `keep`) fields — the public purge-by-subject shape
    * (stream_purge_request). */
  override def purgeSubject(stream: String, filter: String,
                            keep: Int = 0): Long = {
    val req = mapper.createObjectNode()
    req.put("filter", filter)
    if (keep > 0) req.put("keep", keep)
    val r = api(s"$$JS.API.STREAM.PURGE.$stream", mapper.writeValueAsString(req))
    apiError(r).foreach { e =>
      // the missing-stream case keeps its TYPED shape (same as streamInfo)
      // so callers' "bucket not created yet" handling works over the wire
      // exactly as it does against the fixtures
      if (e.contains("stream not found"))
        throw new NatsStreamNotFoundException(s"Failed to purge stream: $e")
      throw new NatsIOException(s"Failed to purge stream: $e")
    }
    Option(r.get("purged")).map(_.asLong).getOrElse(0L)
  }

  /** stream seq + publish time from a `$JS.ACK` reply subject. Two public
    * forms (ADR-15): v1 = 9 tokens
    * (`$JS.ACK.<stream>.<consumer>.<delivered>.<sseq>.<cseq>.<tsNs>.<pending>`),
    * v2 ≥ 12 tokens with `<domain>.<account-hash>` inserted after `ACK` and
    * extension tokens appended at the END — so v2 parses at the v1 offsets
    * shifted by 2, discriminated by token count (the jnats rule). A v1-only
    * positional parse against a domain-configured server would read the
    * wrong tokens and corrupt cursor/window bookkeeping. */
  private def ackMeta(reply: String): (Long, Long) = {
    val p = reply.split('.')
    // valid counts: exactly 9 (v1) or ≥12 (v2) — 10/11 tokens match
    // neither grammar, and falling back to v1 offsets would silently read
    // consumer-name/cseq tokens as seq/ts
    if (p.length < 9 || p.length == 10 || p.length == 11 ||
        p(0) != "$JS" || p(1) != "ACK")
      throw new NatsIOException(
        s"protocol error: malformed ack subject '$reply'")
    try {
      if (p.length >= 12) (p(7).toLong, p(9).toLong) // v2: domain + acct hash
      else (p(5).toLong, p(7).toLong)                // v1: bare 9-token form
    } catch { case _: NumberFormatException =>
      throw new NatsIOException(
        s"protocol error: malformed ack subject '$reply'")
    }
  }

  override def consumer(stream: String, startSeq: Long,
                        filterSubject: Option[String] = None): MessageCursor = {
    def create(from: Long): String = {
      val cfg = mapper.createObjectNode()
      cfg.put("deliver_policy", "by_start_sequence")
        .put("opt_start_seq", from)
        .put("ack_policy", "none")
      filterSubject.foreach(cfg.put("filter_subject", _))
      val req = mapper.createObjectNode()
      req.put("stream_name", stream); req.set("config", cfg)
      val created = api(s"$$JS.API.CONSUMER.CREATE.$stream",
        mapper.writeValueAsString(req))
      apiError(created).foreach(e => throw new NatsIOException(
        s"Failed to create consumer: $e"))
      created.get("name").asText
    }
    new MessageCursor {
      private var name = create(startSeq)
      /** last stream seq DELIVERED to the caller — the recreate point.
        * An ordered (ack-none) consumer's server cursor advances on
        * delivery, so a request torn mid-read would SKIP the lost tail on
        * a naive retry; the ordered-consumer contract is to RECREATE at
        * the last delivered position instead (the seam's documented
        * "recreate at the last delivered sequence" semantics). */
      private var lastSeen = startSeq - 1L
      private var broken = false
      override def next(max: Int): Array[TransportMsg] = {
        if (broken) { // previous attempt tore: resume exactly after lastSeen
          name = create(lastSeen + 1L)
          broken = false
        }
        val resp =
          try request(s"$$JS.API.CONSUMER.MSG.NEXT.$stream.$name",
            s"""{"batch":$max,"no_wait":true}""".getBytes(UTF_8), expect = max)
          catch { case e: Throwable => broken = true; throw e }
        resp.filter(_.status == 0).map { m =>
          val (sseq, tsNs) = m.reply.map(ackMeta).getOrElse((0L, 0L))
          lastSeen = math.max(lastSeen, sseq)
          TransportMsg(m.subject, sseq, tsNs, m.payload,
            m.headers -- NatsWireClient.ReservedHeaders)
        }.toArray
      }
      override def close(): Unit = {
        api(s"$$JS.API.CONSUMER.DELETE.$stream.$name", "{}"); ()
      }
    }
  }

  /** shared page walk for the per-subject index surfaces: the server's
    * subjects map (STREAM.INFO subjects_filter), client-side FNV-1a
    * sharding + paging, then per-subject last-message Direct Gets */
  private def subjectsPage(stream: String, filter: Option[String],
                           bucket: Int, nBuckets: Int, after: Option[String],
                           max: Int): Seq[(String, Long)] = {
    // a real JetStream server PAGINATES the subjects map (offset in the
    // request; total/offset/limit in the response, 100k page cap) — loop
    // STREAM.INFO until every subject for the filter is in hand, else a
    // large key space silently truncates at one page
    val b = Seq.newBuilder[(String, Long)]
    var offset = 0L
    var expectTotal = Long.MaxValue
    var got = 0L
    var more = true
    while (more) {
      val r = api(s"$$JS.API.STREAM.INFO.$stream",
        s"""{"subjects_filter":"${filter.getOrElse(">")}","offset":$offset}""")
      apiError(r).foreach(e =>
        throw new NatsStreamNotFoundException(s"Failed to get stream info: $e"))
      // paged-info fields are top-level in the response (stream_info_response)
      expectTotal = Option(r.get("total")).map(_.asLong).getOrElse(0L)
      val subjects = Option(r.get("state")).flatMap(s => Option(s.get("subjects")))
      var page = 0L
      subjects.foreach { node =>
        val it = node.fields()
        while (it.hasNext) {
          val e = it.next(); b += e.getKey -> e.getValue.asLong; page += 1L
        }
      }
      got += page
      offset += page
      more = page > 0L && got < expectTotal
    }
    b.result()
      .filter(kv => SubjectFilter.shard(kv._1, nBuckets) == bucket)
      .filter(kv => after.forall(kv._1 > _))
      .sortBy(_._1)
      .take(max)
  }

  private def lastBySubject(stream: String, subject: String): Option[TransportMsg] = {
    val resp = request(s"$$JS.API.DIRECT.GET.$stream",
      s"""{"last_by_subj":${mapper.writeValueAsString(
        mapper.getNodeFactory.textNode(subject))}}""".getBytes(UTF_8))
    resp.headOption.filter(_.status == 0).map(msgOf)
  }

  override def lastForSubjects(stream: String, filterSubject: Option[String],
                               bucket: Int, nBuckets: Int,
                               afterSubject: Option[String], max: Int)
      : Array[TransportMsg] =
    subjectsPage(stream, filterSubject, bucket, nBuckets, afterSubject, max)
      .flatMap(kv => lastBySubject(stream, kv._1)).toArray

  override def subjectStats(stream: String, filterSubject: Option[String],
                            bucket: Int, nBuckets: Int,
                            afterSubject: Option[String], max: Int)
      : Array[SubjectStat] =
    subjectsPage(stream, filterSubject, bucket, nBuckets, afterSubject, max)
      .map { case (subj, count) =>
        val last = lastBySubject(stream, subj).map(_.seq).getOrElse(0L)
        SubjectStat(subj, count, last)
      }.toArray

  // ---------------- queue groups over a shared durable pull consumer ----

  private val groupsCreated =
    new scala.collection.concurrent.TrieMap[(String, String), Unit]()

  private def ensureGroup(stream: String, group: String, ackWaitMs: Long,
                          filterSubject: Option[String]): Unit =
    groupsCreated.getOrElseUpdate((stream, group), {
      val cfg = mapper.createObjectNode()
      cfg.put("durable_name", group)
        .put("ack_policy", "explicit")
        .put("ack_wait", ackWaitMs * 1000000L) // ns, the API unit
        .put("deliver_policy", "all")
      filterSubject.foreach(cfg.put("filter_subject", _))
      val req = mapper.createObjectNode()
      req.put("stream_name", stream); req.set("config", cfg)
      val created = api(s"$$JS.API.CONSUMER.DURABLE.CREATE.$stream.$group",
        mapper.writeValueAsString(req))
      apiError(created).foreach(e => throw new IllegalArgumentException(
        s"Failed to create group consumer: $e"))
      ()
    })

  override def groupNext(stream: String, group: String, member: String,
                         maxSeq: Long, max: Int, ackWaitMs: Long,
                         filterSubject: Option[String]): Array[TransportMsg] = {
    ensureGroup(stream, group, ackWaitMs, filterSubject)
    // `max_seq` rides the pull request so a window-aware server (the
    // fixture) never claims past the member's snapshot bound — without it,
    // post-snapshot publishes livelock the drain: claimed → NAK'd (seq >
    // maxSeq) → back in the pool → re-claimed on the next call, forever,
    // with groupPending pinned > 0. A real nats-server ignores unknown
    // request fields; the delayed NAK below covers that path.
    val resp = request(s"$$JS.API.CONSUMER.MSG.NEXT.$stream.$group",
      s"""{"batch":$max,"no_wait":true,"max_seq":$maxSeq}""".getBytes(UTF_8),
      expect = max)
    val out = Array.newBuilder[TransportMsg]
    resp.filter(_.status == 0).foreach { m =>
      val (sseq, tsNs) = m.reply.map(ackMeta).getOrElse((0L, 0L))
      if (sseq <= maxSeq) {
        m.reply.foreach(r => ackSubjects.put((stream, group, sseq), r))
        out += TransportMsg(m.subject, sseq, tsNs, m.payload,
          m.headers -- NatsWireClient.ReservedHeaders)
      } else
        // claimed past the member's window (a server that ignored max_seq):
        // DELAYED NAK — the public `-NAK {"delay": ns}` ack payload — parks
        // the message for a lease length instead of returning it to the
        // claimable pool immediately, so the drain loop sees in-window
        // messages (or clean emptiness) rather than hot-looping on the
        // same post-snapshot tail
        m.reply.foreach { r =>
          val body = s"""-NAK {"delay": ${ackWaitMs * 1000000L}}"""
          fire(s"PUB $r ${body.length}\r\n$body\r\n")
        }
    }
    out.result()
  }

  override def groupAck(stream: String, group: String,
                        seqs: Array[Long]): Unit = {
    // settle the whole batch on ONE lane checkout (one flush)
    val subjects = seqs.flatMap(s => ackSubjects.remove((stream, group, s)))
    if (subjects.nonEmpty)
      fire(subjects.map(r => s"PUB $r 4\r\n+ACK\r\n").mkString)
  }

  override def groupProgress(stream: String, group: String,
                             seqs: Array[Long], ackWaitMs: Long): Unit = {
    // `+WPI` per held claim, batched into one flush. The subjects STAY
    // registered — the claims remain ours and their eventual +ACK rides
    // the same reply subject. ackWaitMs is ignored on the wire: a real
    // server renews to the consumer's configured ack_wait.
    val subjects = seqs.flatMap(s => ackSubjects.get((stream, group, s)))
    if (subjects.nonEmpty)
      fire(subjects.map(r => s"PUB $r 4\r\n+WPI\r\n").mkString)
  }

  override def groupPending(stream: String, group: String): Long = {
    val r = api(s"$$JS.API.CONSUMER.INFO.$stream.$group", "{}")
    if (apiError(r).isDefined) 0L
    else Option(r.get("num_ack_pending")).map(_.asLong).getOrElse(0L) +
      Option(r.get("num_redelivery_pending")).map(_.asLong).getOrElse(0L)
  }

  // ---------------- durable floors + publish ----------------

  override def ackFloor(stream: String, durable: String): Long = {
    val r = api(s"$$JS.API.CONSUMER.INFO.$stream.$durable", "{}")
    if (apiError(r).isDefined) 0L // unknown durable = fresh consumer
    else Option(r.get("ack_floor")).flatMap(f => Option(f.get("stream_seq")))
      .map(_.asLong).getOrElse(0L)
  }

  override def ackAll(stream: String, durable: String, seq: Long): Unit = {
    // cumulative AckAll: +ACK published to the ack subject form carrying the
    // stream seq (the server routes acks by subject, not by request API)
    val subj = s"$$JS.ACK.$stream.$durable.1.$seq.$seq.0.0"
    fire(s"PUB $subj 4\r\n+ACK\r\n")
  }

  /** custom app headers as wire lines — keys/values must be header-legal
    * (no CR/LF; a corrupted header would desync the whole connection) */
  private def customHeaderLines(headers: Map[String, String]): String =
    headers.map { case (k, v) =>
      require(!k.exists(c => c == '\r' || c == '\n' || c == ':') && k.nonEmpty,
        s"illegal header name '$k'")
      require(!v.exists(c => c == '\r' || c == '\n'),
        s"illegal header value for '$k'")
      s"$k: $v\r\n"
    }.mkString

  override def publish(stream: String, subject: String, tsNs: Long,
                       payload: Array[Byte], msgId: String,
                       headers: Map[String, String] = Map.empty,
                       expectLastSubjectSeq: Option[Long] = None): Long = {
    val hdr = ("NATS/1.0\r\n" +
      s"Nats-Msg-Id: $msgId\r\n" +
      s"Nats-Expected-Stream: $stream\r\n" +
      expectLastSubjectSeq.fold("")(e =>
        s"Nats-Expected-Last-Subject-Sequence: $e\r\n") +
      customHeaderLines(headers) +
      s"Graft-Pub-Time: $tsNs\r\n\r\n").getBytes(UTF_8)
    val resp = withLane { l =>
      l.requirePayloadFits(subject, hdr.length.toLong + payload.length)
      l.request(subject, payload, expect = 1, headerBytes = hdr)
    }
    convs.incrementAndGet() // after: a refused publish never hit the socket
    if (resp.isEmpty) throw new NatsIOException("publish: no PubAck")
    failOnNoResponders(resp, "publish")
    if (resp.head.status != 0) // a PubAck is JSON, never a status frame
      throw new NatsIOException(s"publish: status ${resp.head.status}")
    val ack = mapper.readTree(new String(resp.head.payload, UTF_8))
    apiError(ack).foreach { e =>
      // the per-subject CAS failure is a DISTINCT, non-retryable outcome
      // (err_code 10071) — callers re-read and re-decide
      val node = mapper.readTree(new String(resp.head.payload, UTF_8))
      val errCode = Option(node.get("error"))
        .flatMap(n => Option(n.get("err_code"))).map(_.asInt)
      if (errCode.contains(10071) || e.contains("wrong last sequence")) {
        val cur = "\\d+".r.findFirstIn(e).map(_.toLong).getOrElse(-1L)
        throw new NatsWrongLastSequenceException(e, cur)
      }
      throw new NatsIOException(s"publish failed: $e")
    }
    ack.get("seq").asLong
  }

  override def publishBatch(stream: String,
                            entries: Array[PublishEntry]): Array[Long] = {
    convs.incrementAndGet()
    withLane(_.publishPipelined(stream, entries))
  }

  override def close(): Unit = {
    closed = true
    var l = idle.poll()
    while (l != null) { l.close(); l = idle.poll() }
  }
}

object NatsWireClient {
  /** header keys owned by the transport layer (publish bookkeeping +
    * DirectGet envelope) — stripped from the app-visible
    * [[TransportMsg.headers]] on every read path, and excluded from
    * storage on the fixture server's publish path (one list, both sides,
    * so a custom header can never shadow transport metadata) */
  val ReservedHeaders: Set[String] = Set(
    "Nats-Subject", "Nats-Sequence", "Nats-Time-Stamp", "Nats-Stream",
    "Nats-Msg-Id", "Nats-Expected-Stream", "Nats-Rollup",
    "Nats-Expected-Last-Subject-Sequence", "Graft-Pub-Time")

  /** socket-lane cap per client — per (url, credentials) per JVM via
    * [[TransportPool]]; 8 lanes keep 32 local slice readers busy without
    * the per-connection server cost of one socket per task. Tunable via
    * `-Dgraft.wire.lanes=N` (the scale probe sweeps it; a deployment
    * facing a connection-limited server can pin it to 1). */
  def MaxLanes: Int =
    Integer.getInteger("graft.wire.lanes", 8).intValue()

  /** Hard ceiling on a single inbound MSG/HMSG length argument. The server
    * enforces max_payload (default 1 MiB, configurable to 64 MiB) on the
    * publish side; a length above this ceiling therefore cannot be a real
    * frame — it is four corrupt bytes about to become a multi-GiB
    * allocation, and the lane refuses it as a protocol error instead. */
  val MaxFrameBytes: Long = 64L * 1024 * 1024

  /** Ceiling on one control line (INFO's connect_urls included — the
    * server's own default max_control_line is 4 KiB). A line this long
    * without CRLF is a garbage stream, not a frame. */
  val MaxControlLineBytes: Int = 1 * 1024 * 1024

  /** A publish refused LOCALLY (oversize vs the lane's advertised
    * `max_payload`) — an [[IllegalArgumentException]] to callers, but a
    * distinguished subtype so the lane pool keeps the (untouched, healthy)
    * lane instead of closing it like a torn conversation. */
  final class PayloadRefusedException(msg: String)
    extends IllegalArgumentException(msg)
}
