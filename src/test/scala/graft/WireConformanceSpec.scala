package graft

import java.io.{ByteArrayOutputStream, InputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.transport._

/** Wire-protocol CONFORMANCE: every assertion here is written from the
  * PUBLIC protocol documents — the NATS client protocol
  * (https://docs.nats.io/reference/reference-protocols/nats-protocol),
  * ADR-31 "JetStream Direct Get" (nats-architecture-and-design/adr/ADR-31)
  * and ADR-15 "JetStream Subjects" (the `$JS.ACK` reply grammar) — NOT from
  * MiniNatsServer's behavior. The round-9 verdict's residual risk was a
  * compensating framing bug shared by a client and server written by the
  * same hand; three independent checks close it:
  *
  *  1. A BYTE TAP records the raw TCP bytes both directions and replays
  *     them through [[DocGrammarScanner]], a frame tokenizer implemented
  *     here purely from the doc grammar (control line CRLF-terminated,
  *     payload length arithmetic exact, HPUB/HMSG header-length counts the
  *     trailing double-CRLF). Any framing arithmetic error on either side
  *     derails the scanner.
  *  2. GOLDEN SHAPE assertions on the recorded frames: CONNECT field
  *     requirements, SUB/PUB argument grammar, `$JS.API` subject forms,
  *     ADR-31 request fields and 204-EOB / 404 status signaling, and the
  *     `$JS.ACK` v1/v2 token grammar.
  *  3. The full client surface runs against a STRICT server
  *     (`MiniNatsServer(strict = true)`) that rejects malformed frames with
  *     `-ERR` + close, so a client emitting off-spec bytes cannot pass.
  */
class WireConformanceSpec extends AnyFunSuite {

  // ---------------- byte tap: a recording TCP proxy ----------------

  /** Records every byte of the FIRST proxied connection (later lane-pool
    * connections pass through unrecorded — one conversation is enough for
    * grammar checks and keeps the capture deterministic). */
  private final class ByteTap(targetPort: Int) {
    val clientToServer = new ByteArrayOutputStream()
    val serverToClient = new ByteArrayOutputStream()
    private val first = new java.util.concurrent.atomic.AtomicBoolean(true)
    private var server: ServerSocket = _
    @volatile private var running = true

    def start(): Int = {
      server = new ServerSocket(0, 4, InetAddress.getLoopbackAddress)
      val t = new Thread(() => {
        while (running) {
          try {
            val c = server.accept()
            val record = first.compareAndSet(true, false)
            val s = new Socket(InetAddress.getLoopbackAddress, targetPort)
            pump(c.getInputStream, s.getOutputStream,
              if (record) Some(clientToServer) else None)
            pump(s.getInputStream, c.getOutputStream,
              if (record) Some(serverToClient) else None)
          } catch { case _: Exception => () }
        }
      })
      t.setDaemon(true); t.start()
      server.getLocalPort
    }

    private def pump(in: InputStream, out: OutputStream,
                     tap: Option[ByteArrayOutputStream]): Unit = {
      val t = new Thread(() => {
        val buf = new Array[Byte](8192)
        try {
          var n = in.read(buf)
          while (n >= 0) {
            tap.foreach(_.synchronized(tap.get.write(buf, 0, n)))
            out.write(buf, 0, n); out.flush()
            n = in.read(buf)
          }
        } catch { case _: Exception => () }
      })
      t.setDaemon(true); t.start()
    }

    def stop(): Unit = { running = false; server.close() }
  }

  // ---------------- doc-grammar frame scanner ----------------

  /** One parsed frame: verb, control-line args, payload (PUB/HPUB/MSG/
    * HMSG), header block (HPUB/HMSG). */
  private final case class Frame(verb: String, args: Seq[String],
                                 header: String, payload: Array[Byte])

  /** Tokenizes a byte capture STRICTLY per the protocol doc:
    *   - every control line ends CRLF, verbs are the documented set;
    *   - `PUB <subject> [reply] <#bytes>` / `MSG <subject> <sid> [reply]
    *     <#bytes>`: exactly #bytes of payload then CRLF;
    *   - `HPUB`/`HMSG` carry `<#hdr> <#total>`, the header block must
    *     start `NATS/1.0` and end with the double-CRLF INCLUDED in #hdr,
    *     payload is #total − #hdr bytes then CRLF;
    *   - anything else fails the scan.
    * Implemented from the doc text, deliberately NOT sharing code with
    * either the client or the fixture server. */
  private object DocGrammarScanner {
    def scan(bytes: Array[Byte]): Seq[Frame] = {
      val out = Seq.newBuilder[Frame]
      var i = 0
      def readLine(): String = {
        val start = i
        while (i + 1 < bytes.length &&
          !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
        assert(i + 1 < bytes.length,
          s"control line at offset $start not CRLF-terminated")
        val s = new String(bytes, start, i - start, UTF_8)
        i += 2
        s
      }
      def readN(n: Int, what: String): Array[Byte] = {
        assert(i + n <= bytes.length, s"$what: truncated payload")
        val a = java.util.Arrays.copyOfRange(bytes, i, i + n)
        i += n
        a
      }
      def expectCrlf(what: String): Unit = {
        assert(i + 2 <= bytes.length && bytes(i) == '\r' && bytes(i + 1) == '\n',
          s"$what: payload not followed by CRLF")
        i += 2
      }
      while (i < bytes.length) {
        val line = readLine()
        if (line.nonEmpty) {
          val sp = line.indexOf(' ')
          val verb = (if (sp < 0) line else line.substring(0, sp)).toUpperCase
          val args: Seq[String] =
            if (sp < 0) Nil
            else line.substring(sp + 1).split(' ').toSeq
          verb match {
            case "INFO" | "CONNECT" | "PING" | "PONG" | "+OK" | "-ERR" |
                 "SUB" | "UNSUB" =>
              out += Frame(verb, args, "", Array.emptyByteArray)
            case "PUB" =>
              assert(args.length == 2 || args.length == 3,
                s"PUB arity: $line")
              val n = args.last.toInt
              val p = readN(n, "PUB"); expectCrlf("PUB")
              out += Frame(verb, args, "", p)
            case "MSG" =>
              assert(args.length == 3 || args.length == 4,
                s"MSG arity: $line")
              val n = args.last.toInt
              val p = readN(n, "MSG"); expectCrlf("MSG")
              out += Frame(verb, args, "", p)
            case "HPUB" =>
              assert(args.length == 3 || args.length == 4,
                s"HPUB arity: $line")
              val hl = args(args.length - 2).toInt
              val tl = args.last.toInt
              assert(hl <= tl, s"HPUB header longer than total: $line")
              val h = new String(readN(hl, "HPUB header"), UTF_8)
              assert(h.startsWith("NATS/1.0"),
                s"HPUB header version line missing: '$h'")
              assert(h.endsWith("\r\n\r\n"),
                "HPUB #hdr must count the trailing double-CRLF")
              val p = readN(tl - hl, "HPUB"); expectCrlf("HPUB")
              out += Frame(verb, args, h, p)
            case "HMSG" =>
              assert(args.length == 4 || args.length == 5,
                s"HMSG arity: $line")
              val hl = args(args.length - 2).toInt
              val tl = args.last.toInt
              assert(hl <= tl, s"HMSG header longer than total: $line")
              val h = new String(readN(hl, "HMSG header"), UTF_8)
              assert(h.startsWith("NATS/1.0"),
                s"HMSG header version line missing: '$h'")
              assert(h.endsWith("\r\n\r\n"),
                "HMSG #hdr must count the trailing double-CRLF")
              val p = readN(tl - hl, "HMSG"); expectCrlf("HMSG")
              out += Frame(verb, args, h, p)
            case other => fail(s"undocumented verb '$other' on the wire")
          }
        }
      }
      out.result()
    }
  }

  /** `$JS.ACK` grammar (ADR-15): v1 = 9 tokens
    * `$JS.ACK.<stream>.<consumer>.<delivered>.<sseq>.<cseq>.<tsnano>.<pending>`,
    * v2 ≥ 12 with `<domain>.<a-hash>` after ACK and tokens appended at the
    * end. */
  private def assertAckSubject(s: String): Unit = {
    val p = s.split('.')
    assert(p(0) == "$JS" && p(1) == "ACK", s"ack subject prefix: $s")
    assert(p.length == 9 || p.length >= 12,
      s"ack subject token count ${p.length} is neither v1 (9) nor v2 (>=12): $s")
    val nums = if (p.length == 9) p.slice(4, 9) else p.slice(6, 11)
    nums.foreach(t => assert(t.forall(_.isDigit),
      s"non-numeric metadata token '$t' in $s"))
  }

  private def fixtureBacking(): FakeJetStreamServer = {
    val b = new FakeJetStreamServer
    (1L to 40L).foreach { i =>
      b.publish("cf", i, s"cf.dev${i % 4}",
        1700000000000000000L + i * 1000000000L, s"""{"v":$i}""".getBytes(UTF_8))
    }
    b.deleteMsg("cf", 7L)
    b
  }

  test("every byte either direction parses under the doc grammar; golden " +
    "frame shapes for CONNECT, SUB/PUB, JetStream API subjects, ADR-31") {
    val backing = fixtureBacking()
    val srv = new MiniNatsServer(backing)
    val srvPort = srv.start()
    val tap = new ByteTap(srvPort)
    val tapPort = tap.start()
    val t = Transport.connect(s"nats://127.0.0.1:$tapPort", timeoutMs = 2000L)
    try {
      // one of each conversation shape over the tapped connection
      assert(t.streamInfo("cf").messages == 39L)
      assert(t.directGet("cf", 3L).exists(_.subject == "cf.dev3"))
      assert(t.directGet("cf", 7L).isEmpty) // 404 path
      assert(t.fetch("cf", 1L, 40L, 2048).length == 39) // ADR-31 batch + EOB
      val c = t.consumer("cf", 1L)
      assert(c.next(5).length == 5)
      c.close()
      val claimed = t.groupNext("cf", "cg", "m0", 40L, 10, 30000L, None)
      assert(claimed.length == 10)
      t.groupAck("cf", "cg", claimed.map(_.seq))
      t.publish("cf", "cf.dev0", 1700000040000000000L, "x".getBytes(UTF_8), "m-1")
      t.close()
      Thread.sleep(100L) // let the pumps drain the tail
      val c2s = DocGrammarScanner.scan(tap.clientToServer.toByteArray)
      val s2c = DocGrammarScanner.scan(tap.serverToClient.toByteArray)

      // --- server speaks first: INFO with a JSON payload (doc §INFO) ---
      assert(s2c.head.verb == "INFO", "server must open with INFO")
      val info = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(s2c.head.args.mkString(" "))
      assert(info.hasNonNull("server_id") && info.hasNonNull("version"))

      // --- client opens with CONNECT carrying the documented fields ---
      assert(c2s.head.verb == "CONNECT", "client must open with CONNECT")
      val connect = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(c2s.head.args.mkString(" "))
      for (f <- Seq("verbose", "pedantic", "tls_required"))
        assert(connect.has(f) && connect.get(f).isBoolean,
          s"CONNECT missing required boolean '$f'")
      assert(connect.get("protocol").asInt == 1, "CONNECT protocol must be 1")
      // headers:true is required for HMSG delivery (doc §CONNECT)
      assert(connect.get("headers").asBoolean)
      assert(c2s(1).verb == "PING", "CONNECT is followed by PING for RTT ack")

      // --- SUB inboxes then PUB requests: subject forms per JetStream API ---
      val subs = c2s.filter(_.verb == "SUB")
      assert(subs.nonEmpty)
      subs.foreach { f =>
        assert(f.args.length == 2, s"SUB <subject> <sid>: ${f.args}")
        assert(f.args.head.startsWith("_INBOX."), "request reply inbox form")
        assert(f.args(1).forall(_.isDigit))
      }
      val pubs = c2s.filter(f => f.verb == "PUB" || f.verb == "HPUB")
      val apiSubjects = pubs.map(_.args.head).filter(_.startsWith("$JS.API."))
      assert(apiSubjects.exists(_.startsWith("$JS.API.STREAM.INFO.cf")))
      assert(apiSubjects.exists(_ == "$JS.API.DIRECT.GET.cf"))
      assert(apiSubjects.exists(_.startsWith("$JS.API.CONSUMER.CREATE.cf")))
      assert(apiSubjects.exists(
        _.startsWith("$JS.API.CONSUMER.MSG.NEXT.cf.")))

      // --- ADR-31 batched direct get: request fields seq/batch/up_to_seq ---
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val dgBodies = pubs.filter(_.args.head == "$JS.API.DIRECT.GET.cf")
        .map(f => mapper.readTree(new String(f.payload, UTF_8)))
      assert(dgBodies.exists(b => b.has("seq") && b.has("batch") &&
        b.has("up_to_seq")), "ADR-31 batch request field names")

      // --- ADR-31 responses: messages as HMSG with Nats-Stream metadata
      // headers, batch terminated by a 204 EOB status, miss = 404 ---
      val hmsgs = s2c.filter(_.verb == "HMSG")
      assert(hmsgs.exists(_.header.contains("Nats-Sequence:")))
      assert(hmsgs.exists(_.header.contains("Nats-Time-Stamp:")))
      assert(hmsgs.exists(_.header.startsWith("NATS/1.0 204")),
        "ADR-31 batch must terminate with a 204 EOB status frame")
      assert(hmsgs.exists(_.header.startsWith("NATS/1.0 404")),
        "missing message must answer a 404 status")

      // --- MSG.NEXT deliveries carry a $JS.ACK reply subject (ADR-15) ---
      val nextMsgs = s2c.filter(f => f.verb == "MSG" && f.args.length == 4 &&
        f.args(2).startsWith("$JS.ACK."))
      assert(nextMsgs.nonEmpty, "MSG.NEXT delivery must carry an ack reply")
      nextMsgs.foreach(f => assertAckSubject(f.args(2)))

      // --- acks publish +ACK to the ack subject ---
      val ackPubs = c2s.filter(f => f.verb == "PUB" &&
        f.args.head.startsWith("$JS.ACK."))
      assert(ackPubs.nonEmpty)
      ackPubs.foreach { f =>
        assertAckSubject(f.args.head)
        assert(new String(f.payload, UTF_8).startsWith("+ACK"))
      }

      // --- publishes ride HPUB with the JetStream headers ---
      val hpubs = c2s.filter(_.verb == "HPUB")
      assert(hpubs.exists(_.header.contains("Nats-Msg-Id:")))
      assert(hpubs.exists(_.header.contains("Nats-Expected-Stream:")))
    } finally { tap.stop(); srv.stop() }
  }

  test("full client surface against a STRICT server: off-spec bytes can't " +
    "pass, so client and fixture share no compensating bug") {
    val backing = fixtureBacking()
    val srv = new MiniNatsServer(backing, strict = true)
    srv.start()
    val t = Transport.connect(srv.url, timeoutMs = 2000L)
    try {
      assert(t.streamInfo("cf").messages == 39L)
      assert(t.listStreams() == Seq("cf"))
      assert(t.directGet("cf", 3L).nonEmpty && t.directGet("cf", 7L).isEmpty)
      assert(t.fetch("cf", 1L, 40L, 2048).map(_.seq).toSeq ==
        (1L to 40L).filterNot(_ == 7L))
      val c = t.consumer("cf", 1L, Some("cf.dev2"))
      assert(c.next(1000).map(_.seq).toSeq == (2L to 38L by 4L))
      c.close()
      assert((0 until 2).flatMap(b =>
        t.lastForSubjects("cf", None, b, 2, None, 100)).length == 4)
      assert((0 until 2).flatMap(b =>
        t.subjectStats("cf", None, b, 2, None, 100)).map(_.count).sum == 39L)
      val claimed = t.groupNext("cf", "sg", "m0", 40L, 2048, 30000L, None)
      t.groupAck("cf", "sg", claimed.map(_.seq))
      assert(t.groupPending("cf", "sg") == 0L)
      assert(t.publish("cf", "cf.dev1", 1700000050000000000L,
        "y".getBytes(UTF_8), "m-2") == 41L)
      t.ackAll("cf", "dur1", 10L)
      assert(t.ackFloor("cf", "dur1") >= 0L)
      // STREAM.PURGE by subject through the strict parser: keep=1 is the
      // rollup form — cf.dev1 collapses to its newest message (seq 41)
      assert(t.purgeSubject("cf", "cf.dev1", keep = 1) == 10L)
      assert(t.directGet("cf", 41L).nonEmpty)
      assert((0 until 2).flatMap(b =>
        t.subjectStats("cf", None, b, 2, None, 100)).map(_.count).sum == 30L)
    } finally { t.close(); srv.stop() }
  }

  test("ADR-8 KV golden frames: $KV subject grammar, KV-Operation marker, " +
    "Nats-Expected-Last-Subject-Sequence header, err 10071 PubAck shape") {
    // every assertion cites the public ADR-8 "JetStream based Key-Value
    // Stores" (nats-architecture-and-design/adr/ADR-8.md): bucket B is
    // stream KV_B, keys ride `$KV.<bucket>.<key>`, delete publishes an
    // empty value under a `KV-Operation: DEL` header, and compare-and-set
    // rides `Nats-Expected-Last-Subject-Sequence` with the conflict
    // answered by JetStream err_code 10071 ("wrong last sequence")
    val backing = new FakeJetStreamServer
    val srv = new MiniNatsServer(backing)
    val srvPort = srv.start()
    val tap = new ByteTap(srvPort)
    val tapPort = tap.start()
    val t = Transport.connect(s"nats://127.0.0.1:$tapPort", timeoutMs = 2000L)
    try {
      val kv = new KvStore(t, "cfg", maxHistory = 0)
      val r1 = kv.put("app.color", "red".getBytes(UTF_8), 1L)
      kv.update("app.color", "blue".getBytes(UTF_8), expectedRev = r1, tsNs = 2L)
      intercept[NatsWrongLastSequenceException](
        kv.update("app.color", "green".getBytes(UTF_8), expectedRev = r1,
          tsNs = 3L))
      kv.delete("app.color", 4L)
      assert(kv.get("app.color").isEmpty)
      t.close()
      Thread.sleep(100L)
      val c2s = DocGrammarScanner.scan(tap.clientToServer.toByteArray)
      val s2c = DocGrammarScanner.scan(tap.serverToClient.toByteArray)

      // ADR-8 subject grammar: EVERY kv write rides `$KV.cfg.<key>`
      val kvPubs = c2s.filter(f => (f.verb == "PUB" || f.verb == "HPUB") &&
        f.args.head.startsWith("$KV."))
      assert(kvPubs.nonEmpty, "no $KV publishes captured")
      kvPubs.foreach(f => assert(f.args.head == "$KV.cfg.app.color",
        s"off-grammar KV subject ${f.args.head}"))

      // ADR-8 update: the CAS header with the expected revision
      assert(kvPubs.exists(_.header.contains(
        s"Nats-Expected-Last-Subject-Sequence: $r1")),
        "CAS update must carry Nats-Expected-Last-Subject-Sequence")

      // ADR-8 delete: empty-value publish under KV-Operation: DEL
      val dels = kvPubs.filter(_.header.contains("KV-Operation: DEL"))
      assert(dels.nonEmpty, "delete must publish the DEL operation marker")
      dels.foreach(f => assert(f.payload.isEmpty, "DEL marker value empty"))

      // the failed CAS PubAck: JetStream error JSON with err_code 10071
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val conflictAcks = s2c
        .filter(f => f.verb == "MSG" || f.verb == "HMSG")
        .map(f => new String(f.payload, UTF_8))
        .filter(_.contains("10071"))
      assert(conflictAcks.nonEmpty, "CAS conflict must answer err_code 10071")
      val err = mapper.readTree(conflictAcks.head).get("error")
      assert(err.get("err_code").asInt == 10071)
      assert(err.get("description").asText.contains("wrong last sequence"))
    } finally { tap.stop(); srv.stop() }
  }

  test("ADR-20 object-store golden frames: $O chunk/meta layout, " +
    "Nats-Rollup: sub grammar, ObjectInfo digest, purge filter request") {
    // cited to the public ADR-20 "JetStream based Object Stores": bucket B
    // is stream OBJ_B; chunks ride `$O.<bucket>.C.<nuid>`; the meta record
    // rides `$O.<bucket>.M.<base64url(name)>` with a `Nats-Rollup: sub`
    // header; digest is `SHA-256=<base64url>`; a superseded version's
    // chunks are reclaimed with the purge-by-subject `filter` request
    val backing = new FakeJetStreamServer
    val srv = new MiniNatsServer(backing)
    val srvPort = srv.start()
    val tap = new ByteTap(srvPort)
    val tapPort = tap.start()
    val t = Transport.connect(s"nats://127.0.0.1:$tapPort", timeoutMs = 2000L)
    try {
      val name = "a/b c.bin" // dots+spaces force the base64url meta token
      val os = new ObjectStore(t, "blobs", chunkSize = 8)
      os.put(name, ("v1-" * 7).getBytes(UTF_8), 1L) // 21 B → 3 chunks
      os.put(name, ("v2-" * 7).getBytes(UTF_8), 2L) // overwrite → reclaim
      assert(new String(os.get(name), UTF_8) == "v2-" * 7)
      os.delete(name, 3L)                            // tombstone → reclaim
      t.close()
      Thread.sleep(100L)
      val c2s = DocGrammarScanner.scan(tap.clientToServer.toByteArray)
      val pubs = c2s.filter(f => f.verb == "PUB" || f.verb == "HPUB")
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

      // chunk layout: `$O.blobs.C.<nuid>`, nuid a single legal token
      val chunks = pubs.filter(_.args.head.startsWith("$O.blobs.C."))
      assert(chunks.length == 6, s"expected 2 puts × 3 chunks, got ${chunks.length}")
      val nuids = chunks.map(_.args.head.stripPrefix("$O.blobs.C.")).distinct
      assert(nuids.length == 2, "each put takes a FRESH chunk nuid")
      nuids.foreach(n => assert(n.nonEmpty && !n.exists(c => c == '.' ||
        c == '*' || c == '>' || c == ' '), s"illegal nuid token '$n'"))

      // meta layout: `$O.blobs.M.<base64url-nopad(name)>`, rollup header
      val metaSubj = ObjectStore.metaSubject("blobs", name)
      assert(metaSubj.matches("""\$O\.blobs\.M\.[A-Za-z0-9_-]+"""),
        s"meta token must be base64url-no-pad: $metaSubj")
      val metas = pubs.filter(_.args.head == metaSubj)
      assert(metas.length == 3, "2 puts + 1 tombstone meta")
      metas.foreach(f => assert(f.header.contains("Nats-Rollup: sub"),
        "every meta publish must carry the ADR-20 rollup header"))

      // ObjectInfo JSON: required fields + the SHA-256= digest form
      val first = mapper.readTree(new String(metas.head.payload, UTF_8))
      for (fld <- Seq("name", "bucket", "nuid", "size", "chunks", "digest"))
        assert(first.hasNonNull(fld), s"ObjectInfo missing '$fld'")
      assert(first.get("name").asText == name)
      assert(first.get("digest").asText.matches("SHA-256=[A-Za-z0-9_-]+"))
      assert(first.get("size").asLong == 21L && first.get("chunks").asInt == 3)
      val tomb = mapper.readTree(new String(metas.last.payload, UTF_8))
      assert(tomb.get("deleted").asBoolean && tomb.get("size").asLong == 0L &&
        tomb.get("chunks").asInt == 0, "ADR-20 delete tombstone shape")

      // reclaim: STREAM.PURGE with the purge-by-subject `filter` body,
      // targeting exactly the superseded/deleted version's chunk subject
      val purges = pubs.filter(_.args.head == "$JS.API.STREAM.PURGE.OBJ_blobs")
        .map(f => mapper.readTree(new String(f.payload, UTF_8)))
      assert(purges.length == 2, "overwrite + delete each reclaim once")
      purges.foreach { b =>
        assert(b.hasNonNull("filter"), "purge must use the filter field")
        assert(b.get("filter").asText.matches(
          """\$O\.blobs\.C\.[A-Za-z0-9_-]+"""), b.get("filter").asText)
      }

      // the get consumed chunks through a server-side-filtered consumer:
      // CONSUMER.CREATE carrying filter_subject = THE object's chunk
      // subject (wire volume = the object's own bytes, never the bucket)
      val consumerReqs = pubs
        .filter(_.args.head.startsWith("$JS.API.CONSUMER.CREATE.OBJ_blobs"))
        .map(f => mapper.readTree(new String(f.payload, UTF_8)))
      assert(consumerReqs.exists(r =>
        Option(r.get("config")).exists(c =>
          Option(c.get("filter_subject")).exists(
            _.asText.startsWith("$O.blobs.C.")))),
        "chunk fetch must filter server-side on the version's chunk subject")
    } finally { tap.stop(); srv.stop() }
  }

  test("ADR-8 + ADR-20 full lifecycles against the STRICT server") {
    val backing = new FakeJetStreamServer
    val srv = new MiniNatsServer(backing, strict = true)
    srv.start()
    val t = Transport.connect(srv.url, timeoutMs = 2000L)
    try {
      // KV: create / put / CAS update / conflict / history / delete / purge
      val kv = new KvStore(t, "sk", maxHistory = 0)
      val r1 = kv.create("a", "1".getBytes(UTF_8), 1L)
      intercept[NatsWrongLastSequenceException](
        kv.create("a", "dup".getBytes(UTF_8), 2L))
      val r2 = kv.update("a", "2".getBytes(UTF_8), expectedRev = r1, tsNs = 3L)
      intercept[NatsWrongLastSequenceException](
        kv.update("a", "x".getBytes(UTF_8), expectedRev = r1, tsNs = 4L))
      assert(kv.get("a").map(_.valueUtf8).contains("2"))
      assert(kv.history("a").map(_.op) == Seq(KvStore.OpPut, KvStore.OpPut))
      kv.put("b", "3".getBytes(UTF_8), 5L)
      assert(kv.entries().map(_.key).sorted == Seq("a", "b"))
      kv.delete("a", 6L)
      assert(kv.get("a").isEmpty && kv.getRevision("a", r2).nonEmpty)
      kv.purge("b", 7L)
      assert(kv.history("b").map(_.op) == Seq(KvStore.OpPurge))

      // object store: put / get / overwrite / list / delete / sweep
      val os = new ObjectStore(t, "so", chunkSize = 8)
      os.put("x", ("A" * 20).getBytes(UTF_8), 1L)
      os.put("y", ("B" * 9).getBytes(UTF_8), 2L)
      os.put("x", ("C" * 17).getBytes(UTF_8), 3L)
      assert(new String(os.get("x"), UTF_8) == "C" * 17)
      assert(os.list().map(_.name).sorted == Seq("x", "y"))
      os.delete("y", 4L)
      assert(os.list().map(_.name) == Seq("x"))
      assert(os.sweepOrphans() == 0) // nothing unreferenced after reclaim
    } finally { t.close(); srv.stop() }
  }

  test("strict server rejects malformed frames with -ERR and drops the " +
    "connection (parser behavior per the protocol doc)") {
    val backing = fixtureBacking()
    val srv = new MiniNatsServer(backing, strict = true)
    val port = srv.start()

    def raw(lines: String): (String, Boolean) = {
      val s = new Socket(InetAddress.getLoopbackAddress, port)
      s.setSoTimeout(2000)
      val in = s.getInputStream
      val out = s.getOutputStream
      // swallow INFO
      val buf = new Array[Byte](4096)
      in.read(buf)
      out.write("CONNECT {\"verbose\":false,\"protocol\":1}\r\nPING\r\n".getBytes(UTF_8))
      out.flush()
      in.read(buf) // PONG
      out.write(lines.getBytes(UTF_8)); out.flush()
      val sb = new StringBuilder
      var closed = false
      try {
        var n = in.read(buf)
        while (n >= 0) { sb.append(new String(buf, 0, n, UTF_8)); n = in.read(buf) }
        closed = true // EOF = server dropped us
      } catch { case _: java.net.SocketTimeoutException => () }
      s.close()
      (sb.toString, closed)
    }

    val (r1, c1) = raw("BOGUS stuff\r\n")
    assert(r1.contains("-ERR 'Unknown Protocol Operation'") && c1,
      s"unknown verb must -ERR and close, got '$r1' closed=$c1")
    val (r2, c2) = raw("PUB cf.x abc\r\n")
    assert(r2.contains("-ERR 'Parser Error'") && c2,
      s"non-numeric PUB length must -ERR and close, got '$r2'")
    val (r3, c3) = raw("PUB cf.x 3\r\nabcdef\r\n")
    assert(r3.contains("-ERR 'Parser Error'") && c3,
      "payload overrun (missing CRLF at declared length) must be rejected")
    val (r4, c4) = raw("HPUB cf.x 5 30\r\nBAD!!abcdefabcdefabcdefabc\r\n")
    assert(r4.contains("-ERR 'Parser Error'") && c4,
      "HPUB header block must start NATS/1.0 and end double-CRLF")
    val (r5, c5) = raw("SUB inbox\r\n")
    assert(r5.contains("-ERR 'Parser Error'") && c5,
      "SUB needs <subject> <sid>")
    srv.stop()
  }

  // ---------------- server-frame mutation fuzz ----------------

  /** A hostile "server": speaks just enough protocol to reach the response
    * point of a DIRECT.GET conversation, then emits whatever bytes the
    * current trial installed. `closeAfter` drops the connection right after
    * the response — the fuzz mode that makes hangs impossible (every
    * blocked read terminates in EOF). */
  private final class MutatingServer(closeAfter: Boolean) {
    @volatile var respond: (String, Long) => Array[Byte] = validDirectGetFrame
    private val server =
      new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
    @volatile private var running = true
    def port: Int = server.getLocalPort

    def start(): Unit = {
      val t = new Thread(() => {
        while (running) {
          try {
            val c = server.accept()
            val h = new Thread(() => handle(c))
            h.setDaemon(true); h.start()
          } catch { case _: Exception => () }
        }
      })
      t.setDaemon(true); t.start()
    }

    private def handle(c: Socket): Unit = {
      try {
        c.setTcpNoDelay(true)
        val in = c.getInputStream
        val out = c.getOutputStream
        out.write(("INFO {\"server_id\":\"fuzz\",\"max_payload\":1048576," +
          "\"proto\":1}\r\n").getBytes(UTF_8))
        out.flush()
        def line(): String = {
          val sb = new StringBuilder
          var prev = -1
          while (true) {
            val b = in.read()
            if (b < 0) return null
            if (prev == '\r' && b == '\n')
              return sb.substring(0, sb.length - 1)
            sb.append(b.toChar); prev = b
          }
          null
        }
        var inbox = ""
        var sid = 0L
        var open = true
        while (open) {
          val l = line()
          if (l == null) open = false
          else if (l.startsWith("PING")) { out.write("PONG\r\n".getBytes(UTF_8)); out.flush() }
          else if (l.startsWith("SUB ")) {
            val p = l.split(' '); inbox = p(1); sid = p(2).toLong
          } else if (l.startsWith("PUB ") || l.startsWith("HPUB ")) {
            val p = l.split(' ')
            val total = p.last.toInt // PUB len / HPUB total
            val buf = new Array[Byte](total + 2) // payload + CRLF
            var off = 0
            while (off < buf.length) {
              val r = in.read(buf, off, buf.length - off)
              if (r < 0) { open = false; off = buf.length }
              else off += r
            }
            if (open) {
              out.write(respond(inbox, sid)); out.flush()
              if (closeAfter) { c.close(); open = false }
            }
          } // CONNECT / UNSUB / anything else: ignore
        }
      } catch { case _: Exception => () }
      finally { try c.close() catch { case _: Exception => () } }
    }

    def stop(): Unit = { running = false; server.close() }
  }

  private val fuzzHdr = "NATS/1.0\r\nNats-Subject: ev.a.1\r\n" +
    "Nats-Sequence: 5\r\nNats-Time-Stamp: 2024-01-02T03:04:05Z\r\n\r\n"
  private val fuzzPayload = "hello-fuzz"

  /** the one well-formed DIRECT.GET response every mutation starts from */
  private def validDirectGetFrame(inbox: String, sid: Long): Array[Byte] =
    (s"HMSG $inbox $sid ${fuzzHdr.length} " +
      s"${fuzzHdr.length + fuzzPayload.length}\r\n$fuzzHdr$fuzzPayload\r\n")
      .getBytes(UTF_8)

  test("fuzz: >=1k mutated server frames surface a TYPED error or a clean " +
    "result - never a raw parser exception, allocation blowup, or hang") {
    val srv = new MutatingServer(closeAfter = true)
    srv.start()
    val t = Transport.connect(s"nats://127.0.0.1:${srv.port}",
      timeoutMs = 1000L)
    try {
      // sanity: the unmutated template round-trips (otherwise every trial
      // would "pass" by failing for the wrong reason)
      srv.respond = validDirectGetFrame
      val ok = t.directGet("cf", 5L)
      assert(ok.exists(m => new String(m.payload, UTF_8) == fuzzPayload &&
        m.seq == 5L), s"unmutated template must decode, got $ok")

      val rnd = new scala.util.Random(0xF022)
      val lenPool = Seq("-1", "0", "7", "2147483647", "999999999999",
        "68719476736", "xx", "")
      var failures = List.empty[String]
      for (trial <- 1 to 1200) {
        val base = validDirectGetFrame("_INBOX.fuzz", 99L)
        // mutate a COPY of real frame bytes; the server substitutes the
        // trial's bytes wholesale (sid correlation is part of the fuzz
        // surface: a mutated sid is a frame for a dead subscription)
        val mutated: Array[Byte] = rnd.nextInt(8) match {
          case 0 => // bit flip in the control line
            val b = base.clone()
            val i = rnd.nextInt(math.min(40, b.length))
            b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte; b
          case 1 => // bit flip anywhere
            val b = base.clone()
            val i = rnd.nextInt(b.length)
            b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte; b
          case 2 => // truncation (mid-header, mid-payload, mid-CRLF)
            base.take(1 + rnd.nextInt(base.length - 1))
          case 3 => // length-field damage: negative, absurd, non-numeric
            (s"HMSG _INBOX.fuzz 99 ${lenPool(rnd.nextInt(lenPool.length))} " +
              s"${lenPool(rnd.nextInt(lenPool.length))}\r\n$fuzzHdr" +
              s"$fuzzPayload\r\n").getBytes(UTF_8)
          case 4 => // garbage control line injected before the frame
            (Array.fill(rnd.nextInt(64) + 1)(
              (rnd.nextInt(94) + 33).toByte) ++ "\r\n".getBytes(UTF_8)) ++ base
          case 5 => // verb swap
            val verbs = Seq("XMSG", "MSGG", "msg?", "HMS", "H MSG", "12345")
            (verbs(rnd.nextInt(verbs.length)) +
              new String(base, UTF_8).substring(4)).getBytes(UTF_8)
          case 6 => // header-block corruption (status line, colon, CRLFs)
            val b = base.clone()
            val hdrStart = new String(b, UTF_8).indexOf("NATS/1.0")
            val i = hdrStart + rnd.nextInt(fuzzHdr.length)
            b(i) = (rnd.nextInt(94) + 33).toByte; b
          case _ => // pure noise
            Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
        }
        srv.respond = (_, _) => mutated
        try { t.directGet("cf", 5L); () } // a clean result is acceptable
        catch {
          case _: NatsIOException | _: NatsNoRespondersException |
               _: NatsConnectException => () // typed = correct
          case e: Throwable =>
            failures ::= s"trial $trial: ${e.getClass.getName}: " +
              s"${e.getMessage} | frame=${mutated.take(80).map(b =>
                f"$b%02x").mkString}"
        }
      }
      assert(failures.isEmpty,
        s"${failures.length} untyped escapes:\n${failures.take(5).mkString("\n")}")
    } finally { t.close(); srv.stop() }
  }

  test("fuzz: a survivable oddity must not mis-frame the NEXT conversation " +
    "on the same connection") {
    val srv = new MutatingServer(closeAfter = false)
    srv.start()
    val t = Transport.connect(s"nats://127.0.0.1:${srv.port}",
      timeoutMs = 2000L)
    def validAgain(): Unit = {
      srv.respond = validDirectGetFrame
      val m = t.directGet("cf", 5L)
      assert(m.exists(x => new String(x.payload, UTF_8) == fuzzPayload &&
        x.seq == 5L), s"follow-up conversation mis-framed: $m")
    }
    try {
      // interleaved PING: client must PONG and keep reading
      srv.respond = (i, s) => "PING\r\n".getBytes(UTF_8) ++ validDirectGetFrame(i, s)
      assert(t.directGet("cf", 5L).nonEmpty); validAgain()
      // interleaved +OK: skipped
      srv.respond = (i, s) => "+OK\r\n".getBytes(UTF_8) ++ validDirectGetFrame(i, s)
      assert(t.directGet("cf", 5L).nonEmpty); validAgain()
      // a well-formed frame for a DEAD sid rides before the real one:
      // skipped without disturbing framing
      srv.respond = (i, s) =>
        validDirectGetFrame(i, s + 1000) ++ validDirectGetFrame(i, s)
      assert(t.directGet("cf", 5L).nonEmpty); validAgain()
      // corrupt payload CONTENT with correct lengths: delivered as-is,
      // framing intact
      srv.respond = (i, s) => (s"HMSG $i $s ${fuzzHdr.length} " +
        s"${fuzzHdr.length + 4}\r\n${fuzzHdr}ABCD\r\n")
        .getBytes(UTF_8)
      assert(t.directGet("cf", 5L).exists(_.payload.length == 4)); validAgain()
      // unknown extra header: surfaced in headers, framing intact
      locally {
        val hdr = "NATS/1.0\r\nNats-Subject: ev.a.1\r\nNats-Sequence: 5\r\n" +
          "X-Graft-Fuzz: yes\r\n\r\n"
        srv.respond = (i, s) => (s"HMSG $i $s ${hdr.length} " +
          s"${hdr.length + 2}\r\n${hdr}ok\r\n").getBytes(UTF_8)
        assert(t.directGet("cf", 5L)
          .exists(_.headers.get("X-Graft-Fuzz").contains("yes")))
        validAgain()
      }
      // 404 no-messages status: a clean None, connection stays aligned
      srv.respond = (i, s) =>
        (s"HMSG $i $s 16 16\r\nNATS/1.0 404\r\n\r\n\r\n").getBytes(UTF_8)
      assert(t.directGet("cf", 5L).isEmpty); validAgain()
      // -ERR: typed error, lane torn down, NEXT call re-dials cleanly
      srv.respond = (_, _) => "-ERR 'Fuzz Injected'\r\n".getBytes(UTF_8)
      intercept[NatsIOException] { t.directGet("cf", 5L) }
      validAgain()
      // 503 no-responders: the typed no-responders error, then clean re-use
      srv.respond = (i, s) =>
        (s"HMSG $i $s 16 16\r\nNATS/1.0 503\r\n\r\n\r\n").getBytes(UTF_8)
      intercept[NatsNoRespondersException] { t.directGet("cf", 5L) }
      validAgain()
    } finally { t.close(); srv.stop() }
  }
}
