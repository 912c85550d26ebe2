package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.transport._

/** [[KvStore]] (ADR-8 key-value over JetStream): put/get/CAS/history/
  * tombstones against the in-JVM fake, then the SAME facade over real
  * loopback sockets through [[MiniNatsServer]]. */
class KvStoreSpec extends AnyFunSuite {

  private def fresh(tag: String, history: Int = 8): (KvStore, JetStreamTransport) = {
    val url = s"nats://kvstore-$tag:4222"
    FakeJetStream.listen(url)
    val t = Transport.connect(url)
    (new KvStore(t, s"b$tag", history), t)
  }

  private def b(s: String) = s.getBytes(UTF_8)

  test("put/get roundtrip: revisions are stream seqs, last write wins") {
    val (kv, _) = fresh("rt")
    val r1 = kv.put("cfg/a", b("one"), 1L)
    val r2 = kv.put("cfg/a", b("two"), 2L)
    assert(r2 > r1)
    val e = kv.get("cfg/a").get
    assert(e.valueUtf8 == "two" && e.revision == r2 && e.op == "PUT")
    assert(kv.get("missing").isEmpty)
    // point-in-time read by revision; a foreign revision is None
    assert(kv.getRevision("cfg/a", r1).get.valueUtf8 == "one")
    kv.put("other", b("x"), 3L)
    assert(kv.getRevision("cfg/a", kv.get("other").get.revision).isEmpty)
  }

  test("create/update are CAS: races lose loudly, never blind-overwrite") {
    val (kv, _) = fresh("cas")
    val r1 = kv.create("k", b("v1"), 1L)
    // create on an existing key: conflict carrying the current revision
    val e1 = intercept[NatsWrongLastSequenceException](
      kv.create("k", b("v1b"), 2L))
    assert(e1.currentSeq == r1)
    // stale update: conflict; fresh update: succeeds
    val r2 = kv.update("k", b("v2"), expectedRev = r1, tsNs = 3L)
    intercept[NatsWrongLastSequenceException](
      kv.update("k", b("v3"), expectedRev = r1, tsNs = 4L))
    assert(kv.get("k").get.valueUtf8 == "v2" && kv.get("k").get.revision == r2)
    // create AFTER delete succeeds (the CAS rides the tombstone's revision)
    kv.delete("k", 5L)
    val r3 = kv.create("k", b("reborn"), 6L)
    assert(kv.get("k").get.valueUtf8 == "reborn" && r3 > r2)
  }

  test("CAS is atomic under contention: exactly one concurrent create wins") {
    val (kv, _) = fresh("race")
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until 8).map { i =>
      new Thread(() =>
        try { kv.create("hot", b(s"w$i"), i.toLong); wins.incrementAndGet(); () }
        catch { case _: NatsWrongLastSequenceException => () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(wins.get() == 1, s"${wins.get()} creates won")
    assert(kv.get("hot").isDefined)
  }

  test("delete: tombstone hides the key but history keeps prior revisions") {
    val (kv, _) = fresh("del")
    kv.put("k", b("v1"), 1L)
    kv.put("k", b("v2"), 2L)
    kv.delete("k", 3L)
    assert(kv.get("k").isEmpty)
    assert(kv.keys() == Seq.empty)
    val h = kv.history("k")
    assert(h.map(_.op) == Seq("PUT", "PUT", "DEL"))
    assert(h.map(_.valueUtf8).take(2) == Seq("v1", "v2"))
  }

  test("purge: marker only — prior revisions are reclaimed") {
    val (kv, t) = fresh("purge")
    kv.put("k", b("v1"), 1L)
    kv.put("k", b("v2"), 2L)
    kv.purge("k", 3L)
    assert(kv.get("k").isEmpty)
    val h = kv.history("k")
    assert(h.map(_.op) == Seq("PURGE"), h.map(_.op).mkString(","))
    assert(t.streamInfo(kv.stream).messages == 1L)
  }

  test("history depth: writes trim to the bucket's history property") {
    val (kv, t) = fresh("hist", history = 3)
    (1 to 7).foreach(i => kv.put("k", b(s"v$i"), i.toLong))
    val h = kv.history("k")
    assert(h.map(_.valueUtf8) == Seq("v5", "v6", "v7"))
    assert(kv.get("k").get.valueUtf8 == "v7")
    assert(t.streamInfo(kv.stream).messages == 3L)
    // unlimited mode keeps everything (no trim RPC per write)
    val (kv0, _) = fresh("hist0", history = 0)
    (1 to 7).foreach(i => kv0.put("k", b(s"v$i"), i.toLong))
    assert(kv0.history("k").size == 7)
  }

  test("keys/entries: sharded live state, markers excluded, dotted keys ok") {
    val (kv, _) = fresh("keys")
    val names = Seq("app.cfg.a", "app.cfg.b", "app/data_1", "z=last")
    names.zipWithIndex.foreach { case (k, i) => kv.put(k, b(s"v$i"), i.toLong) }
    kv.put("doomed", b("x"), 9L)
    kv.delete("doomed", 10L)
    assert(kv.keys().sorted == names.sorted)
    val sharded = (0 until 3).flatMap(s => kv.entries(s, 3).map(_.key))
    assert(sharded.sorted == names.sorted) // disjoint union across shards
    // bad keys refuse at the call, not on the wire
    intercept[IllegalArgumentException](kv.put("", b("x"), 1L))
    intercept[IllegalArgumentException](kv.put(".lead", b("x"), 1L))
    intercept[IllegalArgumentException](kv.put("sp ace", b("x"), 1L))
    intercept[IllegalArgumentException](kv.put("wild.*", b("x"), 1L))
    intercept[IllegalArgumentException](kv.put("a..b", b("x"), 1L))
  }

  test("WIRE e2e: the same facade over real loopback sockets (MiniNatsServer)") {
    val backing = new FakeJetStreamServer()
    val srv = new MiniNatsServer(backing)
    srv.start()
    try {
      val t = Transport.connect(srv.url)
      try {
        val kv = new KvStore(t, "wirekv", maxHistory = 4)
        val r1 = kv.create("cfg", b("one"), 1L)
        // CAS conflict crosses the wire as err_code 10071 → the typed error
        val e = intercept[NatsWrongLastSequenceException](
          kv.create("cfg", b("dup"), 2L))
        assert(e.currentSeq == r1)
        val r2 = kv.update("cfg", b("two"), expectedRev = r1, tsNs = 3L)
        intercept[NatsWrongLastSequenceException](
          kv.update("cfg", b("stale"), expectedRev = r1, tsNs = 4L))
        assert(kv.get("cfg").get.valueUtf8 == "two")
        // markers ride stored headers over the socket (HMSG both paths)
        kv.delete("cfg", 5L)
        assert(kv.get("cfg").isEmpty)
        assert(kv.history("cfg").map(_.op) == Seq("PUT", "PUT", "DEL"))
        // purge + re-create after wire-side reclamation
        kv.purge("cfg", 6L)
        assert(t.streamInfo(kv.stream).messages == 1L)
        val r3 = kv.create("cfg", b("reborn"), 7L)
        assert(r3 > r2 && kv.get("cfg").get.valueUtf8 == "reborn")
      } finally t.close()
    } finally srv.stop()
  }
}
