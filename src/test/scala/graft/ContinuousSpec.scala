package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.transport.FakeJetStream

/** Push-based delivery (reference roadmap GUIDE.md:482) via Spark
  * continuous processing: sharded long-running tail readers over the
  * transport seam. Covers live delivery of rows published AFTER the query
  * started (the event-driven property micro-batches approximate), modulo
  * sharding exactly-once-per-union, and the store-mode rejection. */
class ContinuousSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def eventually(timeoutMs: Long = 60000L)(cond: => Boolean): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (System.nanoTime() < deadline) {
      if (cond) return true
      Thread.sleep(100L)
    }
    cond
  }

  test("continuous tail: pre-existing AND post-start messages arrive, " +
    "each exactly once across 2 shards") {
    val url = "nats://continuous-spec:4222"
    val s = FakeJetStream.listen(url)
    (1L to 30L).foreach { seq =>
      s.publish("cont", seq, s"cont.dev${seq % 3}",
        1700000000000000000L + seq * 1000000000L, s"""{"v":$seq}""".getBytes)
    }
    // a gap: deleted messages must be skipped silently, like the batch path
    s.deleteMsg("cont", 7L)

    val q = spark.readStream.format("nats_scan")
      .option("url", url).option("stream", "cont")
      .option("continuous_shards", "2")
      .load()
      .selectExpr("seq", "subject")
      .writeStream.format("memory").queryName("cont_tail")
      .trigger(Trigger.Continuous("200 milliseconds"))
      .start()
    try {
      assert(eventually() {
        spark.sql("SELECT count(DISTINCT seq) FROM cont_tail")
          .head().getLong(0) == 29L
      }, "pre-existing messages (30 minus 1 gap) never all arrived")

      // PUSH property: rows published while the query runs appear without
      // any new batch being planned
      (31L to 40L).foreach { seq =>
        s.publish("cont", seq, s"cont.dev${seq % 3}",
          1700000000000000000L + seq * 1000000000L, s"""{"v":$seq}""".getBytes)
      }
      assert(eventually() {
        spark.sql("SELECT count(DISTINCT seq) FROM cont_tail")
          .head().getLong(0) == 39L
      }, "post-start messages never arrived")

      // exactly once across the shard union: no seq delivered twice, and
      // the shards partition the seq space by modulo
      val rows = spark.sql("SELECT seq FROM cont_tail").collect().map(_.getLong(0))
      assert(rows.length == rows.distinct.length,
        s"duplicate delivery: ${rows.groupBy(identity).filter(_._2.length > 1).keys.toSeq.sorted}")
      assert(rows.sorted.sameElements((1L to 40L).filter(_ != 7L)),
        "delivered seq set differs from the published (minus gaps) set")
    } finally q.stop()
  }

  test("continuous queue-group tail: members split delivery, pre-existing " +
    "and live rows each exactly once, O(msgs) wire volume") {
    val url = "nats://continuous-group:4222"
    val s = FakeJetStream.listen(url)
    (1L to 30L).foreach { seq =>
      s.publish("cg", seq, s"cg.dev${seq % 3}",
        1700000000000000000L + seq * 1000000000L, s"""{"v":$seq}""".getBytes)
    }
    s.deleteMsg("cg", 7L)
    val rpcBefore = s.rpcCountTotal
    val q = spark.readStream.format("nats_scan")
      .option("url", url).option("stream", "cg")
      .option("deliver_group", "cgrp")
      .option("group_members", "2")
      .load()
      .selectExpr("seq", "subject")
      .writeStream.format("memory").queryName("cg_tail")
      .trigger(Trigger.Continuous("200 milliseconds"))
      .start()
    try {
      assert(eventually() {
        spark.sql("SELECT count(DISTINCT seq) FROM cg_tail")
          .head().getLong(0) == 29L
      }, "pre-existing messages never all arrived through the group")
      // push property: live publishes arrive with no new batch planned
      (31L to 40L).foreach { seq =>
        s.publish("cg", seq, s"cg.dev${seq % 3}",
          1700000000000000000L + seq * 1000000000L, s"""{"v":$seq}""".getBytes)
      }
      assert(eventually() {
        spark.sql("SELECT count(DISTINCT seq) FROM cg_tail")
          .head().getLong(0) == 39L
      }, "post-start messages never arrived through the group")
      // exactly once across the MEMBER union — the server balanced, never
      // duplicated (vs continuous_shards, where each shard fetches all and
      // drops; here each message crosses the wire once, fleet-wide)
      val rows = spark.sql("SELECT seq FROM cg_tail").collect().map(_.getLong(0))
      assert(rows.length == rows.distinct.length,
        s"duplicate delivery: ${rows.groupBy(identity).filter(_._2.length > 1).keys.toSeq.sorted}")
      assert(rows.sorted.sameElements((1L to 40L).filter(_ != 7L)))
      // wire volume: claim RPCs carrying data are O(msgs/batch); the rest
      // of the delta is the empty poll loop (bounded by runtime/interval),
      // NEVER members × messages — with 39 messages any per-message-
      // per-member delivery would show hundreds of extra data RPCs
      val delta = s.rpcCountTotal - rpcBefore
      assert(delta < 400L, s"group tail cost $delta RPCs (poll-bound expected)")
    } finally q.stop()
  }

  test("continuous queue-group restart: resumes at the server's ack " +
    "frontier, even with a DIFFERENT member count") {
    val url = "nats://continuous-group-restart:4222"
    val s = FakeJetStream.listen(url)
    (1L to 20L).foreach { seq =>
      s.publish("cgr", seq, "cgr.x",
        1700000000000000000L + seq * 1000000000L, Array[Byte](seq.toByte))
    }
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-cgrp-ckpt").toString
    def start(members: Int) = spark.readStream.format("nats_scan")
      .option("url", url).option("stream", "cgr")
      .option("deliver_group", "cgrp_restart")
      .option("group_members", members.toString)
      .load()
      .selectExpr("seq")
      .writeStream
      .foreach(new org.apache.spark.sql.ForeachWriter[org.apache.spark.sql.Row] {
        override def open(partitionId: Long, epochId: Long): Boolean = true
        override def process(r: org.apache.spark.sql.Row): Unit =
          ContinuousSpec.groupCollected.add(r.getLong(0))
        override def close(errorOrNull: Throwable): Unit = ()
      })
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.Continuous("200 milliseconds"))
      .start()

    ContinuousSpec.groupCollected.clear()
    val q1 = start(members = 2)
    try {
      assert(eventually() { ContinuousSpec.groupCollected.size() == 20 },
        "run 1 never delivered the initial 20 through the group")
      // idle readers ack their final batch BEFORE entering the poll wait,
      // so a quiet stream leaves nothing pending — give the ack a moment
      assert(eventually(5000L) {
        graft.transport.Transport.connect(url)
          .groupPending("cgr", "cgrp_restart") == 0L
      }, "final batch never acked while idle")
    } finally q1.stop()

    ContinuousSpec.groupCollected.clear()
    (21L to 25L).foreach { seq =>
      s.publish("cgr", seq, "cgr.x",
        1700000000000000000L + seq * 1000000000L, Array[Byte](seq.toByte))
    }
    // restart with THREE members: the group's server-side cursor is the
    // resume point — unlike seq%n sharding there is no checkpoint-layout
    // coupling, so changing the member count is legal
    val q2 = start(members = 3)
    try {
      assert(eventually() {
        (21L to 25L).forall(ContinuousSpec.groupCollected.contains)
      }, s"restart lost post-stop messages: got ${ContinuousSpec.groupCollected}")
      // no replay of the acked prefix: the drained 1..20 must not reappear
      assert(!ContinuousSpec.groupCollected.contains(1L) &&
        !ContinuousSpec.groupCollected.contains(10L),
        s"restart replayed acked messages: ${ContinuousSpec.groupCollected}")
    } finally q2.stop()
  }

  test("continuous tail: checkpoint restart resumes from committed shard " +
    "offsets, losing nothing") {
    val url = "nats://continuous-restart:4222"
    val s = FakeJetStream.listen(url)
    (1L to 20L).foreach { seq =>
      s.publish("cr", seq, "cr.x",
        1700000000000000000L + seq * 1000000000L, Array[Byte](seq.toByte))
    }
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-cont-ckpt").toString
    // foreach sink: the recovery-capable continuous-compatible sink (the
    // native store sink requires seq distribution+ordering, which Spark
    // rejects in continuous execution by design; memory refuses recovery)
    def start() = spark.readStream.format("nats_scan")
      .option("url", url).option("stream", "cr")
      .option("continuous_shards", "2")
      .load()
      .selectExpr("seq")
      .writeStream
      .foreach(new org.apache.spark.sql.ForeachWriter[org.apache.spark.sql.Row] {
        override def open(partitionId: Long, epochId: Long): Boolean = true
        override def process(r: org.apache.spark.sql.Row): Unit =
          ContinuousSpec.collected.add(r.getLong(0))
        override def close(errorOrNull: Throwable): Unit = ()
      })
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.Continuous("200 milliseconds"))
      .start()

    val q1 = start()
    try {
      assert(eventually() { ContinuousSpec.collected.size() == 20 },
        "run 1 never delivered the initial 20")
      Thread.sleep(600L) // let the final epoch commit before the stop
    } finally q1.stop()

    ContinuousSpec.collected.clear()
    (21L to 25L).foreach { seq =>
      s.publish("cr", seq, "cr.x",
        1700000000000000000L + seq * 1000000000L, Array[Byte](seq.toByte))
    }
    val q2 = start()
    try {
      assert(eventually() {
        (21L to 25L).forall(ContinuousSpec.collected.contains)
      }, s"restart lost post-stop messages: got ${ContinuousSpec.collected}")
      // resume floor: run 2 must NOT replay the whole stream from seq 1 —
      // the checkpointed shard offsets bound the replay to (at most) the
      // final uncommitted epoch's suffix
      assert(!ContinuousSpec.collected.contains(1L) ||
        !ContinuousSpec.collected.contains(2L),
        s"restart replayed from the beginning: ${ContinuousSpec.collected}")
    } finally q2.stop()
  }

  test("continuous durable: committed epochs ack the min shard floor; a " +
    "fresh-checkpoint successor resumes after it") {
    val url = "nats://continuous-durable:4222"
    val s = FakeJetStream.listen(url)
    (1L to 30L).foreach { seq =>
      s.publish("cd", seq, "cd.x",
        1700000000000000000L + seq * 1000000000L, Array[Byte](seq.toByte))
    }
    def job() = spark.readStream.format("nats_scan")
      .option("url", url).option("stream", "cd")
      .option("continuous_shards", "2").option("durable", "grp")
      .load()
      .selectExpr("seq")
      .writeStream
      .foreach(new org.apache.spark.sql.ForeachWriter[org.apache.spark.sql.Row] {
        override def open(partitionId: Long, epochId: Long): Boolean = true
        override def process(r: org.apache.spark.sql.Row): Unit =
          ContinuousSpec.collected.add(r.getLong(0))
        override def close(errorOrNull: Throwable): Unit = ()
      })
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-cont-durable").toString)
      .trigger(Trigger.Continuous("200 milliseconds"))
      .start()

    ContinuousSpec.collected.clear()
    val t = graft.transport.Transport.connect(url)
    val q1 = job()
    try {
      assert(eventually() { ContinuousSpec.collected.size() == 30 })
      // poll the SERVER's ack floor while the query is still running — an
      // epoch commit is asynchronous wrt row delivery, and a fixed sleep
      // races the coordinator on a loaded box (round-12 driver failure)
      assert(eventually() { t.ackFloor("cd", "grp") > 0L },
        "no epoch committed an ack floor while the query was running")
    } finally q1.stop()

    val floor = t.ackFloor("cd", "grp")
    assert(floor > 0L && floor <= 30L,
      s"expected a server-side ack floor after committed epochs, got $floor")

    // successor job: FRESH checkpoint, same durable — only the server's ack
    // state is shared; initialOffset seeds every shard from the floor
    ContinuousSpec.collected.clear()
    (31L to 35L).foreach { seq =>
      s.publish("cd", seq, "cd.x",
        1700000000000000000L + seq * 1000000000L, Array[Byte](seq.toByte))
    }
    val q2 = job()
    try {
      assert(eventually() {
        (31L to 35L).forall(ContinuousSpec.collected.contains)
      }, s"successor missed post-handoff messages: ${ContinuousSpec.collected}")
      assert((1L to floor).forall(q => !ContinuousSpec.collected.contains(q)),
        s"successor replayed below the ack floor $floor: ${ContinuousSpec.collected}")
    } finally q2.stop()
    assert(t.ackFloor("cd", "grp") >= floor, "ack floor regressed")
    t.close()
  }

  test("continuous durable: ZERO committed epochs → fresh-checkpoint " +
    "successor replays from the beginning (at-least-once handoff, pinned)") {
    // Semantics decision (round-13): if a durable continuous job dies before
    // ANY epoch commit, the server ack floor is still 0 and a successor with
    // a FRESH checkpoint replays the whole stream. That is the intended
    // at-least-once contract of the durable handoff — the exactly-once path
    // is the CHECKPOINT (per-shard offsets), which survives crashes even
    // with zero commits; the durable floor is only the cross-checkpoint
    // recovery floor and can, by design, lag delivery arbitrarily.
    val url = "nats://continuous-durable-zero:4222"
    val s = FakeJetStream.listen(url)
    (1L to 12L).foreach { seq =>
      s.publish("cz", seq, "cz.x",
        1700000000000000000L + seq * 1000000000L, Array[Byte](seq.toByte))
    }
    val t = graft.transport.Transport.connect(url)
    // predecessor "stopped before any commit" ≡ the durable has no ack
    // state at all — the floor a zero-commit job leaves behind is exactly 0
    assert(t.ackFloor("cz", "grp0") == 0L,
      "a never-committed durable must have floor 0")

    // unit pin: initialOffset with floor 0 seeds EVERY shard at 0
    val stream0 = new graft.streaming.NatsTransportContinuousStream(
      url, "cz", numShards = 3, connectTimeoutMs = 5000L,
      durable = Some("grp0"))
    val seeded = stream0.initialOffset()
      .asInstanceOf[graft.streaming.ShardsOffset].seqs
    assert(seeded == Map(0 -> 0L, 1 -> 0L, 2 -> 0L),
      s"zero-commit handoff must seed all shards at 0, got $seeded")

    // end-to-end pin: the successor job replays EVERYTHING (at-least-once)
    ContinuousSpec.collected.clear()
    val q = spark.readStream.format("nats_scan")
      .option("url", url).option("stream", "cz")
      .option("continuous_shards", "2").option("durable", "grp0")
      .load()
      .selectExpr("seq")
      .writeStream
      .foreach(new org.apache.spark.sql.ForeachWriter[org.apache.spark.sql.Row] {
        override def open(partitionId: Long, epochId: Long): Boolean = true
        override def process(r: org.apache.spark.sql.Row): Unit =
          ContinuousSpec.collected.add(r.getLong(0))
        override def close(errorOrNull: Throwable): Unit = ()
      })
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-cont-zero").toString)
      .trigger(Trigger.Continuous("200 milliseconds"))
      .start()
    try {
      assert(eventually() {
        (1L to 12L).forall(ContinuousSpec.collected.contains)
      }, s"zero-commit successor must replay from seq 1: ${ContinuousSpec.collected}")
    } finally q.stop()
    t.close()
  }

  test("continuous tail honors subject_filter: only matching rows, live too") {
    val url = "nats://continuous-wild-spec:4222"
    val s = FakeJetStream.listen(url)
    (1L to 30L).foreach { seq =>
      s.publish("cw", seq, s"cw.dev${seq % 3}",
        1700000000000000000L + seq * 1000000000L, s"""{"v":$seq}""".getBytes)
    }
    val q = spark.readStream.format("nats_scan")
      .option("url", url).option("stream", "cw")
      .option("continuous_shards", "2")
      .option("subject_filter", "cw.dev1")
      .load()
      .selectExpr("seq", "subject")
      .writeStream.format("memory").queryName("cw_tail")
      .trigger(Trigger.Continuous("200 milliseconds"))
      .start()
    try {
      // dev1 = seqs ≡ 1 (mod 3) → 10 of the first 30
      assert(eventually() {
        spark.sql("SELECT count(DISTINCT seq) FROM cw_tail")
          .head().getLong(0) == 10L
      }, "filtered pre-existing rows never all arrived")
      (31L to 36L).foreach { seq =>
        s.publish("cw", seq, s"cw.dev${seq % 3}",
          1700000000000000000L + seq * 1000000000L, s"""{"v":$seq}""".getBytes)
      }
      assert(eventually() {
        spark.sql("SELECT count(DISTINCT seq) FROM cw_tail")
          .head().getLong(0) == 12L
      }, "filtered post-start rows never arrived")
      val rows = spark.sql("SELECT seq, subject FROM cw_tail").collect()
      assert(rows.forall(_.getString(1) == "cw.dev1"))
      assert(rows.map(_.getLong(0)).sorted.sameElements((1L to 36L).filter(_ % 3 == 1)))
    } finally q.stop()
  }

  test("micro-batch tail honors subject_filter") {
    val url = "nats://microbatch-wild-spec:4222"
    val s = FakeJetStream.listen(url)
    (1L to 40L).foreach { seq =>
      s.publish("mw", seq, s"mw.dev${seq % 4}",
        1700000000000000000L + seq * 1000000000L, s"""{"v":$seq}""".getBytes)
    }
    val q = spark.readStream.format("nats_scan")
      .option("url", url).option("stream", "mw")
      .option("slice_width", "8")
      .option("subject_filter", "mw.dev2")
      .load()
      .selectExpr("seq", "subject")
      .writeStream.format("memory").queryName("mw_tail")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000L)
    val rows = spark.table("mw_tail").collect()
    assert(rows.forall(_.getString(1) == "mw.dev2"))
    assert(rows.map(_.getLong(0)).sorted.sameElements((2L to 40L by 4L)))
  }

  test("changing continuous_shards across a checkpoint restart fails loudly") {
    val url = "nats://continuous-reshard-spec:4222"
    val s = FakeJetStream.listen(url)
    (1L to 20L).foreach(seq =>
      s.publish("rs", seq, s"rs.${seq % 2}", seq * 1000L, "x".getBytes))
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_reshard_ckpt").toString
    ContinuousSpec.collected.clear()
    def run(shards: Int) = spark.readStream.format("nats_scan")
      .option("url", url).option("stream", "rs")
      .option("continuous_shards", shards.toString)
      .load().selectExpr("seq")
      .writeStream
      .foreach(new org.apache.spark.sql.ForeachWriter[org.apache.spark.sql.Row] {
        override def open(partitionId: Long, epochId: Long): Boolean = true
        override def process(r: org.apache.spark.sql.Row): Unit =
          ContinuousSpec.collected.add(r.getLong(0))
        override def close(errorOrNull: Throwable): Unit = ()
      })
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.Continuous("200 milliseconds"))
      .start()
    val q1 = run(2)
    assert(eventually() { ContinuousSpec.collected.size() == 20 })
    Thread.sleep(600L) // let an epoch commit land in the checkpoint
    q1.stop()
    // same checkpoint, different shard count: must refuse (grown shards
    // would strand modulo classes; shrunk ones double-deliver)
    val q2 = run(4)
    val failed = eventually() { !q2.isActive }
    assert(failed, "restart with a different shard count should fail")
    val msg = Option(q2.exception.map(_.getMessage).orNull).getOrElse("") +
      q2.exception.map(e => Option(e.getCause)
        .map(_.getMessage).getOrElse("")).getOrElse("")
    assert(msg.contains("continuous_shards") || msg.contains("shard"),
      s"unexpected failure: $msg")
  }

  test("micro-batch rejects deliver_group with a pointed error") {
    val url = "nats://mb-group-reject:4222"
    FakeJetStream.listen(url).publish("mg", 1L, "mg.x", 1L, Array[Byte](1))
    val q = spark.readStream.format("nats_scan")
      .option("url", url).option("stream", "mg")
      .option("deliver_group", "g")
      .load().selectExpr("seq")
      .writeStream.format("memory").queryName("mb_grp_reject")
    val e = intercept[Exception](q.start().processAllAvailable())
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(e).contains("use Trigger.Continuous"), chain(e))
  }

  test("continuous rejects last_by_subject like the micro-batch path") {
    val url = "nats://continuous-kv-reject:4222"
    FakeJetStream.listen(url).publish("kvr", 1L, "a.b", 1L, "x".getBytes)
    val e = intercept[Exception] {
      spark.readStream.format("nats_scan")
        .option("url", url).option("stream", "kvr")
        .option("last_by_subject", "true")
        .load().writeStream.format("memory").queryName("kvr_tail")
        .trigger(Trigger.Continuous("200 milliseconds"))
        .start()
      val q = spark.streams.active.find(_.name == "kvr_tail").get
      q.awaitTermination(30000L); q.stop()
      throw new IllegalStateException("query should not have started")
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(e).contains("point-in-time snapshot"), chain(e))
  }

  test("store mode rejects continuous with a pointed error") {
    val e = intercept[Exception] {
      val q = spark.readStream.format("nats_scan")
        .option("dir", "/root/testdata/sf0.001")
        .load()
        .selectExpr("seq")
        .writeStream.format("memory").queryName("cont_store")
        .trigger(Trigger.Continuous("1 second"))
        .start()
      try q.awaitTermination(30000) finally q.stop()
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(e).contains("continuous (push-based) mode requires transport mode"))
  }
}

object ContinuousSpec {
  /** cross-task sink for the restart test (local mode: one JVM) */
  val collected: java.util.Set[java.lang.Long] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.lang.Long]()
  /** separate sink for the GROUP restart test — a straggler writer task
    * from one stopped query must never pollute another test's collector */
  val groupCollected: java.util.Set[java.lang.Long] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.lang.Long]()
}
