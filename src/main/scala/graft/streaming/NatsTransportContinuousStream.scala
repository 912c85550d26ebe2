package graft.streaming

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.connector.read.streaming.{ContinuousPartitionReader, ContinuousPartitionReaderFactory, ContinuousStream, Offset, PartitionOffset}
import org.apache.spark.unsafe.types.UTF8String

import graft.transport.{TransportAuth, TransportMsg, TransportPool}

/** PUSH-BASED DELIVERY over the transport seam — the reference roadmap's
  * "Push-based delivery — event-driven message consumption"
  * (/root/reference/docs/GUIDE.md:482), expressed Spark-first as a
  * CONTINUOUS-processing stream (`Trigger.Continuous`): one long-running
  * task per shard holds its reader open and emits rows the moment a fetch
  * returns them. Latency is fetch-poll bound (`poll_interval_ms` when caught
  * up, immediate while behind), not micro-batch-trigger bound; epoch markers
  * — not batch planning — commit offsets, so there is no per-batch job
  * launch on the hot path at all.
  *
  * SHARDING is the roadmap's "consumer groups — distributed processing
  * across multiple workers" (GUIDE.md:463) in deterministic form: shard i of
  * n owns exactly the seqs with `seq % n == i`. No rebalance protocol, no
  * server-side group state; per-shard order is per-consumer order (each
  * shard's owned seqs arrive ascending), and the union over shards is the
  * full stream exactly once — the same modulo-distribution argument the
  * durable-consumer batch path documents. Every shard fetches the same
  * batches and drops the (n−1)/n it does not own: for the 1000-executor
  * live tail the bytes-per-shard overhead is bounded by n × stream bytes /
  * n = stream bytes — the classic broadcast-tail trade; set n to the
  * consumer-parallelism you need, not the cluster width.
  *
  * Offsets: per-shard last-DELIVERED seq ([[ShardOffset]]), merged into a
  * [[ShardsOffset]] map by the epoch coordinator. Restart replans each
  * shard from its own floor — an epoch that never committed replays only
  * the shards that were behind, and `seq % n` ownership makes the replay
  * rows identical. With `durable`, each committed epoch acks the MINIMUM
  * floor across shards back to the server (AckAll is cumulative — acking
  * beyond an undelivered shard's floor would mark foreign seqs consumed).
  *
  * DURABLE HANDOFF CONTRACT (pinned in ContinuousSpec): the server ack
  * floor is the CROSS-CHECKPOINT recovery floor only, and it is
  * at-least-once by design. If a job stops before any epoch commit, the
  * floor it leaves is whatever its predecessors acked (0 for a fresh
  * durable) and a fresh-checkpoint successor replays everything after it.
  * Exactly-once belongs to the checkpoint: same-checkpoint restarts resume
  * from per-shard offsets regardless of the floor.
  *
  * Gap seqs (deleted/compacted messages) never arrive in a fetch batch;
  * ownership filtering skips them implicitly — no NOT_FOUND probes on the
  * continuous path either. */
final class NatsTransportContinuousStream(url: String, stream: String,
                                          numShards: Int,
                                          connectTimeoutMs: Long,
                                          auth: TransportAuth =
                                            TransportAuth.anonymous,
                                          durable: Option[String] = None,
                                          pollIntervalMs: Long = 50L,
                                          subjectFilter: Option[String] = None,
                                          deliverGroup: Option[String] = None,
                                          groupMembers: Int = 8,
                                          groupAckWaitMs: Long = 30000L)
    extends ContinuousStream {

  require(numShards >= 1, s"continuous_shards must be >= 1, got $numShards")

  /** QUEUE-GROUP tail (`deliver_group`): the server balances delivery
    * across `group_members` long-running member readers — each message is
    * claimed by exactly one member, so the fleet's total wire volume is
    * O(messages), where `continuous_shards` pays shards × messages (every
    * shard fetches the full log and drops the (n−1)/n it does not own).
    * Delivery state lives on the SERVER (leases + explicit acks): offsets
    * here are per-member delivered counts (monotonic, for Spark's epoch
    * bookkeeping only); a member death redelivers its unacked claims to the
    * survivors after the ack-wait lease — at-least-once on failure, the
    * standard queue-group contract (vs the seq%n path's checkpoint-replay
    * exactly-once). */
  private val grouped = deliverGroup.isDefined

  override def initialOffset(): Offset = {
    if (grouped) return ShardsOffset((0 until groupMembers).map(_ -> 0L).toMap)
    // durable handoff parity with the micro-batch stream: the server's
    // cumulative ack floor seeds every shard when the checkpoint is empty
    val floor = durable match {
      case Some(d) =>
        TransportPool.get(url, connectTimeoutMs, auth).ackFloor(stream, d)
      case None => 0L
    }
    ShardsOffset((0 until numShards).map(_ -> floor).toMap)
  }

  override def deserializeOffset(json: String): Offset =
    ShardsOffset.parse(json)

  override def mergeOffsets(offsets: Array[PartitionOffset]): Offset =
    ShardsOffset(offsets.map { case ShardOffset(s, q) => s -> q }.toMap)

  override def planInputPartitions(start: Offset): Array[InputPartition] = {
    if (grouped)
      // member identity is positional; the SERVER owns the delivery state,
      // so a restart (even with a different member count) resumes exactly
      // where the group's acks left off — no checkpoint-layout coupling
      return (0 until groupMembers).map { m =>
        NatsContinuousGroupPartition(url, stream, deliverGroup.get,
          s"cmember-$m", m, groupAckWaitMs, subjectFilter): InputPartition
      }.toArray
    val seqs = start.asInstanceOf[ShardsOffset].seqs
    // the checkpoint's shard map IS the ownership layout: restarting with a
    // different continuous_shards would strand modulo classes (grown) or
    // double-deliver them (shrunk) — fail loudly, like Kafka's
    // partition-count checks
    require(seqs.keySet == (0 until numShards).toSet,
      s"nats_scan continuous: checkpoint was written with " +
        s"${seqs.size} shard(s) ${seqs.keySet.toSeq.sorted.mkString("[", ",", "]")} " +
        s"but continuous_shards=$numShards — restart with the original " +
        "shard count (or a fresh checkpoint to re-shard)")
    seqs.toSeq.sortBy(_._1).map {
      case (shard, afterSeq) =>
        NatsContinuousPartition(url, stream, shard, numShards,
          afterSeq): InputPartition
    }.toArray
  }

  override def createContinuousReaderFactory(): ContinuousPartitionReaderFactory =
    new NatsContinuousReaderFactory(connectTimeoutMs, auth, pollIntervalMs,
      subjectFilter)

  override def commit(end: Offset): Unit = {
    if (grouped) return // group progress is the server's ack state
    durable.foreach { d =>
      val floors = end.asInstanceOf[ShardsOffset].seqs.values
      if (floors.nonEmpty)
        TransportPool.get(url, connectTimeoutMs, auth)
          .ackAll(stream, d, floors.min)
    }
  }

  override def stop(): Unit = ()
}

/** per-shard continuous offset: last seq DELIVERED by `shard` */
final case class ShardOffset(shard: Int, seq: Long) extends PartitionOffset

/** merged checkpoint offset: shard → last delivered seq */
final case class ShardsOffset(seqs: Map[Int, Long]) extends Offset {
  override def json(): String =
    seqs.toSeq.sortBy(_._1).map { case (s, q) => s"$s:$q" }.mkString(",")
}

object ShardsOffset {
  def parse(json: String): ShardsOffset =
    ShardsOffset(json.trim.split(",").iterator.filter(_.nonEmpty).map { part =>
      val Array(s, q) = part.split(":")
      s.trim.toInt -> q.trim.toLong
    }.toMap)
}

final case class NatsContinuousPartition(url: String, stream: String,
                                         shard: Int, numShards: Int,
                                         afterSeq: Long) extends InputPartition

/** one queue-group member of a `deliver_group` continuous tail */
final case class NatsContinuousGroupPartition(url: String, stream: String,
                                              group: String, member: String,
                                              memberIdx: Int, ackWaitMs: Long,
                                              filter: Option[String])
    extends InputPartition

final class NatsContinuousReaderFactory(connectTimeoutMs: Long,
                                        auth: TransportAuth,
                                        pollIntervalMs: Long,
                                        subjectFilter: Option[String] = None)
    extends ContinuousPartitionReaderFactory {
  override def createReader(p: InputPartition): ContinuousPartitionReader[InternalRow] =
    p match {
      case g: NatsContinuousGroupPartition =>
        new NatsContinuousGroupReader(g, connectTimeoutMs, auth, pollIntervalMs)
      case _ =>
        new NatsContinuousReader(p.asInstanceOf[NatsContinuousPartition],
          connectTimeoutMs, auth, pollIntervalMs, subjectFilter)
    }
}

/** One group member's endless tail: claims batches from the server-balanced
  * group consumer, emits them, and ACKS each batch when it pulls the next
  * (cursor-style AckNext — at most one in-flight batch per member; a member
  * death redelivers exactly that batch to the survivors after its lease).
  * The subject filter is the GROUP consumer's filter_subject, applied
  * server-side before delivery — unlike the seq%n reader there is nothing
  * to drop client-side, so wire volume is O(matching messages) fleet-wide. */
final class NatsContinuousGroupReader(p: NatsContinuousGroupPartition,
                                      connectTimeoutMs: Long,
                                      auth: TransportAuth,
                                      pollIntervalMs: Long)
    extends ContinuousPartitionReader[InternalRow] {

  private val BatchSize = 2048

  private val transport = TransportPool.get(p.url, connectTimeoutMs, auth)

  private var delivered = 0L
  private var batch: Array[TransportMsg] = Array.empty
  private var i = 0
  private var current: InternalRow = _

  private def withRetry[T](f: => T): T =
    graft.transport.TransportRetry.withRetry(f)

  override def next(): Boolean = {
    while (true) {
      if (i < batch.length) {
        val m = batch(i)
        i += 1
        delivered += 1L
        current = toRow(m)
        return true
      }
      if (batch.nonEmpty) {
        withRetry(transport.groupAck(p.stream, p.group, batch.map(_.seq)))
        batch = Array.empty
      }
      val claimed = withRetry(transport.groupNext(p.stream, p.group,
        p.member, Long.MaxValue, BatchSize, p.ackWaitMs, p.filter))
      if (claimed.isEmpty) Thread.sleep(pollIntervalMs) // caught up — poll
      else { batch = claimed; i = 0 }
    }
    false
  }

  private def toRow(m: TransportMsg): InternalRow =
    InternalRow(
      UTF8String.fromString(p.stream),
      if (m.subject == null) null else UTF8String.fromString(m.subject),
      m.seq,
      Math.floorDiv(m.tsNs, 1000L),
      m.payload)

  override def get(): InternalRow = current
  override def getOffset: PartitionOffset = ShardOffset(p.memberIdx, delivered)
  override def close(): Unit = () // pooled transport outlives the reader
}

/** One shard's endless tail. `next()` blocks (poll + sleep) until an owned
  * message exists — continuous-mode tasks are long-running by design, and
  * `Thread.sleep` keeps the wait interruptible so `query.stop()` cancels
  * the task promptly. The fetch loop is the batch reader's shape (2048/RPC,
  * transient-fault retry via re-asking the same range) on the POOLED
  * per-JVM connection. */
final class NatsContinuousReader(p: NatsContinuousPartition,
                                 connectTimeoutMs: Long,
                                 auth: TransportAuth,
                                 pollIntervalMs: Long,
                                 subjectFilter: Option[String] = None)
    extends ContinuousPartitionReader[InternalRow] {

  // wildcard tail: non-matching owned messages are dropped here; the shard
  // offset still advances through them at the NEXT delivered row (offsets
  // are read per emitted row), so a restart re-filters at most the
  // unmatched tail — never re-delivers
  private val wildcard = subjectFilter.map(graft.transport.SubjectFilter.matcher)

  private val BatchSize = 2048

  private val transport = TransportPool.get(p.url, connectTimeoutMs, auth)

  /** last seq this shard DELIVERED (the offset axis) */
  private var lastDelivered = p.afterSeq
  /** next seq (global axis) to ask the server for */
  private var fetchFrom = p.afterSeq + 1
  private var batch: Array[TransportMsg] = Array.empty
  private var i = 0
  private var current: InternalRow = _

  private def withRetry[T](f: => T): T =
    graft.transport.TransportRetry.withRetry(f)

  /** last LastSeq observed from the server — re-polled only once the fetch
    * cursor catches up to it, so DRAINING a backlog costs ~1 RPC per 2048
    * messages (the batch reader's shape) instead of a streamInfo before
    * every fetch; when caught up, the tail degenerates to the poll loop. */
  private var knownLast = 0L

  override def next(): Boolean = {
    while (true) {
      while (i < batch.length) {
        val m = batch(i)
        i += 1
        if (m.seq % p.numShards == p.shard.toLong &&
            wildcard.forall(_.matches(m.subject))) {
          lastDelivered = m.seq
          current = toRow(m)
          return true
        }
      }
      if (fetchFrom > knownLast)
        knownLast = withRetry(transport.streamInfo(p.stream)).lastSeq
      if (fetchFrom > knownLast) {
        Thread.sleep(pollIntervalMs) // caught up — poll-bound wait
      } else {
        batch = withRetry(
          transport.fetch(p.stream, fetchFrom, knownLast, BatchSize))
        i = 0
        // an empty batch means the rest of [fetchFrom, knownLast] is gaps
        fetchFrom = if (batch.isEmpty) knownLast + 1 else batch.last.seq + 1
      }
    }
    false
  }

  private def toRow(m: TransportMsg): InternalRow =
    InternalRow(
      UTF8String.fromString(p.stream),
      if (m.subject == null) null else UTF8String.fromString(m.subject),
      m.seq,
      Math.floorDiv(m.tsNs, 1000L), // ns → µs truncation (envelope semantics)
      m.payload)

  override def get(): InternalRow = current
  override def getOffset: PartitionOffset = ShardOffset(p.shard, lastDelivered)
  override def close(): Unit = () // pooled transport outlives the reader
}
