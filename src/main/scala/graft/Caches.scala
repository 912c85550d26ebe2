package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Session-wide registry of intermediate caches/checkpoints.
  *
  * Long-running sessions (Verify runs 80+ queries back to back; Bench runs
  * them again) would otherwise accumulate storage blocks from every
  * `cache()`/`localCheckpoint()` a query planted, relying on GC-driven
  * ContextCleaner to reclaim them eventually. Operators register their
  * intermediates here and the harness calls `drain()` between queries, so
  * storage is released deterministically once a query's action completes.
  */
object Caches {
  private val cached = new ConcurrentLinkedQueue[Dataset[_]]()
  private val rdds = new ConcurrentLinkedQueue[RDD[_]]()

  /** cache + register for the next `drain()`. */
  def tracked[T](ds: Dataset[T]): Dataset[T] = {
    val c = ds.cache()
    cached.add(c)
    c
  }

  /** eager localCheckpoint + register the backing RDD for the next
    * `drain()` (plain `unpersist()` on a checkpointed Dataset is a no-op:
    * the blocks belong to the materialized RDD, not the CacheManager). */
  def checkpointed[T](ds: Dataset[T]): Dataset[T] = {
    val c = ds.localCheckpoint()
    backingRdd(c).foreach(rdds.add)
    c
  }

  /** LAZY localCheckpoint + register: for iterative loops whose very next
    * action scans every partition anyway (an aggregate, a full collect) —
    * that action doubles as the materializer, so the round runs ONE job
    * instead of checkpoint-job + action-job. UNSAFE when the first action
    * references the plan more than once, or when the upstream blocks are
    * freed before the first action runs (a locally-checkpointed RDD
    * cannot recompute its truncated lineage). */
  def checkpointedLazy[T](ds: Dataset[T]): Dataset[T] = {
    val c = ds.localCheckpoint(false)
    backingRdd(c).foreach(rdds.add)
    c
  }

  /** register an already-localCheckpoint'ed dataset's blocks for the next
    * `drain()` (for checkpoints created outside this object). */
  def registerCheckpointed(ds: Dataset[_]): Unit =
    backingRdd(ds).foreach(rdds.add)

  /** free the backing blocks of a checkpointed dataset NOW — iterative
    * operators release round N−1 as soon as round N has materialized. */
  def free(ds: Dataset[_]): Unit = backingRdd(ds).foreach(safeUnpersist)

  private def backingRdd(ds: Dataset[_]): Option[RDD[_]] =
    ds.queryExecution.analyzed.collectFirst { case lr: LogicalRDD => lr.rdd }

  /** unpersist everything registered since the last drain. This registry is
    * JVM-global while sessions are not: a test JVM runs many suites, each
    * with its own (stopped-at-afterAll) SparkContext, so an entry may
    * outlive its context — unpersisting it then NPEs inside the
    * BlockManagerMaster. Dead entries hold no blocks (the stop released
    * them); skip them instead of failing the *next* suite's drain. */
  def drain(): Unit = {
    var d = cached.poll()
    while (d != null) { safeUnpersistDs(d); d = cached.poll() }
    var r = rdds.poll()
    while (r != null) { safeUnpersist(r); r = rdds.poll() }
  }

  private def safeUnpersist(r: RDD[_]): Unit =
    if (!r.sparkContext.isStopped) {
      try r.unpersist(false)
      catch { case _: NullPointerException | _: IllegalStateException => () }
    }

  private def safeUnpersistDs(d: Dataset[_]): Unit =
    if (!d.sparkSession.sparkContext.isStopped) {
      try d.unpersist(false)
      catch { case _: NullPointerException | _: IllegalStateException => () }
    }
}
