package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Shared commit protocol for the persisted indexes ([[DedupIndex]],
  * [[VectorIndex]]) — the pieces that make multi-session maintenance safe
  * on a plain filesystem, with no external coordinator:
  *
  *  - COMMIT LOCK: `fs.create(lock, overwrite = false)` is atomic
  *    create-if-absent on HDFS and the local fs — the standard
  *    commit-lock primitive. Round 14's optimistic CAS was
  *    check-then-rename: a millisecond TOCTOU window between the pointer
  *    re-read and the rename swap still admitted the lost-update it was
  *    built to kill (two writers both pass the check; the second installs
  *    a generation built from stale data and a committed remove() — a
  *    deletion request — silently un-happens). The lock closes the
  *    window: re-read, staging install, and pointer swap all execute
  *    under mutual exclusion. Commits are milliseconds, so contention is
  *    a bounded sub-second wait; a crashed holder's lock self-expires
  *    after [[DefaultStaleMs]] (the flip it guarded either completed —
  *    pointer present — or left [[DedupIndex]]/[[VectorIndex]]'s
  *    crash-state evidence for `requireUnambiguous`).
  *
  *  - APPEND INTENT/MARKER protocol: appends never touch the pointer, so
  *    the lock alone cannot stop a rewrite from committing a snapshot
  *    that misses rows an append committed mid-rewrite (the appended rows
  *    would sit only in the superseded generation and be silently lost at
  *    expiry). Every append (1) drops a unique INTENT file before writing
  *    any data, (2) writes its rows, (3) drops a COMMIT MARKER only after
  *    the data is durably committed, (4) removes the intent. A rewrite
  *    lists markers BEFORE its snapshot read and, inside the lock,
  *    refuses to flip while any intent is live or any NEW marker appeared
  *    — so an append's rows are either provably in the rewrite's snapshot
  *    (its marker predates the snapshot listing) or the rewrite aborts
  *    loudly. Markers observed at snapshot time are baked into the new
  *    generation and cleared after the flip; a crashed appender's intent
  *    self-expires after [[DefaultStaleMs]] (its data either committed
  *    before the crash — visible to any later snapshot — or never left
  *    Spark's job-staging dirs).
  *
  *  - MAINTENANCE-DUE signal: the streaming gates' `deferMaintenance`
  *    mode records "compaction due" as a flag file instead of running the
  *    rewrite inside the micro-batch (at 100 TB a compaction pause rides
  *    the trigger interval); an out-of-band maintainer polls
  *    [[maintenanceDue]] and runs `compact` — which is CAS+lock-guarded,
  *    so it is safe from any session — and a successful flip clears the
  *    flag.
  *
  * Durability note: `rename` and create-if-absent are atomic on HDFS and
  * POSIX filesystems; on object stores without atomic rename (raw S3A)
  * the indexes need the store's committer layer, same as every
  * rename-committed Spark table format. */
object IndexCommit {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** age after which a crashed writer's lock / intent / staging dir is
    * presumed dead and reclaimed (commits are milliseconds, appends
    * seconds-to-minutes; 15 min is conservative for both) */
  val DefaultStaleMs: Long = 15 * 60 * 1000L

  private val LockName = "_commit_lock"
  private val IntentPrefix = "_append_intent_"
  private val MarkerPrefix = "_append_commit_"
  private val MaintenanceDueName = "_maintenance_due"

  /** test seam: runs INSIDE the commit lock, after acquisition and before
    * the guarded body — the exact window round 14's check-then-rename CAS
    * left open. A spec interleaves a full racing writer here
    * DETERMINISTICALLY and asserts the racer fails to acquire. No-op in
    * production. */
  private[graft] var testInsideLock: () => Unit = () => ()

  /** test seam: a GC delete that returns true here is simulated as failed
    * (local-fs tests run as root, where a genuinely undeletable dir is
    * hard to stage) — drives the expireGenerations failure-surfacing spec */
  private[graft] var testFailDelete: String => Boolean = _ => false

  /** 8-hex-char attempt nonce for unique staging dirs / append tokens */
  def nonce(): String =
    java.util.UUID.randomUUID().toString.takeWhile(_ != '-')

  /** run `body` under the index's commit lock; always releases */
  def withCommitLock[T](fs: FileSystem, indexDir: String, what: String,
                        staleMs: Long = DefaultStaleMs)(body: => T): T = {
    val lock = new Path(s"$indexDir/$LockName")
    acquire(fs, lock, what, staleMs)
    try { testInsideLock(); body }
    finally {
      try { fs.delete(lock, false); () } catch { case _: Exception => () }
    }
  }

  private def tryCreate(fs: FileSystem, lock: Path, what: String): Boolean =
    try {
      val out = fs.create(lock, false) // atomic create-if-absent
      try out.write(
        s"$what ts=${System.currentTimeMillis()}".getBytes("UTF-8"))
      finally out.close()
      true
    } catch { case _: java.io.IOException => false }

  private def acquire(fs: FileSystem, lock: Path, what: String,
                      staleMs: Long): Unit = {
    var attempt = 0
    while (attempt < 25) { // ~1 s total — a flip is milliseconds
      if (tryCreate(fs, lock, what)) return
      val stale =
        try System.currentTimeMillis() -
          fs.getFileStatus(lock).getModificationTime > staleMs
        catch { case _: java.io.FileNotFoundException => false } // released
      if (stale) {
        log.warn(s"breaking stale commit lock $lock (holder presumed dead)")
        try { fs.delete(lock, false); () } catch { case _: Exception => () }
      } else Thread.sleep(40)
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"commit lock $lock held by another writer (a pointer flip is " +
        "milliseconds; waited ~1 s) — concurrent maintenance on this " +
        "index; re-run after it finishes. A crashed holder's lock " +
        s"self-expires after $staleMs ms.")
  }

  /** append phase 1: declare intent BEFORE any data write — rewrites
    * refuse to flip while intents are live */
  def beginAppend(fs: FileSystem, indexDir: String): String = {
    val token = nonce()
    val out = fs.create(new Path(s"$indexDir/$IntentPrefix$token"), false)
    try out.write(s"ts=${System.currentTimeMillis()}".getBytes("UTF-8"))
    finally out.close()
    token
  }

  /** append phase 2, success: the MARKER lands first (the durable "my
    * rows are committed in the live generation" receipt a rewrite's
    * marker-diff must observe), then the intent drops — a crash between
    * the two leaves both files, which is safe (rewrites still abort) */
  def finishAppend(fs: FileSystem, indexDir: String, token: String): Unit = {
    fs.create(new Path(s"$indexDir/$MarkerPrefix$token"), true).close()
    fs.delete(new Path(s"$indexDir/$IntentPrefix$token"), false)
    ()
  }

  /** append failure path: nothing durable landed (or the append failed
    * LOUDLY with documented recovery) — drop the intent, leave no marker */
  def abortAppend(fs: FileSystem, indexDir: String, token: String): Unit = {
    try { fs.delete(new Path(s"$indexDir/$IntentPrefix$token"), false); () }
    catch { case _: Exception => () }
  }

  /** live append intents (reaping any older than `staleMs` — a crashed
    * appender must not wedge maintenance forever; its data either
    * committed pre-crash and is visible to any later snapshot, or never
    * left Spark's job staging) */
  def liveIntents(fs: FileSystem, indexDir: String,
                  staleMs: Long = DefaultStaleMs): Seq[String] = {
    val root = new Path(indexDir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith(IntentPrefix))
      .flatMap { s =>
        if (System.currentTimeMillis() - s.getModificationTime > staleMs) {
          log.warn(s"reaping stale append intent ${s.getPath} " +
            "(appender presumed dead)")
          try { fs.delete(s.getPath, false); () }
          catch { case _: Exception => () }
          None
        } else Some(s.getPath.getName)
      }
  }

  /** the current set of append commit markers */
  def commitMarkers(fs: FileSystem, indexDir: String): Set[String] = {
    val root = new Path(indexDir)
    if (!fs.exists(root)) Set.empty
    else fs.listStatus(root)
      .filter(s => s.isFile && s.getPath.getName.startsWith(MarkerPrefix))
      .map(_.getPath.getName).toSet
  }

  /** drop markers a successful flip just baked into the new generation */
  def clearMarkers(fs: FileSystem, indexDir: String,
                   markers: Set[String]): Unit =
    markers.foreach { m =>
      try { fs.delete(new Path(s"$indexDir/$m"), false); () }
      catch { case _: Exception => () }
    }

  /** staging dirs of crashed writers: `<kind>_gN_s<nonce>` dirs older
    * than `staleMs` (live attempts keep their mtime fresh via task file
    * creation; an aborted attempt deletes its own staging on the way out) */
  def staleStagingDirs(fs: FileSystem, indexDir: String,
                       kinds: Seq[String],
                       staleMs: Long = DefaultStaleMs): Seq[String] = {
    val root = new Path(indexDir)
    if (!fs.exists(root)) Seq.empty
    else {
      val pat = ("^(" + kinds.mkString("|") + ")_g\\d+_s[0-9a-f]+$").r
      fs.listStatus(root).toSeq.filter(_.isDirectory)
        .filter(s => pat.findFirstIn(s.getPath.getName).isDefined &&
          System.currentTimeMillis() - s.getModificationTime > staleMs)
        .map(_.getPath.toString)
    }
  }

  /** record "compaction due" for an out-of-band maintainer (idempotent) */
  def signalMaintenanceDue(fs: FileSystem, indexDir: String): Unit = {
    fs.create(new Path(s"$indexDir/$MaintenanceDueName"), true).close()
  }

  /** true while a deferred-maintenance signal is pending */
  def maintenanceDue(fs: FileSystem, indexDir: String): Boolean =
    fs.exists(new Path(s"$indexDir/$MaintenanceDueName"))

  /** a successful maintenance flip clears the signal */
  def clearMaintenanceDue(fs: FileSystem, indexDir: String): Unit = {
    try { fs.delete(new Path(s"$indexDir/$MaintenanceDueName"), false); () }
    catch { case _: Exception => () }
  }

  /** delete helper for generation GC: returns true when the dir is gone
    * afterwards; failures are logged, never thrown (best-effort GC must
    * not fail the maintenance call that triggered it) */
  def tryReclaim(fs: FileSystem, dir: String): Boolean =
    try {
      if (testFailDelete(dir))
        throw new java.io.IOException(s"injected delete failure: $dir")
      val p = new Path(dir)
      fs.delete(p, true)
      !fs.exists(p)
    } catch {
      case e: Exception =>
        log.warn(s"expireGenerations: could not reclaim $dir: $e")
        false
    }
}
