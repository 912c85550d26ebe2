package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** Persistent IVF-PQ vector index: build once over the corpus, save as
  * parquet, reload and serve many queries — the lifecycle that matters at
  * 100 TB, where re-encoding the corpus per query session would dwarf the
  * search itself.
  *
  * On-disk layout (all parquet):
  *   `indexDir/meta`      — one row: numSub, dim, codebook ids + flattened
  *                          codewords (the bounded build side). A REBUILD
  *                          writes its codebook to `meta_gN` for the
  *                          generation it creates, so codebook and
  *                          postings swap together at the pointer flip —
  *                          never a new codebook decoding old codes (see
  *                          [[loadSpecAt]]).
  *   `indexDir/postings`  — (label INT, vec_id LONG, codes ARRAY<BIGINT>):
  *                          the coarse-partition posting lists with 8-byte
  *                          PQ codes per vector — 32× smaller than the
  *                          float32 corpus, the part that stays resident.
  *                          Written partitioned BY label, so a probe reads
  *                          only the probed cluster's directory (the same
  *                          directory-pruning contract `PlanAuditSpec`
  *                          asserts for hive layouts).
  *   `indexDir/gen`       — generation pointer: [[compact]], [[remove]]
  *                          and rebuilds write generation N+1 into
  *                          `postings_gN+1` and flip this pointer as the
  *                          single commit point; build/append/search
  *                          address the live generation. Round-14
  *                          hardening: the pointer commits by directory
  *                          RENAME (never delete-then-write), racing
  *                          writers resolve by an optimistic generation
  *                          check (one winner, one loud abort), and
  *                          superseded generations are RETAINED for a
  *                          grace window — concurrent readers bound to
  *                          them finish, audits time-travel via
  *                          [[searchTopKAt]] — until [[expireGenerations]]
  *                          reclaims them. Round 15 ([[IndexCommit]]):
  *                          the flip is truly atomic (unique per-attempt
  *                          staging + commit lock) and appends
  *                          participate via an intent/marker protocol
  *                          rewrites must observe before flipping.
  *
  * Search: nearest-centroid probe (here: the stored label of the query,
  * matching `ann_ivfpq`'s fixture contract) → decode = codebook lookup per
  * subspace (map-side, the codebook folds to literals) → exact-query ×
  * reconstructed-corpus cosine → per-query top-k. Scores are IDENTICAL to
  * encoding fresh ([[Similarity.pqReconstruct]] → decode(encode(v)) is a
  * pure function of the codes), which the spec asserts row-for-row. */
object VectorIndex {

  final case class Spec(numSub: Int, dim: Int,
                        codebook: Array[(Long, Array[Float])])

  /** test seam: runs between a maintenance rewrite and its CAS commit, so
    * a spec can interleave a racing writer DETERMINISTICALLY (thread-based
    * racing is flaky by construction). No-op in production. */
  private[graft] var testBeforeCommit: () => Unit = () => ()

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Build / REBUILD. A fresh build writes gen-0 postings + `meta` (no
    * pointer file — gen 0 is the implicit origin). A rebuild over an
    * existing index never touches the live generation: postings land in
    * `postings_gN+1`, the new codebook in `meta_gN+1`, and the pointer
    * flip COMMITS both atomically-together — a crash anywhere before the
    * flip leaves the old generation fully consistent (old postings + old
    * codebook), closing the round-13 advisory's stale-codebook window. */
  def build(emb: DataFrame, spec: Spec, indexDir: String): Unit = {
    val spark = emb.sparkSession
    // fail BEFORE any data lands when the store can't give the commit
    // protocol its atomic rename / create-if-absent primitives
    IndexCommit.requireAtomicCommitStore(fs(spark, indexDir), indexDir)
    def encoded = emb.select(col("label"), col("vec_id"),
      Similarity.pqAssign(col("embedding"), spec.codebook, spec.numSub)
        .as("codes"))
    if (!exists(spark, indexDir)) {
      // persist the index's stale horizon FIRST (the one liveness number
      // every later session derives its lock TTL, heartbeat cadence and
      // reap ages from — graft.index.staleHorizonMs in the Hadoop conf,
      // default 15 min), then the gen-0 data
      IndexCommit.initHorizon(fs(spark, indexDir), indexDir,
        spark.sparkContext.hadoopConfiguration)
      // postings and codebook are independent writes — overlap them
      // (guide §2.6; ParallelOps)
      ParallelOps.inParallel(
        encoded.write.partitionBy("label").mode("overwrite")
          .parquet(postingsDir(indexDir, 0)),
        writeMetaFiles(spark, spec, s"$indexDir/meta"))
    } else {
      // REBUILD: stage postings AND codebook in unique per-attempt dirs,
      // install + flip under the commit lock ([[stageAndCommit]]) — same
      // protocol as compact/remove, so racing rebuilds resolve to one
      // winner and appends racing the rebuild are observed
      val prev = generation(spark, indexDir)
      // the horizon this rewrite TRUSTS is the one read at marker-listing
      // time (raise-only keeps a concurrent raise sound)
      val horizon = IndexCommit.horizonMs(fs(spark, indexDir), indexDir)
      val markersListedAt = System.currentTimeMillis()
      val markersSeen =
        IndexCommit.commitMarkers(fs(spark, indexDir), indexDir)
      stageAndCommit(spark, indexDir, prev, markersSeen, markersListedAt,
        horizon, retainGenerations = 1, stageMeta = true) { (pStage, mStage) =>
        ParallelOps.inParallel(
          encoded.write.partitionBy("label").mode("overwrite").parquet(pStage),
          writeMetaFiles(spark, spec, mStage.get))
      }
    }
  }

  /** the codebook schema on disk — identical row shape to the Spark
    * writer this replaces (num_sub, dim, entry_id, codeword), standard
    * parquet list layout, so pre-existing indexes read back unchanged */
  private val metaSchema =
    org.apache.parquet.schema.MessageTypeParser.parseMessageType(
      """message spark_schema {
        |  required int32 num_sub;
        |  required int32 dim;
        |  required int64 entry_id;
        |  required group codeword (LIST) {
        |    repeated group list { required float element; }
        |  }
        |}""".stripMargin)

  /** O(codebook) model file: written DRIVER-SIDE (guide §1 job-count
    * hygiene — a coalesce(1) Spark write paid a scheduled job per
    * build/rebuild for a few KB of model; the write itself stays ordinary
    * parquet) */
  private def writeMetaFiles(spark: SparkSession, spec: Spec,
                             dir: String): Unit =
    BoundedParquet.overwrite(fs(spark, dir), metaSchema, dir) { (fac, sink) =>
      spec.codebook.foreach { case (id, cw) =>
        val g = fac.newGroup()
        g.append("num_sub", spec.numSub)
        g.append("dim", spec.dim)
        g.append("entry_id", id)
        val lst = g.addGroup("codeword")
        cw.foreach(v => lst.addGroup("list").append("element", v))
        sink(g)
      }
    }

  /** generation-addressed posting dirs: gen 0 is the original `postings`
    * layout; maintenance writes generation N+1 into a fresh
    * `postings_gN+1` dir and flips the `gen` pointer — the single commit
    * point — so a reader never observes a half-rewritten index */
  private def postingsDir(indexDir: String, gen: Int): String =
    if (gen == 0) s"$indexDir/postings" else s"$indexDir/postings_g$gen"

  /** per-generation codebook dir — written only by rebuilds (maintenance
    * rewrites recode nothing, so the codebook carries forward) */
  private def metaGenDir(indexDir: String, gen: Int): String =
    if (gen == 0) s"$indexDir/meta" else s"$indexDir/meta_g$gen"

  /** Fail LOUDLY when the pointer is absent but a pointer COMMIT left its
    * staging dirs behind — the crashed-mid-commit state. Reading it as
    * gen 0 would silently serve the superseded original postings (the
    * round-13 advisory's silent-wrong-results path). A bare `postings_gN`
    * without a pointer is NOT this state: it is a rewrite that crashed
    * BEFORE its commit (the old generation is still the truth — the next
    * maintenance attempt overwrites the orphan), and it is also the
    * normal in-flight state of the first maintenance call itself. Every
    * commit writes `gen_tmp` before touching `gen`, so a crash anywhere
    * inside the commit always leaves staging evidence. */
  private def requireUnambiguous(spark: SparkSession, indexDir: String): Unit = {
    val f = fs(spark, indexDir)
    def has(s: String) =
      f.exists(new org.apache.hadoop.fs.Path(s"$indexDir/$s"))
    if (!has("gen") && has("gen_old"))
      throw new IllegalStateException(
        s"vector index at $indexDir has commit staging dirs but no gen " +
          "pointer — a crashed pointer commit. Recover: if gen_old exists, " +
          "rename it back to gen; else rebuild the index. Refusing to read " +
          "it as generation 0.")
  }

  private def generation(spark: SparkSession, indexDir: String): Int = {
    requireUnambiguous(spark, indexDir)
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/gen")
    val f = fs(spark, indexDir)
    if (!f.exists(p)) 0 // pre-maintenance: no pointer yet
    else if (f.getFileStatus(p).isFile) {
      // round-14 format: one text file, read driver-side (no Spark job —
      // generation() runs several times per index operation)
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
      finally in.close()
    } else
      // legacy parquet-directory pointer (pre-round-14 indexes)
      spark.read.parquet(p.toString).collect().head.getInt(0)
  }

  /** the LIVE generation number (0 for a fresh build) */
  def liveGeneration(spark: SparkSession, indexDir: String): Int =
    generation(spark, indexDir)

  /** every generation with postings still on disk, ascending — the live
    * one plus superseded generations retained for in-flight readers and
    * time-travel ([[searchTopKAt]]) until [[expireGenerations]] */
  def generationsOnDisk(spark: SparkSession, indexDir: String): Seq[Int] = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val f = fs(spark, indexDir)
    if (!f.exists(root)) Seq.empty
    else {
      val gN = "postings_g(\\d+)".r
      f.listStatus(root).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName)
        .collect { case "postings" => 0; case gN(n) => n.toInt }
        .sorted
    }
  }

  /** Pointer commit via rename, not write-in-place: overwriting the live
    * `gen` is delete-then-write — a crash mid-write leaves NO pointer,
    * which used to read as gen 0 and silently address the original
    * postings. The pointer is one text FILE (round 14: a parquet dir here
    * cost a full Spark job per [[generation]] read, which runs several
    * times per index operation; pre-round-14 parquet-dir pointers still
    * read, and the next commit upgrades the format): it lands complete in
    * `gen_tmp`, and the swap is two single-file renames with
    * [[requireUnambiguous]] catching every crash-interleaving. */
  private def writeGeneration(spark: SparkSession, indexDir: String,
                              gen: Int): Unit = {
    val f = fs(spark, indexDir)
    // COMMIT FENCE (round 16): abort before the flip if this holder's
    // lease was broken while it was stalled — see IndexCommit.assertLockHeld
    IndexCommit.assertLockHeld(f, indexDir)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$indexDir/$s")
    val out = f.create(p("gen_tmp"), true)
    try out.write(gen.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    f.delete(p("gen_old"), true) // failed prior swap
    if (f.exists(p("gen"))) {
      if (!f.rename(p("gen"), p("gen_old")))
        throw new IllegalStateException(
          s"vector index gen commit: rename $indexDir/gen -> gen_old failed")
    }
    if (!f.rename(p("gen_tmp"), p("gen")))
      throw new IllegalStateException(
        s"vector index gen commit: rename $indexDir/gen_tmp -> gen failed" +
          " — recover by renaming gen_old back to gen")
    f.delete(p("gen_old"), true)
    ()
  }

  /** Write generation N+1 into unique per-attempt staging dirs via
    * `writeStaged(postingsStage, metaStage)` (metaStage is Some only for
    * rebuilds, which carry a new codebook), then commit under the index
    * commit lock ([[IndexCommit]]): pointer re-read (CAS) → append
    * intent/marker checks → staging install (rename to the canonical
    * gN+1 paths) → pointer flip. Round 15: the round-14 CAS was
    * check-then-rename with a millisecond TOCTOU window, and racing
    * writers staged into the SAME canonical dir (a loser's in-flight
    * write could clobber the winner's now-live data); the lock plus
    * unique staging closes both. An aborted attempt reclaims its own
    * staging; a crashed attempt's orphans age out via
    * [[expireGenerations]]' stale-staging sweep. */
  private def stageAndCommit(spark: SparkSession, indexDir: String,
                             gen: Int, markersSeen: Set[String],
                             markersListedAtMs: Long,
                             horizonAtListingMs: Long,
                             retainGenerations: Int, stageMeta: Boolean)(
                             writeStaged: (String, Option[String]) => Unit): Unit = {
    val newGen = gen + 1
    val n = IndexCommit.nonce()
    val pStage = postingsDir(indexDir, newGen) + "_s" + n
    val mStage =
      if (stageMeta) Some(metaGenDir(indexDir, newGen) + "_s" + n) else None
    val f = fs(spark, indexDir)
    try {
      writeStaged(pStage, mStage)
      testBeforeCommit()
      IndexCommit.withCommitLock(f, indexDir, s"vector rewrite -> g$newGen") {
        val now = generation(spark, indexDir)
        if (now != gen)
          throw new java.util.ConcurrentModificationException(
            s"vector index at $indexDir: generation advanced $gen -> $now " +
              "during this rewrite (concurrent maintenance). This call's " +
              "rewrite is DISCARDED — re-run it against the new generation.")
        val intents = IndexCommit.liveIntents(f, indexDir)
        if (intents.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"vector index at $indexDir: append(s) in flight " +
              s"(${intents.mkString(", ")}) — committing this rewrite could " +
              "silently drop their rows. This call's rewrite is DISCARDED " +
              "— re-run after the appends finish.")
        // a rewrite that outlived the marker horizon can no longer trust
        // the diff below (an unseen marker may have been age-reaped)
        IndexCommit.requireMarkerHorizon(indexDir, markersListedAtMs,
          horizonAtListingMs)
        val newMarkers = IndexCommit.commitMarkers(f, indexDir) -- markersSeen
        if (newMarkers.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"vector index at $indexDir: append(s) committed during this " +
              s"rewrite (${newMarkers.mkString(", ")}) — its snapshot may " +
              "not contain their rows. This call's rewrite is DISCARDED — " +
              "re-run it (the new snapshot will include them).")
        // COMMIT FENCE before the first destructive op: install deletes
        // whatever sits at the canonical gN+1 path — under a STOLEN lease
        // that could be a new writer's just-committed generation, so a
        // holder that stalled past the TTL must abort here, not destroy it
        IndexCommit.assertLockHeld(f, indexDir)
        def install(stage: String, canon: String): Unit = {
          val cp = new org.apache.hadoop.fs.Path(canon)
          f.delete(cp, true) // a prior FAILED attempt's orphan, per the CAS
          if (!f.rename(new org.apache.hadoop.fs.Path(stage), cp))
            throw new IllegalStateException(
              s"vector index rewrite: rename $stage -> $canon failed")
        }
        install(pStage, postingsDir(indexDir, newGen))
        mStage.foreach(install(_, metaGenDir(indexDir, newGen)))
        writeGeneration(spark, indexDir, newGen) // COMMIT POINT
        IndexCommit.clearMarkers(f, indexDir, markersSeen)
        IndexCommit.clearMaintenanceDue(f, indexDir)
      }
    } catch {
      case e: Throwable =>
        (Seq(pStage) ++ mStage).foreach { d =>
          try { f.delete(new org.apache.hadoop.fs.Path(d), true); () }
          catch { case _: Exception => () }
        }
        throw e
    }
    expireGenerations(spark, indexDir, retainGenerations)
    ()
  }

  /** what [[expireGenerations]] actually did — see
    * [[DedupIndex.GcResult]] (same contract) */
  final case class GcResult(reclaimed: Seq[String], failed: Seq[String])

  /** Delete superseded generations (postings AND any rebuild codebooks),
    * keeping the live one plus the `retain` newest superseded ones — the
    * grace window for concurrent readers whose plans are bound to an old
    * generation, and for time-travel audits via [[searchTopKAt]]. Also
    * sweeps staging orphans of CRASHED writers (stale `_s<nonce>` dirs).
    * Best-effort: a missing/locked dir never fails the caller — failures
    * are logged and returned, not thrown (round-14 advisory: silent
    * swallow meant storage could stop shrinking with zero signal). */
  def expireGenerations(spark: SparkSession, indexDir: String,
                        retain: Int = 0): GcResult = {
    val live = generation(spark, indexDir)
    val all = generationsOnDisk(spark, indexDir)
    // only generations BELOW live are superseded; anything above it is an
    // in-flight writer's staging (or an aborted writer's orphan, which the
    // next rewrite overwrites) — deleting it here could destroy a
    // concurrent rewrite, and letting it consume a retention slot would
    // evict a genuinely-retained generation early
    val doomedPostings = all.filter(_ < live).sortBy(g => -g).drop(retain)
    val survivors = all.filterNot(doomedPostings.contains)
    // A rebuild codebook meta_gN is shared DOWNSTREAM: a generation
    // created by compact/remove recodes nothing and decodes under the
    // newest rebuild codebook at or below it ([[loadSpecAt]]) — so a
    // codebook outlives its own postings generation as long as ANY
    // surviving generation resolves to it. Codebooks above `live` are an
    // in-flight rebuild's staging and are never touched here.
    val f = fs(spark, indexDir)
    val gM = "meta_g(\\d+)".r
    val rebuilds = f.listStatus(new org.apache.hadoop.fs.Path(indexDir))
      .toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .collect { case gM(n) => n.toInt }
    val needed = survivors
      .flatMap(s => rebuilds.filter(_ <= s) match {
        case Nil => None; case xs => Some(xs.max)
      }).toSet
    val doomedMeta = rebuilds.filter(n => n <= live && !needed.contains(n))
    val doomed = doomedPostings.map(postingsDir(indexDir, _)) ++
      doomedMeta.map(metaGenDir(indexDir, _)) ++
      IndexCommit.staleStagingDirs(f, indexDir, Seq("postings", "meta"))
    val (reclaimed, failed) =
      doomed.partition(d => IndexCommit.tryReclaim(f, d))
    GcResult(reclaimed, failed)
  }

  /** true while a deferred-maintenance signal is pending (the streaming
    * ingest gate's `deferMaintenance` mode records "compaction due"
    * instead of compacting inside the micro-batch; an out-of-band
    * maintainer polls this and runs [[compact]], whose successful flip
    * clears it) */
  def maintenanceDue(spark: SparkSession, indexDir: String): Boolean =
    IndexCommit.maintenanceDue(fs(spark, indexDir), indexDir)

  /** record "compaction due" for an out-of-band maintainer (idempotent) */
  def signalMaintenanceDue(spark: SparkSession, indexDir: String): Unit =
    IndexCommit.signalMaintenanceDue(fs(spark, indexDir), indexDir)

  /** the index's agreed stale horizon (ms) — see
    * [[IndexCommit.horizonMs]] */
  def staleHorizonMs(spark: SparkSession, indexDir: String): Long =
    IndexCommit.horizonMs(fs(spark, indexDir), indexDir)

  /** RAISE the index's stale horizon (lock-guarded, raise-only,
    * persisted, agreed by every session) — see
    * [[IndexCommit.setStaleHorizon]] */
  def setStaleHorizon(spark: SparkSession, indexDir: String,
                      ms: Long): Unit =
    IndexCommit.setStaleHorizon(fs(spark, indexDir), indexDir, ms)

  /** one-row lock/liveness surface — see [[IndexCommit.describeLocks]] */
  def describeLocks(spark: SparkSession, indexDir: String): DataFrame =
    IndexCommit.describeLocks(spark, indexDir)

  /** One-row operability surface — the EXPLAIN-for-indexes a deployment
    * reaches for first: PQ config, live generation, what is on disk
    * (generations, labels, files, bytes — from directory listings), row
    * count, fragmentation ([[maxFilesPerLabel]], the auto-compaction
    * signal) and whether a deferred-maintenance request is pending.
    * O(metadata): the posting row count comes from parquet FOOTERS of
    * the same file listing the size stats already walk (round-15
    * verdict: the previous `count()` launched a scan job whose cost grew
    * with the index); the only remaining Spark read is the O(1) codebook
    * (bounded rows), spec-asserted invariant in index size. */
  def describeIndex(spark: SparkSession, indexDir: String): DataFrame = {
    import spark.implicits._
    val gen = generation(spark, indexDir)
    val spec = loadSpecAt(spark, indexDir, gen)
    val gens = generationsOnDisk(spark, indexDir)
    val f = fs(spark, indexDir)
    val dir = new org.apache.hadoop.fs.Path(postingsDir(indexDir, gen))
    val labelDirs =
      if (!f.exists(dir)) Seq.empty
      else f.listStatus(dir).toSeq.filter(_.isDirectory)
    val files = labelDirs.flatMap(d => f.listStatus(d.getPath).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")))
    Seq((spec.numSub, spec.dim, spec.codebook.length, gen,
      gens.mkString(","), gens.length,
      IndexCommit.footerRowCount(
        spark.sparkContext.hadoopConfiguration, files),
      labelDirs.length.toLong, files.length.toLong, files.map(_.getLen).sum,
      maxFilesPerLabel(spark, indexDir),
      centroidsOnDisk(spark, indexDir),
      IndexCommit.maintenanceDue(f, indexDir)))
      .toDF("num_sub", "dim", "codebook_entries", "live_generation",
        "generations_on_disk", "n_generations", "posting_rows", "labels",
        "posting_files", "posting_bytes", "max_files_per_label",
        "has_centroids", "maintenance_due")
  }

  private def centroidsOnDisk(spark: SparkSession, indexDir: String): Boolean =
    fs(spark, indexDir)
      .exists(new org.apache.hadoop.fs.Path(s"$indexDir/centroids"))

  /** COMPACTION: rewrite the posting lists to ONE file per label
    * directory — the small-files answer for a long-lived vector index.
    * Every [[append]] (and every streaming-ingest micro-batch) adds one
    * file per touched label dir, so after thousands of embedding drops a
    * probe opens thousands of parquet footers per probed cluster;
    * compaction collapses each label back to a single file while
    * preserving the hive layout (directory pruning — the static
    * `label IN (probed)` filter — keeps working unchanged).
    *
    * Cost: ONE hash exchange of the CODES (8-byte PQ codes, 32× smaller
    * than the float corpus — the embeddings are never re-read or
    * re-encoded): `repartition(col("label"))` puts each label's rows
    * wholly in one task, so the partitioned write emits exactly one file
    * per label whatever the task count. Same crash-safe generation flip
    * as `DedupIndex.compact`: the rewrite lands in `postings_gN+1`, the
    * `gen` pointer commit (CAS + rename) flips it, superseded generations
    * age out per `retainGenerations`. */
  def compact(spark: SparkSession, indexDir: String,
              retainGenerations: Int = 1): Unit =
    rewriteGeneration(spark, indexDir, identity, retainGenerations)

  /** REMOVE vectors from the index — the deletion half of the lifecycle
    * (a revoked source's embeddings must leave the search surface without
    * re-encoding the corpus). The ids arrive as a DataFrame (arbitrarily
    * large: a distributed LEFT ANTI join, never a collected set); the
    * posting lists are rewritten without them through the same generation
    * flip as [[compact]] — a remove also compacts, and the hive layout
    * (directory pruning) survives. `searchTopK` after `remove(ids)` is
    * row-identical to an index never containing them. */
  def remove(spark: SparkSession, indexDir: String, ids: DataFrame,
             idCol: String = "vec_id", retainGenerations: Int = 1): Unit = {
    val drop = ids.select(col(idCol).cast("long").as("vec_id")).distinct()
    rewriteGeneration(spark, indexDir,
      df => df.join(drop, Seq("vec_id"), "left_anti"), retainGenerations)
  }

  private def rewriteGeneration(spark: SparkSession, indexDir: String,
                                transform: DataFrame => DataFrame,
                                retainGenerations: Int): Unit = {
    require(retainGenerations >= 0,
      s"retainGenerations must be >= 0, got $retainGenerations")
    val gen = generation(spark, indexDir)
    // markers BEFORE the posting read: any append whose rows this
    // rewrite's snapshot could miss has a marker NOT in this set (the
    // snapshot itself is a fresh path-based read inside writeStaged, so
    // it postdates this listing with no catalog-cache caveat)
    val horizon = IndexCommit.horizonMs(fs(spark, indexDir), indexDir)
    val markersListedAt = System.currentTimeMillis()
    val markersSeen = IndexCommit.commitMarkers(fs(spark, indexDir), indexDir)
    stageAndCommit(spark, indexDir, gen, markersSeen, markersListedAt,
      horizon, retainGenerations, stageMeta = false) { (pStage, _) =>
      // readPostings, not a bare parquet read: a remove() that emptied the
      // index leaves a live dir with no files — compact/remove after it
      // must rewrite the empty relation, not throw (round-13 advisory)
      transform(readPostings(spark, postingsDir(indexDir, gen)))
        .repartition(col("label"))
        .sortWithinPartitions("label", "vec_id")
        .write.partitionBy("label").mode("overwrite").parquet(pStage)
    }
  }

  /** max posting files in any single label dir of the LIVE generation —
    * the fragmentation signal an auto-compaction policy thresholds on
    * (one directory listing, no data read) */
  def maxFilesPerLabel(spark: SparkSession, indexDir: String): Int = {
    val dir = new org.apache.hadoop.fs.Path(
      postingsDir(indexDir, generation(spark, indexDir)))
    val f = fs(spark, indexDir)
    if (!f.exists(dir)) 0
    else f.listStatus(dir).filter(_.isDirectory).foldLeft(0) { (m, d) =>
      math.max(m, f.listStatus(d.getPath)
        .count(_.getPath.getName.endsWith(".parquet")))
    }
  }

  /** INCREMENTAL append — the ANN analog of `dedup_incremental`: encode
    * ONLY the new vectors with the index's stored codebook and append
    * their codes into the existing label-partitioned posting lists. No
    * rebuild: the write touches new files in the appended labels'
    * directories only, the resident corpus codes are never read or
    * re-encoded — at 100 TB an hourly embedding drop costs
    * O(new vectors), not O(corpus).
    *
    * Because PQ codes are a pure function of (vector, codebook) and the
    * codebook is FROZEN in `meta`, `build(a); append(b)` is row-identical
    * to `build(a ∪ b)` — `VectorIndexSpec` asserts it. (Freezing the
    * codebook is the standard IVFPQ posture: appended vectors quantize
    * under the trained codebook; retraining is a deliberate rebuild.) */
  def append(emb: DataFrame, indexDir: String): Unit = {
    val spark = emb.sparkSession
    val f = fs(spark, indexDir)
    // INTENT before any write (round 15, [[IndexCommit]]): a maintenance
    // rewrite refuses to flip while this intent is live, and the COMMIT
    // MARKER dropped after the data lands makes an append that completes
    // mid-rewrite visible to the rewrite's locked marker-diff — together
    // they close the round-14 post-check's remaining TOCTOU.
    val token = IndexCommit.beginAppend(f, indexDir)
    try {
      val spec = loadSpec(spark, indexDir)
      val gen = generation(spark, indexDir)
      emb.select(col("label"), col("vec_id"),
        Similarity.pqAssign(col("embedding"), spec.codebook, spec.numSub)
          .as("codes"))
        .write.partitionBy("label").mode("append")
        .parquet(postingsDir(indexDir, gen))
      testAfterAppendWrite()
      // belt for the millisecond window where a rewrite's intent check ran
      // before our intent landed: its flip is then caught HERE, loudly.
      // Whether the rewrite saw the rows is genuinely ambiguous, so
      // recovery is remove(ids)+append (remove is idempotent) rather than
      // a blind re-append (which could double rows).
      val genNow = generation(spark, indexDir)
      if (genNow != gen)
        throw new java.util.ConcurrentModificationException(
          s"vector index at $indexDir: generation advanced $gen -> $genNow " +
            "while this append wrote — the appended rows may sit only in the " +
            "superseded generation. Recover: remove(theseIds) then re-append.")
      IndexCommit.finishAppend(f, indexDir, token) // marker, then intent drop
    } catch {
      case e: Throwable =>
        IndexCommit.abortAppend(f, indexDir, token)
        throw e
    }
  }

  /** test seam: runs between an append's data write and its generation
    * post-check — a spec interleaves a racing rewrite deterministically */
  private[graft] var testAfterAppendWrite: () => Unit = () => ()

  /** the LIVE generation's codebook */
  def loadSpec(spark: SparkSession, indexDir: String): Spec =
    loadSpecAt(spark, indexDir, generation(spark, indexDir))

  /** The codebook that encodes generation `gen`'s postings: the newest
    * rebuild codebook at or below `gen` (maintenance rewrites recode
    * nothing, so a generation created by compact/remove inherits the
    * codebook of the last rebuild before it; `meta` is the gen-0
    * original). Resolution is deterministic and crash-safe: a rebuild
    * writes `meta_gN+1` BEFORE the pointer flip, and resolution ignores
    * codebooks above the generation being read. */
  def loadSpecAt(spark: SparkSession, indexDir: String, gen: Int): Spec = {
    val f = fs(spark, indexDir)
    val gM = "meta_g(\\d+)".r
    val rebuildGens = f.listStatus(new org.apache.hadoop.fs.Path(indexDir))
      .toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .collect { case gM(n) => n.toInt }
      .filter(_ <= gen)
    val dir =
      if (rebuildGens.isEmpty) s"$indexDir/meta"
      else metaGenDir(indexDir, rebuildGens.max)
    // O(codebook) model file, read DRIVER-SIDE: loadSpec runs on every
    // append / search / describe, and the spark.read.parquet(...).collect()
    // it replaces paid DataSource resolution + schema inference + one
    // scheduled Spark job (~100 ms fixed) per read for a few KB
    val rows = BoundedParquet.readGroups(
      f, spark.sparkContext.hadoopConfiguration, dir)
    val cb = rows.map(g => (g.getLong("entry_id", 0),
        BoundedParquet.floatList(g, "codeword")))
      .sortBy(_._1).toArray
    Spec(rows.head.getInteger("num_sub", 0),
      rows.head.getInteger("dim", 0), cb)
  }

  /** true once `build` has written this index's meta */
  def exists(spark: SparkSession, indexDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/meta")
    fs(spark, indexDir).exists(p)
  }

  /** Persist the COARSE quantizer (IVF centroids) beside the index, so any
    * later session — batch append or the streaming ingest gate — can
    * label arriving vectors without re-deriving the quantizer. Like the PQ
    * codebook in `meta`, the centroids are FROZEN at train time: appended
    * vectors quantize under them, retraining is a deliberate rebuild. */
  private val centroidsSchema =
    org.apache.parquet.schema.MessageTypeParser.parseMessageType(
      """message spark_schema {
        |  required int64 centroid_id;
        |  required group centroid (LIST) {
        |    repeated group list { required float element; }
        |  }
        |}""".stripMargin)

  def saveCentroids(spark: SparkSession, indexDir: String,
                    centroids: Array[(Long, Array[Float])]): Unit =
    // O(nlist) model file, written driver-side — see [[writeMetaFiles]]
    BoundedParquet.overwrite(fs(spark, indexDir), centroidsSchema,
      s"$indexDir/centroids") { (fac, sink) =>
      centroids.foreach { case (id, v) =>
        val g = fac.newGroup()
        g.append("centroid_id", id)
        val lst = g.addGroup("centroid")
        v.foreach(x => lst.addGroup("list").append("element", x))
        sink(g)
      }
    }

  def loadCentroids(spark: SparkSession,
                    indexDir: String): Array[(Long, Array[Float])] =
    // O(nlist) model file, read driver-side — see [[loadSpecAt]]; throws
    // FileNotFoundException when never saved (callers translate)
    BoundedParquet.readGroups(fs(spark, indexDir),
        spark.sparkContext.hadoopConfiguration, s"$indexDir/centroids")
      .map(g => (g.getLong("centroid_id", 0),
        BoundedParquet.floatList(g, "centroid")))
      .sortBy(_._1).toArray

  /** nearest-centroid label per vector — map-side argmax over the bounded
    * centroid set (literal fold, no shuffle); ties break to the LOWEST
    * centroid id, matching the IVF assignment the ann_ivf queries use */
  def assignLabels(emb: DataFrame,
                   centroids: Array[(Long, Array[Float])]): DataFrame = {
    val scored = array(centroids.map { case (cid, v) =>
      struct(Similarity.cosine(typedLit(v), col("embedding")).as("s"),
        lit(-cid).as("nc"))
    }: _*)
    emb.withColumn("label",
      (-array_max(scored).getField("nc")).cast("int"))
  }

  /** reconstruct a vector from its stored codes: per subspace, the chosen
    * codeword slice — one native map-side expression whose codebook travels
    * as a reference object ([[graft.functions.PqDecodeFold]]), so the plan
    * stays O(1) at any codebook size. (The previous CaseWhen-chain
    * formulation was O(K·dim) plan nodes — fine at K=8, codegen bloat at a
    * real K=256 IVFPQ config.) */
  private def decode(codes: Column, spec: Spec): Column =
    Similarity.pqDecode(codes, spec.codebook, spec.numSub)

  /** the postings relation shape — fixed by this operator's own contract
    * (label = hive partition column, then the encoded row): stating it at
    * the scan skips the per-read driver-side footer schema inference
    * (readPostings runs on every search and every rewrite) */
  private val postingsSchema = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField("vec_id", LongType),
      StructField("codes", ArrayType(LongType)),
      StructField("label", IntegerType)))
  }

  /** read a postings dir, tolerating exists-but-empty (a remove() that
    * dropped every vector leaves a dir with no parquet files — the
    * contract is "zero rows", not an error; a MISSING dir stays a loud
    * failure — it means a wrong indexDir/generation) */
  private def readPostings(spark: SparkSession, pDir: String): DataFrame =
    try spark.read.schema(postingsSchema).parquet(pDir)
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        val p = new org.apache.hadoop.fs.Path(pDir)
        if (!fs(spark, pDir).exists(p)) throw e
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          postingsSchema)
    }

  /** top-k per query over the loaded index; queries = (qid, label, qv).
    *
    * `nprobe > 1` probes each query's top-n nearest SAVED centroids
    * ([[saveCentroids]] must have been written beside the index) instead
    * of only the label its row carries — the saved-index analog of the
    * `ann_ivf_multiprobe` query form, with the same probe ranking
    * (rounded cosine desc, centroid id asc). Candidates need no dedup: a
    * vector lives in exactly one label partition and a query's probe
    * labels are distinct, so each (qid, vec_id) pair surfaces once.
    *
    * SCALE CONTRACT — static pruning, not best-effort DPP: the probed
    * label set is collected (O(#queries × nprobe); the query side is
    * broadcast-bounded by this operator's contract) and pushed as a
    * literal `label IN (...)` partition filter on the posting scan, so a
    * search reads exactly the probed clusters' directories. Relying on
    * dynamic partition pruning through the broadcast join instead would
    * let Spark silently decline and scan EVERY posting partition — at
    * 10⁹ vectors that is O(index) per search, the failure mode
    * `VectorIndexSpec` now pins with a files-read assertion through this
    * exact join path. */
  def searchTopK(spark: SparkSession, indexDir: String, queries: DataFrame,
                 k: Int, nprobe: Int = 1): DataFrame =
    searchTopKAt(spark, indexDir, generation(spark, indexDir), queries, k,
      nprobe)

  /** TIME-TRAVEL search: [[searchTopK]] against a RETAINED generation —
    * the reproducibility audit ("which index state served this batch's
    * hard negatives?"). Superseded generations are immutable (appends
    * land in the live generation only), so gen N answers byte-identically
    * until [[expireGenerations]] reclaims it. Each generation decodes
    * under ITS OWN codebook ([[loadSpecAt]]). */
  def searchTopKAt(spark: SparkSession, indexDir: String, gen: Int,
                   queries: DataFrame, k: Int, nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    // a reclaimed generation must fail POINTEDLY (never search as empty —
    // an audit that silently gets zero neighbors would conclude the batch
    // was served by an empty index), naming the knob that controls how
    // much history survives
    val onDisk = generationsOnDisk(spark, indexDir)
    require(onDisk.contains(gen),
      s"vector index at $indexDir has no generation $gen on disk " +
        s"(present: ${onDisk.mkString(", ")}) — it was never written, or " +
        "the retention window already reclaimed it. Audit reads need the " +
        "generation retained: raise retainGenerations on compact/remove " +
        "(and avoid explicit expireGenerations) for as long as time-travel " +
        "must reach back.")
    val spec = loadSpecAt(spark, indexDir, gen)
    val probes =
      if (nprobe == 1) queries
      else {
        val cents =
          try loadCentroids(spark, indexDir)
          catch {
            case e @ (_: org.apache.spark.sql.AnalysisException |
                      _: java.io.FileNotFoundException) =>
              throw new IllegalArgumentException(
                s"searchTopK(nprobe=$nprobe) needs the saved coarse " +
                  s"quantizer ($indexDir/centroids) — persist it with " +
                  "saveCentroids at build time", e)
          }
        require(cents.nonEmpty,
          s"searchTopK(nprobe=$nprobe): $indexDir/centroids is empty")
        // per-query top-nprobe centroids, map-side over the bounded
        // centroid set (ccos desc, centroid id asc — array_sort asc on
        // (s, -cid) then reverse)
        val scored = array(cents.map { case (cid, v) =>
          struct(round(Similarity.cosine(typedLit(v), col("qv")), 6).as("s"),
            lit(-cid).as("nc"))
        }: _*)
        queries.drop("label")
          .withColumn("probe",
            explode(slice(reverse(array_sort(scored)), 1, nprobe)))
          .withColumn("label", (-col("probe").getField("nc")).cast("int"))
          .drop("probe")
      }
    val labels = probes.select("label").distinct().collect().map(_.get(0))
    val postings = readPostings(spark, postingsDir(indexDir, gen))
    val pruned =
      if (labels.isEmpty) postings.filter(lit(false))
      else postings.filter(col("label").isin(labels: _*))
    val rankW = Window.partitionBy("qid")
      .orderBy(col("pq_cos").desc, col("vec_id").asc)
    pruned.join(broadcast(probes), "label")
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("rv", decode(col("codes"), spec))
      .withColumn("pq_cos", round(Similarity.cosine(col("qv"), col("rv")), 6))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select("qid", "rank", "vec_id", "pq_cos")
  }
}
