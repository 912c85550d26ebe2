package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.{Dedup, DedupIndex}

/** Persistent MinHash-LSH dedup index lifecycle: build → append → reload →
  * probe must reproduce the in-session `incrementalMinhashPairs` exactly,
  * and the probe join must consume the index's BUCKETED layout (no
  * Exchange on the index scan side) — the property that keeps the
  * billion-row side of every arriving batch's dedup join shuffle-free. */
class DedupIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, dir, "documents")
    .select(col("doc_id"), col("text"))

  private val spec = DedupIndex.Spec(numHashes = 16, bands = 4, buckets = 4)

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("new_id", "index_id").collect().toSeq

  test("build + append probe == in-session incrementalMinhashPairs == " +
    "single build over the union") {
    val idx = java.nio.file.Files.createTempDirectory("graft_didx").toString
    val corpusA = docs.filter(pmod(col("doc_id"), lit(10)) < 6)
    val corpusB = docs.filter(pmod(col("doc_id"), lit(10)).between(6, 7))
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)

    DedupIndex.build(corpusA, "doc_id", "text", spec, idx)
    DedupIndex.append(corpusB, "doc_id", "text", idx)
    val probed = sorted(
      DedupIndex.probePairs(spark, idx, batch, "doc_id", "text", minEst = 0.5))

    val inSession = sorted(Dedup.incrementalMinhashPairs(
      batch, docs.filter(pmod(col("doc_id"), lit(10)) < 8),
      "doc_id", "text", numHashes = 16, bands = 4, minEst = 0.5))
    assert(probed.nonEmpty, "fixture must produce candidate pairs")
    assert(probed == inSession)

    val idx2 = java.nio.file.Files.createTempDirectory("graft_didx2").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 8),
      "doc_id", "text", spec, idx2)
    assert(sorted(DedupIndex.probePairs(spark, idx2, batch,
      "doc_id", "text", minEst = 0.5)) == probed)
  }

  test("appendFromSignatures fails FAST on a hash-config mismatch (would " +
    "otherwise halve every later est-Jaccard and mix band keys)") {
    val idx = java.nio.file.Files.createTempDirectory("graft_didx_mm").toString
    DedupIndex.build(docs.limit(50), "doc_id", "text", spec, idx)
    val sig32 = Dedup.minhashSignatures(docs.limit(10), "doc_id", "text", 32)
    val e = intercept[IllegalArgumentException] {
      DedupIndex.appendFromSignatures(sig32, "doc_id", idx,
        numHashes = 32, bands = 4)
    }
    assert(e.getMessage.contains("numHashes=16"), e.getMessage)
  }

  test("catalog-loss reload: dropped tables re-register from disk DDL, " +
    "probe identical, scan still bucketed") {
    val idx = java.nio.file.Files.createTempDirectory("graft_didx3").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 8),
      "doc_id", "text", spec, idx)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
    val before = sorted(
      DedupIndex.probePairs(spark, idx, batch, "doc_id", "text"))

    // simulate a NEW session: the catalog forgets the tables, the files stay
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_dedup_idx_"))
      .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
    val after = DedupIndex.probePairs(spark, idx, batch, "doc_id", "text")
    assert(sorted(after) == before)

    // the re-issued DDL carries the bucket spec (a bare scan-only query
    // legitimately reports "disabled by query planner" — assert the
    // catalog metadata, which is what joins consume)
    val tbl = spark.catalog.listTables().collect()
      .map(_.name).find(_.endsWith("_bands")).get
    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $tbl")
      .collect().map(r => r.getString(0) + " " + r.getString(1)).mkString("\n")
    assert(desc.contains("Num Buckets 4") && desc.contains("Bucket Columns"),
      desc)
  }

  test("canonical naming: path spellings share one table; a rebuild with " +
    "a different bucket count refreshes stale session DDL") {
    val abs = java.nio.file.Files.createTempDirectory("graft_didx5")
    DedupIndex.build(docs.limit(60), "doc_id", "text", spec, abs.toString)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
    val viaAbs = sorted(
      DedupIndex.probePairs(spark, abs.toString, batch, "doc_id", "text"))
    val nTables = spark.catalog.listTables().collect()
      .count(_.name.startsWith("graft_dedup_idx_"))
    // the same directory through a different spelling (trailing slash +
    // redundant segment) must resolve to the SAME catalog tables
    val spelled = abs.toString + "/./"
    val viaSpelled = sorted(
      DedupIndex.probePairs(spark, spelled, batch, "doc_id", "text"))
    assert(viaSpelled == viaAbs)
    assert(spark.catalog.listTables().collect()
      .count(_.name.startsWith("graft_dedup_idx_")) == nTables,
      "a respelled path registered duplicate tables")

    // simulate ANOTHER session's rebuild with a different bucket count:
    // on-disk meta says 4 buckets, but this session's cached DDL claims 8 —
    // ensureRegistered must spot the disagreement and re-issue, or every
    // later probe join would hash-partition on the wrong layout.
    // (Resolve THIS index's table by its LOCATION — earlier tests in the
    // suite registered other indexes' _bands tables in the same catalog.)
    val tbl = spark.catalog.listTables().collect().map(_.name)
      .filter(n => n.startsWith("graft_dedup_idx_") && n.endsWith("_bands"))
      .find { n =>
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(n))
          .storage.locationUri.exists(_.toString.contains(abs.toString))
      }.get
    val cols = spark.read.parquet(s"$abs/bands").schema.toDDL
    spark.sql(s"DROP TABLE $tbl")
    spark.sql(
      s"""CREATE TABLE $tbl ($cols) USING PARQUET
         |CLUSTERED BY (bk) SORTED BY (bk) INTO 8 BUCKETS
         |LOCATION '$abs/bands'""".stripMargin)
    val specSeen = DedupIndex.ensureRegistered(spark, abs.toString)
    assert(specSeen.buckets == spec.buckets)
    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $tbl")
      .collect().map(r => r.getString(0) + " " + r.getString(1)).mkString("\n")
    assert(desc.contains(s"Num Buckets ${spec.buckets}"), desc)
    // and the refreshed registration still probes identically
    assert(sorted(DedupIndex.probePairs(spark, abs.toString, batch,
      "doc_id", "text")) == viaAbs)
  }

  private def parquetFiles(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
  }

  test("compact: collapses each bucket to one file, probe identical, " +
    "append lands in the new generation, second compact stacks") {
    val idx = java.nio.file.Files.createTempDirectory("graft_didx_c").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 4),
      "doc_id", "text", spec, idx)
    DedupIndex.append(docs.filter(pmod(col("doc_id"), lit(10)).between(4, 5)),
      "doc_id", "text", idx)
    DedupIndex.append(docs.filter(pmod(col("doc_id"), lit(10)).between(6, 7)),
      "doc_id", "text", idx)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 9)
    val before = sorted(
      DedupIndex.probePairs(spark, idx, batch, "doc_id", "text"))
    assert(before.nonEmpty, "fixture must produce candidate pairs")
    val filesBefore = parquetFiles(s"$idx/bands")
    assert(filesBefore.size > spec.buckets,
      s"fixture must accrete small files (got ${filesBefore.size})")

    DedupIndex.compact(spark, idx)
    val filesAfter = parquetFiles(s"$idx/bands_g1")
    assert(filesAfter.nonEmpty && filesAfter.size <= spec.buckets,
      s"compaction must leave at most one file per bucket " +
        s"(got ${filesAfter.size} for ${spec.buckets} buckets)")
    // the superseded generation is RETAINED (default retainGenerations=1):
    // a concurrent reader whose plan is bound to gen 0 finishes its scan
    assert(parquetFiles(s"$idx/bands").nonEmpty,
      "superseded generation must be retained for in-flight readers")
    assert(DedupIndex.generationsOnDisk(spark, idx) == Seq(0, 1))
    assert(sorted(DedupIndex.probePairs(spark, idx, batch,
      "doc_id", "text")) == before, "compaction changed probe results")

    // append AFTER compaction must land in the generation-1 dir and be
    // probe-identical to the in-session pairs over the widened corpus
    DedupIndex.append(docs.filter(pmod(col("doc_id"), lit(10)) === 8),
      "doc_id", "text", idx)
    assert(parquetFiles(s"$idx/bands_g1").size > filesAfter.size,
      "append after compact did not write into the new generation")
    val widened = sorted(
      DedupIndex.probePairs(spark, idx, batch, "doc_id", "text"))
    assert(widened == sorted(Dedup.incrementalMinhashPairs(
      batch, docs.filter(pmod(col("doc_id"), lit(10)) < 9),
      "doc_id", "text", numHashes = 16, bands = 4, minEst = 0.5)))

    // generations stack: a second compact moves to g2; the retention
    // window (1) keeps g1 and ages out g0
    DedupIndex.compact(spark, idx)
    assert(parquetFiles(s"$idx/bands_g2").nonEmpty &&
      parquetFiles(s"$idx/bands_g1").nonEmpty &&
      parquetFiles(s"$idx/bands").isEmpty,
      DedupIndex.generationsOnDisk(spark, idx).mkString(","))
    assert(sorted(DedupIndex.probePairs(spark, idx, batch,
      "doc_id", "text")) == widened)
    // explicit expiry reclaims everything but the live generation
    DedupIndex.expireGenerations(spark, idx)
    assert(DedupIndex.generationsOnDisk(spark, idx) == Seq(2))

    // the compacted scan is still BUCKETED (layout preserved, not just
    // content): the probe join's index side must carry the bucket spec
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = DedupIndex.probePairs(spark, idx, batch, "doc_id", "text")
        .queryExecution.executedPlan
      val bucketedScans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.tableIdentifier.exists(_.table.startsWith("graft_dedup_idx_")) &&
              s.metadata.get("Bucketed").contains("true") => s
      }
      assert(bucketedScans.size == 2,
        s"expected 2 bucketed index scans after compact:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("remove: probes as if the docs were never indexed, ids gone from " +
    "both relations, layout preserved, append-after-remove works") {
    val idx = java.nio.file.Files.createTempDirectory("graft_didx_rm").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 6),
      "doc_id", "text", spec, idx)
    DedupIndex.append(docs.filter(pmod(col("doc_id"), lit(10)).between(6, 7)),
      "doc_id", "text", idx)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
    DedupIndex.remove(spark, idx,
      docs.filter(pmod(col("doc_id"), lit(10)).between(6, 7))
        .select("doc_id"), "doc_id")

    // row-identical to an index that never contained the removed slice
    val refIdx = java.nio.file.Files
      .createTempDirectory("graft_didx_rm_ref").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 6),
      "doc_id", "text", spec, refIdx)
    val got = sorted(
      DedupIndex.probePairs(spark, idx, batch, "doc_id", "text"))
    assert(got.nonEmpty && got == sorted(
      DedupIndex.probePairs(spark, refIdx, batch, "doc_id", "text")))

    // no trace in either relation
    assert(DedupIndex.bandsRelation(spark, idx)
      .filter(pmod(col("doc_id"), lit(10)).between(6, 7)).count() == 0)
    assert(DedupIndex.sigsRelation(spark, idx)
      .filter(pmod(col("doc_id"), lit(10)).between(6, 7)).count() == 0)
    // a remove is also a compaction: generation advanced, one file/bucket
    assert(parquetFiles(s"$idx/bands_g1").size <= spec.buckets)

    // re-adding the removed slice restores the full-index probe exactly
    DedupIndex.append(docs.filter(pmod(col("doc_id"), lit(10)).between(6, 7)),
      "doc_id", "text", idx)
    val refFull = java.nio.file.Files
      .createTempDirectory("graft_didx_rm_full").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 8),
      "doc_id", "text", spec, refFull)
    assert(sorted(DedupIndex.probePairs(spark, idx, batch, "doc_id", "text"))
      == sorted(DedupIndex.probePairs(spark, refFull, batch, "doc_id", "text")))
  }

  test("racing maintenance: one writer wins, the loser aborts loudly, " +
    "the index stays intact at the winner's generation") {
    val idx = java.nio.file.Files.createTempDirectory("graft_didx_race").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 8),
      "doc_id", "text", spec, idx)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
    val before = sorted(
      DedupIndex.probePairs(spark, idx, batch, "doc_id", "text"))
    assert(before.nonEmpty)

    // deterministic interleaving via the test seam: while the OUTER remove
    // has finished its rewrite but not yet committed, a RACING compact
    // runs to completion and advances the generation out from under it.
    // Without the CAS the outer flip would win last-write-wins and the
    // racer's committed work would be silently discarded.
    val removeIds = docs.filter(pmod(col("doc_id"), lit(10)).between(6, 7))
      .select("doc_id")
    DedupIndex.testBeforeCommit = () => {
      DedupIndex.testBeforeCommit = () => () // the racer itself commits freely
      DedupIndex.compact(spark, idx)
    }
    try {
      val e = intercept[java.util.ConcurrentModificationException] {
        DedupIndex.remove(spark, idx, removeIds, "doc_id")
      }
      assert(e.getMessage.contains("DISCARDED"), e.getMessage)
    } finally DedupIndex.testBeforeCommit = () => ()
    // the loser's remove did NOT land (probe unchanged — the removed slice
    // still matches), and the index is live at the racer's generation
    assert(DedupIndex.liveGeneration(spark, idx) == 1)
    assert(sorted(DedupIndex.probePairs(spark, idx, batch,
      "doc_id", "text")) == before)
    // re-running the remove against the new generation succeeds
    DedupIndex.remove(spark, idx, removeIds, "doc_id")
    assert(DedupIndex.liveGeneration(spark, idx) == 2)
    assert(DedupIndex.bandsRelation(spark, idx)
      .filter(pmod(col("doc_id"), lit(10)).between(6, 7)).count() == 0)
  }

  test("a rewrite racing an IN-FLIGHT append aborts on the live intent; " +
    "the append completes and its rows are indexed (nothing lost)") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_didx_apprace").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 6),
      "doc_id", "text", spec, idx)
    val late = docs.filter(pmod(col("doc_id"), lit(10)).between(6, 7))
    // round-15 protocol: the append declared INTENT before writing, so the
    // rewrite interleaved mid-append must refuse to flip (round 14 let it
    // commit a snapshot missing the append's rows, then failed the APPEND
    // — loud, but the recovery burden sat on the innocent party)
    var racerEx: Throwable = null
    DedupIndex.testAfterAppendWrite = () => {
      DedupIndex.testAfterAppendWrite = () => ()
      racerEx = intercept[java.util.ConcurrentModificationException] {
        DedupIndex.compact(spark, idx)
      }
    }
    try DedupIndex.append(late, "doc_id", "text", idx) // must SUCCEED
    finally DedupIndex.testAfterAppendWrite = () => ()
    assert(racerEx != null &&
      racerEx.getMessage.contains("append(s) in flight"), s"$racerEx")
    assert(DedupIndex.liveGeneration(spark, idx) == 0,
      "the aborted rewrite must not have advanced the generation")
    // the appended rows are fully indexed — probe-identical to a clean
    // build over the union
    val refIdx = java.nio.file.Files
      .createTempDirectory("graft_didx_apprace_ref").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 8),
      "doc_id", "text", spec, refIdx)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
    assert(sorted(DedupIndex.probePairs(spark, idx, batch, "doc_id", "text"))
      == sorted(DedupIndex.probePairs(spark, refIdx, batch, "doc_id", "text")))
    // with the append finished, the once-aborted maintenance now commits
    DedupIndex.compact(spark, idx)
    assert(DedupIndex.liveGeneration(spark, idx) == 1)
    assert(sorted(DedupIndex.probePairs(spark, idx, batch, "doc_id", "text"))
      == sorted(DedupIndex.probePairs(spark, refIdx, batch, "doc_id", "text")))
  }

  test("an append that COMMITS during a rewrite's snapshot window aborts " +
    "the rewrite via the marker-diff (the round-14 silent-loss TOCTOU)") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_didx_mkrace").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 6),
      "doc_id", "text", spec, idx)
    val late = docs.filter(pmod(col("doc_id"), lit(10)).between(6, 7))
    // the rewrite has finished its snapshot writes (which MISSED the
    // append's rows) but not yet committed; a full append lands NOW. In
    // round 14 both the rewrite's CAS and the append's generation
    // post-check passed — the appended rows silently aged out with the
    // superseded generation. The marker the append drops after its data
    // commit must now abort the rewrite instead.
    DedupIndex.testBeforeCommit = () => {
      DedupIndex.testBeforeCommit = () => ()
      DedupIndex.append(late, "doc_id", "text", idx) // completes cleanly
    }
    try {
      val e = intercept[java.util.ConcurrentModificationException] {
        DedupIndex.compact(spark, idx)
      }
      assert(e.getMessage.contains("append(s) committed during this rewrite"),
        e.getMessage)
    } finally DedupIndex.testBeforeCommit = () => ()
    assert(DedupIndex.liveGeneration(spark, idx) == 0)
    // re-running the rewrite sees the appended rows: post-compact the
    // index is probe-identical to a clean build over the union
    DedupIndex.compact(spark, idx)
    assert(DedupIndex.liveGeneration(spark, idx) == 1)
    val refIdx = java.nio.file.Files
      .createTempDirectory("graft_didx_mkrace_ref").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 8),
      "doc_id", "text", spec, refIdx)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
    assert(sorted(DedupIndex.probePairs(spark, idx, batch, "doc_id", "text"))
      == sorted(DedupIndex.probePairs(spark, refIdx, batch, "doc_id", "text")))
  }

  test("two writers INSIDE the commit window: the lock holder wins, the " +
    "racer cannot acquire and aborts without touching committed state") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_didx_lockrace").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 8),
      "doc_id", "text", spec, idx)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
    val before = sorted(
      DedupIndex.probePairs(spark, idx, batch, "doc_id", "text"))
    val removeIds = docs.filter(pmod(col("doc_id"), lit(10)).between(6, 7))
      .select("doc_id")
    // the racer interleaves INSIDE the outer writer's held lock — the
    // exact millisecond window round 14's check-then-rename CAS left open
    // (both writers pass the generation check; the second installs a
    // generation built from stale data and the first's remove() silently
    // un-happens). With the lock, the racer's own commit attempt fails
    // to acquire; the outer remove() proceeds untouched.
    var racerEx: Throwable = null
    graft.operators.IndexCommit.testInsideLock = () => {
      graft.operators.IndexCommit.testInsideLock = () => ()
      racerEx = intercept[java.util.ConcurrentModificationException] {
        DedupIndex.compact(spark, idx)
      }
    }
    graft.operators.IndexCommit.testLockWaitMs = Some(600L) // fast loud-abort
    try DedupIndex.remove(spark, idx, removeIds, "doc_id") // must WIN
    finally {
      graft.operators.IndexCommit.testInsideLock = () => ()
      graft.operators.IndexCommit.testLockWaitMs = None
    }
    assert(racerEx != null &&
      racerEx.getMessage.contains("commit lock"), s"$racerEx")
    assert(DedupIndex.liveGeneration(spark, idx) == 1,
      "exactly one writer must have committed")
    // the remove genuinely landed (the lost-update the lock exists to kill)
    assert(DedupIndex.bandsRelation(spark, idx)
      .filter(pmod(col("doc_id"), lit(10)).between(6, 7)).count() == 0)
    assert(sorted(DedupIndex.probePairs(spark, idx, batch, "doc_id", "text"))
      == sorted(Dedup.incrementalMinhashPairs(
        batch, docs.filter(pmod(col("doc_id"), lit(10)) < 6),
        "doc_id", "text", numHashes = 16, bands = 4, minEst = 0.5)))
    assert(before != sorted(DedupIndex.probePairs(spark, idx, batch,
      "doc_id", "text")), "fixture must make the remove observable")
  }

  test("a maintenance writer whose lease was broken mid-commit aborts at " +
    "the FENCE before touching the pointer or the new writer's dirs " +
    "(the >TTL-pause theft scenario)") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_didx_fence").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 8),
      "doc_id", "text", spec, idx)
    val f = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(s"$idx/_commit_lock")
    // the holder stalls right after acquisition; past the TTL a breaker
    // reaps its lock and a new writer acquires (simulated directly)
    graft.operators.IndexCommit.testInsideLock = () => {
      graft.operators.IndexCommit.testInsideLock = () => ()
      f.delete(lock, false)
      val out = f.create(lock, false)
      out.write("usurper token=feedface ts=0".getBytes("UTF-8")); out.close()
    }
    try {
      val e = intercept[java.util.ConcurrentModificationException] {
        DedupIndex.compact(spark, idx)
      }
      assert(e.getMessage.contains("commit fence"), e.getMessage)
    } finally graft.operators.IndexCommit.testInsideLock = () => ()
    assert(DedupIndex.liveGeneration(spark, idx) == 0,
      "the fenced writer must not have flipped the pointer")
    assert(f.exists(lock), "the victim's release must leave the new " +
      "holder's lock in place")
    f.delete(lock, false)
    // the index is healthy: the fenced attempt's orphans are overwritten
    // by the next rewrite, exactly like a crash before the flip
    DedupIndex.compact(spark, idx)
    assert(DedupIndex.liveGeneration(spark, idx) == 1)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
    assert(sorted(DedupIndex.probePairs(spark, idx, batch, "doc_id", "text"))
      == sorted(Dedup.incrementalMinhashPairs(
        batch, docs.filter(pmod(col("doc_id"), lit(10)) < 8),
        "doc_id", "text", numHashes = 16, bands = 4, minEst = 0.5)))
  }

  test("dual concurrent appends compose: interleaved appends are " +
    "probe-identical to sequential appends (additive files, no clobber)") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_didx_dualapp").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 4),
      "doc_id", "text", spec, idx)
    val sliceA = docs.filter(pmod(col("doc_id"), lit(10)).between(4, 5))
    val sliceB = docs.filter(pmod(col("doc_id"), lit(10)).between(6, 7))
    // append B runs to completion while append A is mid-flight (data
    // written, intent still live): two gates on one shared index
    DedupIndex.testAfterAppendWrite = () => {
      DedupIndex.testAfterAppendWrite = () => ()
      DedupIndex.append(sliceB, "doc_id", "text", idx)
    }
    try DedupIndex.append(sliceA, "doc_id", "text", idx)
    finally DedupIndex.testAfterAppendWrite = () => ()
    val refIdx = java.nio.file.Files
      .createTempDirectory("graft_didx_dualapp_ref").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 8),
      "doc_id", "text", spec, refIdx)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
    assert(sorted(DedupIndex.probePairs(spark, idx, batch, "doc_id", "text"))
      == sorted(DedupIndex.probePairs(spark, refIdx, batch, "doc_id", "text")))
    // no leftover protocol files: both markers were... NOT yet cleared (a
    // rewrite clears them); but both INTENTS must be gone
    val f = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.listStatus(new org.apache.hadoop.fs.Path(idx))
      .exists(_.getPath.getName.startsWith("_append_intent_")),
      "completed appends must not leave intents")
    // and maintenance over the dual-appended index works and keeps rows
    DedupIndex.compact(spark, idx)
    assert(sorted(DedupIndex.probePairs(spark, idx, batch, "doc_id", "text"))
      == sorted(DedupIndex.probePairs(spark, refIdx, batch, "doc_id", "text")))
  }

  test("cross-session append freshness: a probe sees rows another SESSION " +
    "appended (the cached relation refreshes when the data dirs change)") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_didx_xsession").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 6),
      "doc_id", "text", spec, idx)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
    // warm THIS session's relation cache with a probe
    val before = sorted(
      DedupIndex.probePairs(spark, idx, batch, "doc_id", "text"))
    assert(before.nonEmpty)
    // ANOTHER session appends: newSession shares the external catalog but
    // has its OWN relation cache, so its write invalidates nothing here —
    // without the mtime freshness probe this session's next probe would
    // silently miss the appended rows (an incomplete dedup probe admits
    // near-dups, the gate's worst failure mode)
    val other = spark.newSession()
    DedupIndex.append(
      graft.Tables.load(other, dir, "documents")
        .select(col("doc_id"), col("text"))
        .filter(pmod(col("doc_id"), lit(10)).between(6, 7)),
      "doc_id", "text", idx)
    val after = sorted(
      DedupIndex.probePairs(spark, idx, batch, "doc_id", "text"))
    assert(after == sorted(Dedup.incrementalMinhashPairs(
      batch, docs.filter(pmod(col("doc_id"), lit(10)) < 8),
      "doc_id", "text", numHashes = 16, bands = 4, minEst = 0.5)),
      "probe in the original session missed the other session's append")
    assert(after != before, "fixture must make the append observable")
  }

  test("TWO live sessions in one JVM each track freshness independently " +
    "(the cache is keyed by session identity, not a collidable hash, and " +
    "one session's probe cannot mask the other's staleness)") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_didx_twosess").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 6),
      "doc_id", "text", spec, idx)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    def probe(s: org.apache.spark.sql.SparkSession) =
      DedupIndex.probePairs(s, idx,
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text"))
          .filter(pmod(col("doc_id"), lit(10)) >= 8),
        "doc_id", "text").orderBy("new_id", "index_id").collect().toSeq
    // warm BOTH sessions' relation caches (and freshness entries)
    val b1 = probe(s1); val b2 = probe(s2)
    assert(b1 == b2 && b1.nonEmpty)
    // a third session appends; then s1 probes FIRST (refreshing its own
    // cache) — with the round-15 identity-hash keying, a key collision
    // between s1 and s2 would let s1's refresh mask s2's staleness and
    // s2 would silently under-probe
    DedupIndex.append(
      graft.Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
        .filter(pmod(col("doc_id"), lit(10)).between(6, 7)),
      "doc_id", "text", idx)
    val expected = sorted(Dedup.incrementalMinhashPairs(
      batch, docs.filter(pmod(col("doc_id"), lit(10)) < 8),
      "doc_id", "text", numHashes = 16, bands = 4, minEst = 0.5))
    assert(probe(s1) == expected, "s1 missed the append")
    assert(probe(s2) == expected, "s2 missed the append (masked staleness)")
  }

  test("a crashed commit-lock holder's lock self-expires (TTL break); a " +
    "LIVE holder's lock is respected") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_didx_lockttl").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 6),
      "doc_id", "text", spec, idx)
    val f = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a holder that died mid-commit: lock file with an ancient mtime —
    // maintenance must break it (with a warning) and proceed, or the
    // index is wedged forever
    val lock = new org.apache.hadoop.fs.Path(s"$idx/_commit_lock")
    f.create(lock, true).close()
    f.setTimes(lock, System.currentTimeMillis() - 60L * 60 * 1000, -1)
    DedupIndex.compact(spark, idx)
    assert(DedupIndex.liveGeneration(spark, idx) == 1,
      "a stale lock must not wedge maintenance")
    assert(!f.exists(lock), "the commit released (and replaced) the lock")
    // a LIVE lock (fresh mtime, holder presumed mid-flip) blocks: the
    // contender waits out its budget then aborts loudly without touching
    // state (budget shrunk for the spec; production default is 10 s)
    f.create(lock, true).close()
    graft.operators.IndexCommit.testLockWaitMs = Some(600L)
    try {
      val e = intercept[java.util.ConcurrentModificationException] {
        DedupIndex.compact(spark, idx)
      }
      assert(e.getMessage.contains("commit lock"), e.getMessage)
      assert(DedupIndex.liveGeneration(spark, idx) == 1)
    } finally {
      graft.operators.IndexCommit.testLockWaitMs = None
      f.delete(lock, false); ()
    }
    // with the lock released, maintenance proceeds
    DedupIndex.compact(spark, idx)
    assert(DedupIndex.liveGeneration(spark, idx) == 2)
  }

  test("a crashed appender's stale intent is reaped (maintenance is not " +
    "wedged forever); expireGenerations surfaces failed reclamations") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_didx_stale").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 6),
      "doc_id", "text", spec, idx)
    val f = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crashed appender: an intent file whose mtime is ancient
    val orphan = new org.apache.hadoop.fs.Path(s"$idx/_append_intent_deadbeef")
    f.create(orphan, true).close()
    f.setTimes(orphan, System.currentTimeMillis() - 60L * 60 * 1000, -1)
    DedupIndex.compact(spark, idx) // must not abort on the dead intent
    assert(DedupIndex.liveGeneration(spark, idx) == 1)
    assert(!f.exists(orphan), "the stale intent must have been reaped")

    // GC failure surfacing: an injected undeletable generation dir is
    // returned in `failed` (and logged), never thrown — and the next
    // expiry retries it
    graft.operators.IndexCommit.testFailDelete =
      d => d.split("/").last.startsWith("bands")
    try {
      DedupIndex.compact(spark, idx) // gen 1 -> 2; retention keeps g1
      val gc = DedupIndex.expireGenerations(spark, idx)
      assert(gc.failed.exists(_.contains("bands")), gc.toString)
      assert(gc.reclaimed.exists(_.contains("sigs")), gc.toString)
    } finally graft.operators.IndexCommit.testFailDelete = _ => false
    val gc2 = DedupIndex.expireGenerations(spark, idx)
    assert(gc2.failed.isEmpty, gc2.toString)
    assert(DedupIndex.generationsOnDisk(spark, idx) == Seq(2))
  }

  test("rebuild over an existing index stages into generation N+1 (never " +
    "overwrites the live dirs); a bound reader survives the rebuild") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_didx_rebuild").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 4),
      "doc_id", "text", spec, idx)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
    val boundReader = DedupIndex.bandsRelation(spark, idx)
    boundReader.queryExecution.executedPlan // plan against gen 0 files
    val gen0Rows = boundReader.count()

    // rebuild with a WIDER corpus and a different bucket count — spec and
    // data must swap together at the meta flip
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 8),
      "doc_id", "text", spec.copy(buckets = 8), idx)
    assert(DedupIndex.liveGeneration(spark, idx) == 1,
      "a rebuild must advance the generation, not restart the lineage")
    assert(DedupIndex.loadSpec(spark, idx).buckets == 8)
    // the pre-rebuild reader's gen-0 files were never touched
    assert(boundReader.count() == gen0Rows,
      "rebuild must not overwrite the live generation in place")
    assert(sorted(DedupIndex.probePairs(spark, idx, batch, "doc_id", "text"))
      == sorted(Dedup.incrementalMinhashPairs(
        batch, docs.filter(pmod(col("doc_id"), lit(10)) < 8),
        "doc_id", "text", numHashes = 16, bands = 4, minEst = 0.5)))
  }

  test("describeIndex: one-row operability surface with spec, generation, " +
    "rows, files and the deferred-maintenance flag") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_didx_desc").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 6),
      "doc_id", "text", spec, idx)
    DedupIndex.append(docs.filter(pmod(col("doc_id"), lit(10)).between(6, 7)),
      "doc_id", "text", idx)
    DedupIndex.compact(spark, idx)
    val d = DedupIndex.describeIndex(spark, idx).collect().head
    assert(d.getAs[Int]("num_hashes") == 16 && d.getAs[Int]("bands") == 4 &&
      d.getAs[Int]("buckets") == 4)
    assert(d.getAs[Int]("live_generation") == 1 &&
      d.getAs[Int]("n_generations") == 2 &&
      d.getAs[String]("generations_on_disk") == "0,1")
    val sigRows = DedupIndex.sigsRelation(spark, idx).count()
    assert(d.getAs[Long]("sig_rows") == sigRows && sigRows > 0)
    assert(d.getAs[Long]("band_rows") == sigRows * spec.bands)
    assert(d.getAs[Int]("max_files_per_bucket") == 1, "just compacted")
    assert(d.getAs[Long]("band_bytes") > 0 && d.getAs[Long]("sig_bytes") > 0)
    assert(!d.getAs[Boolean]("maintenance_due"))
    DedupIndex.signalMaintenanceDue(spark, idx)
    assert(DedupIndex.describeIndex(spark, idx)
      .collect().head.getAs[Boolean]("maintenance_due"))
    DedupIndex.compact(spark, idx) // a successful flip clears the signal
    assert(!DedupIndex.maintenanceDue(spark, idx))
  }

  test("describeIndex is O(metadata): ZERO Spark jobs — row counts come " +
    "from parquet footers, not scans (round-15: describe cost grew with " +
    "the index)") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_didx_desc0").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 6),
      "doc_id", "text", spec, idx)
    // register the tables once so describe's ensureRegistered is a no-op
    // catalog check, then count jobs across the describe call itself
    DedupIndex.describeIndex(spark, idx).collect()
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val d = DedupIndex.describeIndex(spark, idx) // eager row counts inside
      Thread.sleep(500) // drain the async listener bus
      assert(jobs == 0,
        s"describeIndex must launch no Spark job, saw $jobs")
      // and the footer-derived integers match a real scan's count
      val r = d.collect().head
      assert(r.getAs[Long]("sig_rows") ==
        DedupIndex.sigsRelation(spark, idx).count())
      assert(r.getAs[Long]("band_rows") ==
        DedupIndex.bandsRelation(spark, idx).count())
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("a reader bound to the superseded generation survives the flip " +
    "(retention window), and time-travel reproduces the old probe") {
    val idx = java.nio.file.Files.createTempDirectory("graft_didx_tt").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 6),
      "doc_id", "text", spec, idx)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
    val preMaint = sorted(
      DedupIndex.probePairs(spark, idx, batch, "doc_id", "text"))
    assert(preMaint.nonEmpty)

    // bind a reader's PLAN to generation 0 (planning resolves the file
    // listing), then flip underneath it
    val boundReader = DedupIndex.bandsRelation(spark, idx)
    boundReader.queryExecution.executedPlan // force planning against gen 0
    val gen0Rows = DedupIndex.bandsRelationAt(spark, idx, 0).count()

    DedupIndex.remove(spark, idx,
      docs.filter(pmod(col("doc_id"), lit(10)).between(4, 5))
        .select("doc_id"), "doc_id")
    assert(DedupIndex.liveGeneration(spark, idx) == 1)
    // the pre-flip reader still scans: its generation-0 files are retained
    assert(boundReader.count() == gen0Rows,
      "reader bound to the superseded generation lost its files mid-query")

    // appends land in the LIVE generation only — the superseded one is
    // immutable, so the time-travel read reproduces the pre-maintenance
    // probe exactly even after the index moves on
    DedupIndex.append(docs.filter(pmod(col("doc_id"), lit(10)).between(6, 7)),
      "doc_id", "text", idx)
    assert(sorted(DedupIndex.probePairsAt(spark, idx, gen = 0, batch,
      "doc_id", "text")) == preMaint,
      "time-travel probe of generation 0 diverged from the pre-maintenance probe")
    // and the LIVE probe reflects the remove + append (≠ the snapshot's
    // corpus), so the two surfaces are genuinely distinct
    assert(sorted(DedupIndex.probePairs(spark, idx, batch,
      "doc_id", "text")) == sorted(Dedup.incrementalMinhashPairs(
      batch, docs.filter(pmod(col("doc_id"), lit(10)) < 4)
        .unionByName(docs.filter(pmod(col("doc_id"), lit(10)).between(6, 7))),
      "doc_id", "text", numHashes = 16, bands = 4, minEst = 0.5)))

    // an expired generation refuses loudly, naming what is on disk
    DedupIndex.expireGenerations(spark, idx)
    val e = intercept[IllegalArgumentException] {
      DedupIndex.probePairsAt(spark, idx, gen = 0, batch, "doc_id", "text")
    }
    assert(e.getMessage.contains("no generation 0"), e.getMessage)
    // the error must NAME the retention knob — an operator whose audit hit
    // a reclaimed generation needs to know what to raise, not just that
    // the files are gone
    assert(e.getMessage.contains("retainGenerations"), e.getMessage)
  }

  test("crashed meta commit is detected loudly, never read as 'no index'") {
    val idx = java.nio.file.Files.createTempDirectory("graft_didx_crash").toString
    DedupIndex.build(docs.limit(60), "doc_id", "text", spec, idx)
    DedupIndex.compact(spark, idx)
    // simulate a crash between the two commit renames: meta moved aside,
    // replacement never landed
    val p = new org.apache.hadoop.fs.Path(s"$idx/meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(p, new org.apache.hadoop.fs.Path(s"$idx/meta_old")))
    val e = intercept[IllegalStateException] {
      DedupIndex.exists(spark, idx)
    }
    assert(e.getMessage.contains("crashed meta commit"), e.getMessage)
    // the documented recovery (rename meta_old back) restores the index
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$idx/meta_old"), p))
    assert(DedupIndex.exists(spark, idx))
    assert(DedupIndex.liveGeneration(spark, idx) == 1)
  }

  test("remove-all leaves a working empty index: maintenance and probes " +
    "keep working, a fresh session can still register it") {
    val idx = java.nio.file.Files.createTempDirectory("graft_didx_empty").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 6),
      "doc_id", "text", spec, idx)
    DedupIndex.remove(spark, idx, docs.select("doc_id"), "doc_id")
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
    assert(DedupIndex.probePairs(spark, idx, batch, "doc_id", "text")
      .count() == 0)
    // compact over the emptied index must not throw (round-13 advisory:
    // the generation dir exists but holds no parquet files)
    DedupIndex.compact(spark, idx)
    assert(DedupIndex.liveGeneration(spark, idx) == 2)
    // a NEW session registering the empty index must not choke on schema
    // inference (fixed DDL, never inferred from files)
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_dedup_idx_"))
      .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
    assert(DedupIndex.probePairs(spark, idx, batch, "doc_id", "text")
      .count() == 0)
    // and the index is still APPENDABLE after being emptied
    DedupIndex.append(docs.filter(pmod(col("doc_id"), lit(10)) < 6),
      "doc_id", "text", idx)
    assert(DedupIndex.probePairs(spark, idx, batch, "doc_id", "text")
      .count() > 0)
  }

  test("probe join keeps the index side shuffle-free (bucketed scan, " +
    "no Exchange above it)") {
    val idx = java.nio.file.Files.createTempDirectory("graft_didx4").toString
    DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 8),
      "doc_id", "text", spec, idx)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
    // force a non-broadcast plan so the bucketing (not a broadcast) is
    // what makes the index side exchange-free — at real scale the index
    // side is the big side and broadcast is off the table anyway. AQE off
    // so executedPlan is the real tree (collect doesn't descend into an
    // AdaptiveSparkPlan wrapper); the static exchanges are identical.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val probed =
        DedupIndex.probePairs(spark, idx, batch, "doc_id", "text")
      val plan = probed.queryExecution.executedPlan
      def isIndexScan(
          s: org.apache.spark.sql.execution.FileSourceScanExec): Boolean =
        s.tableIdentifier.exists(_.table.startsWith("graft_dedup_idx_"))
      // every bands/sigs file scan must reach its FIRST join without
      // passing through a ShuffleExchange (the bucket layout IS the
      // partitioning); exchanges further up the pipeline are fine
      import org.apache.spark.sql.execution.SparkPlan
      def scanPaths(p: SparkPlan,
                    acc: List[SparkPlan]): Seq[List[SparkPlan]] = p match {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if isIndexScan(s) => Seq(acc)
        case other => other.children.flatMap(c => scanPaths(c, other :: acc))
      }
      val found = scanPaths(plan, Nil)
      assert(found.size == 2, s"expected 2 index scans:\n$plan")
      found.foreach { pathUp =>
        val toFirstJoin = pathUp.takeWhile(
          !_.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec])
        assert(!toFirstJoin.exists(
          _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
          s"index scan shuffled before its join:\n$plan")
      }
      val bucketedScans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if isIndexScan(s) &&
              s.metadata.get("Bucketed").contains("true") => s
      }
      assert(bucketedScans.size == 2, s"expected 2 bucketed index scans:\n$plan")
      assert(probed.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("leakfree-split pair derivation: the band-relation SELF-join " +
    "consumes the bucket layout on BOTH sides (no Exchange under the join)") {
    val idx = java.nio.file.Files.createTempDirectory("graft_didx6").toString
    DedupIndex.build(docs, "doc_id", "text", spec, idx)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // the pipe_leakfree_split candidate shape: corpus-wide pairs as a
      // self-join of the persisted band relation on its bucket key
      val bands = DedupIndex.bandsRelation(spark, idx)
      val cand = bands.select(col("bk"), col("doc_id").as("id1"))
        .join(bands.select(col("bk"), col("doc_id").as("id2")), "bk")
        .filter(col("id1") < col("id2"))
        .select("id1", "id2").distinct()
      val plan = cand.queryExecution.executedPlan
      import org.apache.spark.sql.execution.SparkPlan
      def isIndexScan(
          s: org.apache.spark.sql.execution.FileSourceScanExec): Boolean =
        s.tableIdentifier.exists(_.table.startsWith("graft_dedup_idx_"))
      def scanPaths(p: SparkPlan,
                    acc: List[SparkPlan]): Seq[List[SparkPlan]] = p match {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if isIndexScan(s) => Seq(acc)
        case other => other.children.flatMap(c => scanPaths(c, other :: acc))
      }
      val found = scanPaths(plan, Nil)
      assert(found.size == 2, s"expected both self-join sides to be index " +
        s"scans:\n$plan")
      found.foreach { pathUp =>
        val toJoin = pathUp.takeWhile(
          !_.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec])
        assert(!toJoin.exists(
          _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
          s"a self-join side shuffled before the join — the bucket layout " +
            s"was not consumed:\n$plan")
      }
      assert(cand.count() > 0, "fixture must produce candidate pairs")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("a rewrite slower than the index's horizon ABORTS loudly and " +
    "discards its staging; RAISING the persisted horizon (setStaleHorizon " +
    "— the 100 TB maintenance knob) unblocks the same rewrite") {
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.setLong(graft.operators.IndexCommit.HorizonConfKey, 1500L)
    val idx = try {
      val d = java.nio.file.Files
        .createTempDirectory("graft_didx_horizon").toString
      // built under a deliberately TINY agreed horizon (1.5 s)
      DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 8),
        "doc_id", "text", spec, d)
      d
    } finally hconf.unset(graft.operators.IndexCommit.HorizonConfKey)
    assert(DedupIndex.staleHorizonMs(spark, idx) == 1500L)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
    val before = sorted(
      DedupIndex.probePairs(spark, idx, batch, "doc_id", "text", 0.5))
    // a staged write longer than the horizon: beyond it the rewrite can
    // no longer trust its marker diff (an unseen marker may have been
    // age-reaped) — it must abort BEFORE the flip, never flip blind
    DedupIndex.testBeforeCommit = () => Thread.sleep(2200L)
    try {
      val e = intercept[java.util.ConcurrentModificationException] {
        DedupIndex.compact(spark, idx)
      }
      assert(e.getMessage.contains("marker horizon"), e.getMessage)
      assert(e.getMessage.contains("setStaleHorizon"), e.getMessage)
    } finally DedupIndex.testBeforeCommit = () => ()
    assert(DedupIndex.liveGeneration(spark, idx) == 0,
      "the slow rewrite must be discarded, not committed")
    // the knob: raise the agreed horizon (persisted — every session's
    // reaping and TTLs follow), and the SAME slow rewrite commits
    DedupIndex.setStaleHorizon(spark, idx, 120000L)
    DedupIndex.testBeforeCommit = () => Thread.sleep(2200L)
    try DedupIndex.compact(spark, idx)
    finally DedupIndex.testBeforeCommit = () => ()
    assert(DedupIndex.liveGeneration(spark, idx) == 1)
    assert(sorted(DedupIndex.probePairs(spark, idx, batch,
      "doc_id", "text", 0.5)) == before,
      "the unblocked rewrite must be layout-only")
  }

  test("a horizon raise MID-REWRITE does not relax the in-flight " +
    "rewrite's guard: it aborts at the horizon captured at its marker " +
    "listing (conservative), and only the NEXT rewrite rides the raise") {
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.setLong(graft.operators.IndexCommit.HorizonConfKey, 1500L)
    val idx = try {
      val d = java.nio.file.Files
        .createTempDirectory("graft_didx_midraise").toString
      DedupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) < 8),
        "doc_id", "text", spec, d)
      d
    } finally hconf.unset(graft.operators.IndexCommit.HorizonConfKey)
    // the raise lands AFTER this rewrite listed markers under 1500 ms —
    // its marker-diff trust is bounded by what reapers COULD have done
    // under the old horizon, so the guard must hold at 1500, not 60000
    DedupIndex.testBeforeCommit = () => {
      DedupIndex.testBeforeCommit = () => ()
      DedupIndex.setStaleHorizon(spark, idx, 60000L)
      Thread.sleep(2200L)
    }
    try {
      val e = intercept[java.util.ConcurrentModificationException] {
        DedupIndex.compact(spark, idx)
      }
      assert(e.getMessage.contains("1500-ms"), e.getMessage)
    } finally DedupIndex.testBeforeCommit = () => ()
    assert(DedupIndex.liveGeneration(spark, idx) == 0)
    // the retry captures the raised horizon at ITS listing and commits
    DedupIndex.testBeforeCommit = () => Thread.sleep(2200L)
    try DedupIndex.compact(spark, idx)
    finally DedupIndex.testBeforeCommit = () => ()
    assert(DedupIndex.liveGeneration(spark, idx) == 1)
  }
}
