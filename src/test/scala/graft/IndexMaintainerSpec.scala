package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.{DedupIndex, IndexCommit}

/** The maintainer's EXIT SEMANTICS and machine-readable summary — the
  * cron `--once` shape is the deployment shape, and cron alerts on exit
  * codes (round-16 verdict #4: the old always-0 exit made a fleet where
  * every index was sick look healthy to its scheduler). Healthy sweeps
  * and benign lost races (the commit protocol rolled the attempt back;
  * the flag stays set and the next run retries) exit 0; a sick index
  * (crashed-commit state, unrecognized layout) exits nonzero. Every
  * sweep also prints one JSON line to stdout for wrappers that want more
  * than the exit bit. */
class IndexMaintainerSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, dir, "documents")
    .select(col("doc_id"), col("text"))
  private val spec = DedupIndex.Spec(numHashes = 16, bands = 4, buckets = 4)

  private def fsFor(d: String) = new org.apache.hadoop.fs.Path(d)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def runCapturing(dirs: Seq[String]): (Int, Seq[String]) = {
    val buf = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
      IndexMaintainer.run(spark, dirs, intervalS = 0L)
    }
    (code, buf.toString("UTF-8").linesIterator.toSeq)
  }

  test("healthy sweep exits 0 and prints one JSON summary line per dir; " +
    "a benign lost race (live append intent) also exits 0 — the flag " +
    "stays set for the next run; a sick index exits 1") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_maint_exit").toString
    val idx = s"$root/idx"
    DedupIndex.build(docs.limit(40), "doc_id", "text", spec, idx)
    DedupIndex.signalMaintenanceDue(spark, idx)

    // benign race first: a live append intent blocks the compact; the
    // protocol rolls the attempt back — retry semantics, NOT an alert
    val f = fsFor(idx)
    val token = IndexCommit.beginAppend(f, idx)
    val (benignCode, benignOut) = runCapturing(Seq(idx))
    assert(benignCode == 0, s"benign race must exit 0: $benignOut")
    val benignJson = benignOut.filter(_.startsWith("{\"dir\""))
    assert(benignJson.size == 1, benignOut.toString)
    assert(benignJson.head.contains("\"benign\":true") &&
      benignJson.head.contains("\"compacted\":false"), benignJson.head)
    assert(DedupIndex.maintenanceDue(spark, idx),
      "the flag must survive a benign loss so the next sweep retries")
    IndexCommit.abortAppend(f, idx, token)

    // healthy: the retry compacts, clears the flag, exits 0
    val (okCode, okOut) = runCapturing(Seq(idx))
    assert(okCode == 0, okOut.toString)
    val okJson = okOut.filter(_.startsWith("{\"dir\""))
    assert(okJson.head.contains("\"compacted\":true") &&
      okJson.head.contains("\"benign\":true"), okJson.toString)
    assert(!DedupIndex.maintenanceDue(spark, idx))
    assert(DedupIndex.liveGeneration(spark, idx) == 1)

    // sick index anywhere in the list: nonzero exit, and the JSON line
    // carries benign=false + the error for the wrapper
    val sick = s"$root/sick"
    val sf = fsFor(sick)
    sf.mkdirs(new org.apache.hadoop.fs.Path(s"$sick/bands_g1"))
    sf.create(new org.apache.hadoop.fs.Path(s"$sick/meta_old"), true).close()
    IndexCommit.signalMaintenanceDue(sf, sick)
    val (sickCode, sickOut) = runCapturing(Seq(sick, idx))
    assert(sickCode == 1, sickOut.toString)
    val sickJson = sickOut.filter(_.startsWith("{\"dir\""))
    assert(sickJson.size == 2, sickOut.toString)
    assert(sickJson.head.contains("\"benign\":false") &&
      sickJson.head.contains("crashed meta commit"), sickJson.head)
    // the healthy index behind the sick one was still swept (idle no-op)
    assert(sickJson(1).contains("\"benign\":true"), sickJson(1))
  }

  test("Sweep.json escapes quotes/backslashes/newlines (error messages " +
    "quote filesystem paths and exception text verbatim)") {
    val s = IndexMaintainer.Sweep("/d\\ir", "dedup", due = true,
      compacted = false, benign = false,
      Some("boom \"quoted\"\nsecond line"))
    val j = s.json
    assert(j.contains("\"error\":\"boom \\\"quoted\\\" second line\""), j)
    assert(j.contains("\"dir\":\"/d\\\\ir\""), j)
    // and it parses as one JSON object
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(j)
    assert(node.get("benign").asBoolean() == false)
    assert(node.get("kind").asText() == "dedup")
  }
}
