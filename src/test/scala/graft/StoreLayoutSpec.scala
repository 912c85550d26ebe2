package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.sources.StoreLayout

/** The store-layout marker version-gates the top-n early stop: the scan may
  * treat "first rows = lowest seqs" as true only for stores the SORTED write
  * path committed (it writes the marker). Anything else — pre-marker builds,
  * external tooling — gets the full sort above the scan, and a forged marker
  * fails the readers' monotonicity assertion loudly instead of silently
  * dropping low seqs. */
class StoreLayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def v2 = spark.read.format("nats_scan").option("dir", dir).load()
  private def store(tmp: String) = new java.io.File(s"$tmp/events.msgs")
  private def marker(tmp: String) =
    new java.io.File(store(tmp), StoreLayout.MarkerName)
  private def readBack(tmp: String) =
    spark.read.format("nats_scan").option("dir", tmp).load()
  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def writeStore(tmp: String, hiSeq: Long, mode: String): Unit =
    v2.filter(col("seq") <= hiSeq).write.format("nats_scan")
      .option("dir", tmp).mode(mode).save()

  test("sorted write commits the marker; native top-n pushes and answers the head") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout1").toString
    writeStore(tmp, 300L, "overwrite")
    assert(StoreLayout.seqSorted(store(tmp)), "commit must write the marker")
    val df = readBack(tmp).orderBy("seq").limit(5)
    assert(plan(df).contains("PushedLimit=5"), plan(df))
    assert(df.select("seq").collect().map(_.getLong(0))
      .sameElements(Array(1L, 2L, 3L, 4L, 5L)))
  }

  test("unmarked store (pre-marker build / external data): top-n declined, result right") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout2").toString
    writeStore(tmp, 300L, "overwrite")
    assert(marker(tmp).delete())
    val df = readBack(tmp).orderBy("seq").limit(5)
    assert(!plan(df).contains("PushedLimit"), plan(df))
    // full sort above the scan stands — same answer, no early stop
    assert(df.select("seq").collect().map(_.getLong(0))
      .sameElements(Array(1L, 2L, 3L, 4L, 5L)))
  }

  test("append next to unvouched files cannot claim the marker; truncate reclaims") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout3").toString
    writeStore(tmp, 300L, "overwrite")
    assert(marker(tmp).delete())
    // appending sorted files next to files nobody vouches for must not
    // declare the whole store sorted
    writeStore(tmp, 400L, "append")
    assert(!StoreLayout.seqSorted(store(tmp)),
      "append must not vouch for foreign part files")
    // truncate wipes the unvouched files: every survivor is this write's
    writeStore(tmp, 50L, "overwrite")
    assert(StoreLayout.seqSorted(store(tmp)))
    assert(readBack(tmp).count() == 50L)
  }

  test("forged marker over an unsorted part file fails loudly, never silently wrong") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout4").toString
    val st = store(tmp)
    assert(st.mkdirs())
    // an UNSORTED part file, written through the task writer directly —
    // bypassing the planner's RequiresDistributionAndOrdering sort (exactly
    // what out-of-band tooling could produce)
    val w = new graft.sources.NatsScanWriterFactory(st.getPath,
      graft.sources.NatsScanSource.envelopeSchema, "forge").createWriter(0, 0L)
    def row(seq: Long): InternalRow = InternalRow(
      UTF8String.fromString("events"),
      UTF8String.fromString(s"events.x.$seq"),
      seq, seq * 1000000L, Array[Byte](1))
    Seq(5L, 3L, 9L, 1L, 7L).foreach(s => w.write(row(s)))
    w.commit()
    StoreLayout.write(st) // the forgery: claims sorted over unsorted data
    val df = readBack(tmp).orderBy("seq").limit(2)
    assert(plan(df).contains("PushedLimit=2"), plan(df))
    val e = intercept[Exception](df.collect())
    def root(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else root(t.getCause)
    assert(root(e).getMessage.contains("seq-ascending"),
      s"expected the monotonicity assertion, got: ${root(e).getMessage}")
  }
}
