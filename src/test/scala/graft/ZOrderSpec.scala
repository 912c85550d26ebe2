package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.ZOrder

/** Z-order layout: (1) the interleave is the textbook Morton code, (2) the
  * re-layout is content-identical, and (3) — the point of the operator —
  * parquet file stats under the z-layout PRUNE on the second dimension,
  * where a single-key sort layout cannot. */
class ZOrderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.01"
  private def events = Tables.load(spark, dir, "events")

  /** reference Morton implementation, bit by bit */
  private def morton(ranks: Seq[Long], bits: Int): Long = {
    var z = 0L
    val n = ranks.length
    for (i <- ranks.indices; b <- 0 until bits)
      z |= (((ranks(i) >>> b) & 1L) << (b * n + i))
    z
  }

  test("interleave == textbook Morton code") {
    import spark.implicits._
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (4095L, 0L),
      (4095L, 4095L), (123L, 321L), (2048L, 17L))
    val got = cases.toDF("a", "b")
      .select(ZOrder.interleave(Seq(col("a"), col("b")), 12).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == cases.map { case (a, b) => morton(Seq(a, b), 12) })
    // three dimensions too
    val got3 = Seq((7L, 1L, 5L)).toDF("a", "b", "c")
      .select(ZOrder.interleave(Seq(col("a"), col("b"), col("c")), 8).as("z"))
      .head().getLong(0)
    assert(got3 == morton(Seq(7L, 1L, 5L), 8))
    intercept[IllegalArgumentException] {
      ZOrder.interleave(Seq(col("a"), col("b")), 32) // 64 bits > 63
    }
  }

  test("cluster() is content-identical: layout moves, rows don't") {
    val out = java.nio.file.Files.createTempDirectory("graft_z_id").toString
    ZOrder.cluster(events, Seq("user_id", "event_id"), partitions = 8)
      .write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == events.count())
    val a = back.agg(sum("event_id"), sum("user_id"),
      sum(crc32(col("event_type")))).head()
    val e = events.agg(sum("event_id"), sum("user_id"),
      sum(crc32(col("event_type")))).head()
    assert(a == e)
    assert(back.schema == events.schema) // no helper column leaks
  }

  test("the skipping win: a user_id predicate prunes most z-layout files " +
    "and NO files of the event_id-sorted layout") {
    val zDir = java.nio.file.Files.createTempDirectory("graft_z_z").toString
    val sDir = java.nio.file.Files.createTempDirectory("graft_z_s").toString
    val nFiles = 16
    ZOrder.cluster(events, Seq("user_id", "event_id"), partitions = nFiles)
      .write.mode("overwrite").parquet(zDir)
    // the single-key layout every log naturally has: sorted by event id
    events.repartitionByRange(nFiles, col("event_id"))
      .sortWithinPartitions("event_id")
      .write.mode("overwrite").parquet(sDir)

    val (lo, hi) = (10L, 19L) // user_id ∈ [10, 19] — 1/15 of the key space
    val (zHit, _) = ZOrder.overlappingFiles(zDir, "user_id", lo, hi)
    val (sHit, _) = ZOrder.overlappingFiles(sDir, "user_id", lo, hi)
    // sorted-by-event_id: user ids span every file — zero skipping
    assert(sHit == nFiles, s"sorted layout: $sHit/$nFiles files overlap")
    // z-layout: the curve confines the range to a fraction of the files
    assert(zHit <= nFiles / 2,
      s"z-layout should prune: $zHit/$nFiles files overlap user_id [$lo,$hi]")

    // and the pruned layout returns the same answer
    val zAns = spark.read.parquet(zDir)
      .filter(col("user_id").between(lo, hi))
      .agg(count(lit(1)), sum("event_id")).head()
    val raw = events.filter(col("user_id").between(lo, hi))
      .agg(count(lit(1)), sum("event_id")).head()
    assert(zAns == raw)
  }

  test("string dimensions cluster by hash rank: few distinct values per " +
    "file, where the time-sorted layout mixes all of them everywhere") {
    val zDir = java.nio.file.Files.createTempDirectory("graft_z_str").toString
    // 32 files → the range split consumes ~5 top z-bits, of which 2 are
    // event_type hash bits (interleaving alternates dimensions — each
    // dimension gets ~half the resolution, that's the trade)
    ZOrder.cluster(events, Seq("event_type", "ts"), partitions = 32)
      .write.mode("overwrite").parquet(zDir)
    val perFile = new java.io.File(zDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).toSeq
      .map(f => spark.read.parquet(f.getPath)
        .select("event_type").distinct().count())
    // 5 event types: the hash bits confine each file to its hash group
    // (± straddle at the sampled range boundaries) — no file sees all 5,
    // and the average is under half of them; the ts-sorted layout puts
    // all 5 types in EVERY file
    assert(perFile.nonEmpty && perFile.max < 5 &&
      perFile.sum.toDouble / perFile.size < 2.5,
      s"distinct event_types per z-file: $perFile")
  }

  test("orderedStrings = true: string ranks preserve lexicographic order, " +
    "so plain min/max stats prune string predicates too") {
    val zDir = java.nio.file.Files.createTempDirectory("graft_z_ord").toString
    ZOrder.cluster(events, Seq("event_type", "event_id"), partitions = 32,
        orderedStrings = true)
      .write.mode("overwrite").parquet(zDir)
    // per-file lexicographic [min,max] of the string dimension
    val bounds = new java.io.File(zDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).toSeq
      .map { f =>
        val r = spark.read.parquet(f.getPath)
          .agg(min("event_type"), max("event_type")).head()
        (r.getString(0), r.getString(1))
      }
    // an equality predicate on one of the 5 types overlaps only the files
    // whose lex range straddles it — most files prune
    val hit = bounds.count { case (mn, mx) =>
      mn <= "purchase" && "purchase" <= mx }
    assert(hit <= bounds.size / 2,
      s"ordered ranks should prune: $hit/${bounds.size} files overlap")
    // content identity and schema-order preservation survive the
    // broadcast rank join
    val back = spark.read.parquet(zDir)
    assert(back.schema == events.schema)
    assert(back.count() == events.count())
  }

  test("cluster refuses an input that already has a __z helper column") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "__z")
    val e = intercept[IllegalArgumentException] {
      ZOrder.cluster(df, Seq("a"), partitions = 2)
    }
    assert(e.getMessage.contains("__z"), e.getMessage)
  }
}
