package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.functions.{GramMoments, Similarity, TextFunctions}

/** The round-10 map-side folds (WinnowFpFold, CdcChunkFold, GramMoments)
  * replace explode + doc-partitioned-window / pair-explode + hash-agg
  * plans. Contract: IDENTICAL results to the formulations they replaced —
  * proven here by running BOTH forms over the real sf0.001 tables (which
  * include short/edge-length docs) and comparing row sets exactly.
  */
class TextFoldEquivalenceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docs = Tables.load(spark, sfDir, "documents")
    .select(col("doc_id"), col("text"))

  test("WinnowFpFold == explode + window-min + distinct formulation") {
    val k = 4; val w = 5
    val fold = docs
      .select(col("doc_id"),
        explode(TextFunctions.winnowFingerprints(
          split(col("text"), " "), k, w)).as("minh"))
    val exploded = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= k)
      .select(col("doc_id"), col("t"),
        explode(expr(s"sequence(1, size(t) - ${k - 1})")).as("i"))
      .select(col("doc_id"), col("i"),
        Similarity.hash60(concat_ws(" ",
          (0 until k).map(j => element_at(col("t"), col("i") + j)): _*))
          .as("h"))
      .withColumn("minh", min("h").over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("i").rowsBetween(-(w - 1), 0)))
      .filter(col("i") >= w)
      .select(col("doc_id"), col("minh")).distinct()
    assert(fold.exceptAll(exploded).isEmpty && exploded.exceptAll(fold).isEmpty)
    // fold emits distinct ascending — no duplicate (doc_id, minh)
    assert(fold.count() == fold.distinct().count())
  }

  test("CdcChunkFold == explode + running-boundary windows + slice formulation") {
    val k = 4; val div = 16
    val fold = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= k)
      .select(col("doc_id"),
        posexplode(TextFunctions.cdcChunks(col("t"), k, div))
          .as(Seq("cid", "ctext")))
      .select(col("doc_id"), col("cid").cast("long").as("cid"),
        md5(col("ctext")).as("cmd5"))
    val base = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= k)
    val pos = base
      .select(col("doc_id"), col("t"),
        explode(expr(s"sequence(1, size(t) - ${k - 1})")).as("i"))
      .select(col("doc_id"), col("i"),
        Similarity.hash60(concat_ws(" ",
          (0 until k).map(j => element_at(col("t"), col("i") + j)): _*))
          .as("h"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("i")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val windowed = pos
      .withColumn("b", when(pmod(col("h"), lit(div)) === 0, 1L).otherwise(0L))
      .withColumn("cid", sum("b").over(win) - col("b"))
      .groupBy("doc_id", "cid")
      .agg(min("i").as("first"), max("i").as("last"))
      .join(base, "doc_id")
      .select(col("doc_id"), col("cid"),
        md5(concat_ws(" ",
          slice(col("t"), col("first"), col("last") - col("first") + k)))
          .as("cmd5"))
    assert(fold.exceptAll(windowed).isEmpty && windowed.exceptAll(fold).isEmpty)
  }

  test("GramMoments == pair-explode + hash-agg formulation, bit-identical sums") {
    val e = Tables.load(spark, sfDir, "embeddings").select(col("embedding"))
    val g = e.agg(GramMoments.moments(col("embedding")).as("g"))
      .select(explode(col("g")).as("v"))
      .collect().map(_.getLong(0))
    assert(g.length == GramMoments.BufLen)
    val ds = e.select(posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy("d")
      .agg(sum(round(col("x").cast("double") * 1e8, 0).cast("long")).as("sx"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    ds.foreach { case (d, sx) => assert(g(d) == sx, s"dim sum $d") }
    val sp = e
      .select(col("embedding"), posexplode(col("embedding")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"), col("embedding"),
        explode(expr("sequence(i, 63)")).as("j"))
      .select(col("i"), col("j"),
        round(col("xi").cast("double") *
          element_at(col("embedding"), col("j") + 1).cast("double") * 1e8, 0)
          .cast("long").as("p"))
      .groupBy("i", "j").agg(sum("p").as("sxy"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    for (i <- 0 until GramMoments.Dim; j <- i until GramMoments.Dim) {
      val off = GramMoments.Dim + i * (2 * GramMoments.Dim + 1 - i) / 2 + (j - i)
      assert(g(off) == sp((i, j)), s"pair sum ($i,$j)")
    }
  }

  test("BigramFeatureCountFold == explode + md5 + hash-agg formulation") {
    val nB = 64
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("l"))
      .filter(size(col("l")) >= 2)
    val fold = toks
      .select(col("doc_id"),
        posexplode(TextFunctions.bigramFeatureCounts(col("l"), nB))
          .as(Seq("f", "c")))
      .filter(col("c") > 0)
      .select(col("doc_id"), col("f").cast("long").as("f"), col("c"))
    val exploded = toks
      .select(col("doc_id"), col("l"),
        explode(expr("sequence(1, size(l) - 1)")).as("i"))
      .select(col("doc_id"),
        pmod(Similarity.hash60(concat(element_at(col("l"), col("i")),
          lit(" "), element_at(col("l"), col("i") + 1))), lit(nB.toLong)).as("f"))
      .groupBy("doc_id", "f").agg(count(lit(1)).as("c"))
    assert(fold.exceptAll(exploded).isEmpty && exploded.exceptAll(fold).isEmpty)
  }

  test("TokenCountsFold == explode + groupBy(doc, w) formulation") {
    val fold = docs.select(col("doc_id"),
      explode(TextFunctions.tokenCounts(split(col("text"), " ")))
        .as(Seq("w", "c")))
    val grouped = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    assert(fold.exceptAll(grouped).isEmpty && grouped.exceptAll(fold).isEmpty)
  }

  test("SpanHashesFold == explode + multi-arg xxhash64 + distinct formulation") {
    for (k <- Seq(2, 16)) {
      val base = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= k)
      val fold = base.select(col("doc_id"),
        explode(TextFunctions.spanHashes(col("w"), k)).as("h"))
      val exploded = base
        .select(col("doc_id"), col("w"),
          explode(expr(s"sequence(1, size(w) - ${k - 1})")).as("i"))
        .select(col("doc_id"),
          xxhash64((0 until k).map(j =>
            element_at(col("w"), col("i") + lit(j))): _*).as("h"))
        .distinct()
      assert(fold.exceptAll(exploded).isEmpty && exploded.exceptAll(fold).isEmpty,
        s"k=$k")
    }
  }

  test("roundHalfUp == Spark round(double, 0) on boundary-adversarial values") {
    val vals = Seq(2.5, -2.5, 0.5, -0.5, 3.5, 1.0e8 - 0.5, 2.4999999,
      2.5000001, -2.4999999, -2.5000001, 0.49999999999, 1234567.5,
      -1234567.5, 0.0, -0.0, 1e-9, -1e-9, 7.499999999999999,
      0.15f.toDouble * 0.35f.toDouble * 1e8, -0.123456f.toDouble * 1e8)
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      vals.map(v => org.apache.spark.sql.Row(v)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType))))
    val sparkRounded = df.select(round(col("v"), 0).cast("long")).collect()
      .map(_.getLong(0))
    vals.zip(sparkRounded).foreach { case (v, exp) =>
      assert(GramMoments.roundHalfUp(v) == exp, s"v=$v")
    }
  }
}
