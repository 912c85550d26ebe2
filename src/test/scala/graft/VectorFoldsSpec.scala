package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.functions.Similarity

/** The native vector folds (DotFold/L2SqFold/MaxAbsFold/PqEncodeFold)
  * replace `aggregate(zip_with(...))` higher-order functions in the ANN hot
  * path. Contract: bit-identical values to the HOF formulation — same
  * sequential double fold, same null semantics — under BOTH evaluation
  * paths (whole-stage codegen and interpreted). */
class VectorFoldsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import scala.jdk.CollectionConverters._
  private def df = {
    val rows = Seq(
      (1L, Array(1.0f, 2.0f, -3.5f, 0.25f), Array(0.5f, -1.0f, 2.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f, 1.0f)),
      (3L, Array(1e-7f, -1e7f, 3.14159f, 2.71828f),
        Array(-1e-7f, 1e7f, 2.71828f, 3.14159f)))
    spark.createDataFrame(rows.map(r => org.apache.spark.sql.Row(
      r._1, r._2.toSeq, r._3.toSeq)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
  }

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def withCodegen[T](on: Boolean)(f: => T): T = {
    val k = "spark.sql.codegen.wholeStage"
    val old = spark.conf.get(k)
    spark.conf.set(k, on.toString)
    try f finally spark.conf.set(k, old)
  }

  test("DotFold == HOF fold, bit-identical, codegen and interpreted") {
    for (cg <- Seq(true, false)) withCodegen(cg) {
      val r = df.select(
        Similarity.dot(col("a"), col("b")).as("native"),
        hofDot(col("a"), col("b")).as("hof")).collect()
      r.foreach { row =>
        assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(row.getDouble(1)), s"codegen=$cg")
      }
    }
  }

  test("L2SqFold == HOF fold, bit-identical") {
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, v) => acc + v)
    val r = df.select(Similarity.l2sq(col("a"), col("b")).as("n"),
      hof.as("h")).collect()
    r.foreach { row =>
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(1)))
    }
  }

  test("MaxAbsFold == HOF greatest fold (quantScale path)") {
    val hof = greatest(
      aggregate(col("a"), lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double"))))
        / lit(127.0), lit(1e-30))
    val r = df.select(Similarity.quantScale(col("a")).as("n"), hof.as("h"))
      .collect()
    r.foreach { row =>
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(1)))
    }
  }

  test("null semantics: NULL array, length mismatch, NULL element → NULL") {
    val r = spark.sql(
      """SELECT * FROM VALUES
         (CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))),
         (array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))),
         (array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)),
          array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) t(a, b)""")
      .select(Similarity.dot(col("a"), col("b")).as("d")).collect()
    assert(r.forall(_.isNullAt(0)))
  }

  test("folds stay inside whole-stage codegen (no CodegenFallback span break)") {
    // repartition: keep the projection out of ConvertToLocalRelation's
    // eager driver-side fold, so a real codegen'd stage is planned
    val q = df.repartition(2)
      .filter(col("id") =!= 2L) // drop the zero vector (ANSI divide-by-zero)
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    q.collect() // AQE only materializes the final (codegen'd) plan on run
    val plan = q.queryExecution.executedPlan.toString
    // AQE prints codegen'd operators with the `*(n)` star prefix
    assert(plan.contains("WholeStageCodegen") ||
      "\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined, plan)
  }

  test("TokenSetHashFold: sorted, duplicate-free, size == distinct token count") {
    val r = df.sparkSession.sql(
      """SELECT array('b','a','b','c','a') AS toks
         UNION ALL SELECT array('x') UNION ALL SELECT array()""")
      .select(graft.functions.TextFunctions.tokenSetHash(col("toks")).as("h"),
        size(array_distinct(col("toks"))).as("nd"))
      .collect()
    r.foreach { row =>
      val h = row.getSeq[Long](0)
      assert(h.length == row.getInt(1), s"$h vs ${row.getInt(1)}")
      assert(h == h.sorted && h.distinct.length == h.length, h)
    }
  }

  test("SortedIntersectCount == brute-force set intersection on random sets") {
    val rnd = new scala.util.Random(7)
    (0 until 20).foreach { _ =>
      val a = Array.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong)
        .distinct.sorted
      val b = Array.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong)
        .distinct.sorted
      val want = a.toSet.intersect(b.toSet).size
      val got = spark.sql(
        s"SELECT array(${a.mkString(",")}) AS a, array(${b.mkString(",")}) AS b")
        .select(graft.functions.TextFunctions
          .sortedIntersectCount(col("a").cast("array<long>"),
            col("b").cast("array<long>")).as("c"))
        .head().getInt(0)
      assert(got == want, s"a=${a.toSeq} b=${b.toSeq}")
    }
  }

  test("PqEncodeFold emitCodes: codes are the argmin entry ids (ties→lowest)") {
    // two identical codebook entries → tie on every subspace → lowest id
    val cb = Array(
      (0L, Array(1.0f, 1.0f, 5.0f, 5.0f)),
      (1L, Array(1.0f, 1.0f, 5.0f, 5.0f)),
      (2L, Array(9.0f, 9.0f, -5.0f, -5.0f)))
    val r = df.select(Similarity.pqAssign(col("a"), cb, numSub = 2).as("k"))
      .collect().map(_.getSeq[Long](0))
    r.foreach { codes =>
      assert(codes.length == 2)
      assert(codes.forall(k => k == 0L || k == 2L), codes) // 1 never wins a tie
    }
  }
}
