package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Co-located joins via bucketing: both fact tables bucketed on the join key
  * land pre-partitioned, so the join plans WITHOUT a shuffle exchange — at
  * 100 TB this turns the biggest recurring fact-fact join from a full
  * network shuffle into a local merge per bucket. */
class BucketedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = "/tmp/graft_warehouse"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // the metastore is per-session (in-memory derby) but the warehouse dir
    // persists — remove orphaned locations from previous runs
    Seq("b_orders", "b_lineitem").foreach { t =>
      val d = new java.io.File(s"$warehouse/$t")
      if (d.exists()) {
        java.nio.file.Files.walk(d.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    }
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle:\n$plan")

    // result parity with the unbucketed join
    val n = joined.count()
    val expected = orders.join(lineitem,
      col("o_orderkey") === col("l_orderkey")).count()
    assert(n == expected)
  }
}
