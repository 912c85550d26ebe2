package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Runtime re-planning evidence: the two AQE behaviors a 100 TB deployment
  * leans on — skew-join splitting (a hot key no longer pins one task) and
  * runtime bloom-filter pruning (a selective dim filter reaches the fact
  * scan as a row-level filter). Thresholds are lowered so the behaviors
  * trigger on fixture-sized data; the *mechanism* asserted is the same one
  * that fires at scale. */
class AdaptiveExecSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition (hot key does not pin one task)") {
    import spark.implicits._
    withConf(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // 90% of the left side lands on key 0 — the classic hot key
      val left = spark.range(0, 20000)
        .select((when(col("id") % 10 =!= 0, col("id") % 1000)
          .otherwise(0L)).as("k"), col("id").as("v"))
      val right = spark.range(0, 1000).select(col("id").as("k"),
        (col("id") * 7).as("w"))
      val joined = left.join(right, "k")
      // AQE finalizes the physical plan only when THIS DataFrame executes
      // (count() would plan a separate execution and leave this one initial)
      assert(joined.collect().length == 20000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"expected a skew-split join:\n$p")
    }
  }

  test("runtime bloom filter from a selective dim filter prunes the fact side") {
    import spark.implicits._
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val tmp = java.nio.file.Files.createTempDirectory("graft_bloom").toString
      spark.range(0, 50000).select(col("id").as("k"), (col("id") % 97).as("v"))
        .write.mode("overwrite").parquet(s"$tmp/fact")
      spark.range(0, 5000).select(col("id").as("k"), (col("id") % 5).as("cat"))
        .write.mode("overwrite").parquet(s"$tmp/dim")
      val fact = spark.read.parquet(s"$tmp/fact")
      val dim = spark.read.parquet(s"$tmp/dim").filter(col("cat") === 3)
      val joined = fact.join(dim, "k")
      assert(joined.count() == 1000L)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        s"expected a runtime bloom filter on the fact scan:\n$p")
    }
  }
}
