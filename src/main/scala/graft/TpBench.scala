package graft
import org.apache.spark.sql.SparkSession
object TpBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = DeploymentProfile.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try Bench.materialize(SparkEntry.entry(spark)) catch { case _: Throwable => () }
    spark.catalog.clearCache()
    for (r <- 1 to 2; n <- Seq("nats_avro_extract", "nats_cbor_extract", "dedup_winnow", "q_scalar_funcs")) {
      val t0 = System.nanoTime()
      Bench.materialize(SparkEntry.queries(n)(spark, sfDir))
      println(f"TPBENCH r$r $n%-24s ${(System.nanoTime()-t0)/1e9}%.2f s")
      Caches.drain()
    }
    spark.stop()
  }
}
