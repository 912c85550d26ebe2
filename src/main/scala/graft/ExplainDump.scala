package graft

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` output for named bench queries to
  * files — the plan evidence committed under plans/<round>/ for every
  * query an optimization round touches.
  * Run: sbt "runMain graft.ExplainDump <outDir> <suffix> <query...>"
  * (env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench). Building a
  * lifecycle query's DataFrame executes its fixture (index builds,
  * streaming batches) exactly as the bench does; the dumped plan is the
  * final returned query's. Measurement only — never run by the bench or
  * the oracle. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainDump <outDir> <suffix> <query...>")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = DeploymentProfile.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try Bench.materialize(SparkEntry.entry(spark)) catch { case _: Throwable => () }
    spark.catalog.clearCache()
    args.drop(2).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      Caches.drain()
      println(s"[explaindump] wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
