package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Measurement probe (optimization guide §1): run named bench queries with a
  * SparkListener that counts Spark jobs and reports per-job wall time +
  * description, so an overhead-dominated query (many tiny jobs) can be told
  * apart from a compute-dominated one before anything is changed.
  * Run: sbt "runMain graft.JobProbe <query> [query...]"
  * (env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench).
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
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

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val props = Option(j.properties)
        val desc = props
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(props.flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.put(j.jobId, (System.nanoTime(), desc))
        ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val st = jobs.remove(j.jobId)
        if (st != null)
          done.add((j.jobId, (System.nanoTime() - st._1) / 1e9, st._2))
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)

    args.foreach { name =>
      (1 to 2).foreach { run =>
        done.clear()
        val t0 = System.nanoTime()
        Bench.materialize(SparkEntry.queries(name)(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        Caches.drain()
        Thread.sleep(500) // let the listener bus drain (no public wait API)
        import scala.jdk.CollectionConverters._
        val js = done.asScala.toSeq.sortBy(_._1)
        val jobSum = js.map(_._2).sum
        println(f"[jobprobe] $name run$run total=$dt%.3f jobs=${js.size} jobSum=$jobSum%.3f gap=${dt - jobSum}%.3f")
        js.foreach { case (id, d, desc) =>
          println(f"  job $id%5d ${d * 1000}%8.1f ms  ${desc.take(90)}")
        }
      }
    }
    spark.stop()
  }
}
