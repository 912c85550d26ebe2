package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing probe for the VECTOR-index lifecycle family (optimization
  * guide §1): replays the ann_index_compact fixture with a wall-clock
  * timer around each public API phase — build, appends, compact, the
  * bounded model reads, and the search split into plan-time vs run-time —
  * so the round's optimization targets the phase that actually costs.
  * Measurement only — never run by the bench or the oracle. */
object VecProbe {
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

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[vecprobe] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    (1 to 2).foreach { round =>
      println(s"== round $round: vector lifecycle ==")
      val codebook = e.filter(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
      val spec = graft.operators.VectorIndex.Spec(numSub = 8,
        dim = codebook.head._2.length, codebook = codebook)
      val idx = graft.Scratch.dir("vp_idx")
      phase("build")(graft.operators.VectorIndex.build(
        e.filter(pmod(col("vec_id"), lit(4)) === 0), spec, idx))
      phase("append1")(graft.operators.VectorIndex.append(
        e.filter(pmod(col("vec_id"), lit(4)) === 1), idx))
      phase("append2")(graft.operators.VectorIndex.append(
        e.filter(pmod(col("vec_id"), lit(4)) === 2), idx))
      phase("compact")(graft.operators.VectorIndex.compact(spark, idx))
      phase("append3")(graft.operators.VectorIndex.append(
        e.filter(pmod(col("vec_id"), lit(4)) === 3), idx))
      phase("loadSpec")(graft.operators.VectorIndex.loadSpec(spark, idx))
      val q = e.filter(col("vec_id") < 10)
        .select(col("label"), col("vec_id").as("qid"),
          col("embedding").as("qv"))
      val search = phase("search-plan")(
        graft.operators.VectorIndex.searchTopK(spark, idx, q, k = 3)
          .orderBy("qid", "rank"))
      phase("search-analyze")(search.queryExecution.executedPlan)
      phase("search-run")(Bench.materialize(search))
      Caches.drain()
    }
    spark.stop()
  }
}
