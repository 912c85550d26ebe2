package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing probe for the streaming-gate and index-lifecycle families
  * (optimization guide §1): replays the dedup_gate_autocompact and
  * dedup_index_compact fixtures with a wall-clock timer around each public
  * API phase, so the round's optimization targets the phase that actually
  * costs, not the one that looks expensive. Measurement only — never run by
  * the bench or the oracle. */
object GateProbe {
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
      println(f"[gateprobe] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")

    (1 to 2).foreach { round =>
      println(s"== round $round: gate ==")
      val idx = graft.Scratch.dir("gp_gate_idx")
      val out = graft.Scratch.dir("gp_gate_out")
      val cfg = graft.streaming.StreamingDedup.Config(
        indexDir = idx, outDir = out, idCol = "doc_id", textCol = "text",
        numHashes = 16, bands = 4, minEst = 0.5,
        bucketed = true, buckets = 8, compactThreshold = 2)
      (0 to 2).foreach(b => phase(s"ingest$b")(
        graft.streaming.StreamingDedup.ingest(cfg)(
          docs.filter(pmod(col("doc_id"), lit(3)) === b), b.toLong)))
      phase("tail-read")(Bench.materialize(
        spark.read.parquet(out)
          .select(col("doc_id"), md5(col("text")).as("content_md5"))
          .withColumn("gen_advanced",
            lit(graft.operators.DedupIndex.liveGeneration(spark, idx) > 0))
          .orderBy("doc_id")))
      Caches.drain()

      println(s"== round $round: index compact ==")
      val idx2 = graft.Scratch.dir("gp_didx_c")
      val d = docs
      phase("build")(graft.operators.DedupIndex.build(
        d.filter(pmod(col("doc_id"), lit(10)) < 4), "doc_id", "text",
        graft.operators.DedupIndex.Spec(16, 4, 8), idx2))
      phase("append1")(graft.operators.DedupIndex.append(
        d.filter(pmod(col("doc_id"), lit(10)).between(4, 5)), "doc_id", "text", idx2))
      phase("append2")(graft.operators.DedupIndex.append(
        d.filter(pmod(col("doc_id"), lit(10)).between(6, 7)), "doc_id", "text", idx2))
      phase("compact")(graft.operators.DedupIndex.compact(spark, idx2))
      phase("probe")(Bench.materialize(
        graft.operators.DedupIndex.probePairs(spark, idx2,
          d.filter(pmod(col("doc_id"), lit(10)) >= 8), "doc_id", "text", 0.5)
          .orderBy("new_id", "index_id")))
      Caches.drain()
    }
    spark.stop()
  }
}
