package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up probe: replicate the documents corpus k× (k = 1, 2, 4, 8) with
  * replica-scoped ids/sources and time the expensive pipeline stages. The
  * point is the SHAPE of the curve — signature computation and blocked pair
  * verification must grow linearly with input (the pair join is bounded by
  * the blocking key, so output does not go quadratic in corpus size).
  *
  * Run: sbt "runMain graft.ScaleProbe" (env SPARK_GRAFT_SF_DIR to change SF).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def replicate(k: Int): DataFrame =
      Tables.load(spark, sfDir, "documents")
        .withColumn("r", explode(sequence(lit(0), lit(k - 1))))
        .withColumn("doc_id", col("doc_id") + col("r") * lit(10000000L))
        .withColumn("source", concat(col("source"), lit("_"), col("r")))
        .drop("r")

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // warmup
    replicate(1).count()

    println(f"${"k"}%3s ${"docs"}%8s ${"sig_s"}%8s ${"simhash_s"}%10s ${"jaccard_s"}%10s ${"jaccard_pairs"}%14s")
    Seq(1, 2, 4, 8).foreach { k =>
      val docs = replicate(k).cache()
      val nDocs = docs.count()
      val (tSig, _) = time(
        operators.Dedup.minhashSignatures(docs, "doc_id", "text").count())
      val (tSim, _) = time(
        operators.Dedup.simhashPairs(docs, "doc_id", "text",
          maxHamming = 3, blockShift = 40).count())
      val (tJac, nPairs) = time(
        operators.Dedup.jaccardPairs(docs, "doc_id", "text",
          blockCol = "source", minJaccard = 0.9).count())
      docs.unpersist()
      println(f"$k%3d $nDocs%8d $tSig%8.2f $tSim%10.2f $tJac%10.2f $nPairs%14d")
    }
    spark.stop()
  }
}
