package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.DedupIndex

/** Isolates the `describeIndex` STEP from the build/append/compact
  * fixture the `*_index_describe` bench queries run around it: builds a
  * dedup index over the corpus at 1× and k× (untimed), then times
  * `describeIndex` alone at each scale (min of `reps`). The lifecycle
  * queries' 10× ratio is dominated by the O(data) fixture by design;
  * this probe is the direct evidence that the describe step itself is
  * O(metadata) after the round-16 footer-count change (row counts from
  * parquet footers — zero Spark jobs, also spec-asserted with a
  * SparkListener in `DedupIndexSpec`/`VectorIndexSpec`).
  *
  * Run: `sbt "runMain graft.DescribeScaleProbe [k] [reps]"`
  * (env SPARK_GRAFT_SF_DIR for the base corpus, default sf0.1). */
object DescribeScaleProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val spec = DedupIndex.Spec(numHashes = 16, bands = 4, buckets = 32)

    def timeDescribe(scale: Int): (Double, Long) = {
      val dir = Scratch.dir(s"graft_descprobe_${scale}x")
      val corpus =
        if (scale == 1) docs
        else docs.withColumn("r", explode(sequence(lit(0), lit(scale - 1))))
          .withColumn("doc_id", col("doc_id") + col("r") * lit(10000000L))
          .drop("r")
      DedupIndex.build(corpus, "doc_id", "text", spec, dir) // untimed
      DedupIndex.describeIndex(spark, dir).collect()        // warm
      val best = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        DedupIndex.describeIndex(spark, dir).collect()
        (System.nanoTime() - t0) / 1e9
      }.min
      val rows = DedupIndex.describeIndex(spark, dir)
        .collect().head.getAs[Long]("band_rows")
      (best, rows)
    }

    val (t1, r1) = timeDescribe(1)
    val (tk, rk) = timeDescribe(k)
    println(f"""{"metric":"describe_scale","k":$k,"sec_1x":$t1%.4f,""" +
      f""""sec_${k}x":$tk%.4f,"ratio":${tk / t1}%.3f,""" +
      s""""band_rows_1x":$r1,"band_rows_${k}x":$rk}""")
    spark.stop()
  }
}
