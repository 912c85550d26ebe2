package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-family scale bench: replicate the corpus tables k× (default 10)
  * into a temp dir and run the SLOWEST suite queries from the committed
  * sf0.1 artifact back-to-back in ONE session — the measurement the
  * per-family ScaleProbe can't make (it times operators in isolation;
  * cross-query cache/codegen/GC interactions only show up when the heavy
  * queries share a JVM).
  *
  * Replication scheme matches ScaleProbe: ids offset by r×10⁷ per replica,
  * `documents.source` suffixed `_r` (so source-blocked pair joins treat
  * replicas as disjoint corpora — the honest scale-up: exact-duplicate
  * replicas WOULD be pairable content for unblocked dedup, and queries
  * whose pair volume grows with cross-replica duplication are expected to
  * grow superlinearly in OUTPUT, which the artifact records rather than
  * hides).
  *
  * Run: `sbt "runMain graft.CrossScaleBench [k] [query...]"`
  * (env SPARK_GRAFT_SF_DIR for the base corpus, default sf0.1).
  * Artifact: bench_scale<k>x_<sf>.json — per-query seconds at k×, alongside
  * the committed 1× numbers for ratio reading.
  */
object CrossScaleBench {

  /** the 15 slowest non-trivial queries of the committed round-11 sf0.1
    * artifact (bench_full_sf0.1.json), fixture builders included — they
    * are real pipeline stages and scale with the corpus — plus the
    * round-13 index-compaction/deletion lifecycles and the round-14
    * streaming-gate + time-travel lifecycles (each runs build + maintain
    * + probe/search inside the measured query: the rewrites must stay
    * O(index) and the retained-generation reads O(snapshot), so their
    * 10× ratios are scale properties worth pinning) */
  val DefaultQueries: Seq[String] = Seq(
    "dedup_index_fixture", "dedup_index_probe", "dedup_lsh_sweep",
    "dedup_keep_one", "text_kneser_ney", "pipe_end2end", "dedup_centrality",
    "dedup_cluster_sizes", "dedup_components", "pipe_leakfree_split",
    "ann_index_ingest", "pipe_bpe_apply", "dedup_winnow", "dedup_span_scrub",
    "nats_avro_extract", "dedup_index_compact", "ann_index_compact",
    "dedup_index_remove", "ann_index_remove",
    "dedup_gate_autocompact", "ann_index_autocompact",
    "dedup_index_timetravel", "ann_index_timetravel",
    "dedup_index_describe", "ann_index_describe")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val names = if (args.length > 1) args.drop(1).toSeq else DefaultQueries
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    val spark = DeploymentProfile.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- materialize the k×-replicated corpus (one-time, not timed) ----
    val out = graft.Scratch.dir(s"graft_scale${k}x")
    def reps: org.apache.spark.sql.Column =
      explode(sequence(lit(0), lit(k - 1)))
    // 32 id-clustered files per replicated table: the base fixture is a
    // single parquet file, and an exploded 10× copy written at the read's
    // parallelism would land as a couple of huge row groups — every
    // downstream scan would start from 2-4 splits and the bench would
    // measure file layout, not operators. RANGE partitioning (not random
    // round-robin) keeps the base fixture's id clustering, so row-group
    // min/max stats stay as prunable as the original corpus's.
    def write(df: DataFrame, name: String, idCol: String): Unit =
      df.repartitionByRange(32, col(idCol))
        .write.mode("overwrite").parquet(s"$out/$name.parquet")

    write(spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("r", reps)
      .withColumn("doc_id", col("doc_id") + col("r") * lit(10000000L))
      .withColumn("source", concat(col("source"), lit("_"), col("r")))
      .drop("r"), "documents", "doc_id")
    write(spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("r", reps)
      .withColumn("vec_id", col("vec_id") + col("r") * lit(10000000L))
      .drop("r"), "embeddings", "vec_id")
    // events: replicate through the PINNED NTZ read schema so the replica's
    // ts column round-trips as TIMESTAMP(MICROS, NTZ) — Tables.load's
    // epoch-ns rebuild contract
    write(Tables.loadEventsRaw(spark, sfDir)
      .withColumn("r", reps)
      .withColumn("event_id", col("event_id") + col("r") * lit(10000000L))
      .drop("r"), "events", "event_id")
    Tables.names.filterNot(Seq("documents", "embeddings", "events").contains)
      .foreach { n =>
        val df = spark.read.parquet(s"$sfDir/$n.parquet")
        write(df, n, df.columns.head)
      }

    // ---- warm, then run the picked queries in one session ----
    // GRAFT_SCALE_REPS (default 3) full passes over the query list; the
    // artifact records the per-query MIN — this box is co-tenant-noisy
    // (identical queries measured 21 s ↔ 78 s across runs at identical
    // HEAD), and the least-displaced pass is the one that measures the
    // operator rather than the neighbor.
    val repsN = sys.env.get("GRAFT_SCALE_REPS").map(_.toInt).getOrElse(3)
    try Bench.materialize(SparkEntry.entry(spark))
    catch { case _: Throwable => () }
    spark.catalog.clearCache()
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    for (rep <- 1 to repsN) {
      names.foreach { name =>
        val t0 = System.nanoTime()
        // a pass that THROWS records no time: a fast failure (immediate
        // abort) must not become the query's "best" in the artifact
        val ok =
          try { Bench.materialize(SparkEntry.queries(name)(spark, out)); true }
          catch { case _: Throwable => failed += name; false }
        val dt = (System.nanoTime() - t0) / 1e9
        Caches.drain()
        if (ok) best(name) = math.min(best.getOrElse(name, Double.MaxValue), dt)
      }
      spark.catalog.clearCache()
      System.err.println(s"[scalebench] pass $rep/$repsN done")
    }
    val results = best.toSeq

    val qs = results.map { case (n, v) => "\"" + n + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val sfTag = java.nio.file.Paths.get(sfDir).getFileName.toString
      .replaceAll("[^A-Za-z0-9._-]", "_")
    val line = s"""{"metric":"scale${k}x_total","value":$total,"unit":"sec",""" +
      s""""k":$k,"queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    try {
      // a FILTERED run must not clobber the committed full artifact with a
      // partial per-query map (same rule as Bench's bench_partial_<sf>)
      val target =
        if (args.length > 1) s"bench_scale${k}x_partial_$sfTag.json"
        else s"bench_scale${k}x_$sfTag.json"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(target),
        (line + "\n").getBytes("UTF-8"))
      ()
    } catch { case e: Throwable =>
      System.err.println(s"[scalebench] artifact write failed: $e")
    }
    println(line)
    if (failed.nonEmpty)
      System.err.println(s"[scalebench] FAILED: ${failed.mkString(", ")}")
    spark.stop()
  }
}
