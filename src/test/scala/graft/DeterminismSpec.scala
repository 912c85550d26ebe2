package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Parallelism-invariance: every query promises identical RESULTS at any
  * cluster size (docs/DETERMINISM.md). This spec executes representative
  * queries — one per risk family: double aggregation order, window
  * tie-breaks, hash sampling, iterative convergence, similarity folds —
  * under two different shuffle parallelisms and compares the full result
  * sets cell-by-cell. A pass here is direct evidence the 100 TB deployment
  * (where partition counts are never what they were in test) reproduces the
  * sf0.1 answers. */
class DeterminismSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  // the families most exposed to partitioning: decimal money aggregation,
  // global-order windows, deterministic sampling, connected components
  // (iterative), ANN cosine folds, minhash LSH pairs
  private val representative = Seq(
    "q_agg_pricing", "q_window_lag", "pipe_weighted_sample",
    "dedup_components", "ann_topk", "dedup_minhash_lsh",
    "pipe_lang_mixture", "q_regr",
    "ann_ivfpq", "dedup_incremental", "pipe_curriculum", "dedup_jaccard",
    // round-6 families: wire codecs (avro/msgpack/cbor round-trips through
    // per-row expressions), regex PII scrubbing, catalog-routed scan
    "nats_avro_extract", "nats_msgpack_extract", "nats_cbor_extract",
    "pipe_pii", "v2_catalog", "proto_imported",
    // round-6 additions: centroid-comparison dedup (float-rounding-backed
    // keep decisions), grouped rule battery, map-side chunk explode
    "dedup_semantic", "pipe_gopher_rules", "pipe_chunk",
    // retrieval/LM family: decimal-exact log-prob sums (perplexity, DSIR),
    // fixed-order BM25 term addition, rounded-before-rank tf-idf windows,
    // iterative k-means with per-round rounded centroids
    "text_bm25", "text_tfidf", "text_perplexity", "pipe_dsir",
    "embed_kmeans", "pipe_bpe_pairs", "dedup_bloom",
    "pipe_ccnet_buckets", "ann_hard_negatives", "dedup_cluster_sizes",
    "mm_audio_fingerprint", "q_funnel", "q_retention", "dedup_centrality",
    "dedup_containment", "dedup_soft_weights", "text_zipf",
    "embed_covariance", "text_backoff", "pipe_bpe_train",
    "dedup_lsh_sweep", "pipe_bpe_apply", "text_kneser_ney",
    "embed_pca_power", "text_heaps", "q_anomaly", "text_diversity",
    "dedup_winnow", "dedup_cdc", "pipe_leakfree_split",
    "text_collocations", "q_transitions", "ann_mmr",
    "embed_outliers", "dedup_scorecard",
    // round-7 additions: hash-deterministic caps/realization, rounded-
    // before-rank truncated cosines, integer-unit centroid drift,
    // stats-driven plans (broadcast decisions must not change results)
    "pipe_domain_cap", "pipe_token_budget", "pipe_mixture_realize",
    "pipe_filter_funnel", "ann_filtered", "embed_matryoshka",
    "text_boilerplate", "embed_drift",
    // round-8 additions: credentialed transport scan (pooled dials must not
    // change results), Struct/Any JSON-text decode (canonical rendering is
    // partitioning-blind by construction — pin it), registry-framed Avro
    // with per-row writer-schema resolution across task boundaries
    "transport_auth", "proto_struct", "proto_struct_text", "proto_any",
    "nats_avro_registry",
    // profile-resolved transport scan: bind-time option merge must be
    // invisible to results at any parallelism (dedup_lsh_sweep, already
    // listed above, now also covers the zero-collect single-plan rewrite)
    "transport_profile",
    // round-8 wildcard/KV/pipeline additions: sharded per-subject index
    // reads (bucket count ≠ shuffle partitions must not matter), server-
    // side consumer filtering, first-doc novelty (min over a trigram
    // shuffle), rollup + hash-window dataset card, doc-local scene cuts
    "transport_kv_latest", "transport_wildcard_consumer",
    "nats_subject_wildcard", "text_novelty", "text_readability",
    "pipe_dataset_card", "mm_scene_cut",
    // hash-ordered shard manifest (min_by leader keys) and the index-backed
    // grouped pushdown (bucket sharding ≠ shuffle partitioning must not
    // show through)
    "pipe_shard_plan", "transport_subject_stats_wild",
    // mergeable-HLL rollup: sketch-union order must not move the estimate
    // across the boolean error contract at any partitioning
    "q_hll_mergeable",
    // dynamic-key JSON schema profile (LATERAL variant_explode + one
    // groupBy(key) — rate division must not wobble with partial-agg order)
    "nats_json_profile",
    // round-9 wire binding: the same rows through REAL sockets, across
    // lane-pool scheduling and slice interleaving (transport_group is
    // deliberately NOT here — a queue group is a consume-once source)
    "transport_wire_scan")

  private def run(name: String, partitions: Int): Seq[String] = {
    spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    try {
      val df = SparkEntry.queries(name)(spark, dir)
      // canonical form: sort by every column, render rows as strings
      val sorted = df.orderBy(df.columns.map(col).toIndexedSeq: _*)
      sorted.collect().map(_.toString).toSeq
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      Caches.drain()
    }
  }

  representative.foreach { name =>
    test(s"$name: identical results at shuffle=3 and shuffle=17") {
      val a = run(name, 3)
      val b = run(name, 17)
      assert(a.size == b.size, s"row counts differ: ${a.size} vs ${b.size}")
      a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
        assert(x == y, s"row $i differs:\n  $x\n  $y")
      }
      assert(a.nonEmpty)
    }
  }
}
