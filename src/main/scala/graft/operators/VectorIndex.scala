package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** Persistent IVF-PQ vector index: build once over the corpus, save as
  * parquet, reload and serve many queries — the lifecycle that matters at
  * 100 TB, where re-encoding the corpus per query session would dwarf the
  * search itself.
  *
  * On-disk layout (all parquet):
  *   `indexDir/meta`      — one row: numSub, dim, codebook ids + flattened
  *                          codewords (the bounded build side);
  *   `indexDir/postings`  — (label INT, vec_id LONG, codes ARRAY<BIGINT>):
  *                          the coarse-partition posting lists with 8-byte
  *                          PQ codes per vector — 32× smaller than the
  *                          float32 corpus, the part that stays resident.
  *                          Written partitioned BY label, so a probe reads
  *                          only the probed cluster's directory (the same
  *                          directory-pruning contract `PlanAuditSpec`
  *                          asserts for hive layouts).
  *   `indexDir/gen`       — generation pointer (round-13 maintenance):
  *                          [[compact]] and [[remove]] rewrite the
  *                          postings into `postings_gN` and flip this
  *                          file as the single commit point; build/
  *                          append/search address the live generation.
  *
  * Search: nearest-centroid probe (here: the stored label of the query,
  * matching `ann_ivfpq`'s fixture contract) → decode = codebook lookup per
  * subspace (map-side, the codebook folds to literals) → exact-query ×
  * reconstructed-corpus cosine → per-query top-k. Scores are IDENTICAL to
  * encoding fresh ([[Similarity.pqReconstruct]] → decode(encode(v)) is a
  * pure function of the codes), which the spec asserts row-for-row. */
object VectorIndex {

  final case class Spec(numSub: Int, dim: Int,
                        codebook: Array[(Long, Array[Float])])

  def build(emb: DataFrame, spec: Spec, indexDir: String): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val prevGen = generation(spark, indexDir)
    emb.select(col("label"), col("vec_id"),
      Similarity.pqAssign(col("embedding"), spec.codebook, spec.numSub)
        .as("codes"))
      .write.partitionBy("label").mode("overwrite")
      .parquet(postingsDir(indexDir, 0))
    // a rebuild restarts the lineage at gen 0 (flip AFTER the data lands:
    // a crash mid-build leaves the prior generation readable)
    if (prevGen != 0) {
      writeGeneration(spark, indexDir, 0)
      try { val p = new org.apache.hadoop.fs.Path(
          postingsDir(indexDir, prevGen))
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true); () }
      catch { case _: Exception => () }
    }
    spec.codebook.toSeq
      .map { case (id, cw) => (spec.numSub, spec.dim, id, cw.toSeq) }
      .toDF("num_sub", "dim", "entry_id", "codeword")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$indexDir/meta")
  }

  /** generation-addressed posting dirs: gen 0 is the original `postings`
    * layout; each [[compact]] writes generation N+1 into a fresh
    * `postings_gN+1` dir and flips the `gen` pointer — the single commit
    * point — so a reader never observes a half-rewritten index */
  private def postingsDir(indexDir: String, gen: Int): String =
    if (gen == 0) s"$indexDir/postings" else s"$indexDir/postings_g$gen"

  private def generation(spark: SparkSession, indexDir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/gen")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0 // pre-compaction indexes have no pointer file
    else spark.read.parquet(p.toString).collect().head.getInt(0)
  }

  private def writeGeneration(spark: SparkSession, indexDir: String,
                              gen: Int): Unit = {
    import spark.implicits._
    Seq(gen).toDF("generation").coalesce(1)
      .write.mode("overwrite").parquet(s"$indexDir/gen")
  }

  /** COMPACTION: rewrite the posting lists to ONE file per label
    * directory — the small-files answer for a long-lived vector index.
    * Every [[append]] (and every streaming-ingest micro-batch) adds one
    * file per touched label dir, so after thousands of embedding drops a
    * probe opens thousands of parquet footers per probed cluster;
    * compaction collapses each label back to a single file while
    * preserving the hive layout (directory pruning — the static
    * `label IN (probed)` filter — keeps working unchanged).
    *
    * Cost: ONE hash exchange of the CODES (8-byte PQ codes, 32× smaller
    * than the float corpus — the embeddings are never re-read or
    * re-encoded): `repartition(col("label"))` puts each label's rows
    * wholly in one task, so the partitioned write emits exactly one file
    * per label whatever the task count. Same crash-safe generation flip
    * as `DedupIndex.compact`: the rewrite lands in `postings_gN+1`, the
    * `gen` pointer write commits it, the old dir is GC'd best-effort. */
  def compact(spark: SparkSession, indexDir: String): Unit =
    rewriteGeneration(spark, indexDir, identity)

  /** REMOVE vectors from the index — the deletion half of the lifecycle
    * (a revoked source's embeddings must leave the search surface without
    * re-encoding the corpus). The ids arrive as a DataFrame (arbitrarily
    * large: a distributed LEFT ANTI join, never a collected set); the
    * posting lists are rewritten without them through the same generation
    * flip as [[compact]] — a remove also compacts, and the hive layout
    * (directory pruning) survives. `searchTopK` after `remove(ids)` is
    * row-identical to an index never containing them. */
  def remove(spark: SparkSession, indexDir: String, ids: DataFrame,
             idCol: String = "vec_id"): Unit = {
    val drop = ids.select(col(idCol).cast("long").as("vec_id")).distinct()
    rewriteGeneration(spark, indexDir,
      df => df.join(drop, Seq("vec_id"), "left_anti"))
  }

  /** single-writer, like append: concurrent maintenance calls on one
    * index dir race the `gen` flip */
  private def rewriteGeneration(spark: SparkSession, indexDir: String,
                                transform: DataFrame => DataFrame): Unit = {
    val gen = generation(spark, indexDir)
    val newGen = gen + 1
    val dir = postingsDir(indexDir, newGen)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true) // failed prior try
    transform(spark.read.parquet(postingsDir(indexDir, gen)))
      .repartition(col("label"))
      .sortWithinPartitions("label", "vec_id")
      .write.partitionBy("label").mode("overwrite").parquet(dir)
    writeGeneration(spark, indexDir, newGen) // COMMIT POINT
    try { fs.delete(new org.apache.hadoop.fs.Path(
      postingsDir(indexDir, gen)), true); () }
    catch { case _: Exception => () }
  }

  /** max posting files in any single label dir of the LIVE generation —
    * the fragmentation signal an auto-compaction policy thresholds on
    * (one directory listing, no data read) */
  def maxFilesPerLabel(spark: SparkSession, indexDir: String): Int = {
    val dir = new org.apache.hadoop.fs.Path(
      postingsDir(indexDir, generation(spark, indexDir)))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) 0
    else fs.listStatus(dir).filter(_.isDirectory).foldLeft(0) { (m, d) =>
      math.max(m, fs.listStatus(d.getPath)
        .count(_.getPath.getName.endsWith(".parquet")))
    }
  }

  /** INCREMENTAL append — the ANN analog of `dedup_incremental`: encode
    * ONLY the new vectors with the index's stored codebook and append
    * their codes into the existing label-partitioned posting lists. No
    * rebuild: the write touches new files in the appended labels'
    * directories only, the resident corpus codes are never read or
    * re-encoded — at 100 TB an hourly embedding drop costs
    * O(new vectors), not O(corpus).
    *
    * Because PQ codes are a pure function of (vector, codebook) and the
    * codebook is FROZEN in `meta`, `build(a); append(b)` is row-identical
    * to `build(a ∪ b)` — `VectorIndexSpec` asserts it. (Freezing the
    * codebook is the standard IVFPQ posture: appended vectors quantize
    * under the trained codebook; retraining is a deliberate rebuild.) */
  def append(emb: DataFrame, indexDir: String): Unit = {
    val spark = emb.sparkSession
    val spec = loadSpec(spark, indexDir)
    emb.select(col("label"), col("vec_id"),
      Similarity.pqAssign(col("embedding"), spec.codebook, spec.numSub)
        .as("codes"))
      .write.partitionBy("label").mode("append")
      .parquet(postingsDir(indexDir, generation(spark, indexDir)))
  }

  def loadSpec(spark: SparkSession, indexDir: String): Spec = {
    val rows = spark.read.parquet(s"$indexDir/meta").collect()
    val cb = rows.map(r => (r.getLong(2), r.getSeq[Float](3).toArray))
      .sortBy(_._1)
    Spec(rows.head.getInt(0), rows.head.getInt(1), cb)
  }

  /** true once `build` has written this index's meta */
  def exists(spark: SparkSession, indexDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/meta")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Persist the COARSE quantizer (IVF centroids) beside the index, so any
    * later session — batch append or the streaming ingest gate — can
    * label arriving vectors without re-deriving the quantizer. Like the PQ
    * codebook in `meta`, the centroids are FROZEN at train time: appended
    * vectors quantize under them, retraining is a deliberate rebuild. */
  def saveCentroids(spark: SparkSession, indexDir: String,
                    centroids: Array[(Long, Array[Float])]): Unit = {
    import spark.implicits._
    centroids.toSeq.map { case (id, v) => (id, v.toSeq) }
      .toDF("centroid_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
  }

  def loadCentroids(spark: SparkSession,
                    indexDir: String): Array[(Long, Array[Float])] =
    spark.read.parquet(s"$indexDir/centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)

  /** nearest-centroid label per vector — map-side argmax over the bounded
    * centroid set (literal fold, no shuffle); ties break to the LOWEST
    * centroid id, matching the IVF assignment the ann_ivf queries use */
  def assignLabels(emb: DataFrame,
                   centroids: Array[(Long, Array[Float])]): DataFrame = {
    val scored = array(centroids.map { case (cid, v) =>
      struct(Similarity.cosine(typedLit(v), col("embedding")).as("s"),
        lit(-cid).as("nc"))
    }: _*)
    emb.withColumn("label",
      (-array_max(scored).getField("nc")).cast("int"))
  }

  /** reconstruct a vector from its stored codes: per subspace, the chosen
    * codeword slice — one native map-side expression whose codebook travels
    * as a reference object ([[graft.functions.PqDecodeFold]]), so the plan
    * stays O(1) at any codebook size. (The previous CaseWhen-chain
    * formulation was O(K·dim) plan nodes — fine at K=8, codegen bloat at a
    * real K=256 IVFPQ config.) */
  private def decode(codes: Column, spec: Spec): Column =
    Similarity.pqDecode(codes, spec.codebook, spec.numSub)

  /** top-k per query over the loaded index; queries = (qid, label, qv).
    *
    * `nprobe > 1` probes each query's top-n nearest SAVED centroids
    * ([[saveCentroids]] must have been written beside the index) instead
    * of only the label its row carries — the saved-index analog of the
    * `ann_ivf_multiprobe` query form, with the same probe ranking
    * (rounded cosine desc, centroid id asc). Candidates need no dedup: a
    * vector lives in exactly one label partition and a query's probe
    * labels are distinct, so each (qid, vec_id) pair surfaces once.
    *
    * SCALE CONTRACT — static pruning, not best-effort DPP: the probed
    * label set is collected (O(#queries × nprobe); the query side is
    * broadcast-bounded by this operator's contract) and pushed as a
    * literal `label IN (...)` partition filter on the posting scan, so a
    * search reads exactly the probed clusters' directories. Relying on
    * dynamic partition pruning through the broadcast join instead would
    * let Spark silently decline and scan EVERY posting partition — at
    * 10⁹ vectors that is O(index) per search, the failure mode
    * `VectorIndexSpec` now pins with a files-read assertion through this
    * exact join path. */
  def searchTopK(spark: SparkSession, indexDir: String, queries: DataFrame,
                 k: Int, nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val spec = loadSpec(spark, indexDir)
    val probes =
      if (nprobe == 1) queries
      else {
        val cents =
          try loadCentroids(spark, indexDir)
          catch {
            case e: org.apache.spark.sql.AnalysisException =>
              throw new IllegalArgumentException(
                s"searchTopK(nprobe=$nprobe) needs the saved coarse " +
                  s"quantizer ($indexDir/centroids) — persist it with " +
                  "saveCentroids at build time", e)
          }
        require(cents.nonEmpty,
          s"searchTopK(nprobe=$nprobe): $indexDir/centroids is empty")
        // per-query top-nprobe centroids, map-side over the bounded
        // centroid set (ccos desc, centroid id asc — array_sort asc on
        // (s, -cid) then reverse)
        val scored = array(cents.map { case (cid, v) =>
          struct(round(Similarity.cosine(typedLit(v), col("qv")), 6).as("s"),
            lit(-cid).as("nc"))
        }: _*)
        queries.drop("label")
          .withColumn("probe",
            explode(slice(reverse(array_sort(scored)), 1, nprobe)))
          .withColumn("label", (-col("probe").getField("nc")).cast("int"))
          .drop("probe")
      }
    val labels = probes.select("label").distinct().collect().map(_.get(0))
    // a remove() that emptied the index leaves a dir with no parquet
    // files — no schema to infer, but the contract is "no candidates",
    // not an error. A MISSING dir (wrong indexDir) must stay a loud
    // failure, so the fallback applies only when the dir exists.
    val pDir = postingsDir(indexDir, generation(spark, indexDir))
    val postings =
      try spark.read.parquet(pDir)
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          val p = new org.apache.hadoop.fs.Path(pDir)
          val exists = p.getFileSystem(
            spark.sparkContext.hadoopConfiguration).exists(p)
          if (!exists) throw e
          import org.apache.spark.sql.types._
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(Seq(StructField("label", IntegerType),
              StructField("vec_id", LongType),
              StructField("codes", ArrayType(LongType)))))
      }
    val pruned =
      if (labels.isEmpty) postings.filter(lit(false))
      else postings.filter(col("label").isin(labels: _*))
    val rankW = Window.partitionBy("qid")
      .orderBy(col("pq_cos").desc, col("vec_id").asc)
    pruned.join(broadcast(probes), "label")
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("rv", decode(col("codes"), spec))
      .withColumn("pq_cos", round(Similarity.cosine(col("qv"), col("rv")), 6))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select("qid", "rank", "vec_id", "pq_cos")
  }
}
