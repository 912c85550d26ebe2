package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.VectorIndex

/** Persistent IVF-PQ index lifecycle: build → save → load → search must
  * reproduce the fresh-encode `ann_ivfpq` query exactly — decode(encode(v))
  * is a pure function of the stored codes, so a saved index serves the
  * same answers as re-encoding the corpus. */
class VectorIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("saved index search == fresh-encode ann_ivfpq, postings label-partitioned") {
    val idx = java.nio.file.Files.createTempDirectory("graft_vindex").toString
    val emb = Tables.load(spark, dir, "embeddings")
    val codebook = emb.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val spec = VectorIndex.Spec(numSub = 8,
      dim = codebook.head._2.length, codebook = codebook)

    VectorIndex.build(emb, spec, idx)

    // layout: label-partitioned posting directories; codes are numSub longs
    val postingDirs = new java.io.File(s"$idx/postings")
      .listFiles().filter(_.getName.startsWith("label="))
    assert(postingDirs.length > 1, postingDirs.mkString(","))
    val oneCodes = spark.read.parquet(s"$idx/postings")
      .select(size(col("codes"))).distinct().collect().map(_.getInt(0)).toSet
    assert(oneCodes == Set(8), oneCodes)

    val queries = emb.filter(col("vec_id") < 10)
      .select(col("label"), col("vec_id").as("qid"), col("embedding").as("qv"))
    val got = VectorIndex.searchTopK(spark, idx, queries, k = 3)
      .orderBy("qid", "rank").collect().map(_.toString)
    val want = SparkEntry.queries("ann_ivfpq")(spark, dir)
      .collect().map(_.toString)
    assert(got.length == want.length && got.sameElements(want),
      s"${got.take(3).mkString("; ")} vs ${want.take(3).mkString("; ")}")

    // a probe for one label prunes posting directories (directory-level,
    // same contract as the hive-partition plan audit)
    val one = spark.read.parquet(s"$idx/postings")
      .filter(col("label") === postingDirs.head.getName.stripPrefix("label=").toInt)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
  }

  test("K=256 codebook: decode(encode(v)) == fresh reconstruct, plan size flat") {
    val idx = java.nio.file.Files.createTempDirectory("graft_vindex256").toString
    val emb = Tables.load(spark, dir, "embeddings")
    // a real IVFPQ-sized codebook — 256 entries from the corpus itself
    val codebook = emb.filter(col("vec_id") < 256)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    assert(codebook.length == 256, s"fixture too small: ${codebook.length}")
    val spec = VectorIndex.Spec(numSub = 8,
      dim = codebook.head._2.length, codebook = codebook)

    VectorIndex.build(emb, spec, idx)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("label"), col("vec_id").as("qid"), col("embedding").as("qv"))
    val viaIndex = VectorIndex.searchTopK(spark, idx, queries, k = 3)
      .orderBy("qid", "rank")

    // reference: rerun the same ranking over fresh-encoded vectors
    import graft.functions.Similarity
    val fresh = emb.select(col("label"), col("vec_id"),
      Similarity.pqReconstruct(col("embedding"), codebook, numSub = 8).as("rv"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("pq_cos").desc, col("vec_id").asc)
    val want = fresh.join(broadcast(queries), "label")
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("pq_cos", round(Similarity.cosine(col("qv"), col("rv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("qid", "rank", "vec_id", "pq_cos")
      .orderBy("qid", "rank")

    val got = viaIndex.collect().map(_.toString)
    val exp = want.collect().map(_.toString)
    assert(got.nonEmpty && got.sameElements(exp),
      s"${got.take(3).mkString("; ")} vs ${exp.take(3).mkString("; ")}")

    // plan-size contract: the decode expression is one node regardless of K
    // (the CaseWhen chain this replaced grew O(K·dim) and would dominate
    // the plan string at K=256)
    val planStr = viaIndex.queryExecution.executedPlan.toString
    assert(planStr.contains("pq_decode_fold"), planStr.take(2000))
    assert(planStr.length < 100000, s"plan string blew up: ${planStr.length}")
  }

  test("append == rebuild: build(even) + append(odd) is row-identical to " +
    "build(all), touches only new files, and serves identical answers") {
    val emb = Tables.load(spark, dir, "embeddings")
    val codebook = emb.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val spec = VectorIndex.Spec(numSub = 8,
      dim = codebook.head._2.length, codebook = codebook)

    val idxFull = java.nio.file.Files.createTempDirectory("graft_vi_full").toString
    val idxAppend = java.nio.file.Files.createTempDirectory("graft_vi_app").toString
    VectorIndex.build(emb, spec, idxFull)
    VectorIndex.build(emb.filter(pmod(col("vec_id"), lit(2)) === 0),
      spec, idxAppend)

    // resident posting files BEFORE the append: the append must not
    // rewrite any of them (incremental = O(new vectors), not O(corpus))
    def files(p: String): Set[String] = {
      val base = java.nio.file.Paths.get(p)
      val s = java.nio.file.Files.walk(base)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(f =>
          f.toString.endsWith(".parquet")).map(base.relativize(_).toString).toSet
      } finally s.close()
    }
    val before = files(s"$idxAppend/postings")
    VectorIndex.append(emb.filter(pmod(col("vec_id"), lit(2)) === 1), idxAppend)
    val after = files(s"$idxAppend/postings")
    assert(before.subsetOf(after) && after.size > before.size,
      s"append must only ADD posting files (${before.size} -> ${after.size})")

    // postings row-identical to the full build
    def postings(p: String): Set[String] =
      spark.read.parquet(s"$p/postings")
        .select(col("label"), col("vec_id"), col("codes"))
        .collect().map(_.toString).toSet
    assert(postings(idxAppend) == postings(idxFull),
      "appended postings diverge from a fresh full build")

    // and the search surface answers identically
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("label"), col("vec_id").as("qid"), col("embedding").as("qv"))
    val a = VectorIndex.searchTopK(spark, idxAppend, queries, k = 3)
      .orderBy("qid", "rank").collect().map(_.toString)
    val f = VectorIndex.searchTopK(spark, idxFull, queries, k = 3)
      .orderBy("qid", "rank").collect().map(_.toString)
    assert(a.nonEmpty && a.sameElements(f))
  }
}
