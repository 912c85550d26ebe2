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
}
