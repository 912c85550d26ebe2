package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Connected-components label propagation: shapes the oracle data may not
  * exercise — long chains (multi-round convergence) and disjoint clusters. */
class DedupComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def components(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    graft.operators.Dedup
      .connectedComponents(pairs.toDF("id1", "id2"), "id1", "id2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain needs multiple propagation rounds, still converges to the min") {
    // 1-2-3-4-5-6-7-8: diameter 7, min label must travel the whole chain
    val chain = (1L to 7L).map(i => (i, i + 1))
    val c = components(chain)
    assert(c.size == 8)
    assert(c.values.toSet == Set(1L))
  }

  test("disjoint clusters keep separate component ids; pairs direction-free") {
    val c = components(Seq((10L, 11L), (12L, 11L), (20L, 21L), (30L, 31L), (31L, 30L)))
    assert(c(10L) == 10L && c(11L) == 10L && c(12L) == 10L)
    assert(c(20L) == 20L && c(21L) == 20L)
    assert(c(30L) == 30L && c(31L) == 30L)
  }

  test("clique converges in one round") {
    val nodes = (1L to 5L)
    val clique = for (a <- nodes; b <- nodes if a < b) yield (a, b)
    val c = components(clique)
    assert(c.values.toSet == Set(1L))
  }
}
