package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.queries.RetrievalQueries

/** The deep-BPE exactness claims, proven rather than asserted:
  *
  *  1. the SQL batch-merge fold ≡ an INDEPENDENT plain-Scala greedy model
  *     (left-to-right, merged symbol becomes the new prev) for arbitrary
  *     rule sets — including overlapping/chaining ones the selector would
  *     never emit, so the fold's semantics are pinned, not just its use;
  *  2. for rule sets the non-overlap selector actually emits, ONE batch
  *     fold ≡ applying the member rules ONE AT A TIME, in rank order AND
  *     in reverse — the commutation argument that makes a batched round
  *     exactly the sequential result of its members;
  *  3. the selector itself: top-1 always survives, survivors are pairwise
  *     non-conflicting, and the batch bound holds.
  */
class DeepBpeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** independent greedy model of one batch round: left-to-right, a rule
    * (prev, x) merges into prev+x which stays the open symbol */
  private def model(syms: Seq[String], rules: Set[(String, String)]): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    syms.foreach { x =>
      if (out.nonEmpty && rules.contains((out.last, x)))
        out(out.length - 1) = out.last + x
      else out += x
    }
    out.toSeq
  }

  private def foldViaSql(words: Seq[Seq[String]],
                         rules: Seq[(String, String)]): Seq[Seq[String]] = {
    import spark.implicits._
    val df = words.zipWithIndex.map { case (w, i) => (i, w) }.toDF("i", "syms")
    df.withColumn("syms", expr(RetrievalQueries.bpeBatchFoldExpr(rules)))
      .orderBy("i").collect()
      .map(_.getSeq[String](1).toSeq).toSeq
  }

  private val alphabet = "abcdef".map(_.toString)

  test("SQL batch fold == plain-Scala greedy model on random words and " +
    "ARBITRARY rule sets (overlapping and chaining included)") {
    val rnd = new scala.util.Random(7)
    (1 to 25).foreach { trial =>
      val words = Seq.fill(40)(
        Seq.fill(1 + rnd.nextInt(10))(alphabet(rnd.nextInt(alphabet.length))))
      // arbitrary rules over single letters AND over merged symbols (chains)
      val rules = (Seq.fill(4)((alphabet(rnd.nextInt(6)), alphabet(rnd.nextInt(6)))) ++
        Seq(("ab", "c"), ("a", "bc"))).distinct
      val got = foldViaSql(words, rules)
      val want = words.map(model(_, rules.toSet))
      assert(got == want, s"trial $trial rules=$rules")
    }
  }

  test("batch fold == sequential one-rule folds (rank order AND reversed) " +
    "for selector-emitted rule sets") {
    val rnd = new scala.util.Random(11)
    (1 to 15).foreach { trial =>
      val words = Seq.fill(60)(
        Seq.fill(1 + rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length))))
      // candidate window from actual pair counts, ranked like the operator
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach(w => w.sliding(2).foreach {
        case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
        case _ => ()
      })
      val cands = counts.toSeq.map { case ((a, b), n) => (a, b, n) }
        .sortBy { case (a, b, n) => (-n, a + "|" + b) }
      val sel = RetrievalQueries.bpeSelectBatch(cands, batch = 3)
      if (sel.nonEmpty) {
        val rules = sel.map(p => (p._1, p._2))
        val batch = foldViaSql(words, rules)
        def sequential(order: Seq[(String, String)]): Seq[Seq[String]] =
          order.foldLeft(words)((ws, r) =>
            ws.map(model(_, Set(r)))) // one-rule model per step
        assert(batch == sequential(rules), s"trial $trial rules=$rules")
        assert(batch == sequential(rules.reverse),
          s"trial $trial reversed rules=$rules")
      }
    }
  }

  test("selector: top-1 survives, survivors pairwise non-conflicting, " +
    "batch bound respected") {
    val cands = Seq(
      ("a", "b", 100L), ("b", "c", 90L), ("c", "d", 80L), ("e", "f", 70L),
      ("ab", "c", 60L), ("f", "f", 50L), ("x", "y", 40L), ("y", "z", 30L))
    val sel = RetrievalQueries.bpeSelectBatch(cands, batch = 3)
    assert(sel.head == ("a", "b", 100L)) // top-1 always in
    // (b,c) conflicts with (a,b) via b; (c,d) conflicts with (b,c)? —
    // conflict is vs ALL higher-ranked candidates, selected or not:
    // (c,d) shares c with (b,c) → out; (e,f) clean → in; (ab,c) equals
    // (a,b)'s concat → out; (f,f) shares f with (e,f) → out; (x,y) in;
    // batch=3 stops there
    assert(sel == Seq(("a", "b", 100L), ("e", "f", 70L), ("x", "y", 40L)))
    def conflict(p: (String, String, Long), q: (String, String, Long)) =
      p._1 == q._1 || p._1 == q._2 || p._2 == q._1 || p._2 == q._2 ||
        p._1 == q._1 + q._2 || q._1 == p._1 + p._2
    sel.combinations(2).foreach { case Seq(p, q) =>
      assert(!conflict(p, q) && !conflict(q, p), s"$p conflicts $q")
    }
    assert(sel.length <= 3)
  }
}
