package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.Pii

/** Pii contract: detection counts what a human would, masking leaves zero
  * residual matches, and the rule ORDER prevents cross-rule artifacts (an
  * email's dotted domain never resurfaces as an IPv4). */
class PiiSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def frame(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def scrubOne(s: String): String =
    Pii.scrub(frame((1L, s)), "text").select("text").first().getString(0)

  private def countsOne(s: String): (Int, Int, Int) = {
    val r = Pii.withCounts(frame((1L, s)), "text")
      .select("n_email", "n_phone", "n_ipv4").first()
    (r.getInt(0), r.getInt(1), r.getInt(2))
  }

  test("each rule detects and masks its shape") {
    assert(countsOne("write a.b+c%d@mail-x.example.org soon") === ((1, 0, 0)))
    assert(scrubOne("write a.b+c%d@mail-x.example.org soon")
      === "write <EMAIL> soon")

    assert(countsOne("call +44 020-555-0123 now") === ((0, 1, 0)))
    assert(scrubOne("call +44 020-555-0123 now") === "call <PHONE> now")

    assert(countsOne("ping 192.168.001.255 ok") === ((0, 0, 1)))
    assert(scrubOne("ping 192.168.001.255 ok") === "ping <IP> ok")
  }

  test("near-misses do NOT match") {
    // bare number runs without the + prefix; dotted triples; no-TLD emails
    val (e, p, i) = countsOne("order 555-123-4567 v1.2.3 at user@localhost x")
    assert((e, p, i) === ((0, 0, 0)))
  }

  test("multi-PII doc: every shape masked, counts independent") {
    val s = "mail u1@ex.com or u2@ex.org, call +1 555-123-4567, " +
      "host 10.0.0.1 and 10.0.0.2"
    assert(countsOne(s) === ((2, 1, 2)))
    val out = scrubOne(s)
    assert(out === "mail <EMAIL> or <EMAIL>, call <PHONE>, " +
      "host <IP> and <IP>")
  }

  test("rule order: email's dotted domain never resurfaces as an IPv4") {
    // the domain embeds a valid dotted quad — under the default order the
    // whole address masks as ONE email and no <IP> leaks
    val s = "u@mail.10.0.0.10.example.com deployed"
    assert(scrubOne(s) === "<EMAIL> deployed")
    // with the order REVERSED the quad fires inside the address and the
    // mangled remainder no longer parses as an email — order is semantic
    assert(Pii.scrub(frame((1L, s)), "text", Seq(Pii.Ipv4, Pii.Email))
      .select("text").first().getString(0)
      === "u@mail.<IP>.example.com deployed")
    // 5 dotted groups: the quad match is leftmost, the tail survives
    assert(scrubOne("at 1.2.3.4.5 end") === "at <IP>.5 end")
  }

  test("report: per-rule rollup with zero residual, self-certified") {
    val df = frame(
      (1L, "u@ex.com and 10.0.0.1"),
      (2L, "call +1 555-123-4567"),
      (3L, "plain prose, nothing here"),
      (4L, "u2@ex.com u3@ex.com"))
    val r = Pii.report(df, "text").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq === Seq(
      ("email", 2L, 3L, 0L), ("ipv4", 1L, 1L, 0L), ("phone", 1L, 1L, 0L)))
  }

  test("custom rule set: order respected, names key the columns") {
    val hex = Pii.Rule("hexid", "\\b0x[0-9a-f]{8}\\b", "<HEX>")
    val df = Pii.withCounts(frame((1L, "ref 0xdeadbeef ok")), "text", Seq(hex))
    assert(df.select("n_hexid").first().getInt(0) === 1)
    assert(Pii.scrub(frame((1L, "ref 0xdeadbeef ok")), "text", Seq(hex))
      .select("text").first().getString(0) === "ref <HEX> ok")
    // invalid configs are bind-time errors
    intercept[IllegalArgumentException] { Pii.report(df, "text", Seq.empty) }
    intercept[IllegalArgumentException] { Pii.Rule("bad name", "x", "y") }
    intercept[IllegalArgumentException] {
      Pii.report(df, "text", Seq(hex, hex))
    }
  }

  test("fuzz: scrub is idempotent, residual-free, and agrees with a " +
    "driver-side java.util.regex reference on adversarial glue") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val token = Gen.oneOf(
      "hello", "x1", "a.b", "-", "10.0.0.1", "999.1.2.3", "1.2.3.4.5",
      "u@ex.com", "u@localhost", "a@10.0.0.7", "bare@", "@start",
      "+1 555-123-4567", "555-123-4567", "+999 1-2-3", "v1.2.3",
      "admin@mail.10.0.0.10.example.com", "0x7f", "..", "<EMAIL>")
    val sep = Gen.oneOf(" ", "", ".", "-", "  ")
    val textGen = for {
      n <- Gen.chooseNum(0, 12)
      ts <- Gen.listOfN(n, token)
      ss <- Gen.listOfN(math.max(n - 1, 0), sep)
    } yield ts.zipAll(ss, "", "").map { case (t, s) => t + s }.mkString
    val texts = (0 until 40).flatMap(i =>
      textGen.apply(Gen.Parameters.default, Seed(i.toLong)))
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = Pii.scrub(df, "text", out = "clean")
      .withColumn("twice", Pii.scrubCol(col("clean")))
    val rows = Pii.withCounts(out, "text")
      .select("text", "clean", "twice", "n_email", "n_phone", "n_ipv4")
      .collect()
    rows.foreach { r =>
      val (orig, clean, twice) =
        (r.getString(0), r.getString(1), r.getString(2))
      // idempotence: a scrubbed corpus re-entering the pipeline is a no-op
      assert(clean == twice, s"not idempotent on '$orig'")
      // residual-free: no rule matches its own pattern after masking
      Pii.Default.foreach { rule =>
        assert(!rule.pattern.r.findFirstIn(clean).isDefined,
          s"residual ${rule.name} in '$clean' (from '$orig')")
      }
      // Spark == plain java.util.regex applied in the same order
      val ref = Pii.Default.foldLeft(orig)((t, rule) =>
        rule.pattern.r.replaceAllIn(t, rule.mask))
      assert(clean == ref, s"driver-reference mismatch on '$orig'")
      val refCounts = Pii.Default.map(rule =>
        rule.pattern.r.findAllIn(orig).size)
      assert(Seq(r.getInt(3), r.getInt(4), r.getInt(5)) == refCounts,
        s"count mismatch on '$orig'")
    }
  }

  test("scrub into a separate output column preserves the original") {
    val out = Pii.scrub(frame((1L, "u@ex.com")), "text", out = "clean")
      .select("text", "clean").first()
    assert(out.getString(0) === "u@ex.com")
    assert(out.getString(1) === "<EMAIL>")
  }
}
