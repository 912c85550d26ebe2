package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key aggregation: the two-phase salted aggregate.
  *
  * Phase 1 shuffles on (key, salt) so a hot key spreads over `saltBuckets`
  * reducers; phase 2 re-aggregates the tiny per-salt partials on the key.
  * Only algebraic aggregates (sum/count/min/max) compose this way, which is
  * why the operator takes them explicitly. Results are bit-identical to the
  * unsalted groupBy — the oracle checks exactly that.
  *
  * (AQE's skew-join handling covers joins; aggregation skew still needs the
  * salt when a single group dominates — e.g. language or event-type keys in
  * web-scale corpora where one value is 90% of rows.)
  */
object SkewTools {

  final case class AlgebraicAgg(phase1: Seq[Column], phase2: Seq[Column])

  /** sum/count/min/max composition for a numeric value column */
  def sumCountMinMax(valueCol: String): AlgebraicAgg = AlgebraicAgg(
    phase1 = Seq(
      sum(col(valueCol)).as("__sum"),
      count(lit(1)).as("__cnt"),
      min(col(valueCol)).as("__min"),
      max(col(valueCol)).as("__max")),
    phase2 = Seq(
      sum(col("__sum")).as(s"sum_$valueCol"),
      sum(col("__cnt")).as("n"),
      min(col("__min")).as(s"min_$valueCol"),
      max(col("__max")).as(s"max_$valueCol")))

  def saltedAgg(df: DataFrame, keyCol: String, agg: AlgebraicAgg,
                saltBuckets: Int, saltOn: Column): DataFrame =
    df.withColumn("__salt", pmod(saltOn, lit(saltBuckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(agg.phase1.head, agg.phase1.tail: _*)
      .groupBy(col(keyCol))
      .agg(agg.phase2.head, agg.phase2.tail: _*)

  /** Skew-salted equi-join (the manual pre-AQE form, still needed when a
    * single hot key exceeds what one split task can absorb): the fact side
    * gets a deterministic salt in [0, saltBuckets); the dim side is
    * replicated saltBuckets× (explode of a literal range — map-side, no
    * shuffle of the dim scan), and the join key becomes (key, salt), so a
    * hot key's rows spread over saltBuckets reducers. Row-identical to the
    * plain equi-join; cost is dim×saltBuckets build rows, which is why the
    * dim side must be the small one. */
  def saltedJoin(fact: DataFrame, factKey: String,
                 dim: DataFrame, dimKey: String,
                 saltBuckets: Int, saltOn: Column): DataFrame = {
    // coalesce: a NULL salt expression would null the equi-condition and
    // silently DROP the fact row; any deterministic bucket preserves the
    // row-identical-to-plain-join contract
    val f = fact.withColumn("__salt",
      coalesce(pmod(saltOn, lit(saltBuckets)), lit(0)))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    f.join(d, f(factKey) === d(dimKey) && f("__salt") === d("__salt"))
      .drop("__salt")
  }
}
