package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned (bucketed) range join — the interval-containment join Spark has no
  * native operator for. A naive `a.t BETWEEN r.lo AND r.hi` join plans as a
  * broadcast-nested-loop / cartesian product: O(|events| × |ranges|)
  * comparisons, the classic 100 TB incident. Binning restores an equi-join:
  *
  *   - every point row computes ONE bin id (`floor(t / binWidth)`) map-side;
  *   - every range row explodes into the bins it overlaps
  *     (`(hi-lo)/binWidth + 1` rows — choose binWidth ≈ typical range span
  *     so the fan-out stays small);
  *   - the join is a hash equi-join on the bin id, then the exact
  *     containment predicate filters within each bin.
  *
  * No duplicates are produced: a point lives in exactly one bin, so each
  * qualifying (point, range) pair meets exactly once. Work scales with
  * |points| + Σ bins-per-range + |matches|, never the cross product, and the
  * bin key shuffles/broadcasts like any equi-join key.
  */
object RangeJoin {

  /** Join `points` (with numeric column `tCol`) to `ranges` (with numeric
    * `loCol`/`hiCol`, inclusive) on lo ≤ t ≤ hi. Column names must not
    * collide across the two inputs; values must be non-negative (bin ids use
    * integer DIV — exact at any magnitude, where a double division would
    * mis-bin epoch-nanosecond values beyond 2^53). */
  def rangeJoin(points: DataFrame, tCol: String,
                ranges: DataFrame, loCol: String, hiCol: String,
                binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binnedPoints = points.withColumn("__bin", binOf(tCol, binWidth))
    val binnedRanges = ranges.withColumn("__bin",
      explode(sequence(binOf(loCol, binWidth), binOf(hiCol, binWidth))))
    binnedPoints.join(binnedRanges, "__bin")
      .filter(col(tCol) >= col(loCol) && col(tCol) <= col(hiCol))
      .drop("__bin")
  }

  private def binOf(name: String, w: Long): Column =
    expr(s"`$name` DIV $w")
}
