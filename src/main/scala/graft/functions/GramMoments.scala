package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One-pass covariance moments for a fixed-dimension embedding column —
  * the map-side state of `embed_covariance` / `embed_pca_power`.
  *
  * Replaces the pair-EXPLODE formulation (one row per (i ≤ j) dimension
  * pair per input row — dim(dim+1)/2 = 2080 generated rows per embedding
  * at dim 64, hash-aggregated back down to 2080 groups) with a typed
  * `Aggregator` whose buffer is ONE `long[dim + dim(dim+1)/2]`: slot d
  * holds Σ round(x_d·1e8) (the dim sums) and the tail holds
  * Σ round(x_i·x_j·1e8) in (i, j ≥ i) row-major order. Updates mutate the
  * buffer in place; merges are element-wise long adds — order-invariant
  * BIGINT arithmetic, so the result is bit-identical to the exploded
  * original (identical rounded products, summed in any order). At any
  * scale the partial-aggregate state is a fixed ~17 KB per task and the
  * shuffle carries one buffer per partition — the same "bounded model"
  * posture as the kmeans/PCA collects.
  *
  * Rounding replicates Spark's `round(double, 0)` (BigDecimal.valueOf +
  * HALF_UP) exactly: the fast path `floor(v + 0.5)` / `ceil(v − 0.5)` is
  * used only when the fractional part is ≥ 1e-6 away from the 0.5
  * boundary — farther than the half-ulp wobble of `BigDecimal.valueOf`'s
  * shortest-decimal representation, so both paths agree there — and the
  * boundary cases take the BigDecimal path verbatim.
  *
  * NULL embeddings contribute nothing (the exploded original generated no
  * rows for them); row count is aggregated alongside by the caller's
  * `count(lit(1))` in the same single pass.
  */
object GramMoments {

  final val Dim = 64
  final val PairLen: Int = Dim * (Dim + 1) / 2
  final val BufLen: Int = Dim + PairLen

  /** Spark `round(v, 0)` for doubles: decimal HALF_UP via BigDecimal. */
  def roundHalfUp(v: Double): Long = {
    val f = v - Math.floor(v)
    if (Math.abs(f - 0.5) >= 1e-6) {
      // away from the tie boundary: binary floor/ceil == decimal HALF_UP
      if (v >= 0) Math.floor(v + 0.5).toLong else Math.ceil(v - 0.5).toLong
    } else {
      java.math.BigDecimal.valueOf(v)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    }
  }

  private[graft] object Agg extends Aggregator[Seq[Float], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](BufLen)

    override def reduce(b: Array[Long], emb: Seq[Float]): Array[Long] = {
      if (emb != null) {
        val n = math.min(emb.length, Dim)
        val x = new Array[Double](n)
        var i = 0
        while (i < n) { x(i) = emb(i).toDouble; i += 1 }
        i = 0
        var off = Dim
        while (i < n) {
          b(i) += roundHalfUp(x(i) * 1e8)
          var j = i
          while (j < n) {
            // (x_i * x_j) scaled AFTER the product — same association as
            // the exploded original's `xi * element_at(...) * 1e8`
            b(off + (j - i)) += roundHalfUp(x(i) * x(j) * 1e8)
            j += 1
          }
          off += Dim - i
          i += 1
        }
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < BufLen) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(b: Array[Long]): Seq[Long] = b.toSeq

    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** the aggregate as a Column function: `moments(col("embedding"))` →
    * ARRAY<BIGINT> of length [[BufLen]] (dim sums ++ pair sums) */
  def moments(emb: Column): Column =
    udaf(Agg, ExpressionEncoder[Seq[Float]]()).apply(emb)

  /** 1-based `element_at` index of Σ round(x_i·x_j·1e8) for 0-based
    * dimension columns i ≤ j: Dim + i(2·Dim+1−i)/2 + (j−i) + 1.
    * Column `/` is double division, but i(129−i) is even and ≤ 64·129 —
    * far inside double exactness — so the cast back to int is lossless
    * for every valid (i, j); the GramMoments equivalence spec checks all
    * 2080 cells. */
  def pairIndex(i: Column, j: Column): Column = {
    import org.apache.spark.sql.functions.lit
    lit(Dim) + (i * (lit(2 * Dim + 1) - i)) / 2 + (j - i) + 1
  }
}
