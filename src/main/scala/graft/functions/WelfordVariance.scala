package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate (the `Aggregator[IN, BUF, OUT]` extensibility
  * surface): sample variance via Welford/Chan parallel combination —
  * numerically stable and ASSOCIATIVE, so partial aggregation across any
  * number of partitions yields the same result as a single pass (the
  * property that makes a custom aggregate safe at cluster scale).
  * Output matches the engines' built-in var_samp, which is what the oracle
  * checks. */
final case class VarBuf(n: Long, mean: Double, m2: Double)

object WelfordVariance extends Aggregator[Double, VarBuf, Double] {
  type Buf = VarBuf
  private def Buf(n: Long, mean: Double, m2: Double): VarBuf =
    VarBuf(n, mean, m2)

  override def zero: Buf = Buf(0L, 0.0, 0.0)

  override def reduce(b: Buf, x: Double): Buf = {
    val n = b.n + 1
    val d = x - b.mean
    val mean = b.mean + d / n
    Buf(n, mean, b.m2 + d * (x - mean))
  }

  override def merge(a: Buf, b: Buf): Buf = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      Buf(n,
        a.mean + d * b.n / n,
        a.m2 + b.m2 + d * d * a.n * b.n / n)
    }
  }

  override def finish(b: Buf): Double =
    if (b.n < 2) Double.NaN else b.m2 / (b.n - 1)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
