package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector-similarity primitives over `Array[Float]` embedding columns.
  *
  * Dot products are computed as a sequential left-fold in DOUBLE via
  * `aggregate(zip_with(...))` — bit-identical to the DuckDB oracle's
  * `list_sum` over a comprehension, which is what makes cosine scores
  * hash-comparable across engines. All per-pair work is codegen'd expression
  * evaluation; the pair generation strategy (brute force / IVF partition /
  * LSH bucket) decides the join shape and is what changes at 100 TB.
  */
object Similarity {

  /** dot(a, b) in double precision, sequential accumulation order */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** deterministic random-hyperplane bit: sign of sum_i sign60(b,i) * v_i,
    * where sign60 is ±1 from the shared 60-bit hash — reproducible in SQL
    * engines for oracle checks, no RNG state. */
  def hyperplaneBit(vec: String, planeIdx: Int): Column =
    expr(s"CASE WHEN aggregate(zip_with($vec, sequence(1, size($vec)), " +
      s"(x, i) -> CAST(x AS DOUBLE) * CASE WHEN " +
      s"(CAST(conv(substring(md5(concat('p$planeIdx:', CAST(i AS STRING))), 1, 15), 16, 10) AS BIGINT) & 1) = 1 " +
      s"THEN 1.0 ELSE -1.0 END), CAST(0 AS DOUBLE), (acc, v) -> acc + v) > 0 THEN 1 ELSE 0 END")

  /** nBits-bit LSH bucket id from deterministic hyperplanes */
  def lshBucket(vec: String, nBits: Int): Column =
    (0 until nBits).map(b => hyperplaneBit(vec, b) * lit(1L << b))
      .reduce(_ + _).cast("long")
}
