package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSql

/** Vector-similarity primitives over `Array[Float]` embedding columns.
  *
  * Dot products are a sequential left-fold in DOUBLE — bit-identical to the
  * DuckDB oracle's `list_sum` over a comprehension, which is what makes
  * cosine scores hash-comparable across engines. The folds are native
  * codegen'd expressions ([[DotFold]]/[[L2SqFold]]/[[MaxAbsFold]]): the
  * `aggregate(zip_with(...))` Column equivalents are higher-order functions,
  * which Spark evaluates interpreted — at ANN pair volume the fold is the
  * workload, so it must compile. The pair generation strategy (brute force /
  * IVF partition / LSH bucket) decides the join shape and is what changes
  * at 100 TB.
  */
object Similarity {

  /** dot(a, b) in double precision, sequential accumulation order
    * (native codegen'd fold — see [[DotFold]]) */
  def dot(a: Column, b: Column): Column =
    GraftSql.column(DotFold(GraftSql.expression(a), GraftSql.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** division sequenced as dot/na/nb to match the oracle's `/ sqrt / sqrt`
    * exactly (a/(b*c) differs from a/b/c in the last ulp) */
  def cosine(a: Column, b: Column): Column = dot(a, b) / norm(a) / norm(b)

  /** Per-vector symmetric int8 quantization scale: max|x|/127, floored at
    * 1e-30 so the all-zero vector stays finite. 4× memory over float32 —
    * at 100 TB of embeddings that is the difference between spilling and
    * fitting; recall loss is measured, not guessed (`ann_quantized_int8`
    * hash-verifies the quantized scores against the oracle recomputing the
    * identical arithmetic). */
  def quantScale(v: Column): Column =
    greatest(
      GraftSql.column(MaxAbsFold(GraftSql.expression(v))) / lit(127.0),
      lit(1e-30))

  /** quantize-then-dequantize in one step: round-half-up via floor(x/s+0.5)
    * — floor is exact in both engines, unlike round(), whose half-way rule
    * differs across engines — times the scale. Values land on the int8
    * lattice [-127, 127]·s; downstream cosine runs on these doubles. */
  def dequantized(v: Column, scale: Column): Column =
    transform(v, x => floor(x.cast("double") / scale + lit(0.5)) * scale)

  /** squared L2 distance in double precision, sequential accumulation
    * (native codegen'd fold — see [[L2SqFold]]) */
  def l2sq(a: Column, b: Column): Column =
    GraftSql.column(L2SqFold(GraftSql.expression(a), GraftSql.expression(b)))

  /** Product-quantization encode+decode in one map-side expression: the
    * vector is cut into `numSub` subspaces; each subvector snaps to its
    * nearest codebook entry (argmin squared-L2, ties to the lowest entry
    * id) and the reconstruction concatenates the chosen entries. The
    * codebook is a bounded build side (entries × dim floats) folded into
    * literals at plan time — same topology as the k-means IVF seeds, so
    * encoding shuffles nothing. numSub codes/vector = 8 bytes instead of
    * 256 at 64-dim float32 — the memory knob that keeps a 100 TB corpus'
    * index resident; accuracy is hash-measured, not guessed
    * (`ann_pq` verifies the reconstructed scores against the oracle
    * recomputing identical arithmetic).
    *
    * Result type is ARRAY<DOUBLE> (the fold's exact-widened accumulator
    * element type) — note for consumers of the reconstructed column: the
    * pre-fold struct-min formulation surfaced ARRAY<FLOAT>; the values are
    * the identical float lattice points, exactly widened. */
  def pqReconstruct(vec: Column, codebook: Array[(Long, Array[Float])],
                    numSub: Int): Column =
    GraftSql.column(PqEncodeFold(GraftSql.expression(vec),
      codebook.map(_._1),
      codebook.map(_._2.map(_.toDouble)), // float→double widening is exact
      numSub, emitCodes = false))

  /** PQ CODES (the chosen entry id per subspace — what the index stores:
    * numSub longs instead of dim floats). Same argmin/tie contract as
    * [[pqReconstruct]]. */
  def pqAssign(vec: Column, codebook: Array[(Long, Array[Float])],
               numSub: Int): Column =
    GraftSql.column(PqEncodeFold(GraftSql.expression(vec),
      codebook.map(_._1),
      codebook.map(_._2.map(_.toDouble)),
      numSub, emitCodes = true))

  /** Same as [[pqReconstruct]] but with a DOUBLE codebook — used for
    * TRAINED codewords (per-dimension means), which only agree across
    * engines in double precision (a float32 narrowing would diverge from
    * the oracle's double arithmetic). */
  def pqReconstructD(vec: Column, codebook: Array[(Long, Array[Double])],
                     numSub: Int): Column =
    GraftSql.column(PqEncodeFold(GraftSql.expression(vec),
      codebook.map(_._1), codebook.map(_._2), numSub, emitCodes = false))

  /** Reconstruct a vector from stored PQ CODES (the index-serving
    * direction: codes → codeword slices). Exact inverse of [[pqAssign]]'s
    * id choice; O(1) plan size at any codebook K — see [[PqDecodeFold]]. */
  def pqDecode(codes: Column, codebook: Array[(Long, Array[Float])],
               numSub: Int): Column =
    GraftSql.column(PqDecodeFold(GraftSql.expression(codes),
      codebook.map(_._1),
      codebook.map(_._2.map(_.toDouble)), // float→double widening is exact
      numSub))

  /** 60-bit md5 hash as a column — the deterministic key for splits,
    * sampling, and shingle hashing; equals DuckDB
    * `('0x'||substr(md5(x),1,15))::BIGINT`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 60-bit md5 hash computed driver-side — same value as the SQL
    * `conv(substring(md5(s),1,15),16,10)` used by the oracles. */
  def hash60Scala(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** deterministic random-hyperplane bit: sign of sum_i sign60(plane,i)*v_i.
    * The ±1 sign vector is md5-derived but CONSTANT per (plane, dim), so it
    * is folded to an array literal at plan time — per row only the dot
    * product remains (the expression-per-dim md5 variant was 384 md5 calls
    * per input row). The SQL oracle recomputes the same signs symbolically. */
  def hyperplaneBit(vec: Column, planeIdx: Int, dim: Int): Column = {
    val signs = (1 to dim).map { i =>
      if ((hash60Scala(s"p$planeIdx:$i") & 1L) == 1L) 1.0 else -1.0
    }
    val sgn = array(signs.map(lit): _*)
    when(dot(vec, sgn) > 0, 1L).otherwise(0L)
  }

  /** nBits-bit LSH bucket id from deterministic hyperplanes */
  def lshBucket(vec: Column, nBits: Int, dim: Int): Column =
    (0 until nBits).map(b => hyperplaneBit(vec, b, dim) * lit(1L << b))
      .reduce(_ + _).cast("long")
}
