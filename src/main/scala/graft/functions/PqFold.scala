package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Whole-operator product-quantization encode as ONE native expression.
  *
  * The composed-Column formulation (numSub × entries `slice`/[[L2SqFold]]/
  * `struct`/`array_min` nodes) evaluates 64 fold calls and allocates 64
  * intermediate slices per row; this expression runs the identical
  * arithmetic — per subspace, a first-wins argmin of the sequential
  * double-precision squared-L2 fold against each codebook entry — in one
  * compiled loop with zero per-row allocation beyond the output array.
  *
  * Bit-identity contract (the DuckDB oracle hash-checks it):
  *   - fold order: j ascending within the subspace, `d = x−y; acc += d·d`
  *     in double, float inputs widened exactly;
  *   - tie rule: strictly-smaller wins, so equal distances keep the lowest
  *     entry INDEX — `entries` must therefore be sorted by id ascending,
  *     which makes first-wins equal the lexicographic struct-min's
  *     ties-to-lowest-id (call sites sort; asserted here);
  *   - null semantics: NULL vector → NULL; wrong length → NULL; NULL
  *     element → NULL.
  *
  * `emitCodes = true` returns the chosen entry ids (ARRAY<BIGINT>, the
  * 8-byte PQ code a 100 TB index actually stores); `false` returns the
  * reconstructed vector (ARRAY<DOUBLE>) for asymmetric-distance search.
  *
  * Codegen calls back into [[encode]] through a reference object — one
  * virtual call per ROW (the loop inside is JIT-compiled Scala), which
  * keeps the surrounding projection inside whole-stage codegen without
  * inlining a giant method body.
  */
case class PqEncodeFold(child: Expression, ids: Array[Long],
                        codebook: Array[Array[Double]], numSub: Int,
                        emitCodes: Boolean)
    extends UnaryExpression {
  require(ids.length == codebook.length && ids.nonEmpty, "empty codebook")

  // entries normalize to id-ascending order HERE (stable zip-sort), so
  // first-wins argmin ≡ ties-to-lowest-id for any caller order — the
  // struct-min formulation this expression replaced handled unsorted
  // codebooks, so must this, rather than rejecting them at plan build
  private val (sortedIds: Array[Long], sortedCodebook: Array[Array[Double]]) =
    if (ids.sameElements(ids.sorted)) (ids, codebook)
    else {
      val z = ids.zip(codebook).sortBy(_._1)
      (z.map(_._1), z.map(_._2))
    }

  private val dim = codebook.head.length
  private val w = dim / numSub
  require(dim % numSub == 0, s"dim $dim not divisible by $numSub")

  override def prettyName: String = "pq_encode_fold"
  override def dataType: DataType =
    if (emitCodes) ArrayType(LongType, containsNull = false)
    else ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<FLOAT|DOUBLE>, got ${t.sql}")
  }

  @transient private lazy val childFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** the whole encode; public so generated code can call it */
  def encode(a: ArrayData): ArrayData = {
    if (a.numElements() != dim) return null
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) return null
      v(i) = if (childFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    val outD = if (emitCodes) null else new Array[Double](dim)
    val outK = if (emitCodes) new Array[Long](numSub) else null
    var s = 0
    while (s < numSub) {
      val off = s * w
      var best = Double.PositiveInfinity
      var bi = 0
      var c = 0
      while (c < sortedCodebook.length) {
        val cv = sortedCodebook(c)
        var acc = 0.0
        var j = 0
        while (j < w) {
          val d = v(off + j) - cv(off + j)
          acc += d * d
          j += 1
        }
        if (acc < best) { best = acc; bi = c }
        c += 1
      }
      if (emitCodes) outK(s) = sortedIds(bi)
      else {
        val cv = sortedCodebook(bi)
        var j = 0
        while (j < w) { outD(off + j) = cv(off + j); j += 1 }
      }
      s += 1
    }
    new GenericArrayData(if (emitCodes) outK.asInstanceOf[AnyRef] else outD)
  }

  override def nullSafeEval(c: Any): Any = encode(c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqFold", this, classOf[PqEncodeFold].getName)
    val ad = classOf[ArrayData].getName
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = ($ad) $ref.encode($v);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeFold =
    copy(child = newChild)

  // case-class equality on Array fields is reference equality, which makes
  // semantically identical folds compare unequal and defeats Catalyst
  // subexpression elimination — compare contents instead
  override def equals(o: Any): Boolean = o match {
    case p: PqEncodeFold =>
      p.child == child && p.numSub == numSub && p.emitCodes == emitCodes &&
        java.util.Arrays.equals(p.ids, ids) &&
        p.codebook.length == codebook.length &&
        p.codebook.indices.forall(i =>
          java.util.Arrays.equals(p.codebook(i), codebook(i)))
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(numSub),
      java.lang.Boolean.valueOf(emitCodes),
      Integer.valueOf(java.util.Arrays.hashCode(ids)))
}

/** PQ decode (codes → reconstructed vector) as one native expression: per
  * subspace, look up the stored entry id and copy its codeword slice.
  *
  * This replaces the CaseWhen-chain formulation (K whens × numSub subspaces
  * × w-element array literals — O(K·dim) PLAN nodes), whose generated code
  * grows with the codebook: at K=256 (a real IVFPQ config) the chain bloats
  * codegen past JIT limits, while this expression is O(1) plan size at any
  * K — the codebook travels as a reference object, exactly like
  * [[PqEncodeFold]]'s. Value-identical to the chain: the same exact
  * float→double-widened codeword slices, unknown id → NULL (the chain's
  * fall-through).
  */
case class PqDecodeFold(child: Expression, ids: Array[Long],
                        codebook: Array[Array[Double]], numSub: Int)
    extends UnaryExpression {
  require(ids.length == codebook.length && ids.nonEmpty, "empty codebook")

  private val dim = codebook.head.length
  private val w = dim / numSub
  require(dim % numSub == 0, s"dim $dim not divisible by $numSub")

  // id → entry index; ids are arbitrary longs (row ids, not dense ranks).
  // Boxed key/value types: a HashMap[Long, Int] in Scala unboxes a missing
  // key's null to 0, silently aliasing unknown ids to entry 0.
  @transient private lazy val byId: java.util.HashMap[java.lang.Long, java.lang.Integer] = {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Integer](ids.length * 2)
    ids.zipWithIndex.foreach { case (id, i) =>
      m.put(java.lang.Long.valueOf(id), Integer.valueOf(i))
    }
    m
  }

  override def prettyName: String = "pq_decode_fold"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType | IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<BIGINT|INT> codes, got ${t.sql}")
  }

  @transient private lazy val childInt =
    child.dataType.asInstanceOf[ArrayType].elementType == IntegerType

  /** whole reconstruction; public so generated code can call it */
  def decode(a: ArrayData): ArrayData = {
    if (a.numElements() != numSub) return null
    val out = new Array[Double](dim)
    var s = 0
    while (s < numSub) {
      if (a.isNullAt(s)) return null
      val code = if (childInt) a.getInt(s).toLong else a.getLong(s)
      val e = byId.get(code)
      if (e == null) return null // unknown entry id (CaseWhen fall-through)
      val cv = codebook(e.intValue())
      val off = s * w
      var j = 0
      while (j < w) { out(off + j) = cv(off + j); j += 1 }
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(c: Any): Any = decode(c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqDecode", this, classOf[PqDecodeFold].getName)
    val ad = classOf[ArrayData].getName
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = ($ad) $ref.decode($v);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PqDecodeFold =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case p: PqDecodeFold =>
      p.child == child && p.numSub == numSub &&
        java.util.Arrays.equals(p.ids, ids) &&
        p.codebook.length == codebook.length &&
        p.codebook.indices.forall(i =>
          java.util.Arrays.equals(p.codebook(i), codebook(i)))
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(numSub),
      Integer.valueOf(java.util.Arrays.hashCode(ids)))
}
