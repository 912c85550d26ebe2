package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native folds for the text-dedup hot path (MinHash signatures, SimHash
  * fingerprints, rolling hashes). Same rationale as [[PairFold]]: the
  * `aggregate(...)` Column formulations are higher-order functions —
  * interpreted, one intermediate array per step — and signature computation
  * is the map-side cost of every LSH/dedup operator. Each expression
  * replicates its HOF original bit-for-bit, including null semantics, and
  * the DuckDB oracle hash-checks the results end-to-end.
  *
  * Codegen uses the reference-object callback (one virtual call per row,
  * JIT-compiled loop inside) so surrounding projections stay in
  * whole-stage codegen.
  */
private[graft] object TextFoldUtil {
  private val mdTL: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** first 60 bits of md5(bytes) as a non-negative long — equals
    * `CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)` */
  def md5Hash60(bytes: Array[Byte]): Long = {
    val md = mdTL.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var k = 0
    while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
    v >>> 4
  }
}

/** MinHash signature: per shingle, base = md5-hash60 & (2^30−1); per hash
  * function h, sig[h] = min over shingles of (x·(2h+1) + h·40503) mod
  * 1073741789. NULL array → NULL; NULL shingles are skipped (`least`
  * semantics); empty array → all-MAX signature (the fold's init). */
case class MinhashSigFold(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def prettyName: String = "minhash_sig_fold"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${t.sql}")
  }

  def compute(a: ArrayData): ArrayData = {
    val acc = Array.fill(numHashes)(Long.MaxValue)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = TextFoldUtil.md5Hash60(a.getUTF8String(i).getBytes) & 1073741823L
        var h = 0
        while (h < numHashes) {
          val v = (x * (2 * h + 1) + h * 40503L) % 1073741789L
          if (v < acc(h)) acc(h) = v
          h += 1
        }
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  override def nullSafeEval(c: Any): Any = compute(c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mhFold", this, classOf[MinhashSigFold].getName)
    val ad = classOf[ArrayData].getName
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = ($ad) $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigFold =
    copy(child = newChild)
}

/** Per-token 60-bit md5 hashes: `transform(arr, t -> hash60(prefix || t))`
  * as one compiled pass (the HOF transform evaluates an interpreted md5
  * expression per element). NULL array → NULL; NULL elements map to NULL
  * elements (transform semantics). */
case class TokenHash60Fold(child: Expression, prefix: String)
    extends UnaryExpression {
  override def prettyName: String = "token_hash60_fold"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${t.sql}")
  }

  @transient private lazy val prefixBytes = prefix.getBytes("UTF-8")

  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) out(i) = null
      else {
        val tok = a.getUTF8String(i).getBytes
        val b = new Array[Byte](prefixBytes.length + tok.length)
        System.arraycopy(prefixBytes, 0, b, 0, prefixBytes.length)
        System.arraycopy(tok, 0, b, prefixBytes.length, tok.length)
        out(i) = TextFoldUtil.md5Hash60(b)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(c: Any): Any = compute(c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("thFold", this, classOf[TokenHash60Fold].getName)
    val ad = classOf[ArrayData].getName
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = ($ad) $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenHash60Fold =
    copy(child = newChild)
}

/** 60-bit SimHash: bit b is set iff 2·|{h : bit b of h set}| > |hashes|
  * (strict majority; the denominator counts NULL entries — `size()`
  * semantics — while NULL entries cast no votes — `filter` semantics). */
case class Simhash60Fold(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash60_fold"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<BIGINT>, got ${t.sql}")
  }

  def compute(a: ArrayData): Long = {
    val n = a.numElements()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val h = a.getLong(i)
        var b = 0
        while (b < 60) { counts(b) += ((h >> b) & 1L).toInt; b += 1 }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (2 * counts(b) > n) out |= (1L << b)
      b += 1
    }
    out
  }

  override def nullSafeEval(c: Any): Any = compute(c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shFold", this, classOf[Simhash60Fold].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Simhash60Fold =
    copy(child = newChild)
}

/** Distinct-token hash SET, sorted ascending: first-occurrence distinct of
  * the token array, 60-bit md5 hash per distinct token, sorted — one
  * compiled pass producing the representation [[SortedIntersectCount]]
  * merges linearly. Jaccard's verify stage is quadratic in candidate
  * PAIRS, so the per-pair work must be a merge over pre-sorted longs, not
  * a hash-set build; the sort happens once per document, map-side. NULL
  * array → NULL; NULL tokens are ignored (they can never intersect). */
case class TokenSetHashFold(child: Expression) extends UnaryExpression {
  override def prettyName: String = "token_set_hash_fold"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${t.sql}")
  }

  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val set = new java.util.HashSet[Long](Math.max(16, n * 2))
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        set.add(TextFoldUtil.md5Hash60(a.getUTF8String(i).getBytes)): Unit
      }
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override def nullSafeEval(c: Any): Any = compute(c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tsFold", this, classOf[TokenSetHashFold].getName)
    val ad = classOf[ArrayData].getName
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = ($ad) $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetHashFold =
    copy(child = newChild)
}

/** Count of tokens contained in a literal string set — replaces
  * `size(filter(arr, t -> t IN (...)))` (interpreted lambda per element)
  * in the stopword-ratio / language-ID / quality-model features. NULL
  * array → NULL; NULL elements are never members (IN's null semantics
  * drop them from the filter). */
case class TokenCountInFold(child: Expression, values: Seq[String])
    extends UnaryExpression {
  override def prettyName: String = "token_count_in_fold"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${t.sql}")
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](values.size * 2)
    values.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }

  def compute(a: ArrayData): Int = {
    val n = a.numElements()
    var i = 0; var c = 0
    while (i < n) {
      if (!a.isNullAt(i) && set.contains(a.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(x: Any): Any = compute(x.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tciFold", this,
      classOf[TokenCountInFold].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenCountInFold =
    copy(child = newChild)
}

/** |a ∩ b| of two SORTED long arrays by linear merge — the per-pair inner
  * loop of exact-Jaccard verification. O(|a|+|b|), zero allocation. Inputs
  * MUST be sorted ascending and duplicate-free ([[TokenSetHashFold]]
  * guarantees both). NULL array → NULL. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "sorted_intersect_count"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two ARRAY<BIGINT>, got ${l.sql}, ${r.sql}")
    }

  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("siFold", this,
      classOf[SortedIntersectCount].getName)
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Rabin–Karp rolling hash over the characters: fold
  * `acc = (acc·31 + ascii(char)) mod 1e9+7`. `ascii` here replicates
  * Spark's Ascii expression exactly: the SIGNED first byte of the
  * character's UTF-8 encoding (for ASCII text — the only kind the oracle
  * data contains — that is the code point). Empty string → 0, NULL → NULL. */
case class RollingHashFold(child: Expression) extends UnaryExpression {
  override def prettyName: String = "rolling_hash_fold"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${t.sql}")
  }

  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val first =
        if (cp < 0x80) cp
        else if (cp < 0x800) 0xC0 | (cp >> 6)
        else if (cp < 0x10000) 0xE0 | (cp >> 12)
        else 0xF0 | (cp >> 18)
      acc = (acc * 31 + first.toByte.toInt) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  override def nullSafeEval(c: Any): Any = compute(c.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rhFold", this, classOf[RollingHashFold].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHashFold =
    copy(child = newChild)
}
