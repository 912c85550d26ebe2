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

  /** tokens[first..last] (0-based, inclusive) space-joined with concat_ws
    * semantics: NULL elements are skipped entirely (no doubled separator). */
  def joinTokens(a: ArrayData, first: Int, last: Int): UTF8String = {
    val bb = new java.io.ByteArrayOutputStream()
    var i = first
    var any = false
    while (i <= last) {
      if (!a.isNullAt(i)) {
        if (any) bb.write(' ')
        val b = a.getUTF8String(i).getBytes
        bb.write(b, 0, b.length)
        any = true
      }
      i += 1
    }
    UTF8String.fromBytes(bb.toByteArray)
  }

  /** 60-bit md5 hash of every k-gram of the token array: h(i) =
    * md5Hash60(tokens[i..i+k−1] space-joined, concat_ws null-skipping) —
    * the compiled form of `hash60(concat_ws(' ', t[i], …, t[i+k−1]))`. */
  def gramHashes(a: ArrayData, k: Int): Array[Long] = {
    val m = a.numElements() - k + 1
    val h = new Array[Long](if (m > 0) m else 0)
    var i = 0
    while (i < m) {
      h(i) = md5Hash60(joinTokens(a, i, i + k - 1).getBytes)
      i += 1
    }
    h
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

/** Winnowing fingerprint selection (Schleimer et al. 2003, the MOSS
  * algorithm) as ONE compiled pass: hash every k-gram (60-bit md5 of the
  * space-joined gram — `hash60` semantics, concat_ws null-skipping), keep
  * the minimum hash of each sliding window of w consecutive gram hashes
  * (only windows fully inside the doc — gram index ≥ w, matching the
  * exploded formulation's `i >= w` filter), then distinct, ascending.
  *
  * Replaces a per-GRAM-POSITION explode + doc-partitioned window-min +
  * distinct: that plan materializes one row per token position and sorts
  * them inside a window exchange before any fingerprint exists; this fold
  * emits only the selected fingerprints, map-side. By the winnowing
  * density bound the output is ~2/(w+1) of the gram count before distinct.
  *
  * NULL array → NULL; fewer than max(k, k+w−1) tokens → empty array (docs
  * that produced zero surviving rows in the exploded original). */
case class WinnowFpFold(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def prettyName: String = "winnow_fp_fold"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${t.sql}")
  }

  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val m = n - k + 1
    if (m < w) return new GenericArrayData(Array.emptyLongArray)
    val h = TextFoldUtil.gramHashes(a, k)
    val fps = new java.util.TreeSet[java.lang.Long]()
    var i = w - 1 // 0-based index of the window's LAST gram
    while (i < m) {
      var mn = h(i)
      var j = i - w + 1
      while (j < i) { if (h(j) < mn) mn = h(j); j += 1 }
      fps.add(mn)
      i += 1
    }
    val out = new Array[Long](fps.size)
    val it = fps.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(c: Any): Any = compute(c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wnFold", this, classOf[WinnowFpFold].getName)
    val ad = classOf[ArrayData].getName
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = ($ad) $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFpFold =
    copy(child = newChild)
}

/** Content-defined chunking (the LBFS/rsync gear): chunk boundaries fall
  * AFTER every k-gram position whose 60-bit gram hash ≡ 0 (mod div) — a
  * boundary gram is the LAST position of its chunk, exactly the
  * `cid = running_sum(b) − b` arithmetic of the windowed formulation this
  * replaces. Emits each chunk's text (tokens[first .. last+k−1], space-
  * joined, concat_ws null-skipping) in document order; overlap between
  * adjacent chunks (the shared k−1 gram tail) is part of the contract.
  *
  * Replaces a per-position explode + TWO doc-partitioned windows + a
  * join-back + per-chunk slice; the fold walks the token array once.
  *
  * NULL array → NULL; fewer than k tokens → empty array. */
case class CdcChunkFold(child: Expression, k: Int, div: Int)
    extends UnaryExpression {
  override def prettyName: String = "cdc_chunk_fold"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${t.sql}")
  }

  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val m = n - k + 1
    if (m < 1) return new GenericArrayData(Array.empty[Any])
    val h = TextFoldUtil.gramHashes(a, k)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var firstG = 0 // 0-based gram index of the current chunk's first gram
    var g = 0
    while (g < m) {
      // h is non-negative (60-bit), so plain % matches SQL pmod exactly
      if (h(g) % div == 0) {
        out += TextFoldUtil.joinTokens(a, firstG, g + k - 1)
        firstG = g + 1
      }
      g += 1
    }
    if (firstG < m) out += TextFoldUtil.joinTokens(a, firstG, n - 1)
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(c: Any): Any = compute(c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdcFold", this, classOf[CdcChunkFold].getName)
    val ad = classOf[ArrayData].getName
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = ($ad) $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunkFold =
    copy(child = newChild)
}

/** DSIR hashed-bigram feature counts: per document, the count of bigrams
  * landing in each of nBuckets buckets, f = hash60(w1 ⊔ " " ⊔ w2) mod
  * nBuckets — ONE compiled pass returning a fixed long[nBuckets] histogram.
  * Replaces a per-bigram-POSITION explode (one row per token position,
  * interpreted md5 per row) + a (doc, lang, f) hash aggregation over
  * corpus-token-scale input: after this fold only ≤ nBuckets rows per doc
  * exist. Bigrams containing a NULL token are skipped (the exploded
  * original propagated a NULL feature instead, which then dropped out of
  * the weight join; split() arrays contain no NULLs, and the equivalence
  * spec pins the two forms equal on real data). NULL array → NULL. */
case class BigramFeatureCountFold(child: Expression, nBuckets: Int)
    extends UnaryExpression {
  override def prettyName: String = "bigram_feature_count_fold"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${t.sql}")
  }

  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val counts = new Array[Long](nBuckets)
    var i = 0
    while (i < n - 1) {
      if (!a.isNullAt(i) && !a.isNullAt(i + 1)) {
        val w1 = a.getUTF8String(i).getBytes
        val w2 = a.getUTF8String(i + 1).getBytes
        val b = new Array[Byte](w1.length + 1 + w2.length)
        System.arraycopy(w1, 0, b, 0, w1.length)
        b(w1.length) = ' '
        System.arraycopy(w2, 0, b, w1.length + 1, w2.length)
        // hash60 is non-negative, so % equals SQL pmod
        counts((TextFoldUtil.md5Hash60(b) % nBuckets).toInt) += 1L
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(c: Any): Any = compute(c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bfFold", this,
      classOf[BigramFeatureCountFold].getName)
    val ad = classOf[ArrayData].getName
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = ($ad) $ref.compute($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BigramFeatureCountFold =
    copy(child = newChild)
}

/** Per-document term counts as ONE compiled pass: tokens →
  * MAP<token, count>. Replaces the retrieval family's shared
  * `explode(tokens)` + `groupBy(doc_id, w).count()` base — a shuffle that
  * carries one row per corpus TOKEN — with a map-side histogram whose
  * explode yields one row per DISTINCT term per doc (~40 % of tokens on
  * natural text, and already grouped: no (doc, w) exchange at all).
  * NULL array → NULL; NULL tokens are skipped (split() arrays contain
  * none; the exploded original would group them under a NULL key). */
case class TokenCountsFold(child: Expression) extends UnaryExpression {
  override def prettyName: String = "token_counts_fold"
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${t.sql}")
  }

  def compute(a: ArrayData): org.apache.spark.sql.catalyst.util.MapData = {
    val n = a.numElements()
    val m = new java.util.LinkedHashMap[UTF8String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val w = a.getUTF8String(i)
        val prev = m.get(w)
        m.put(w, if (prev == null) 1L else prev + 1L)
      }
      i += 1
    }
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var o = 0
    while (it.hasNext) {
      val e = it.next()
      keys(o) = e.getKey; vals(o) = e.getValue; o += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def nullSafeEval(c: Any): Any = compute(c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tcFold", this, classOf[TokenCountsFold].getName)
    val md = classOf[org.apache.spark.sql.catalyst.util.MapData].getName
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = ($md) $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenCountsFold =
    copy(child = newChild)
}

/** Distinct k-token span hashes per document, ONE compiled pass: h(i) =
  * the exact multi-argument `xxhash64(t[i], …, t[i+k−1])` value (seed 42,
  * per-field chaining via Spark's own XxHash64Function; NULL fields skip
  * the chain step, as in the expression) — then distinct, ascending.
  * Replaces the span-dedup detection's per-POSITION explode + top-level
  * xxhash64 + a (doc, hash) DISTINCT exchange: the fold emits each doc's
  * deduplicated span-hash set map-side, so only distinct spans ever enter
  * a shuffle. NULL array → NULL; fewer than k tokens → empty array. */
case class SpanHashesFold(child: Expression, k: Int) extends UnaryExpression {
  override def prettyName: String = "span_hashes_fold"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${t.sql}")
  }

  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val m = n - k + 1
    if (m < 1) return new GenericArrayData(Array.emptyLongArray)
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < m) {
      var h = 42L
      var j = i
      while (j < i + k) {
        if (!a.isNullAt(j))
          h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
            .hash(a.getUTF8String(j), StringType, h)
        j += 1
      }
      set.add(h)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(c: Any): Any = compute(c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shFold", this, classOf[SpanHashesFold].getName)
    val ad = classOf[ArrayData].getName
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = ($ad) $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): SpanHashesFold =
    copy(child = newChild)
}
