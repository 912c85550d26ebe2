package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd vector folds — the hot inner loop of every ANN /
  * similarity operator.
  *
  * The Column-API equivalents (`aggregate(zip_with(...))`) are higher-order
  * functions, which Spark evaluates INTERPRETED (HOFs are CodegenFallback
  * and allocate a zipped intermediate array per row). These expressions
  * compute the identical sequential left-fold in compiled Java inside
  * whole-stage codegen: same accumulation order, same double arithmetic,
  * same null semantics — bit-identical results (the DuckDB oracle
  * hash-checks that), minus the per-pair interpretation overhead. At ANN
  * candidate-generation scale (corpus × queries pairs) the fold IS the
  * workload, which is why this is a native `Expression` and not a UDF
  * (a UDF would serialize every array across the codegen boundary).
  *
  * Null semantics mirror `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, +)`:
  * NULL array → NULL; length mismatch → NULL (zip_with pads with nulls, and
  * the fold absorbs them); NULL element → NULL. [[MaxAbsFold]] mirrors
  * `aggregate(v, 0.0, (acc,x) => greatest(acc, abs(x)))`: greatest() skips
  * NULL elements, empty array → 0.0.
  */
private[graft] trait VectorFoldHelpers { self: Expression =>
  protected def elemGetter(e: Expression, arr: String, i: String): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _         => s"$arr.getDouble($i)"
    }

  protected def elemAt(e: Expression, arr: ArrayData, i: Int): Double =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => arr.getFloat(i).toDouble
      case _         => arr.getDouble(i)
    }

  protected def checkVecType(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$name expects ARRAY<FLOAT|DOUBLE>, got ${t.sql}")
    }
}

/** Pairwise fold over two numeric arrays: DOT (`acc += x*y`) or L2SQ
  * (`d = x-y; acc += d*d`), sequential, in double precision. */
abstract class PairFold extends BinaryExpression with VectorFoldHelpers {
  /** loop-body statement(s); reads locals `x`,`y`, accumulates into `acc` */
  protected def accumJava: String
  protected def combineScala(x: Double, y: Double): Double

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    checkVecType(left, prettyName) match {
      case TypeCheckResult.TypeCheckSuccess => checkVecType(right, prettyName)
      case f => f
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += combineScala(elemAt(left, a, i), elemAt(right, b, i))
      i += 1
    }
    acc
  }

  /** The fold loop is emitted as its OWN generated function, not inlined:
    * operators like PQ encode compose dozens of folds into one projection,
    * and inlining every loop produces a method past HotSpot's JIT size
    * threshold — the whole generated method then runs interpreted, which
    * is slower than the HOF path this class replaces. One small function
    * per fold keeps every method hot-compilable. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lg = left.genCode(ctx)
    val rg = right.genCode(ctx)
    val ad = classOf[ArrayData].getName
    // primitive return + a reusable boolean[1] null flag — a boxed
    // java.lang.Double return would allocate one box per row on exactly
    // the candidate-generation hot path (corpus × queries rows) these
    // folds exist to keep allocation-free. The scratch flag is per-task
    // mutable state (codegen objects are single-threaded), read
    // immediately after the call.
    val flag = ctx.addMutableState("boolean[]", "foldNullFlag",
      v => s"$v = new boolean[1];")
    val fn = ctx.freshName(prettyName.replace("_", ""))
    val funcName = ctx.addNewFunction(fn,
      s"""
        private double $fn($ad a, $ad b, boolean[] nullOut) {
          int n = a.numElements();
          if (n != b.numElements()) { nullOut[0] = true; return 0.0; }
          double acc = 0.0;
          for (int i = 0; i < n; i++) {
            if (a.isNullAt(i) || b.isNullAt(i)) { nullOut[0] = true; return 0.0; }
            double x = ${elemGetter(left, "a", "i")};
            double y = ${elemGetter(right, "b", "i")};
            $accumJava
          }
          nullOut[0] = false;
          return acc;
        }
      """)
    val tmp = ctx.freshName("foldRes")
    val body =
      code"""
        ${lg.code}
        ${rg.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${lg.isNull} && !${rg.isNull}) {
          double $tmp = $funcName(${lg.value}, ${rg.value}, $flag);
          if (!$flag[0]) { ${ev.isNull} = false; ${ev.value} = $tmp; }
        }
      """
    ev.copy(code = body)
  }
}

/** dot(a, b) = Σ aᵢ·bᵢ, sequential left-fold in double. */
case class DotFold(left: Expression, right: Expression) extends PairFold {
  override def prettyName: String = "dot_fold"
  override protected def accumJava: String = "acc += x * y;"
  override protected def combineScala(x: Double, y: Double): Double = x * y
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFold =
    copy(left = newLeft, right = newRight)
}

/** l2sq(a, b) = Σ (aᵢ−bᵢ)², sequential left-fold in double. */
case class L2SqFold(left: Expression, right: Expression) extends PairFold {
  override def prettyName: String = "l2sq_fold"
  override protected def accumJava: String =
    "double d = x - y; acc += d * d;"
  override protected def combineScala(x: Double, y: Double): Double = {
    val d = x - y; d * d
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqFold =
    copy(left = newLeft, right = newRight)
}

/** max |xᵢ| over a numeric array; NULL elements skipped (greatest()
  * semantics), empty array → 0.0. */
case class MaxAbsFold(child: Expression)
    extends UnaryExpression with VectorFoldHelpers {
  override def prettyName: String = "max_abs_fold"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    checkVecType(child, prettyName)

  override def nullSafeEval(c: Any): Any = {
    val a = c.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (!a.isNullAt(i)) acc = math.max(acc, math.abs(elemAt(child, a, i)))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val ad = classOf[ArrayData].getName
      val a = ctx.freshName("a")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        $ad $a = $arr;
        int $n = $a.numElements();
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i)) {
            $acc = java.lang.Math.max($acc,
              java.lang.Math.abs(${elemGetter(child, a, i)}));
          }
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MaxAbsFold =
    copy(child = newChild)
}
