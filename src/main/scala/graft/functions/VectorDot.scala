package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Kernel shared by interpreted eval and generated code. */
object VectorDotImpl {
  /** Integer dot product of two long arrays (the int8-code scoring loop
    * of quantized search). Shorter array bounds the sum; null elements
    * are treated as 0 (quantized codes are never null in practice).
    */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var s = 0L
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  /** Double dot product of two float arrays, strict left-to-right
    * accumulation — the SAME summation order as the HOF
    * `aggregate(zip_with(...))` fold and as a sequential SQL loop, so
    * the resulting doubles are bit-identical to both (q29/q161 oracle
    * requirement). Shorter array bounds the sum; nulls contribute 0.
    */
  def dotFloat(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var s = 0.0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }
}

/** `int8_dot(a, b)` as a native Catalyst expression with codegen.
  *
  * Spark's array higher-order functions (`zip_with` + `aggregate`) are
  * NEVER codegen'd — each lambda invocation walks the interpreted
  * expression tree (the round-4/5 stall diagnosis, dev/PERF_r5.md §2).
  * On the coarse stage of quantized search that tree sits inside a
  * |corpus|×|queries| loop, so this expression keeps the hottest
  * per-row loop of the retrieval path inside whole-stage codegen: a
  * tight primitive `long` loop, no boxing, no closure dispatch.
  */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorDotImpl.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.functions.VectorDotImpl.dotLong($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Dot =
    copy(left = newLeft, right = newRight)
}

/** `float_dot(a, b)` — the float-embedding twin of [[Int8Dot]], for the
  * exact-cosine hot loops (brute-force rerank, mutual-kNN): a
  * |corpus|×|queries| inner loop must not run through interpreted
  * `aggregate`/`zip_with` lambdas (measured 76s → 2s on q161's 4M-pair
  * scoring when this expression replaced the HOF fold).
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorDotImpl.dotFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.functions.VectorDotImpl.dotFloat($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}
