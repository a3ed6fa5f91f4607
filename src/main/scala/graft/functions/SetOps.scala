package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Kernel shared by interpreted eval and generated code. */
object SortedIntersectImpl {
  /** Count of DISTINCT common values of two SORTED long arrays — the
    * same number as `size(array_intersect(a, b))` whenever both inputs
    * are sorted ascending with nulls first (`sort_array`'s default
    * order). One forward merge: no hash set, no boxed Longs, no result
    * array — the three allocations `array_intersect` pays per row.
    * Duplicate runs advance past in place, so multiset inputs still
    * count each shared value once (array_intersect's DISTINCT
    * semantics). A shared null counts once, as in array_intersect.
    *
    * PRECONDITION: both arrays sorted ascending, nulls first. Unsorted
    * input returns an undercount, not an error — callers own the
    * `sort_array` upstream (the dedup verify stages build their gram
    * sets with exactly that).
    */
  def countSorted(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && a.isNullAt(i)) i += 1
    while (j < nb && b.isNullAt(j)) j += 1
    if (i > 0 && j > 0) c += 1 // null present in both counts once
    while (i < na && j < nb) {
      val va = a.getLong(i); val vb = b.getLong(j)
      if (va < vb) i += 1
      else if (va > vb) j += 1
      else {
        c += 1
        i += 1; while (i < na && a.getLong(i) == va) i += 1
        j += 1; while (j < nb && b.getLong(j) == vb) j += 1
      }
    }
    c
  }
}

/** `sorted_intersect_count(a, b)` as a native Catalyst expression with
  * codegen — the verify kernel of the exact set-similarity family
  * (PPJoin / containment / LSH-gated Jaccard). Each candidate pair is
  * verified by intersecting its two full sorted gram-hash sets; the
  * built-in `array_intersect` builds an OpenHashSet AND materializes
  * the intersection array per row just so `size` can read its length.
  * At 100× scale the verify stage runs tens of millions of candidate
  * intersections, so the per-row constant is the stage's CPU bill —
  * this expression replaces it with a single allocation-free merge
  * over the already-sorted inputs.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectImpl.countSorted(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.functions.SortedIntersectImpl.countSorted($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
