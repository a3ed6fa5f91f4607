package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for the canonical query-string suffix of
  * [[graft.operators.Web.canonicalizeUrl]] — byte-for-byte the bound
  * HOF chain it replaces:
  *
  * {{{
  *   bind(array_join(array_sort(filter(split(q, "&", -1),
  *       p => p =!= "" && !p.startsWith("utm_"))), "&"),
  *     j => when(j =!= "", concat(lit("?"), j)).otherwise(lit("")))
  * }}}
  *
  * which Spark always INTERPRETS (array HOF lambdas have no codegen):
  * per row it walked split/filter/sort/join through expression
  * evaluators. This kernel is one byte scan + one small sort per row.
  *
  * Equivalence notes, pinned by UrlCanonicalSpec:
  *   - `split(q, "&", -1)` is a Java-regex split on the literal '&'
  *     byte; '&' is ASCII so it never occurs inside a multi-byte UTF-8
  *     char and a byte scan is exact. Leading/trailing/doubled '&'
  *     yield empty segments — dropped by the filter either way, so the
  *     kernel just skips empty segments.
  *   - the filter drops segments that byte-prefix "utm_" (UTF8String
  *     .startsWith is a byte-prefix test).
  *   - `array_sort` on strings is UTF8String binary order
  *     (unsigned-byte lexicographic, length tiebreak) — exactly
  *     UTF8String.compareTo, used here. Duplicates are kept.
  *   - empty query (or one with no surviving params) yields "", and
  *     the suffix is "" rather than "?".
  */
object CanonicalQueryImpl {

  private val EMPTY = UTF8String.fromString("")

  /** Is the segment bytes[s, e) prefixed "utm_"? */
  private def isUtm(b: Array[Byte], s: Int, e: Int): Boolean =
    e - s >= 4 && b(s) == 'u' && b(s + 1) == 't' && b(s + 2) == 'm' &&
      b(s + 3) == '_'

  /** UTF8String.compareTo semantics over two byte ranges: unsigned
    * lexicographic over the common prefix, then length.
    */
  private def cmp(b: Array[Byte], s1: Int, e1: Int, s2: Int, e2: Int): Int = {
    val l1 = e1 - s1; val l2 = e2 - s2
    val n = math.min(l1, l2)
    var i = 0
    while (i < n) {
      val d = (b(s1 + i) & 0xFF) - (b(s2 + i) & 0xFF)
      if (d != 0) return d
      i += 1
    }
    l1 - l2
  }

  def canonicalQuery(q: UTF8String): UTF8String = {
    val bytes = q.getBytes
    val nb = bytes.length
    if (nb == 0) return EMPTY
    // collect non-empty, non-utm_ segment spans
    var starts = new Array[Int](8); var ends = new Array[Int](8)
    var count = 0
    var start = 0
    var i = 0
    while (i <= nb) {
      if (i == nb || bytes(i) == '&') {
        if (i > start && !isUtm(bytes, start, i)) {
          if (count == starts.length) {
            starts = java.util.Arrays.copyOf(starts, count * 2)
            ends = java.util.Arrays.copyOf(ends, count * 2)
          }
          starts(count) = start; ends(count) = i; count += 1
        }
        start = i + 1
      }
      i += 1
    }
    if (count == 0) return EMPTY
    // insertion sort of the span index order (segments are few)
    val idx = new Array[Int](count)
    var k = 0
    while (k < count) { idx(k) = k; k += 1 }
    k = 1
    while (k < count) {
      val cur = idx(k)
      var j = k - 1
      while (j >= 0 && cmp(bytes, starts(idx(j)), ends(idx(j)),
          starts(cur), ends(cur)) > 0) {
        idx(j + 1) = idx(j); j -= 1
      }
      idx(j + 1) = cur
      k += 1
    }
    // "?" + segments joined by '&'
    var outLen = count // '?' plus count-1 '&'s
    k = 0
    while (k < count) { outLen += ends(k) - starts(k); k += 1 }
    val out = new Array[Byte](outLen)
    out(0) = '?'
    var p = 1
    k = 0
    while (k < count) {
      if (k > 0) { out(p) = '&'; p += 1 }
      val s = starts(idx(k)); val l = ends(idx(k)) - s
      System.arraycopy(bytes, s, out, p, l); p += l
      k += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** `canonical_query(queryString)` as a native codegen expression — the
  * sorted, tracking-stripped "?k=v&..." suffix (empty string when no
  * parameter survives). Input is the raw query segment AFTER '?'.
  */
case class CanonicalQuery(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(q: Any): Any =
    CanonicalQueryImpl.canonicalQuery(q.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, q => {
      s"${ev.value} = graft.functions.CanonicalQueryImpl.canonicalQuery($q);"
    })

  override protected def withNewChildInternal(newChild: Expression): CanonicalQuery =
    copy(child = newChild)
}
