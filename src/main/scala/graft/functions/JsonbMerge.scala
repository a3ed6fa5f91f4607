package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Shallow (top-level, right-biased) JSON object merge `a || b` shared by
  * interpreted eval and generated code — the codegen replacement for the
  * Jackson UDF that was the merge engine's last `ScalaUDF` on a hot path
  * (q46's fold over same-batch updates ran it inside an INTERPRETED
  * `aggregate` lambda: one catalyst→scala conversion plus a Jackson
  * parse+reserialize per update element, measured ~40% of q46's sf10
  * wall).
  *
  * Semantics (the UDF contract, `db/__init__.py:229,305` jsonb `||`):
  *
  *   - null a → b; null b → a (null only when both are null);
  *   - either side not a JSON object (first non-ws byte not '{') → b
  *     exactly as written;
  *   - both objects → one object holding a's keys in a's order (b's
  *     value where b has the same key) followed by b-only keys in b's
  *     order; duplicate keys within one document keep the first
  *     position with the last value (Jackson's LinkedHashMap `set`).
  *
  * Equivalence domain vs the Jackson UDF (spec-pinned): byte-identical
  * on compact-serialized JSON with canonical escapes — the engine norm
  * (documents come from `to_json` / stored jsonb text). Values are
  * copied as RAW SPANS minified (whitespace outside strings dropped,
  * exactly Jackson's compact writer on such input); Jackson would
  * additionally renormalize exotic number spellings (1e2 → 100.0) and
  * re-escape non-canonical escapes, which this scanner preserves — no
  * engine path produces either. Structurally malformed input that
  * commits to the object path throws, like the UDF; malformed
  * non-object input returns b where the UDF would throw.
  */
object JsonbMergeImpl {

  /** Flat (keyStart, keyEnd, valueStart, valueEnd) quads; key spans are
    * the string CONTENT (between the quotes), value spans are raw.
    */
  private final class Entries {
    var n = 0
    var a = new Array[Int](32)
    def add(ks: Int, ke: Int, vs: Int, ve: Int): Unit = {
      if (4 * n == a.length) a = java.util.Arrays.copyOf(a, a.length * 2)
      a(4 * n) = ks; a(4 * n + 1) = ke; a(4 * n + 2) = vs; a(4 * n + 3) = ve
      n += 1
    }
    def ks(i: Int): Int = a(4 * i)
    def ke(i: Int): Int = a(4 * i + 1)
    def vs(i: Int): Int = a(4 * i + 2)
    def ve(i: Int): Int = a(4 * i + 3)
    def setValue(i: Int, vs: Int, ve: Int): Unit = {
      a(4 * i + 2) = vs; a(4 * i + 3) = ve
    }
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r'

  private def skipWs(u: UTF8String, from: Int, n: Int): Int = {
    var i = from
    while (i < n && isWs(u.getByte(i))) i += 1
    i
  }

  private def isHex(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'a' && b <= 'f') || (b >= 'A' && b <= 'F')

  private def malformed(): Nothing =
    throw new IllegalArgumentException(
      "jsonb_merge_shallow: malformed JSON object")

  /** Closing-quote index of a string opened just before `from`; escape
    * validation as in [[JsonScalarImpl]]. Malformed → throw (the UDF's
    * Jackson parse throws on the same inputs).
    */
  private def stringEnd(u: UTF8String, from: Int, n: Int): Int = {
    var i = from
    while (i < n) {
      val b = u.getByte(i)
      if (b == '\\') {
        if (i + 1 >= n) malformed()
        val e = u.getByte(i + 1)
        if (e == 'u') {
          if (i + 6 > n || !isHex(u.getByte(i + 2)) || !isHex(u.getByte(i + 3)) ||
            !isHex(u.getByte(i + 4)) || !isHex(u.getByte(i + 5))) malformed()
          i += 6
        } else if (e == '"' || e == '\\' || e == '/' || e == 'b' || e == 'f' ||
          e == 'n' || e == 'r' || e == 't') {
          i += 2
        } else malformed()
      } else if (b == '"') return i
      else i += 1
    }
    malformed()
  }

  /** Index AFTER a balanced object/array starting at `from`. */
  private def skipStructured(u: UTF8String, from: Int, n: Int): Int = {
    var i = from
    var depth = 0
    while (i < n) {
      val b = u.getByte(i)
      if (b == '{' || b == '[') { depth += 1; i += 1 }
      else if (b == '}' || b == ']') {
        depth -= 1; i += 1
        if (depth == 0) return i
      } else if (b == '"') i = stringEnd(u, i + 1, n) + 1
      else i += 1
    }
    malformed()
  }

  /** JSON string-body unescape of an already-validated span (cold path —
    * escaped keys only).
    */
  private def unescape(u: UTF8String, from: Int, to: Int): String = {
    val sb = new java.lang.StringBuilder(to - from)
    val s = u.substring(from, to).toString
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\\') {
        s.charAt(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '/' => sb.append('/'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case _ => malformed()
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Unescaped-key equality of two validated content spans; escape-free
    * spans (the norm) compare raw bytes.
    */
  private def keysEqual(ua: UTF8String, as: Int, ae: Int,
      ub: UTF8String, bs: Int, be: Int): Boolean = {
    var esc = false
    var i = as
    while (i < ae && !esc) { if (ua.getByte(i) == '\\') esc = true; i += 1 }
    i = bs
    while (i < be && !esc) { if (ub.getByte(i) == '\\') esc = true; i += 1 }
    if (!esc) {
      if (ae - as != be - bs) return false
      var j = 0
      val len = ae - as
      while (j < len) {
        if (ua.getByte(as + j) != ub.getByte(bs + j)) return false
        j += 1
      }
      true
    } else unescape(ua, as, ae) == unescape(ub, bs, be)
  }

  /** Top-level entries of `u`, or null when the first non-ws byte is not
    * '{' (the not-an-object path). Duplicate keys keep the first
    * position with the last value. Malformed object syntax throws.
    */
  private def parseObject(u: UTF8String): Entries = {
    val n = u.numBytes
    var i = skipWs(u, 0, n)
    if (i >= n || u.getByte(i) != '{') return null
    i = skipWs(u, i + 1, n)
    val es = new Entries
    if (i < n && u.getByte(i) == '}') return es
    while (true) {
      if (i >= n || u.getByte(i) != '"') malformed()
      val ks = i + 1
      val ke = stringEnd(u, ks, n)
      i = skipWs(u, ke + 1, n)
      if (i >= n || u.getByte(i) != ':') malformed()
      i = skipWs(u, i + 1, n)
      if (i >= n) malformed()
      val vs = i
      val c = u.getByte(i)
      val ve =
        if (c == '"') stringEnd(u, i + 1, n) + 1
        else if (c == '{' || c == '[') skipStructured(u, i, n)
        else {
          var j = i
          var b = c
          while (j < n && b != ',' && b != '}' && !isWs(b)) {
            j += 1
            if (j < n) b = u.getByte(j)
          }
          if (j == vs) malformed()
          j
        }
      // duplicate key within one document: first position, last value
      var dup = -1
      var k = 0
      while (k < es.n && dup < 0) {
        if (keysEqual(u, ks, ke, u, es.ks(k), es.ke(k))) dup = k
        k += 1
      }
      if (dup >= 0) es.setValue(dup, vs, ve) else es.add(ks, ke, vs, ve)
      i = skipWs(u, ve, n)
      if (i >= n) malformed()
      if (u.getByte(i) == '}') return es
      if (u.getByte(i) != ',') malformed()
      i = skipWs(u, i + 1, n)
    }
    es // unreachable
  }

  /** Copy [from, to) of `u` into `out` minified: whitespace outside
    * strings dropped (Jackson's compact writer on canonical input),
    * string bytes verbatim. @return new write position.
    */
  private def minifyCopy(u: UTF8String, from: Int, to: Int,
      out: Array[Byte], pos0: Int): Int = {
    var pos = pos0
    var i = from
    var inStr = false
    while (i < to) {
      val b = u.getByte(i)
      if (inStr) {
        out(pos) = b; pos += 1
        if (b == '\\') {
          out(pos) = u.getByte(i + 1); pos += 1
          i += 2
        } else {
          if (b == '"') inStr = false
          i += 1
        }
      } else if (b == '"') {
        inStr = true
        out(pos) = b; pos += 1
        i += 1
      } else if (isWs(b)) i += 1
      else {
        out(pos) = b; pos += 1
        i += 1
      }
    }
    pos
  }

  /** Null-tolerant pair merge — the UDF contract above. */
  def merge2(a: UTF8String, b: UTF8String): UTF8String = {
    if (a == null) return b
    if (b == null) return a
    val ea = parseObject(a)
    if (ea == null) return b
    val eb = parseObject(b)
    if (eb == null) return b
    val out = new Array[Byte](a.numBytes + b.numBytes + 4)
    var pos = 0
    out(pos) = '{'; pos += 1
    var first = true
    // which b entries were consumed by a shared key
    val used = new Array[Boolean](eb.n)
    var i = 0
    while (i < ea.n) {
      if (!first) { out(pos) = ','; pos += 1 }
      first = false
      pos = minifyCopy(a, ea.ks(i) - 1, ea.ke(i) + 1, out, pos) // key w/ quotes
      out(pos) = ':'; pos += 1
      var j = 0
      var hit = -1
      while (j < eb.n && hit < 0) {
        if (!used(j) &&
          keysEqual(a, ea.ks(i), ea.ke(i), b, eb.ks(j), eb.ke(j))) hit = j
        j += 1
      }
      if (hit >= 0) {
        used(hit) = true
        pos = minifyCopy(b, eb.vs(hit), eb.ve(hit), out, pos)
      } else pos = minifyCopy(a, ea.vs(i), ea.ve(i), out, pos)
      i += 1
    }
    var j = 0
    while (j < eb.n) {
      if (!used(j)) {
        if (!first) { out(pos) = ','; pos += 1 }
        first = false
        pos = minifyCopy(b, eb.ks(j) - 1, eb.ke(j) + 1, out, pos)
        out(pos) = ':'; pos += 1
        pos = minifyCopy(b, eb.vs(j), eb.ve(j), out, pos)
      }
      j += 1
    }
    out(pos) = '}'; pos += 1
    val res = new Array[Byte](pos)
    Platform.copyMemory(out, Platform.BYTE_ARRAY_OFFSET,
      res, Platform.BYTE_ARRAY_OFFSET, pos)
    UTF8String.fromBytes(res)
  }

  /** Left fold of [[merge2]] over a string array with a null initial
    * accumulator — `aggregate(docs, NULL, (acc, d) -> merge(acc, d))`
    * as ONE codegen call (the HOF form runs interpreted per element).
    */
  def foldMerge(arr: ArrayData): UTF8String = {
    var acc: UTF8String = null
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val e = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      acc = merge2(acc, e)
      i += 1
    }
    acc
  }
}

/** `jsonb_merge_shallow(a, b)` — codegen shallow right-biased JSON merge
  * (see [[JsonbMergeImpl]] for the exact UDF-equivalence contract).
  * Null-TOLERANT on both sides (null a → b, null b → a), so this is not
  * a nullSafe binary: eval and codegen handle nulls inline.
  */
case class JsonbMergeShallow(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable && right.nullable

  override def eval(input: InternalRow): Any =
    JsonbMergeImpl.merge2(
      left.eval(input).asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aEv = left.genCode(ctx)
    val bEv = right.genCode(ctx)
    val r = ctx.freshName("graftMerged")
    ev.copy(code =
      code"""
        ${aEv.code}
        ${bEv.code}
        UTF8String $r = graft.functions.JsonbMergeImpl.merge2(
          ${aEv.isNull} ? null : ${aEv.value},
          ${bEv.isNull} ? null : ${bEv.value});
        boolean ${ev.isNull} = ($r == null);
        UTF8String ${ev.value} = $r;
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonbMergeShallow =
    copy(left = newLeft, right = newRight)
}

/** `jsonb_merge_fold(docs)` — the same-batch sequential-update fold
  * `aggregate(docs, NULL, (acc, d) -> jsonb_merge_shallow(acc, d))` as a
  * single whole-stage-codegen call over the array. Null array → null;
  * all-null / empty array → null (the fold's initial accumulator).
  */
case class JsonbMergeFold(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(docs: Any): Any =
    JsonbMergeImpl.foldMerge(docs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, docs => {
      val r = ctx.freshName("graftFold")
      s"""
         |UTF8String $r = graft.functions.JsonbMergeImpl.foldMerge($docs);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): JsonbMergeFold = copy(child = newChild)
}
