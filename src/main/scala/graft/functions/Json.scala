package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass top-level scalar field extraction shared by interpreted
  * eval and generated code — the hot-loop replacement for
  * `get_json_object(json, '$.key')` when the key is a TOP-LEVEL SCALAR.
  *
  * Why: every Spark JSON path (`GetJsonObject`, `JsonToStructs`,
  * `JsonTuple`) is a `CodegenFallback` that instantiates a Jackson
  * parser per row — measured ~1.3 s of q53_pa_v2's 1.9 s at sf0.1 for a
  * 20-char document, and identical costs for all three built-ins
  * (dev/ProbeQ53). This scanner allocates one String copy of the
  * document per row plus the result — no parser object, no token
  * stream (a direct UTF8String byte scan would drop the copy too;
  * structural JSON chars are ASCII, so that is the documented next
  * step if profiles ever blame the copy) — stays inside whole-stage
  * codegen (one static call per row; measured q53 2.9 → 0.77 s), and
  * matches `get_json_object` semantics on its supported domain:
  *
  *   - top-level object with the key mapped to a string / number /
  *     boolean → the value's text (strings unescaped, numbers/booleans
  *     AS WRITTEN — get_json_object re-serializes numbers through
  *     Jackson, e.g. 4.50 → 4.5, so only canonical/integer numbers are
  *     byte-identical between the two; the gate's fields are);
  *   - key absent, value JSON null, input not an object, or malformed
  *     input → SQL null;
  *   - FIRST occurrence wins on duplicate keys (as GetJsonObject);
  *   - DOCUMENTED RESTRICTION: a key mapped to an object/array returns
  *     null (get_json_object would re-serialize it) — use
  *     get_json_object for structured values.
  */
object JsonScalarImpl {

  /** @return extracted text or null (SQL null). */
  def extract(jsonU: UTF8String, keyU: UTF8String): UTF8String = {
    val s = jsonU.toString
    val key = keyU.toString
    val n = s.length
    var i = skipWs(s, 0)
    if (i >= n || s.charAt(i) != '{') return null
    i += 1
    var first = true
    while (i < n) {
      i = skipWs(s, i)
      if (i < n && s.charAt(i) == '}') return null // clean end, key absent
      if (!first) {
        if (i >= n || s.charAt(i) != ',') return null
        i = skipWs(s, i + 1)
      }
      first = false
      // member key (must be a string)
      if (i >= n || s.charAt(i) != '"') return null
      val kEnd = stringEnd(s, i + 1)
      if (kEnd < 0) return null
      val matches = keyEquals(s, i + 1, kEnd, key)
      i = skipWs(s, kEnd + 1)
      if (i >= n || s.charAt(i) != ':') return null
      i = skipWs(s, i + 1)
      if (i >= n) return null
      s.charAt(i) match {
        case '"' =>
          val vEnd = stringEnd(s, i + 1)
          if (vEnd < 0) return null
          if (matches)
            return UTF8String.fromString(unescape(s, i + 1, vEnd))
          i = vEnd + 1
        case '{' | '[' =>
          val vEnd = skipStructured(s, i)
          if (vEnd < 0) return null
          if (matches) return null // documented scalar-only restriction
          i = vEnd
        case _ =>
          // number / true / false / null literal: scan to delimiter
          val st = i
          while (i < n && s.charAt(i) != ',' && s.charAt(i) != '}' &&
            !isWs(s.charAt(i))) i += 1
          // an empty literal ({"k":} / {"k":,...}) is malformed JSON —
          // null, like get_json_object, regardless of which key matched
          if (i == st) return null
          if (matches) {
            val lit = s.substring(st, i)
            return if (lit == "null") null else UTF8String.fromString(lit)
          }
      }
    }
    null // ran off the end: malformed
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  private def skipWs(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && isWs(s.charAt(i))) i += 1
    i
  }

  /** Index of the closing quote of a string opened just before `from`,
    * honoring backslash escapes; -1 if unterminated.
    */
  private def stringEnd(s: String, from: Int): Int = {
    var i = from
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') i += 2
      else if (c == '"') return i
      else i += 1
    }
    -1
  }

  /** Raw (still-escaped) key span vs the sought (unescaped) key: equal
    * when the unescaped span equals the key. Fast path for spans with
    * no escapes; the escaped path unescapes the span.
    */
  private def keyEquals(s: String, from: Int, to: Int, key: String): Boolean = {
    var hasEsc = false
    var i = from
    while (i < to && !hasEsc) { if (s.charAt(i) == '\\') hasEsc = true; i += 1 }
    if (!hasEsc)
      (to - from) == key.length && s.regionMatches(from, key, 0, key.length)
    else unescape(s, from, to) == key
  }

  /** JSON string-body unescape over s[from, to). */
  private def unescape(s: String, from: Int, to: Int): String = {
    var i = from
    var plain = true
    while (i < to && plain) { if (s.charAt(i) == '\\') plain = false; i += 1 }
    if (plain) return s.substring(from, to)
    val sb = new java.lang.StringBuilder(to - from)
    i = from
    while (i < to) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < to) {
        s.charAt(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '/' => sb.append('/'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'u' if i + 6 <= to =>
            try {
              sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
              i += 6
            } catch { case _: Exception => sb.append(c); i += 1 }
          case _ => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Skip a balanced object/array starting at `from` (s(from) is '{' or
    * '['), strings-with-escapes aware. @return index AFTER it, or -1.
    */
  private def skipStructured(s: String, from: Int): Int = {
    var i = from
    var depth = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '{' | '[' => depth += 1; i += 1
        case '}' | ']' =>
          depth -= 1; i += 1
          if (depth == 0) return i
        case '"' =>
          val e = stringEnd(s, i + 1)
          if (e < 0) return -1
          i = e + 1
        case _ => i += 1
      }
    }
    -1
  }
}

/** `json_scalar_field(json, key)` — codegen top-level scalar extraction
  * (see [[JsonScalarImpl.extract]] for the exact get_json_object
  * equivalence contract and the structured-value restriction).
  */
case class JsonScalarField(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(json: Any, key: Any): Any =
    JsonScalarImpl.extract(
      json.asInstanceOf[UTF8String], key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (json, key) => {
      // freshName: with non-nullable children nullSafeCodeGen inlines
      // this WITHOUT a brace scope, so a fixed local name would janino-
      // collide when two instances land in one generated method
      val r = ctx.freshName("graftJson")
      s"""
         |UTF8String $r = graft.functions.JsonScalarImpl.extract($json, $key);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonScalarField =
    copy(left = newLeft, right = newRight)
}
