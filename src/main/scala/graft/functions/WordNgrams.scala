package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel shared by interpreted eval and generated code.
  *
  * Reproduces, byte-for-byte, the Column formulation the text family
  * was built on:
  *
  * {{{
  *   bind(split(trim(text), "\\s+"), toks =>
  *     [array_distinct](
  *       transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
  *         i => array_join(slice(toks, i + 1, lit(n)), " "))))
  * }}}
  *
  * whose inner lambda Spark always INTERPRETS (array HOFs have no
  * codegen): per gram it walked an expression tree, sliced a fresh
  * array and built the join through evaluators. This kernel is one
  * byte scan + one byte copy per gram — and it is the single hottest
  * loop of the corpus-text family (every shingle of every document
  * passes through it).
  *
  * Semantics notes, all inherited from the original and pinned by the
  * equivalence spec:
  *   - `trim` is `UTF8String.trim()` — the very method `StringTrim`
  *     evaluates (ASCII space only);
  *   - the split is Java-regex `\s+` with limit -1: `\s` matches the
  *     six ASCII whitespace bytes (never part of a multi-byte UTF-8
  *     char, so a byte scan is exact), a leading separator yields a
  *     leading EMPTY token and a trailing separator a trailing one;
  *     the empty string yields one empty token (so a blank document
  *     contributes a single "" gram);
  *   - documents shorter than n contribute their single clamped
  *     prefix gram (sequence(0, max(T-n, 0)) with slice clamping).
  */
object WordNgramsImpl {

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** The six bytes Java regex `\s` matches (no UNICODE_CHARACTER_CLASS). */
  private def isSep(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Token spans into `bytes` replicating `split(s, "\\s+", -1)`:
    * returns (starts, ends, count). Interior empties are impossible;
    * lead/tail empties follow Java split.
    */
  private def tokenSpans(bytes: Array[Byte]): (Array[Int], Array[Int], Int) = {
    val nb = bytes.length
    if (nb == 0) return (Array(0), Array(0), 1) // "".split → [""]
    var cap = 16
    var starts = new Array[Int](cap); var ends = new Array[Int](cap)
    var count = 0
    def push(s: Int, e: Int): Unit = {
      if (count == cap) {
        cap *= 2
        starts = java.util.Arrays.copyOf(starts, cap)
        ends = java.util.Arrays.copyOf(ends, cap)
      }
      starts(count) = s; ends(count) = e; count += 1
    }
    var i = 0; var seg = 0
    while (i < nb) {
      if (isSep(bytes(i))) {
        push(seg, i) // empty only when the run leads the string
        i += 1
        while (i < nb && isSep(bytes(i))) i += 1
        seg = i
      } else i += 1
    }
    push(seg, nb) // empty when the string ends in a separator run
    (starts, ends, count)
  }

  /** Build gram i..j-1 as raw bytes (tokens joined by single spaces). */
  private def gramBytes(bytes: Array[Byte], starts: Array[Int],
      ends: Array[Int], i: Int, j: Int): Array[Byte] = {
    var len = j - i - 1
    var k = i
    while (k < j) { len += ends(k) - starts(k); k += 1 }
    val g = new Array[Byte](len)
    var p = 0; k = i
    while (k < j) {
      if (k > i) { g(p) = ' '; p += 1 }
      val l = ends(k) - starts(k)
      System.arraycopy(bytes, starts(k), g, p, l); p += l
      k += 1
    }
    g
  }

  def ngrams(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val bytes = text.trim().getBytes
    val (starts, ends, count) = tokenSpans(bytes)
    val numGrams = math.max(count - n, 0) + 1
    val out = new java.util.ArrayList[AnyRef](numGrams)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    var i = 0
    while (i < numGrams) {
      val u = UTF8String.fromBytes(
        gramBytes(bytes, starts, ends, i, math.min(i + n, count)))
      if (seen == null || seen.add(u)) out.add(u)
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }

  /** First 15 hex chars of md5 as a 60-bit long — hash60Base
    * (`conv(substring(md5(g), 1, 15), 16, 10)`) without the hex string
    * or the conv parse: bytes 0..6 then the high nibble of byte 7.
    */
  private def hash60(d: Array[Byte]): Long = {
    var v = 0L
    var k = 0
    while (k < 7) { v = (v << 8) | (d(k) & 0xFFL); k += 1 }
    (v << 4) | ((d(7) >>> 4) & 0xFL)
  }

  /** `prefix` is digested BEFORE the gram bytes — the seeded family
    * `hash60(g, s)` = md5("s<s>|" + g) rides the same kernel (winnowing
    * fingerprints use seed 7). Empty prefix = plain hash60Base.
    */
  def ngramHash60(text: UTF8String, n: Int, distinct: Boolean,
      prefix: Array[Byte]): ArrayData = {
    val bytes = text.trim().getBytes
    val (starts, ends, count) = tokenSpans(bytes)
    val numGrams = math.max(count - n, 0) + 1
    val out = new Array[Long](numGrams)
    var m = 0
    // distinctness is decided on the GRAM (as array_distinct-then-hash
    // does), not on the hash — a 2^-60 collision must still emit both
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    val md = md5.get()
    var i = 0
    while (i < numGrams) {
      val g = gramBytes(bytes, starts, ends, i, math.min(i + n, count))
      if (seen == null || seen.add(UTF8String.fromBytes(g))) {
        md.reset()
        if (prefix.length > 0) md.update(prefix)
        out(m) = hash60(md.digest(g))
        m += 1
      }
      i += 1
    }
    ArrayData.toArrayData(if (m == numGrams) out
      else java.util.Arrays.copyOf(out, m))
  }

  /** Winnowing window minima (Schleimer et al. 2003): the DISTINCT
    * (first-occurrence order) minima of every `w`-wide window over the
    * hash array, with the legacy clamping — max(G-w+1, 1) windows, the
    * last ones shrinking at the tail; a shorter-than-w array yields the
    * single whole-array minimum.
    *
    * SQL-facing edge cases (unreachable through the gram kernel, which
    * emits ≥ 1 non-null hash, but reachable via `winnow_minima(...)`):
    * an EMPTY array returns an empty array — a deliberate divergence
    * from the legacy HOF tree, whose `array_min(slice(...))` produced
    * `[null]` there; a NULL array element is rejected with a clear
    * error (the output type claims containsNull=false, so silently
    * reading the null slot would return garbage).
    */
  def winnowMinima(h: ArrayData, w: Int): ArrayData = {
    val g = h.numElements()
    if (g == 0) return ArrayData.toArrayData(Array.emptyLongArray)
    val numWins = math.max(g - w + 1, 1)
    val out = new Array[Long](numWins)
    var m = 0
    val seen = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i < numWins) {
      var mn = Long.MaxValue
      var j = i; val end = math.min(i + w, g)
      while (j < end) {
        if (h.isNullAt(j)) throw new IllegalArgumentException(
          "winnow_minima: null array elements are not supported " +
            s"(null at index $j); filter or coalesce them first")
        val v = h.getLong(j); if (v < mn) mn = v; j += 1
      }
      if (seen.add(mn)) { out(m) = mn; m += 1 }
      i += 1
    }
    ArrayData.toArrayData(if (m == numWins) out
      else java.util.Arrays.copyOf(out, m))
  }
}

/** `word_ngrams(text, n[, distinct])` as a native codegen expression —
  * the shingle kernel under [[graft.operators.Dedup.wordShingles]]
  * (distinct) and `TextAnalysis.wordNgrams` (positional). */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n > 0, "word_ngrams: n must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    WordNgramsImpl.ngrams(t.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"${ev.value} = graft.functions.WordNgramsImpl.ngrams($t, $n, $distinct);"
    })

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** `word_ngram_hash60(text, n[, distinct])` — the fused form of
  * `explode(wordShingles(text, n))` + `hash60Base(gram)`: tokenless
  * md5 straight off the gram bytes, no hex string, no conv, and the
  * exploded rows carry 8-byte longs instead of gram text. The value is
  * bit-identical to hash60Base (pinned by spec), so every engine-
  * portability property of the md5 convention is preserved.
  */
case class WordNgramHash60(child: Expression, n: Int, distinct: Boolean,
    prefix: String = "") extends UnaryExpression {
  require(n > 0, "word_ngram_hash60: n must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val prefixBytes =
    prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def nullSafeEval(t: Any): Any =
    WordNgramsImpl.ngramHash60(
      t.asInstanceOf[UTF8String], n, distinct, prefixBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pfx = ctx.addReferenceObj("wngPrefix", prefixBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, t => {
      s"${ev.value} = graft.functions.WordNgramsImpl" +
        s".ngramHash60($t, $n, $distinct, $pfx);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgramHash60 =
    copy(child = newChild)
}

/** `winnow_minima(hashes, w)` — the rolling-window distinct-minima
  * stage of winnowing fingerprints as one primitive loop (the HOF form
  * re-sliced the hash array and ran array_min through interpreted
  * lambdas per window).
  */
case class WinnowMinima(child: Expression, window: Int)
    extends UnaryExpression {
  require(window > 0, "winnow_minima: window must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(h: Any): Any =
    WordNgramsImpl.winnowMinima(h.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      s"${ev.value} = graft.functions.WordNgramsImpl.winnowMinima($h, $window);"
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowMinima =
    copy(child = newChild)
}
