package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk-boundary kernel shared by interpreted eval and
  * generated code.
  */
object CdcImpl {

  /** 1-based (code-point) end positions of content-defined chunks: a
    * position i ≥ k is a boundary when the rolling sum of the last `k`
    * code points is ≡ 0 (mod `m`); the final position is always a
    * boundary so every character lands in exactly one chunk. The
    * boundary decision depends only on a k-char window of CONTENT —
    * never on absolute offsets — which is the whole point: inserting or
    * deleting a prefix shifts every byte, yet downstream boundaries
    * (and therefore chunk hashes) re-align, so chunk-level dedup still
    * finds the shared tail. Fixed-size chunking (q259's
    * chunkWithOverlap) shares nothing after a one-char insert.
    *
    * The rolling sum is the gear/Rabin stand-in chosen so an oracle SQL
    * can replay it exactly (a windowed SUM over exploded code points);
    * swapping in a gear table changes one line of this kernel and the
    * boundary-rate math, nothing structural. One pass, O(1) state —
    * at 100 TB this runs inside the scan's codegen stage and the text
    * never leaves its partition.
    */
  def boundaries(s: UTF8String, k: Int, m: Int): ArrayData = {
    val str = s.toString
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    val window = new Array[Int](k)
    var sum = 0L
    var cp = 0     // code points consumed
    var ci = 0     // UTF-16 char index
    while (ci < str.length) {
      val code = str.codePointAt(ci)
      ci += Character.charCount(code)
      val slot = cp % k
      if (cp >= k) sum -= window(slot)
      window(slot) = code
      sum += code
      cp += 1
      if (cp >= k && sum % m == 0) out += cp
    }
    if (cp > 0 && (out.isEmpty || out.last != cp)) out += cp
    ArrayData.toArrayData(out.toArray)
  }
}

/** `cdc_boundaries(text, k, m)` as a native Catalyst expression — chunk
  * end positions for content-defined chunking, computed in one pass over
  * the string inside whole-stage codegen. The alternative relational
  * formulation (explode every character, windowed sum per doc) shuffles
  * the entire corpus byte-for-byte through a per-doc window; this
  * expression keeps boundary detection in the scan stage so the only
  * downstream fan-out is chunks-per-doc (≈ len/m rows), not
  * chars-per-doc.
  */
case class CdcBoundaries(child: Expression, k: Int, m: Int)
    extends UnaryExpression {
  require(k >= 1 && m >= 2, "cdc_boundaries needs k >= 1 and m >= 2")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    CdcImpl.boundaries(s.asInstanceOf[UTF8String], k, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.CdcImpl.boundaries($s, $k, $m)")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}
