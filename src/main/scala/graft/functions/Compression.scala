package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate kernel shared by interpreted eval and generated code. */
object CompressionImpl {
  /** zlib (Deflate, level 6) compressed length of the string's UTF-8
    * bytes. One Deflater per call, `nowrap = false` (2-byte zlib header
    * + 4-byte adler32 included — constant offset, irrelevant to a
    * ratio). Deterministic for a fixed JDK zlib: same input → same
    * length on every partition, retry, and run of one cluster image;
    * like any library-version-dependent signal it should be recomputed,
    * not diffed, across JDK upgrades.
    */
  def deflatedLen(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](1024)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** `deflated_length(text)` as a native Catalyst expression — the
  * compression-ratio quality signal (Gopher/FineWeb-style: text that
  * deflates far below its raw size is repetitive boilerplate; text that
  * barely deflates is high-entropy noise) without a boxing Scala UDF:
  * codegen emits a direct static call, so the signal stays inside the
  * whole-stage-codegen scan pipeline and the text never leaves its
  * partition.
  */
case class DeflatedLength(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(s: Any): Any =
    CompressionImpl.deflatedLen(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.CompressionImpl.deflatedLen($s)")

  override protected def withNewChildInternal(newChild: Expression): DeflatedLength =
    copy(child = newChild)
}
