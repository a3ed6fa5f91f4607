package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared by interpreted eval and generated code. */
object NormalizeImpl {
  /** Unicode NFC (canonical composition). The `isNormalized` probe is the
    * hot path: real web text is overwhelmingly already NFC, and the probe
    * is a single pass with no allocation, so the common case returns the
    * input `UTF8String` untouched (no copy, no re-encode).
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(text)` as a native Catalyst expression with codegen —
  * Unicode canonical composition (NFC), the first step of text cleaning
  * for a training corpus (bytes that render identically must compare
  * identically before any dedup/fingerprint sees them). A Scala UDF here
  * would box every row of a 100 TB text column; this stays inside
  * whole-stage codegen like [[HammingDistance]] and [[Int8Dot]].
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NormalizeImpl.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeImpl.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

