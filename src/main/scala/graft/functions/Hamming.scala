package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level helpers shared by interpreted eval and generated code. */
object HammingImpl {
  /** Substitution-only distance between equal-length strings.
    * Mirrors the reference semantics (id3c
    * schema/deploy/functions/hamming_distance.sql:5-33): unequal lengths
    * are a caller error; we surface -1 so the expression can return null
    * instead of aborting a 100 TB job mid-stage.
    */
  def distance(a: UTF8String, b: UTF8String): Int = {
    val na = a.numChars(); val nb = b.numChars()
    if (na != nb) return -1
    var i = 0; var d = 0
    // ASCII fast path: compare raw bytes when byte length == char length.
    if (a.numBytes() == na && b.numBytes() == nb) {
      while (i < na) { if (a.getByte(i) != b.getByte(i)) d += 1; i += 1 }
    } else {
      val sa = a.toString; val sb = b.toString
      while (i < na) { if (sa.charAt(i) != sb.charAt(i)) d += 1; i += 1 }
    }
    d
  }

  /** Short-circuiting `distance(a,b) <= k` (reference
    * hamming_distance_lte, hamming_distance.sql:36-60): bails out as soon
    * as the running distance exceeds k — the hot path of barcode minting.
    */
  def distanceLte(a: UTF8String, b: UTF8String, k: Int): Boolean = {
    val na = a.numChars(); val nb = b.numChars()
    if (na != nb) return false
    var i = 0; var d = 0
    if (a.numBytes() == na && b.numBytes() == nb) {
      while (i < na && d <= k) { if (a.getByte(i) != b.getByte(i)) d += 1; i += 1 }
    } else {
      val sa = a.toString; val sb = b.toString
      while (i < na && d <= k) { if (sa.charAt(i) != sb.charAt(i)) d += 1; i += 1 }
    }
    d <= k
  }
}

/** `hamming_distance(a, b)` as a native Catalyst expression with codegen —
  * stays inside whole-stage codegen on the minting path (unlike a Scala
  * UDF, which would box every row). Returns null when lengths differ.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val d = HammingImpl.distance(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    if (d < 0) null else d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: non-nullable children inline this without a brace
      // scope — a fixed name would collide across instances (latent
      // until a projection carries two hamming_distance calls over
      // non-null columns)
      val d = ctx.freshName("graftDist")
      s"""
         |int $d = graft.functions.HammingImpl.distance($a, $b);
         |if ($d < 0) { ${ev.isNull} = true; } else { ${ev.value} = $d; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

/** `hamming_distance_lte(a, b, k)` — boolean, short-circuits above k. */
case class HammingDistanceLte(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = BooleanType

  override def nullSafeEval(a: Any, b: Any, k: Any): Any =
    HammingImpl.distanceLte(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, k) => {
      s"${ev.value} = graft.functions.HammingImpl.distanceLte($a, $b, $k);"
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): HammingDistanceLte =
    copy(first = f, second = s, third = t)
}
