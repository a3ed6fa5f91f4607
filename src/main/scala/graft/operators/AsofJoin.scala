package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: attach to every left row the LATEST right
  * row with the same key whose time is at-or-before the left row's time —
  * the temporal-join primitive behind attribution, slowly-changing-
  * dimension lookups, and sensor alignment (pandas `merge_asof`, Flink
  * temporal joins, DuckDB `ASOF JOIN`).
  *
  * Spark-first plan: tag both sides, union the (key, time) projections,
  * and run ONE window per key ordered by (time, tag) with
  * `last(_r, ignoreNulls)` over an unbounded-preceding frame — each left
  * row picks up the most recent right struct that precedes it in the
  * ordering. Right rows sort before left rows at equal timestamps, so
  * "at-or-before" is inclusive. Cost at 100 TB: one shuffle of both
  * sides keyed on the join key (the minimum any temporal join pays) and
  * a linear per-key scan; no range-explode, no per-left-row probe, no
  * driver involvement. A monster hot key serializes within its task —
  * the same bound every per-key-ordered semantic has.
  *
  * `toleranceMs` (optional) voids matches older than the window, like
  * `merge_asof(tolerance=...)`: the matched struct is nulled, the left
  * row survives (left-outer semantics either way).
  *
  * Output: every left column, then every right column renamed
  * `rightPrefix + name` (null where no right row qualifies).
  */
object AsofJoin {
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String,
      toleranceMs: Option[Long] = None,
      rightPrefix: String = "r_",
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val fwd = direction == "forward"
    val lType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rType = org.apache.spark.sql.types.StructType(right.schema.fields)
    val lSide = left.select(
      col(keyCol).as("_k"), col(timeCol).as("_t"), lit(1).as("_tag"),
      struct(left.columns.map(left(_)): _*).as("_l"),
      lit(null).cast(rType).as("_r"))
    val rSide = right.select(
      col(keyCol).as("_k"), col(timeCol).as("_t"), lit(0).as("_tag"),
      lit(null).cast(lType).as("_l"),
      struct(right.columns.map(right(_)): _*).as("_r"))
    // forward = the mirror image: scan times descending, so the "most
    // recent preceding" right row in scan order is the EARLIEST right row
    // at-or-after the left row's time. Right still sorts first at equal
    // times (inclusive match) — only the time axis flips.
    val w = Window.partitionBy("_k")
      .orderBy(if (fwd) col("_t").desc else col("_t").asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lSide.unionByName(rSide)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
    val gated = toleranceMs match {
      case Some(tol) =>
        val gap =
          if (fwd) col(s"_m.$timeCol").cast("double") - col("_t").cast("double")
          else col("_t").cast("double") - col(s"_m.$timeCol").cast("double")
        matched.withColumn("_m", when(gap <= tol / 1000.0, col("_m")))
      case None => matched
    }
    val leftCols = left.columns.map(c => col(s"_l.$c").as(c))
    val rightCols = right.columns.map(c => col(s"_m.$c").as(rightPrefix + c))
    gated.select(leftCols ++ rightCols: _*)
  }
}
