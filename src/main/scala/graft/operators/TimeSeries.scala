package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series construction over keyed daily (or any
  * integer-bucket) aggregates: per-key dense spines and forward fill.
  * Everything reduces or windows per key — the corpus-wide frame never
  * sorts globally.
  */
object TimeSeries {

  /** Dense per-key spine + forward fill. Input is an already-aggregated
    * frame with one row per (key, bucket); output has one row per key
    * and EVERY bucket between that key's own min and max (observed-range
    * bounded, not global-calendar × keys), with `nCol` zero-filled on
    * gap buckets and `carryCol` carried forward from the last observed
    * bucket (`last(ignoreNulls)` over a per-key window).
    *
    * The input is consumed twice (bounds + the fill join); callers
    * holding a derived `daily` should pass a checkpointed frame (as
    * SparkEntry's q112 does) so the upstream scan does not re-execute —
    * exchange reuse does NOT cover the second consumer when it lands in
    * a broadcast.
    */
  def gapFillForward(
      daily: DataFrame, keyCol: String, bucketCol: String,
      nCol: String, carryCol: String): DataFrame = {
    val spine = daily.groupBy(col(keyCol))
      .agg(min(col(bucketCol)).as("_d0"), max(col(bucketCol)).as("_d1"))
      .select(col(keyCol),
        explode(sequence(col("_d0"), col("_d1"))).as(bucketCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq(keyCol, bucketCol), "left")
      .select(col(keyCol), col(bucketCol),
        coalesce(col(nCol), lit(0L)).as(nCol),
        last(col(carryCol), ignoreNulls = true).over(w).as(carryCol))
  }
}
