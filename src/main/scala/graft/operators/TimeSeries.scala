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

  /** CUSUM changepoint detection per key, integer-exact: over a key's
    * ordered series x_1..x_D with total T, the centered cumulative sum
    * at step t is cum_t − t·T/D; scaling by D keeps it an integer,
    * S_t = D·cum_t − t·T, and the changepoint estimate is the t
    * maximizing |S_t| (the classic at-most-one-changepoint location
    * statistic — a level shift makes |S| peak at the shift). Ties break
    * to the earliest step, so output is deterministic on any engine —
    * no floats anywhere. One small aggregation to (key, step, x), one
    * per-key ordered window, one argmin pick.
    *
    * Output: key col, n_steps, t_star (1-based argmax step),
    * step_value (the orderCol value at t_star), score = |S_t| long.
    */
  def cusumChangepoint(
      df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
    val all = Window.partitionBy(keyCol)
    val scored = df
      .select(col(keyCol), col(orderCol), col(valueCol).cast("long").as("_x"))
      .withColumn("_t", row_number().over(w))
      .withColumn("_cum", sum(col("_x")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_D", count(lit(1)).over(all))
      .withColumn("_tot", sum(col("_x")).over(all))
      .withColumn("_s",
        abs(col("_D") * col("_cum") - col("_t") * col("_tot")))
    scored.groupBy(keyCol)
      .agg(max(col("_D")).as("n_steps"),
        min_by(col("_t"), struct((-col("_s")).as("ns"), col("_t")))
          .cast("long").as("t_star"),
        min_by(col(orderCol), struct((-col("_s")).as("ns"), col("_t")))
          .as("step_value"),
        max(col("_s")).as("score"))
  }

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
