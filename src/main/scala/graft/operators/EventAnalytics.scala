package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log analytics over warehouse-scale streams: funnel stage
  * progression and SCD2 history construction. Both reduce per key and
  * never sort or window the event log globally — the properties that
  * keep them linear at 100 TB.
  */
object EventAnalytics {

  /** N-stage funnel by FIRST-occurrence times: stage i's clock starts at
    * stage i-1's first event, and a same-second event advances (`>=` —
    * sub-second order within the second is not trusted, matching the
    * epoch-seconds resolution of the input).
    *
    * Plan shape: one filtered min-aggregation per stage, chained by
    * equi-joins on the user key — all co-partitioned after the first
    * shuffle, with each stage's input pruned by its type filter before
    * anything moves.
    *
    * Output: userCol, t1..tN (first-reach seconds, null = not reached),
    * stage (0..N, the deepest stage reached).
    */
  def funnelStages(
      events: DataFrame, userCol: String, typeCol: String, secCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val users = events.select(col(userCol)).distinct()
    // the stage chain consumes the log once per stage; prune to stage
    // events and checkpoint so the full log is scanned once for the
    // chain (plus once above for the user universe), not once per stage
    val pruned = events
      .filter(col(typeCol).isin(stages: _*))
      .select(col(userCol), col(typeCol), col(secCol))
      .localCheckpoint(false)
    var prev: DataFrame = null
    val stageFrames = stages.zipWithIndex.map { case (st, i) =>
      val tcol = s"t${i + 1}"
      val base = pruned.filter(col(typeCol) === st)
      val cur =
        if (i == 0)
          base.groupBy(col(userCol)).agg(min(col(secCol)).as(tcol))
        else
          base.join(prev, Seq(userCol))
            .filter(col(secCol) >= col(s"t$i"))
            .groupBy(col(userCol)).agg(min(col(secCol)).as(tcol))
      prev = cur
      tcol -> cur
    }
    val joined = stageFrames.foldLeft(users) { case (acc, (_, f)) =>
      acc.join(f, Seq(userCol), "left")
    }
    // the chain is monotone (t_{i+1} non-null ⇒ t_i non-null), so the
    // deepest non-null wins
    val stageCol = stageFrames.zipWithIndex.foldLeft(lit(0L)) {
      case (acc, ((tcol, _), i)) =>
        when(col(tcol).isNotNull, lit((i + 1).toLong)).otherwise(acc)
    }
    joined.withColumn("stage", stageCol)
  }

  /** SCD2 history build — fold a keyed update log into validity
    * intervals with change suppression: consecutive equal values merge
    * into one row, `valid_to` is the NEXT change's start (null while
    * current). Ordering is (secCol, seqCol) so same-second updates stay
    * deterministic. Two per-key windows; the log never sorts globally.
    *
    * Output: keyCol, valid_from, valid_to, state.
    */
  def scd2(
      updates: DataFrame, keyCol: String, secCol: String, seqCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(secCol), col(seqCol))
    updates
      .withColumn("_prev", lag(col(valueCol), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col(valueCol))
      // lead over the FILTERED rows: the interval ends at the next CHANGE
      .withColumn("valid_to", lead(col(secCol), 1).over(w))
      .select(col(keyCol), col(secCol).as("valid_from"), col("valid_to"),
        col(valueCol).as("state"))
  }

  /** Per-key least-squares trend (drift detection over metric streams):
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) from ONE map-side
    * -combining aggregation per key — no window, no sort, no second
    * pass. All sums are decimal-exact (x as offset epoch seconds, y
    * through decimal(18,6)), so the two operands of the final division
    * are bit-identical in any engine and the single IEEE divide makes
    * even the double slope hash-comparable. `epochOffset` recenters x
    * (slope is translation-invariant) to keep x² sums far from the
    * 38-digit decimal ceiling at corpus scale.
    *
    * Output: key, n_events, slope (null when n < 2 or x is constant).
    */
  def trendSlopes(
      df: DataFrame, keyCol: String, secCol: String, valueCol: String,
      epochOffset: Long): DataFrame = {
    val x = (col(secCol) - epochOffset).cast("decimal(38,0)")
    val y = col(valueCol).cast("decimal(18,6)")
    val g = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(x).as("_sx"), sum(y).as("_sy"),
        sum(x * y).as("_sxy"), sum(x * x).as("_sxx"))
    val n = col("n_events").cast("decimal(38,0)")
    val num = n * col("_sxy") - col("_sx") * col("_sy")
    val den = n * col("_sxx") - col("_sx") * col("_sx")
    g.select(col(keyCol), col("n_events"),
      when(col("n_events") >= 2 && den =!= 0,
        num.cast("double") / den.cast("double"))
        .otherwise(lit(null).cast("double")).as("slope"))
  }
}
