package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the state layer behind a
  * continuously-refreshed rollup: per-(group, epoch) MERGEABLE aggregate
  * states are computed once per epoch (day/hour/shard), persisted, and
  * any wider total — per-group lifetime stats, a new day appended, a
  * late shard backfilled — is answered by re-aggregating the STATES,
  * never by rescanning raw data. At 100 TB this is the difference
  * between "refresh touches #epochs × #groups rows" and "refresh
  * rescans the corpus": the state table for a year of daily states over
  * a few thousand groups is about a million rows regardless of raw
  * volume. The reference's materialized-view refresh
  * (refresh_materialized_view, warehouse.sql usage) recomputes from
  * scratch; this is the algebraic-merge form that replaces it when the
  * base table stops fitting a rescan budget.
  *
  * The state chosen here is the classic commutative-monoid tuple
  * (n, sum, min, max) — each component merges by sum/sum/min/max, so
  * merging is itself one partial-aggregated groupBy and states compose
  * associatively across any epoch split. Values are quantized to cents
  * BEFORE aggregation (the q261 idiom) so sums are integer-exact and
  * engine-portable. Distinct-ish states ride the same pattern via
  * [[Sketches.shardSketches]] (HLL registers) and
  * [[Sketches.log2HistogramQuantiles]] (bucket counters).
  */
object Ivm {

  /** One aggregate state per (groupCol, epochCol): n non-null values,
    * integer-cents sum/min/max. Null values contribute nothing (n
    * counts values, not rows). One partial-aggregated groupBy of the
    * epoch's raw rows — computed once, persisted, never recomputed.
    */
  def aggState(
      df: DataFrame, groupCol: String, epochCol: String,
      valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(epochCol),
        (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("_c"))
      .groupBy(col(groupCol), col(epochCol))
      .agg(count(lit(1)).as("n"),
        sum(col("_c")).as("sum_cents"),
        min(col("_c")).as("min_cents"),
        max(col("_c")).as("max_cents"))

  /** Merge states down to per-group totals — sum of counts/sums, min of
    * mins, max of maxes. Input is state-sized (epochs × groups), so this
    * aggregation never touches raw data; appending a fresh epoch is
    * `existing.unionByName(aggState(delta, ...))` fed back through here.
    * Exactly equal to aggregating the raw union directly (monoid
    * associativity — spec-pinned and oracle-checked).
    */
  def mergeStates(states: DataFrame, groupCol: String): DataFrame =
    states.groupBy(col(groupCol))
      .agg(sum(col("n")).as("n"),
        sum(col("sum_cents")).as("sum_cents"),
        min(col("min_cents")).as("min_cents"),
        max(col("max_cents")).as("max_cents"))
}
