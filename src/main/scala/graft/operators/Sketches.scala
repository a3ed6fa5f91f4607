package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches (Apache DataSketches HLL, built into
  * Spark as `hll_sketch_agg` / `hll_union_agg`): the scale form of
  * COUNT(DISTINCT) for a sharded corpus. An exact global distinct over
  * 100 TB shuffles every distinct value once; the sketch form
  * aggregates each shard to a fixed-size binary register array
  * map-side, ships KILOBYTES per shard, and the union of shard
  * sketches has exactly the same registers as a sketch built over the
  * whole corpus in one pass — so estimates are not merely close but
  * identical, and shard sketches can be persisted and re-merged as the
  * corpus grows without rescanning old shards (the incremental-stats
  * companion to [[Dedup.dedupAgainstIndex]]'s standing index).
  *
  * Exact-when-it-matters: [[Skew.exactDistinct]] remains the partial
  * -agg exact form; this is the constant-memory approximate form for
  * dashboard-grade corpus stats (distinct URLs / tokens / users per
  * source) where a rescan per refresh is the thing that doesn't scale.
  */
object Sketches {

  /** One HLL sketch + exact row count per shard. lgK = 12 gives ~1.6%
    * relative error in ~4 KB per shard. */
  def shardSketches(
      df: DataFrame, shardCol: String, valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(col(shardCol).as("shard"))
      .agg(
        hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Merge shard sketches to one global estimate (one tiny final
    * aggregation over #shards rows — the corpus is not rescanned). */
  def mergedEstimate(shards: DataFrame): DataFrame =
    shards.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as("approx_distinct"),
      sum(col("n_rows")).as("n_rows"))

  /** Per-shard estimates alongside the rows they summarize. */
  def shardEstimates(shards: DataFrame): DataFrame =
    shards.select(col("shard"),
      hll_sketch_estimate(col("sketch")).as("approx_distinct"),
      col("n_rows"))
}
