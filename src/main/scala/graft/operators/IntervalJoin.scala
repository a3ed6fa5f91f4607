package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join — all pairs (a, b) with the same key whose
  * half-open intervals intersect (`a.s < b.e && b.s < a.e`) — the
  * range-join primitive behind shift overlaps, concurrent-session
  * detection, and genomic interval intersection.
  *
  * The naive plan for an inequality join is a per-key nested loop
  * (quadratic in the hot key, and Spark would pick BNL if expressed
  * directly). The scalable form tiles the number line: each interval
  * explodes to the `bucketWidth`-sized tiles it touches, candidates meet
  * in an EQUI-join on (key, tile) — shuffle-partitioned, AQE-skew-
  * splittable — and the exact predicate filters survivors. A pair that
  * shares several tiles would duplicate, so it is emitted only in the
  * canonical tile `max(floor(a.s/W), floor(b.s/W))` — the first tile
  * where both intervals are present — which removes the duplicate-pair
  * `distinct` shuffle entirely (the same emit-once trick as the
  * fragment-join literature; cf. Dedup's banded joins).
  *
  * `bucketWidth` trades fan-out (long intervals explode to `len/W + 1`
  * tiles) against candidate selectivity (wide tiles pool unrelated
  * intervals); set it near the typical interval length.
  *
  * Inputs must carry columns (id, key, s, e) with numeric s < e
  * (callers map dates/timestamps to day/second numbers first — integer
  * bucket math stays engine-exact). Empty/backward intervals are
  * dropped. Output: key, id_a, id_b (+ both interval bounds).
  */
object IntervalJoin {
  def overlapJoin(
      a: DataFrame, b: DataFrame, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    def tiled(df: DataFrame, suffix: String): DataFrame =
      df.filter(col("s") < col("e"))
        .select(col("key"), col("id").as(s"id_$suffix"),
          col("s").as(s"s_$suffix"), col("e").as(s"e_$suffix"),
          explode(sequence(
            floor(col("s") / bucketWidth).cast("long"),
            floor((col("e") - 1) / bucketWidth).cast("long"))).as("_tile"))
    tiled(a, "a").hint("shuffle_hash")
      .join(tiled(b, "b"), Seq("key", "_tile"))
      .filter(col("s_a") < col("e_b") && col("s_b") < col("e_a"))
      .filter(col("_tile") === greatest(
        floor(col("s_a") / bucketWidth).cast("long"),
        floor(col("s_b") / bucketWidth).cast("long")))
      .select(col("key"), col("id_a"), col("id_b"),
        col("s_a"), col("e_a"), col("s_b"), col("e_b"))
  }

  /** Merge overlapping-or-touching intervals per key (the gaps-and-
    * islands pattern): consecutive intervals whose start is <= the
    * running max of previous ends belong to one island; islands collapse
    * to their envelope [min s, max e] with the member count. One ordered
    * window per KEY (parallel across keys — the partition key is the
    * entity, never a single global partition), then one map-side-
    * combining aggregation. Integer bounds in, integer bounds out —
    * engine-exact. Inputs follow [[overlapJoin]]'s (key, s, e)
    * convention with s < e; empty/backward intervals are dropped.
    *
    * Output: key, s, e, n_intervals.
    */
  def mergeIntervals(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy("s", "e")
    val prevMax = max(col("e")).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    df.filter(col("s") < col("e"))
      .withColumn("_new",
        when(prevMax.isNull || col("s") > prevMax, 1L).otherwise(0L))
      .withColumn("_island", sum(col("_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("key", "_island")
      .agg(min(col("s")).as("s"), max(col("e")).as("e"),
        count(lit(1)).as("n_intervals"))
      .select("key", "s", "e", "n_intervals")
  }
}
