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

  /** Bloom-gated incremental dedup: the batch rows whose key is NOT in
    * the standing corpus, computed EXACTLY but with the corpus touched
    * only for the might-contain sliver. The corpus's keys fold into a
    * KB-scale Bloom sketch (Spark's own `BloomFilterAggregate` — the
    * expression behind AQE runtime join filters, surfaced here as an
    * operator); rows the sketch rejects are DEFINITELY new and skip the
    * join entirely (no false negatives), and only the might-contain
    * rows — true dups plus the fpp sliver — pay the exact anti-join
    * verify. At corpus scale that turns "anti-join every batch against
    * 100 TB of keys" into "scan the batch against an in-plan literal +
    * anti-join a few percent of it"; the sketch itself is built once
    * per corpus version and is the same artifact a runtime filter
    * would inject. Result is EXACTLY the plain anti-join (oracle form).
    */
  def bloomPrunedNewKeys(
      corpusKeys: DataFrame, batch: DataFrame, keyCol: String,
      expectedItems: Long, numBits: Long): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column => toCol, expression => toExpr}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.types.BinaryType
    val agg = new BloomFilterAggregate(
      toExpr(xxhash64(col(keyCol))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    // the sketch is a bounded KB-scale binary — collecting it is the
    // same driver round-trip a scalar-subquery runtime filter performs
    val bytes = corpusKeys.agg(toCol(agg).as("bf"))
      .head.getAs[Array[Byte]](0)
    if (bytes == null) batch // empty corpus: everything is new
    else {
      val might = toCol(BloomFilterMightContain(
        Literal(bytes, BinaryType), toExpr(xxhash64(col(keyCol)))))
      val sureNew = batch.filter(!might)
      val verified = batch.filter(might)
        .join(corpusKeys.select(col(keyCol)), Seq(keyCol), "left_anti")
      sureNew.unionByName(verified)
    }
  }

  /** The Misra-Gries summary fold — ≤ `cap` counters; any item whose
    * frequency in the folded stream exceeds (stream length)/(cap+1)
    * is guaranteed to survive. Shared by the batch two-pass form
    * ([[heavyHitters]]) and the streaming per-shard state
    * ([[graft.streaming.StreamingEtl.streamingHeavyHitterCandidates]]).
    * Mutates and returns `m` so streaming state folds incrementally.
    */
  private[graft] def mgFold(
      it: Iterator[String], cap: Int,
      m: scala.collection.mutable.HashMap[String, Long])
      : scala.collection.mutable.HashMap[String, Long] = {
    it.foreach { s =>
      m.get(s) match {
        case Some(v) => m.update(s, v + 1)
        case None if m.size < cap => m.update(s, 1L)
        case None => // decrement-all step; snapshot keys before mutating
          m.keys.toArray.foreach { kk =>
            val v = m(kk) - 1
            if (v == 0) m.remove(kk) else m.update(kk, v)
          }
      }
    }
    m
  }

  /** Two-pass EXACT heavy hitters (frequency strictly above n/k)
    * without a full groupBy of the corpus: pass 1 runs a Misra-Gries
    * summary with k-1 counters inside each partition (mapPartitions —
    * genuinely imperative per-partition state, the documented last
    * resort, used here because the summary is order-insensitive in its
    * guarantee) and unions the surviving keys. MG guarantees any item
    * with partition frequency > n_p/k survives its partition's summary,
    * and Σ n_p = n, so by pigeonhole the union is a SUPERSET of every
    * global heavy hitter — at most partitions·(k-1) keys, kilobytes,
    * broadcastable. Pass 2 rescans the corpus once against the
    * broadcast candidate set and counts ONLY candidate keys exactly;
    * every non-candidate folds into a single null bucket map-side, so
    * the exchange carries ≤ candidates+1 groups — at 100 TB that is the
    * difference between a bounded shuffle and shuffling every distinct
    * token. The candidate SET varies with partitioning, but the final
    * exact filter (cnt · k > n, integer arithmetic) does not — the
    * output is deterministic under any partitioning.
    *
    * Output: (keyCol string, cnt long) for keys with count > n/k.
    */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(keyCol).cast("string")).as[String]
    val cands = keys.mapPartitions { it =>
      mgFold(it, k - 1,
        scala.collection.mutable.HashMap.empty[String, Long]).keysIterator
    }.toDF(keyCol).distinct()
    val counted = df.select(col(keyCol).cast("string").as(keyCol))
      .join(broadcast(cands.withColumn("_hh", lit(true))), Seq(keyCol), "left")
      .groupBy(when(col("_hh"), col(keyCol)).as(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false) // tiny; two consumers (total + filter)
    val total = counted.agg(sum(col("cnt")).as("_n"))
    counted.filter(col(keyCol).isNotNull)
      .crossJoin(broadcast(total)) // 1-row total
      .filter(col("cnt") * lit(k.toLong) > col("_n"))
      .select(col(keyCol), col("cnt"))
  }

  /** Count-min sketch build — the mergeable FREQUENCY sketch next to
    * HLL (cardinality), Misra-Gries (top-k membership) and the log₂
    * histogram (quantiles): `depth` independent md5-salted hash rows of
    * `width` counters each. Every input key increments one counter per
    * row; a point estimate reads the MINIMUM of its `depth` counters,
    * which can only OVERCOUNT (collisions add, never subtract) — the
    * one-sided guarantee that makes it safe as a frequency CEILING for
    * blocklist screens and cap-style sampling at corpus scale.
    *
    * Scale shape: the explode fans each row to `depth` (row, bucket)
    * pairs, but hash-partial aggregation collapses them map-side to at
    * most depth·width groups per task, so the exchange carries a
    * sketch-sized payload REGARDLESS of corpus size — and two shards'
    * sketches merge by plain counter addition (groupBy-sum), the same
    * re-merge-without-rescan property as [[shardSketches]]. Standard
    * bound: with width w, overcount ≤ 2·n/w per row with prob ≥ 1/2,
    * so the min over `depth` rows exceeds it with prob ≤ 2^(−depth).
    *
    * Output: (r, bucket, cnt) — at most depth·width rows.
    */
  def countMinSketch(
      df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1 and width >= 2")
    df.select(explode(array((0 until depth).map { r =>
        struct(lit(r.toLong).as("r"),
          (Sampling.keyHash60(col(keyCol), s"cm$r") % width).as("bucket"))
      }: _*)).as("_p"))
      .groupBy(col("_p.r").as("r"), col("_p.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates from a [[countMinSketch]]: each probe key
    * hashes to its `depth` (row, bucket) cells, the sketch (≤ depth·width
    * rows — kilobytes) joins in as a BROADCAST, and the estimate is the
    * min surviving counter (an absent cell means nothing ever hashed
    * there → 0). Estimates satisfy `cm_est >= true count` always.
    *
    * Output: (keyCol, cm_est).
    */
  def cmEstimates(
      sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame =
    keys.select(col(keyCol),
        explode(array((0 until depth).map { r =>
          struct(lit(r.toLong).as("r"),
            (Sampling.keyHash60(col(keyCol), s"cm$r") % width).as("bucket"))
        }: _*)).as("_p"))
      .select(col(keyCol), col("_p.r").as("r"), col("_p.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))

  /** Mergeable log₂-bucket histogram quantiles — the constant-memory
    * quantile sketch next to HLL (cardinality) and Misra-Gries
    * (frequency): each positive value lands in the bucket of its bit
    * length (bucket b covers [2^(b−1), 2^b−1], ≤ 64 buckets per group
    * FOREVER), so per-group histograms are a few hundred bytes,
    * map-side partial-aggregated, and merge across shards/days by
    * simple addition — while any quantile is answered from the
    * cumulative counts with a guaranteed ≤ 2× relative value error
    * (the bucket's bounds bracket the true quantile). The same
    * integer-bit-length trick as `Profile.bucketByRank`'s sub-bucket
    * key; exact alternatives are `Profile.equiDepthHistogram` (full
    * shuffle of distinct values) when the error bound isn't enough.
    *
    * Quantile read: for each q (percent) the FIRST bucket whose
    * cumulative count reaches ceil(q·N/100) — integer threshold
    * arithmetic, no doubles anywhere. The per-group cumulative window
    * runs over ≤ 64 rows per group (bucket-sized, never corpus-sized).
    *
    * Output: (groupCol, q_pct, bucket_bits, lo, hi, cum_n, n_total).
    */
  def log2HistogramQuantiles(
      df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[Int]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 100),
      "quantiles must be percents in (0, 100]")
    import org.apache.spark.sql.expressions.Window
    val buckets = df
      .select(col(groupCol), col(valueCol).cast("long").as("_v"))
      .filter(col("_v").isNotNull && col("_v") > 0)
      .withColumn("_bits", length(conv(col("_v"), 10, 2)).cast("long"))
      .groupBy(groupCol, "_bits").agg(count(lit(1)).as("_c"))
    val cum = Window.partitionBy(col(groupCol)).orderBy(col("_bits"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col(groupCol))
    val withCum = buckets
      .withColumn("cum_n", sum(col("_c")).over(cum))
      .withColumn("n_total", sum(col("_c")).over(tot))
    val pick = Window.partitionBy(col(groupCol), col("q_pct"))
      .orderBy(col("_bits"))
    withCum
      .crossJoin(broadcast(
        df.sparkSession.range(1).select(
          explode(array(qs.map(q => lit(q.toLong)): _*)).as("q_pct"))))
      .filter(col("cum_n") * 100 >= col("q_pct") * col("n_total"))
      .withColumn("_rk", row_number().over(pick))
      .filter(col("_rk") === 1)
      .select(col(groupCol), col("q_pct"),
        col("_bits").as("bucket_bits"),
        expr("shiftleft(1L, cast(_bits - 1 as int))").as("lo"),
        expr("shiftleft(1L, cast(_bits as int)) - 1").as("hi"),
        col("cum_n"), col("n_total"))
  }
}
