package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming face of the ETL layer (SURVEY.md §2.8).
  *
  * The reference approximates a stream processor with append-only receiving
  * tables + an unprocessed filter + FIFO ordering (id3c
  * cli/command/etl/presence_absence.py:64-79). The native Spark shape is a
  * file-source stream over the receiving directory with checkpointed
  * progress — the checkpoint subsumes `processing_log` bookkeeping, and
  * `Trigger.AvailableNow` gives exactly the reference's "drain everything
  * pending, then stop" cron semantics with exactly-once file tracking.
  *
  * At 100 TB the same code runs continuously (ProcessingTime trigger) with
  * `maxFilesPerTrigger` as backpressure — no operator changes.
  */
object StreamingEtl {

  /** Open a receiving feed directory as a stream of raw documents. */
  def readFeed(
      spark: SparkSession,
      dir: String,
      schema: StructType,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(dir)
  }

  /** Run one drain-the-backlog pass (cron semantics): apply `transform` to
    * each micro-batch and append the result to `outDir`. The checkpoint
    * directory IS the processing log — restarts resume exactly after the
    * last committed batch.
    */
  def drainToParquet(
      feed: DataFrame,
      transform: DataFrame => DataFrame,
      outDir: String,
      checkpointDir: String): StreamingQuery =
    transform(feed).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .start()

  /** Windowed event-time aggregation with a watermark — the streaming twin
    * of SparkEntry's q30 tumbling-window query. Late events beyond
    * `watermark` are dropped; state is bounded (the scale requirement).
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      window: String = "1 hour",
      watermark: String = "2 hours",
      slide: Option[String] = None): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(
        slide.fold(
          org.apache.spark.sql.functions.window(col(tsCol), window))(sl =>
          org.apache.spark.sql.functions.window(col(tsCol), window, sl)),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Per-interval OHLC downsampling bars — the streaming twin of
    * SparkEntry's q116. Every output is an exact selection (min_by/
    * max_by/min/max), which makes the streamed result identical to the
    * batch result regardless of micro-batch boundaries: selections
    * commute with partial aggregation, unlike float accumulations.
    * Watermark bounds state to live windows.
    */
  def ohlcBars(
      events: DataFrame, tsCol: String, keyCol: String,
      window: String = "1 day", watermark: String = "2 days"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
        col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        min_by(col("value"), struct(col(tsCol), col("event_id"))).as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max_by(col("value"), struct(col(tsCol), col("event_id"))).as("close"))
      .select(col("window.start").as("bar_start"), col(keyCol),
        col("n_events"), col("open"), col("high"), col("low"), col("close"))

  /** Stateful per-key sessionization via flatMapGroupsWithState-style
    * dedup: keep the first occurrence of each (key) across micro-batches
    * using dropDuplicates with a watermark — bounded state, exactly the
    * first-DET-per-record semantics of the reference
    * (etl/redcap_det.py:137-175) in streaming form.
    */
  def firstPerKey(events: DataFrame, tsCol: String, keyCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Watermarked stream-stream interval join — the two-stream face of the
    * batch interval join ([[graft.operators.IntervalJoin]]): each left
    * event matches right events with the same key whose event time falls
    * in [left.ts + lowerSec, left.ts + upperSec] — the impression→click /
    * order→result attribution shape. BOTH sides carry watermarks and the
    * join condition bounds event-time skew, which is exactly what lets
    * Spark derive a state-retention horizon and EVICT buffered rows
    * instead of holding either stream forever — the stream-stream scale
    * requirement; without the time bound, state grows with the corpus.
    *
    * The same call works on batch frames (withWatermark is a no-op there),
    * so backfill and live attribution share one code path; the spec pins
    * stream == batch equality.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String,
      lowerSec: Long, upperSec: Long,
      watermark: String = "2 hours"): DataFrame = {
    require(lowerSec <= upperSec,
      s"interval [$lowerSec, $upperSec] is empty")
    val lw = left.withWatermark(leftTs, watermark)
    val rw = right.withWatermark(rightTs, watermark)
    lw.join(rw,
        lw(keyCol) === rw(keyCol) &&
          rw(rightTs) >= lw(leftTs) + expr(s"INTERVAL '$lowerSec' SECOND") &&
          rw(rightTs) <= lw(leftTs) + expr(s"INTERVAL '$upperSec' SECOND"))
      .drop(rw(keyCol))
  }

  /** Streaming near-duplicate gate: each arriving document is minhashed
    * PER ROW (the stateless column form — no groupBy, so the stream
    * needs no watermark), banded, and probed against a STANDING corpus
    * index ([[graft.operators.Dedup.minhashBandIndex]], loaded as a
    * static frame) — the streaming twin of the batch incremental dedup
    * (`minhashLshPairsAgainst`, q77). Signature agreement is verified
    * inline on the matched rows, so the whole micro-batch pipeline is
    * stateless: state lives in the persisted index, not the stream, and
    * a restart replays exactly (the determinism the md5 minhash family
    * guarantees).
    *
    * A pair matched by several bands emits one row per matching band —
    * dedup of the flag belongs to the sink (or a
    * `dropDuplicatesWithinWatermark` when event time exists); the spec
    * pins distinct-pair equality with the batch operator.
    *
    * Output: batch_id, corpus_id, agree (matched signature positions).
    */
  def dedupAgainstIndex(
      docs: DataFrame, index: DataFrame,
      idCol: String, textCol: String,
      shingleN: Int = 4, numHashes: Int = 16, bandSize: Int = 4,
      minAgree: Int = 12): DataFrame = {
    val numBands = numHashes / bandSize
    val sig = graft.operators.Dedup.minhashSignature(
      col(textCol), shingleN, numHashes)
    val banded = docs
      .select(col(idCol).as("batch_id"), sig.as("sig_b"))
      .select(col("batch_id"), col("sig_b"),
        posexplode(graft.operators.Dedup.bandBuckets(
          col("sig_b"), numBands, bandSize)).as(Seq("band", "bucket")))
    banded
      .join(index.select(col("id").as("corpus_id"), col("sig").as("sig_a"),
        col("band"), col("bucket")), Seq("band", "bucket"))
      .withColumn("agree", size(filter(
        zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b)))
      .filter(col("agree") >= minAgree)
      .select("batch_id", "corpus_id", "agree")
  }

  /** A keyed update event entering [[upsertChanges]]. */
  final case class Upsert(key: String, seq: Long, value: String)
  /** Per-key state carried between micro-batches. */
  final case class LastValue(value: String)
  /** Emitted change row: change ∈ created | updated (no-ops are skipped). */
  final case class Change(key: String, seq: Long, value: String, change: String)

  /** The upsert verb's change-detection semantics (reference
    * etl/__init__.py:175-197 / db/__init__.py:262-269 — insert, update, or
    * "skip if unchanged") as genuine custom streaming state:
    * `flatMapGroupsWithState` keeps each key's last value between
    * micro-batches and emits only created/updated rows, so a feed that
    * re-delivers the same document produces no writes — the streaming twin
    * of the batch MERGE's no-op suppression, with per-key state instead of
    * a full-table join.
    *
    * Scale: state is one value per live key, partitioned by key across
    * executors (RocksDB-backed state store on a real cluster); events
    * within a batch apply in `seq` order, so replays are deterministic.
    */
  def upsertChanges(updates: org.apache.spark.sql.Dataset[Upsert])
      : org.apache.spark.sql.Dataset[Change] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import updates.sparkSession.implicits._
    updates
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Upsert], state: GroupState[LastValue]) =>
          val ordered = rows.toSeq.sortBy(_.seq)
          val out = Seq.newBuilder[Change]
          var last = state.getOption.map(_.value)
          for (u <- ordered) {
            last match {
              case None =>
                out += Change(key, u.seq, u.value, "created")
              case Some(v) if v != u.value =>
                out += Change(key, u.seq, u.value, "updated")
              case _ => () // unchanged → skip (no write)
            }
            last = Some(u.value)
          }
          last.foreach(v => state.update(LastValue(v)))
          out.result().iterator
      }
  }

  /** An event entering [[rollingFeatures]]. */
  final case class Tick(user: String, sec: Long, eventId: Long, value: Double)
  /** Per-user trailing-window buffer carried between micro-batches. */
  final case class TailBuf(window: Seq[(Long, Long, Double)]) // sec, id, value
  /** Per-event rolling feature row. */
  final case class Rolling(
      user: String, sec: Long, eventId: Long, n1h: Long, sum1h: Double)

  /** Streaming twin of SparkEntry's q130 rolling RANGE-frame features:
    * each event emits its user's trailing-`horizonSec` count and value
    * sum AS OF that event — the online feature-serving form of the batch
    * lookback. `flatMapGroupsWithState` keeps one bounded buffer per user
    * (events inside the horizon only), evicting as time advances.
    *
    * RANGE-frame peer semantics are preserved: all events sharing a
    * second are appended before any of them emits, so same-second peers
    * see each other exactly as the batch window frame does. Equality with
    * the batch expression holds when each user's events arrive in
    * event-time order across micro-batches (the spec pins it); a late
    * event cannot retroactively amend rows already emitted — that
    * reconciliation belongs to the batch backfill.
    */
  def rollingFeatures(
      ticks: org.apache.spark.sql.Dataset[Tick],
      horizonSec: Long = 3600): org.apache.spark.sql.Dataset[Rolling] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import ticks.sparkSession.implicits._
    ticks
      .groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: String, rows: Iterator[Tick], state: GroupState[TailBuf]) =>
          var buf = state.getOption.map(_.window).getOrElse(Seq.empty)
          val out = Seq.newBuilder[Rolling]
          rows.toSeq.sortBy(t => (t.sec, t.eventId)).groupBy(_.sec).toSeq
            .sortBy(_._1).foreach { case (sec, peers) =>
              buf = (buf ++ peers.map(t => (t.sec, t.eventId, t.value)))
                .filter(_._1 > sec - horizonSec)
              for (t <- peers.sortBy(_.eventId))
                out += Rolling(user, t.sec, t.eventId, buf.size,
                  buf.map(_._3).sum)
            }
          state.update(TailBuf(buf))
          out.result().iterator
      }
  }

  /** Per-shard Misra-Gries state for [[streamingHeavyHitterCandidates]]. */
  case class MgShardState(counters: Map[String, Long], n: Long)

  /** Streaming heavy-hitter candidates — the Misra-Gries summary
    * ([[graft.operators.Sketches.mgFold]], same kernel as the batch
    * two-pass form) as flatMapGroupsWithState state, sharded by key
    * hash so no single task owns the stream: each shard holds ≤ k−1
    * counters FOREVER (bounded state, no watermark needed — the sketch,
    * not the stream, is the state) and re-emits its current summary
    * every micro-batch. Guarantee: a key with global frequency > n/k
    * has shard frequency > n_shard/k (all its occurrences land in one
    * shard and n_shard ≤ n), so the union of shard candidate sets is a
    * SUPERSET of the true heavy hitters at every point in time; the
    * exact counts come from the same bounded verification pass the
    * batch form runs ([[graft.operators.Sketches.heavyHitters]] pass 2)
    * against the accumulated corpus.
    *
    * Output stream (Update mode): (shard, candidates array, shard_n) —
    * latest row per shard is its current summary.
    */
  def streamingHeavyHitterCandidates(
      stream: DataFrame, keyCol: String, k: Int,
      numShards: Int = 64): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(k >= 2 && numShards >= 1)
    val spark = stream.sparkSession
    import spark.implicits._
    val ds = stream.select(
        pmod(hash(col(keyCol)), lit(numShards)).as("shard"),
        col(keyCol).cast("string").as("key"))
      .as[(Int, String)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[(Int, String)],
            state: GroupState[MgShardState]) =>
          val m = scala.collection.mutable.HashMap.empty[String, Long]
          state.getOption.foreach(s => m ++= s.counters)
          var n = state.getOption.map(_.n).getOrElse(0L)
          val batch = rows.map(_._2).toArray
          n += batch.length
          graft.operators.Sketches.mgFold(batch.iterator, k - 1, m)
          state.update(MgShardState(m.toMap, n))
          Iterator.single((shard, m.keys.toSeq.sorted, n))
      }.toDF("shard", "candidates", "shard_n")
  }

  /** Per-group bucket-count state for [[streamingLog2Histogram]]. */
  case class HistState(counts: Map[Long, Long])

  /** Streaming twin of [[graft.operators.Sketches.log2HistogramQuantiles]]'s
    * histogram: per-group bit-length bucket counts held as
    * flatMapGroupsWithState state (≤ 64 counters per group FOREVER —
    * the sketch, not the stream, is the state, same contract as
    * [[streamingHeavyHitterCandidates]]) and re-emitted every
    * micro-batch. Because the sketch merges by addition, the streamed
    * state after any prefix of the stream is IDENTICAL to the batch
    * histogram over that prefix — not approximately, register-for-
    * register (the spec pins it) — and quantile reads are the same
    * cumulative-count arithmetic as the batch form.
    *
    * Output stream (Update mode): (group, bits array, counts array) —
    * latest row per group is its current histogram, buckets ascending.
    */
  def streamingLog2Histogram(
      stream: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    val ds = stream.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull && col("v") > 0)
      .as[(String, Long)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Long)],
            state: GroupState[HistState]) =>
          val m = scala.collection.mutable.HashMap.empty[Long, Long]
          state.getOption.foreach(s => m ++= s.counts)
          rows.foreach { case (_, v) =>
            val bits = (64 - java.lang.Long.numberOfLeadingZeros(v)).toLong
            m(bits) = m.getOrElse(bits, 0L) + 1L
          }
          state.update(HistState(m.toMap))
          val sorted = m.toSeq.sortBy(_._1)
          Iterator.single((g, sorted.map(_._1), sorted.map(_._2)))
      }.toDF(groupCol, "bits", "counts")
  }

  /** Per-row counter state for [[streamingCountMin]]. */
  case class CmRowState(counts: Map[Long, Long])

  /** Streaming twin of [[graft.operators.Sketches.countMinSketch]]: the
    * same md5-salted (row, bucket) cells, held as one bounded counter
    * map per sketch row (≤ width counters per row FOREVER) in
    * flatMapGroupsWithState state and re-emitted every micro-batch.
    * Counter addition is the merge, so after any stream prefix the
    * state is register-for-register IDENTICAL to the batch sketch over
    * that prefix (spec-pinned) — frequency ceilings stay valid while
    * the stream runs, no rebuild between micro-batches.
    *
    * Output stream (Update mode): (r, buckets array, cnts array),
    * buckets ascending — latest row per r is that sketch row's state.
    */
  def streamingCountMin(
      stream: DataFrame, keyCol: String, depth: Int, width: Int)
      : DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    val cells = stream.select(explode(array((0 until depth).map { r =>
        struct(lit(r.toLong).as("r"),
          (graft.operators.Sampling.keyHash60(col(keyCol), s"cm$r") % width)
            .as("bucket"))
      }: _*)).as("_p"))
      .select(col("_p.r").as("r"), col("_p.bucket").as("bucket"))
      .as[(Long, Long)]
    cells.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (r: Long, rows: Iterator[(Long, Long)],
            state: GroupState[CmRowState]) =>
          val m = scala.collection.mutable.HashMap.empty[Long, Long]
          state.getOption.foreach(s => m ++= s.counts)
          rows.foreach { case (_, b) => m(b) = m.getOrElse(b, 0L) + 1L }
          state.update(CmRowState(m.toMap))
          val sorted = m.toSeq.sortBy(_._1)
          Iterator.single((r, sorted.map(_._1), sorted.map(_._2)))
      }.toDF("r", "buckets", "cnts")
  }

  /** An event entering [[gapSessions]] (event time in epoch seconds). */
  final case class SEvent(user: String, sec: Long,
      ts: java.sql.Timestamp)
  /** Per-user open session carried between micro-batches. */
  final case class OpenSession(start: Long, end: Long, n: Long)
  /** A closed session emitted by [[gapSessions]]. */
  final case class ClosedSession(
      user: String, start_sec: Long, end_sec: Long, n_events: Long)

  /** Streaming gap sessionization — the stateful twin of q82's batch
    * `session_window`: one bounded [[OpenSession]] per active user,
    * extended while events arrive within `gapSec` of the session's
    * last event (MERGE at exactly last+gap, matching Spark's batch
    * session_window boundary), closed and emitted either when a
    * farther event opens the next session or when the event-time
    * watermark passes end+gap (EventTimeTimeout — idle users' sessions
    * drain without waiting for their next event, and state for a user
    * who never returns is dropped, so state stays proportional to
    * ACTIVE users, not ever-seen users).
    *
    * Equality with the batch form holds when each user's events arrive
    * in event-time order across micro-batches (the spec pins stream ==
    * batch `session_window` min/max/count); a late event cannot reopen
    * an emitted session — that reconciliation belongs to the batch
    * backfill, the same contract as [[rollingFeatures]].
    */
  def gapSessions(
      events: org.apache.spark.sql.Dataset[SEvent],
      gapSec: Long = 1800)
      : org.apache.spark.sql.Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (user: String, rows: Iterator[SEvent],
            state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(user, s.start, s.end, s.n))
          } else {
            val out = Seq.newBuilder[ClosedSession]
            var open = state.getOption
            for (e <- rows.toSeq.sortBy(_.sec)) {
              open match {
                case Some(s) if e.sec <= s.end + gapSec =>
                  open = Some(OpenSession(s.start, math.max(s.end, e.sec),
                    s.n + 1))
                case Some(s) =>
                  out += ClosedSession(user, s.start, s.end, s.n)
                  open = Some(OpenSession(e.sec, e.sec, 1))
                case None =>
                  open = Some(OpenSession(e.sec, e.sec, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // fire only once an event at exactly end+gap (which would
              // still merge) can no longer arrive
              state.setTimeoutTimestamp((s.end + gapSec) * 1000 + 1)
            }
            out.result().iterator
          }
      }
  }

  /** Per-key OLS accumulator carried between micro-batches: the five
    * monoid sums of [[graft.operators.EventAnalytics.trendSlopes]]. */
  final case class TrendState(n: Long, sx: Long, sy: Long, sxy: Long,
      sxx: Long)

  /** Streaming twin of the batch trend detector
    * ([[graft.operators.EventAnalytics.trendSlopes]]): the OLS slope's
    * five sums (n, Σx, Σy, Σxy, Σx²) are a commutative monoid, so the
    * per-key state is FIVE LONGS regardless of stream length — the
    * canonical "aggregate state, never raw rows" incremental shape.
    * `yCol` must already be integer units (cents/micros — the house
    * exactness discipline), `secCol` epoch seconds; `epochOffset`
    * recenters x exactly like the batch operator so the sums, and
    * therefore the slope computed from them, match the batch run over
    * the same prefix sum-for-sum (spec-pinned).
    *
    * Output stream (Update mode): (key, n_events, sx, sy, sxy, sxx) —
    * latest row per key is its current state; slope = the batch
    * projection (n·Σxy − ΣxΣy)/(n·Σx² − (Σx)²) applied downstream.
    */
  def streamingTrendSums(
      stream: DataFrame, keyCol: String, secCol: String, yCol: String,
      epochOffset: Long): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    val rows = stream.select(col(keyCol).cast("string"),
        (col(secCol).cast("long") - epochOffset).as("_x"),
        col(yCol).cast("long"))
      .as[(String, Long, Long)]
    rows.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (k: String, it: Iterator[(String, Long, Long)],
            state: GroupState[TrendState]) =>
          var s = state.getOption.getOrElse(TrendState(0L, 0L, 0L, 0L, 0L))
          it.foreach { case (_, x, y) =>
            s = TrendState(s.n + 1, s.sx + x, s.sy + y,
              s.sxy + x * y, s.sxx + x * x)
          }
          state.update(s)
          Iterator.single((k, s.n, s.sx, s.sy, s.sxy, s.sxx))
      }.toDF(keyCol, "n_events", "sx", "sy", "sxy", "sxx")
  }
}
