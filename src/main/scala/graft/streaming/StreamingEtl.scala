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
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))

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
}
