package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The receiving area (SURVEY.md §1.1): one append-only table per feed,
  * shaped exactly like the reference's receiving tables
  * (id3c schema/deploy/receiving/presence-absence.sql:8-24) —
  * `id, document (raw json text), received, processing_log`.
  *
  * The reference's GIN index on processing_log has no Spark equivalent;
  * instead the unprocessed scan stays cheap because (a) processing_log is
  * a pruned column, and (b) feeds can be compacted into processed/
  * unprocessed partition directories (`compact`), so incremental runs
  * prune partitions instead of filtering 100 TB.
  */
object Receiving {

  /** processing_log element (reference mark_processed,
    * etl/presence_absence.py:455-471): {etl, revision, status, timestamp}.
    */
  val logEntryType: StructType = StructType(Seq(
    StructField("etl", StringType),
    StructField("revision", IntegerType),
    StructField("status", StringType),
    StructField("timestamp", TimestampType)))

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("document", StringType),
    StructField("received", TimestampType),
    StructField("processing_log", ArrayType(logEntryType))))

  /** Wrap raw documents into receiving shape (S1/S2: HTTP receive and
    * NDJSON COPY both reduce to "append lines with received=now").
    *
    * Sequential ids come from [[Merge.withDenseId]] — the columnar
    * partition-offset prefix sum (one tiny count job, then purely local
    * numbering), NOT a global window, which would funnel the whole ingest
    * batch through a single partition (r10: previously an
    * `rdd.zipWithIndex` round-trip — same distribution, but a full Row
    * encode/decode that dropped ingest out of codegen). Ids follow input
    * order, same as the reference's bigserial.
    */
  def fromDocuments(docs: DataFrame, docCol: String, startId: Long = 0L): DataFrame = {
    val src = docs.select(col(docCol).cast("string").as("document"))
    Merge.withDenseId(src, "id", startId)
      .withColumn("received", current_timestamp())
      .withColumn("processing_log", array().cast(ArrayType(logEntryType)))
      .select("id", "document", "received", "processing_log")
  }

  /** Read an NDJSON feed file as raw documents (reference
    * cli/command/receiving.py:27-59 keeps the exact text around — so do
    * we: `document` stays the raw line, parsed on read with from_json).
    */
  def readNdjson(spark: SparkSession, path: String): DataFrame =
    fromDocuments(spark.read.text(path).withColumnRenamed("value", "document"), "document")

  /** F1 — *the* incremental predicate (reference `where not processing_log
    * @> [{"etl": name, "revision": rev}]`, etl/presence_absence.py:72-79):
    * keep records not yet processed by (etl, revision). A higher-order
    * `exists` keeps this inside codegen; no UDF, no shuffle.
    */
  def unprocessed(feed: DataFrame, etl: String, revision: Int): DataFrame =
    feed.filter(!exists(col("processing_log"),
      e => e.getField("etl") === lit(etl) && e.getField("revision") === lit(revision)))

  /** M8 — append a status entry to processing_log for the given ids.
    * Copy-on-write: returns the rewritten feed; [[snapshotSwap]] persists
    * it atomically, mirroring the reference's transactional commit
    * (cli/command/__init__.py:120-158).
    */
  def markProcessed(
      feed: DataFrame,
      processedIds: DataFrame, // single column "id"
      etl: String,
      revision: Int,
      status: String = "processed"): DataFrame = {
    val entry = struct(
      lit(etl).as("etl"), lit(revision).as("revision"),
      lit(status).as("status"), current_timestamp().as("timestamp"))
    feed.join(processedIds.select(col("id").as("_pid")),
        col("id") === col("_pid"), "left")
      .withColumn("processing_log",
        when(col("_pid").isNotNull,
          concat(col("processing_log"), array(entry)))
          .otherwise(col("processing_log")))
      .drop("_pid")
  }

  /** mark_skipped (reference etl/fhir.py:129-132): same append with
    * status=skipped — the per-record quarantine of §2.8.
    */
  def markSkipped(feed: DataFrame, ids: DataFrame, etl: String, revision: Int): DataFrame =
    markProcessed(feed, ids, etl, revision, status = "skipped")

  // ---- status side-table: O(batch) mark_processed --------------------
  // The copy-on-write markProcessed + snapshotSwap path rewrites the
  // ENTIRE feed to append one log element per touched row — at a 100 TB
  // feed with a 1 GB backlog that is a 100 TB rewrite per ETL cycle. The
  // reference appends one jsonb element in place
  // (etl/presence_absence.py:455-471); the batch-storage analogue is an
  // append-only SIDE-TABLE of (id, etl, revision, status, timestamp)
  // rows: each cycle appends O(batch) rows and never touches the feed.
  // The copy-on-write path remains as the compaction story (fold the
  // side-table back into processing_log when the feed is rewritten
  // anyway, e.g. by compactByProcessed).

  /** Status rows for `ids` — the side-table delta of one ETL cycle.
    * Append with `df.write.mode("append").parquet(statusDir)`: appends
    * are new files only, O(batch) bytes written.
    */
  def statusDelta(
      ids: DataFrame, // single column "id"
      etl: String,
      revision: Int,
      status: String = "processed"): DataFrame =
    ids.select(col("id"), lit(etl).as("etl"), lit(revision).as("revision"),
      lit(status).as("status"), current_timestamp().as("timestamp"))

  /** F1 against the side-table: records with no status row for
    * (etl, revision) in either the side-table or the feed's own
    * processing_log. The anti-join shuffles only (id) pairs of the
    * side-table — never the documents (AQE broadcasts a small backlog's
    * worth of status rows).
    */
  def unprocessedVia(
      feed: DataFrame,
      statusTable: DataFrame,
      etl: String,
      revision: Int): DataFrame =
    unprocessed(feed, etl, revision)
      .join(statusTable
          .filter(col("etl") === lit(etl) && col("revision") === lit(revision))
          .select(col("id")),
        Seq("id"), "left_anti")

  /** Fold the side-table back into the reference-shaped processing_log
    * column (compaction read path; entries ordered by timestamp). */
  def withProcessingLog(feed: DataFrame, statusTable: DataFrame): DataFrame = {
    val folded = statusTable
      .groupBy("id")
      .agg(array_sort(collect_list(struct(
        col("timestamp"), col("etl"), col("revision"), col("status"))))
        .as("_entries"))
      .select(col("id"), transform(col("_entries"),
        e => struct(e.getField("etl").as("etl"),
          e.getField("revision").as("revision"),
          e.getField("status").as("status"),
          e.getField("timestamp").as("timestamp"))).as("_log"))
    feed.join(folded, Seq("id"), "left")
      .withColumn("processing_log",
        concat(col("processing_log"),
          coalesce(col("_log"), array().cast(ArrayType(logEntryType)))))
      .drop("_log")
  }

  /** Compact a feed into a directory partitioned by a `processed` flag
    * for (etl, revision). The reference's GIN index on processing_log has
    * no Spark equivalent; this is its replacement at scale — an
    * incremental run reads `processed=false` and PRUNES the processed
    * partitions at the file listing, so a 100 TB feed with a 1 GB backlog
    * scans 1 GB (SURVEY §4 "partition receiving tables on a processed
    * flag").
    */
  def compactByProcessed(feed: DataFrame, etl: String, revision: Int,
      dir: String): Unit =
    feed.withColumn("processed",
        exists(col("processing_log"),
          e => e.getField("etl") === lit(etl) &&
            e.getField("revision") === lit(revision)))
      .write.mode("overwrite").partitionBy("processed").parquet(dir)

  /** Read the unprocessed partition of a compacted feed (partition-pruned
    * scan — check `.explain` for `PartitionFilters: [isnotnull(processed),
    * (processed = false)]`).
    */
  def readUnprocessedPartition(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).filter(!col("processed")).drop("processed")

  /** Atomic snapshot write: write to `<dir>.tmp-<epoch>`, then swap the
    * directory — the batch analogue of the reference's single-transaction
    * commit/rollback (cli/command/__init__.py:89-158). A dry run stops
    * before the swap.
    *
    * Crash safety (single writer): between `rename(dst→bak)` and
    * `rename(tmp→dst)` there is an instant with no live directory. Every
    * entry point ([[openSnapshot]], and snapshotSwap itself before it
    * starts) runs [[recoverSwap]], which rolls a stranded `.bak-*` back
    * into place — the rename-back is one atomic metadata op, so a crashed
    * swap behaves like the reference's rolled-back transaction: the old
    * snapshot stays live, the orphaned `.tmp-*` is swept.
    */
  def snapshotSwap(df: DataFrame, dir: String, dryRun: Boolean = false): Unit = {
    val tmp = s"$dir.tmp-${System.currentTimeMillis()}"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      df.sparkSession.sparkContext.hadoopConfiguration)
    if (!dryRun) recoverSwap(fs, dir)
    df.write.mode("overwrite").parquet(tmp)
    if (dryRun) {
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      ()
    } else {
      val dst = new org.apache.hadoop.fs.Path(dir)
      val bak = new org.apache.hadoop.fs.Path(s"$dir.bak-${System.currentTimeMillis()}")
      if (fs.exists(dst)) fs.rename(dst, bak)
      fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
      if (fs.exists(bak)) fs.delete(bak, true)
      ()
    }
  }

  /** Read a snapshot table, first recovering from any crashed swap. */
  def openSnapshot(spark: SparkSession, dir: String): DataFrame = {
    recoverSwap(org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration), dir)
    spark.read.parquet(dir)
  }

  /** Roll back a swap that crashed between its two renames: if `dir` is
    * missing but `.bak-*` siblings exist, the newest backup is renamed
    * back into place (atomic) and orphaned `.tmp-*` staging dirs are
    * swept. No-op when `dir` is live.
    */
  def recoverSwap(fs: org.apache.hadoop.fs.FileSystem, dir: String): Unit = {
    val dst = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(dst)) {
      val baks = Option(fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$dir.bak-*"))).getOrElse(Array.empty)
      if (baks.nonEmpty) {
        val newest = baks.maxBy(_.getPath.getName)
        fs.rename(newest.getPath, dst)
        baks.filterNot(_ eq newest).foreach(b => fs.delete(b.getPath, true))
        Option(fs.globStatus(new org.apache.hadoop.fs.Path(s"$dir.tmp-*")))
          .getOrElse(Array.empty)
          .foreach(t => fs.delete(t.getPath, true))
      }
    }
  }
}
