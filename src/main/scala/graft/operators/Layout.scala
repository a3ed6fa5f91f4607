package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout for columnar tables — the write-side half of the
  * 100 TB design. Query plans prune with partition values and per-file
  * column min/max statistics; both only help if the writer CLUSTERED the
  * data so those ranges are tight. This module owns the two standard
  * mechanisms:
  *
  *  - [[writeZClustered]]: multi-dimensional clustering — range-partition
  *    and sort by a Z-order curve key ([[graft.functions.zOrder2]]) so
  *    per-file min/max stays tight on BOTH interleaved dimensions and
  *    scans filtered on either prune files.
  *  - [[writeBucketed]]: hash-bucket a join/aggregation key at write time
  *    so later joins and groupBys between co-bucketed tables need NO
  *    exchange at all — the shuffle is paid once, at write, not per query.
  */
object Layout {

  /** Write `df` as parquet clustered on the Z-order curve of two bounded
    * non-negative dimensions. `repartitionByRange` on the curve key gives
    * each output file a disjoint curve interval (range exchange + local
    * sort); a curve interval is a small set of rectangles in (x, y), so
    * every file's min/max footprint is tight on both columns — the
    * property scans rely on to skip files for a predicate on either
    * dimension. One shuffle total, the same cost profile as any
    * repartition write.
    *
    * `numFiles` sizes output files (at 100 TB: total bytes / ~128 MB).
    */
  def writeZClustered(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int,
      numFiles: Int,
      path: String): Unit = {
    val z = graft.functions.zOrder2(col(xCol), col(yCol), bits)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Write `df` hash-bucketed (and sorted) by `keys` as a catalog table.
    * Two tables bucketed the same way equi-join with ZERO exchange — at
    * corpus scale that turns every recurring join against a standing
    * index (dedup corpus, identifier dimension, embedding index) from a
    * per-query 100 TB shuffle into a one-time write-side cost. Sorted
    * buckets additionally let the join skip its sort.
    */
  def writeBucketed(
      df: DataFrame,
      numBuckets: Int,
      keys: Seq[String],
      table: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Per-file (min, max) of a column across a parquet directory — the
    * pruning-tightness audit [[writeZClustered]] is judged by. Distributed
    * (`input_file_name` + hash agg), no footer reads on the driver.
    */
  def fileRanges(spark: SparkSession, path: String, colName: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(colName)).as("lo"), max(col(colName)).as("hi"),
        count(lit(1)).as("rows"))

  /** Skip-effectiveness report over a [[fileRanges]] frame: for a range
    * predicate [lo, hi] on the audited column, how many files (and
    * rows) a min/max zone map would prune without opening them. This is
    * the measurement to run BEFORE committing a 100 TB re-cluster: if
    * the current layout already skips 95% of files for the hot
    * predicates, a Z-order rewrite buys little; if it skips 0%, the
    * rewrite pays for itself in scan time. One aggregation over the
    * file-count-sized stats frame.
    *
    * Output: one row — n_files, n_skipped, n_rows, rows_skipped.
    */
  def skipEffectiveness(ranges: DataFrame, lo: Column, hi: Column): DataFrame =
    ranges.agg(
      count(lit(1)).as("n_files"),
      sum(when(col("hi") < lo || col("lo") > hi, 1L).otherwise(0L))
        .as("n_skipped"),
      sum(col("rows")).as("n_rows"),
      sum(when(col("hi") < lo || col("lo") > hi, col("rows"))
        .otherwise(0L)).as("rows_skipped"))

  /** Small-file compaction (the OPTIMIZE verb): rewrite a parquet
    * directory into ceil(bytes / targetBytes) files. Incremental ingest
    * (micro-batches, per-feed appends) strews thousands of KB-scale
    * files; at 100 TB the resulting open/footer/seek overhead dominates
    * scan time and throttles the driver's file listing. `coalesce` (not
    * `repartition`) merges partitions WITHOUT a shuffle — compaction
    * reads each row once and writes it once; clustering during
    * compaction is [[writeZClustered]]'s job, not this one's.
    *
    * Returns (input file count, output file count, bytes).
    */
  def compactToTarget(
      spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): (Int, Int, Long) = {
    val (nIn, bytes, n) = compactionStats(inDir, targetBytes)
    withMaxPartitionBytes(spark, targetBytes) {
      spark.read.parquet(inDir).coalesce(n)
        .write.mode(SaveMode.Overwrite).parquet(outDir)
    }
    val out = Option(new java.io.File(outDir).listFiles())
      .getOrElse(Array.empty)
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    (nIn, out, bytes)
  }

  /** The shuffle-free compaction frame [[compactToTarget]] writes —
    * split out so specs can assert the executed plan has no Exchange.
    * Partitions are forced (`rdd.getNumPartitions`) while the packing
    * conf is pinned, so the returned frame keeps them.
    */
  def compactionFrame(
      spark: SparkSession, inDir: String,
      targetBytes: Long): org.apache.spark.sql.DataFrame = {
    val (_, _, n) = compactionStats(inDir, targetBytes)
    withMaxPartitionBytes(spark, targetBytes) {
      val df = spark.read.parquet(inDir).coalesce(n)
      df.rdd.getNumPartitions // materialize scan partitions under the conf
      df
    }
  }

  /** (input parquet file count, input bytes, target output file count). */
  private def compactionStats(
      inDir: String, targetBytes: Long): (Int, Long, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val files = Option(new java.io.File(inDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val bytes = files.map(_.length()).sum
    (files.length, bytes,
      math.max(1, ((bytes + targetBytes - 1) / targetBytes).toInt))
  }

  /** Pin `spark.sql.files.maxPartitionBytes` to `targetBytes` for the
    * duration of `body`: the scan's partition packing must not merge
    * more than a target-file's worth into one read partition — `coalesce`
    * only MERGES, so with the default 128 MB packing the requested file
    * count would silently not be reached for small targets.
    */
  private def withMaxPartitionBytes[A](
      spark: SparkSession, targetBytes: Long)(body: => A): A = {
    val key = "spark.sql.files.maxPartitionBytes"
    val before = spark.conf.getOption(key)
    spark.conf.set(key, targetBytes)
    try body
    finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
