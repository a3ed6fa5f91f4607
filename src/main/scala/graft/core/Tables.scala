package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the test star schema (TESTDATA.md) and for
  * receiving/warehouse directories in general.
  *
  * Reads are plain `spark.read.parquet` so Catalyst keeps full pushdown
  * (PushedFilters + ReadSchema pruning) on every downstream query.
  */
object Tables {
  /** (sessionId, path) → base relation. `spark.read.parquet` re-lists the
    * directory and re-reads footers to re-infer the schema on EVERY call —
    * measured 150-300 ms per table on this box's filesystem, paid by every
    * query in a bench pass. The resolved relation is immutable, so reuse
    * it: downstream plans build on the same LogicalRelation and keep full
    * pushdown/pruning. Keyed by session so tests with their own sessions
    * never share state; values are weakly referenced via the session's own
    * lifecycle (a bounded map of tiny plan objects — at most
    * #sessions × #tables entries).
    */
  private val relationCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    relationCache.computeIfAbsent(
      (spark, s"$dir/$name.parquet"),
      { case (_, path) => spark.read.parquet(path) })

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark only reads as a
    * raw long (spark.sql.legacy.parquet.nanosAsLong — set in our session
    * builders). Normalize to a proper timestamp (µs precision) here.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
