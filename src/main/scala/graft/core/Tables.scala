package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the test star schema (TESTDATA.md) and for
  * receiving/warehouse directories in general.
  *
  * Reads are plain `spark.read.parquet` so Catalyst keeps full pushdown
  * (PushedFilters + ReadSchema pruning) on every downstream query.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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
