package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink surface (SURVEY.md §2.1). Each reference ingest path
  * reduces to a Spark reader plus the receiving-append convention.
  */
object Sources {

  /** S2/S9 — NDJSON: each line is one raw document (reference COPY-based
    * bulk upload, lib/id3c/db/session.py:157-188). The exact text is kept
    * (receiving convention); parse on read with from_json.
    */
  def readNdjson(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).withColumnRenamed("value", "document")

  def writeNdjson(df: DataFrame, path: String): Unit =
    df.toJSON.write.mode("overwrite").text(path)

  /** S3 — all-strings tabular reader (reference read_excel gymnastics,
    * lib/id3c/cli/io/pandas.py:48-133, forces every cell to string so
    * barcodes like "0440E5" or leading-zero ids survive). CSV/TSV with an
    * explicit all-StringType schema: inference is disabled by design.
    */
  def readCsvAllStrings(spark: SparkSession, path: String, sep: String = ","): DataFrame = {
    val header = spark.read.option("header", "false").option("sep", sep)
      .csv(path).limit(1).collect().headOption
      .map(_.toSeq.map(String.valueOf)).getOrElse(Seq.empty)
    val schema = StructType(header.map(c => StructField(c, StringType)))
    spark.read.option("header", "true").option("sep", sep).schema(schema).csv(path)
  }

  /** S5 — GeoJSON FeatureCollection reader (reference fiona-based location
    * import, cli/command/location.py:63-230): one row per feature with
    * properties map + geometry kept as a JSON string (geometry predicates
    * are applied by the geo helpers, not at ingest).
    */
  def readGeoJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)
      .select(explode(col("features")).as("feature"))
      .select(
        col("feature.properties").as("properties"),
        to_json(col("feature.geometry")).as("geometry_json"),
        col("feature.geometry.type").as("geometry_type"))

  /** S6 — FASTQ directory scan → sequence read sets (reference
    * cli/command/sequence_read_set.py:29-77): regex-extract the sample id
    * from each filename, group file urls per sample. The listing itself
    * is a metadata-only `binaryFile` scan (no content read).
    */
  def fastqReadSets(spark: SparkSession, dir: String,
      idPattern: String = "^(\\d+)_"): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.fastq.gz")
      .load(dir)
      .select(col("path"))
    files
      .withColumn("filename", element_at(split(col("path"), "/"), -1))
      .withColumn("sample", regexp_extract(col("filename"), idPattern, 1))
      .filter(col("sample") =!= "")
      .groupBy("sample")
      .agg(sort_array(collect_list(col("path"))).as("urls"))
  }

  /** S8-shape — cache-backed external lookup: join the persisted cache
    * first; only cache misses would go to the external service (reference
    * TTL pickle cache, cli/command/__init__.py:221-279). The service call
    * itself is out of scope (zero egress); `misses` is returned so a
    * caller can batch them.
    */
  def cachedLookup(input: DataFrame, cache: DataFrame, key: String): (DataFrame, DataFrame) = {
    val hits = input.join(cache, Seq(key), "inner")
    val misses = input.join(cache, Seq(key), "left_anti")
    (hits, misses)
  }

  /** S8 with the reference's full TTL semantics (`TTLCache(maxsize, ttl)`
    * + pickled_cache, cli/command/__init__.py:221-279): the cache frame
    * carries a `cached_at` timestamp; entries older than `ttlSeconds`
    * count as misses, exactly like TTLCache expiry.
    */
  def ttlCachedLookup(
      input: DataFrame,
      cache: DataFrame, // key, …values…, cached_at timestamp
      key: String,
      ttlSeconds: Long,
      now: java.sql.Timestamp): (DataFrame, DataFrame) = {
    val fresh = cache.filter(
      col("cached_at") >= lit(now) - expr(s"INTERVAL $ttlSeconds SECONDS"))
    cachedLookup(input, fresh, key)
  }

  /** Write-back step of the pickled-cache contract: newly resolved
    * entries are stamped `cached_at = now`; surviving entries keep their
    * stamps; expired entries are dropped; and when the result exceeds
    * `maxSize` the oldest entries are evicted first (TTLCache's
    * maxsize+TTL eviction). The top-k eviction is a global sort on
    * cached_at — acceptable because a lookup cache is dimension-scale by
    * construction; pass maxSize=0 to skip it.
    */
  def refreshTtlCache(
      cache: DataFrame,
      resolved: DataFrame, // key, …values… (no cached_at)
      key: String,
      ttlSeconds: Long,
      now: java.sql.Timestamp,
      maxSize: Long = 0L): DataFrame = {
    val stamped = resolved.withColumn("cached_at", lit(now))
    val fresh = cache.filter(
        col("cached_at") >= lit(now) - expr(s"INTERVAL $ttlSeconds SECONDS"))
      .join(stamped.select(key), Seq(key), "left_anti")
    val merged = stamped.unionByName(fresh)
    if (maxSize <= 0) merged
    else merged.orderBy(col("cached_at").desc).limit(maxSize.toInt)
  }
}
