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
    // escape = '"' selects RFC-4180 doubled-quote escaping ("" inside a
    // quoted field → one quote), the dialect pandas/DuckDB/Excel write;
    // Spark's default backslash escape leaves `"q""esc"` un-unescaped
    // (caught by the q285 fixture gate)
    val header = spark.read.option("header", "false").option("sep", sep)
      .option("escape", "\"")
      .csv(path).limit(1).collect().headOption
      .map(_.toSeq.map(String.valueOf)).getOrElse(Seq.empty)
    val schema = StructType(header.map(c => StructField(c, StringType)))
    spark.read.option("header", "true").option("sep", sep)
      .option("escape", "\"").schema(schema).csv(path)
  }

  /** S4 — workbook provenance + digest-keyed conditional re-parse
    * (reference cli/io/google.py:66-99 and cli/command/manifest.py:
    * 297-317): a docs.google.com URL yields its document id (the Drive
    * export + etag REST calls themselves are external SaaS, out of scope
    * per SURVEY — zero egress). A LOCAL workbook's provenance digest is
    * sha1 of its bytes — the reference's non-Google branch
    * (manifest.py:313-316) — or sha1 of a supplied etag (the Google
    * branch, manifest.py:309-310). [[readWorkbookCached]] re-parses the
    * all-strings sheet only when the digest changed: the etag-conditional
    * export, locally.
    */
  def googleDocumentId(url: String): Option[String] = {
    val u = try new java.net.URI(url) catch { case _: Exception => return None }
    if (u.getHost != "docs.google.com") None
    else "^/[^/]+/d/([a-zA-Z0-9\\-_]+)".r
      .findFirstMatchIn(Option(u.getPath).getOrElse(""))
      .map(_.group(1))
  }

  /** sha1 provenance digest: of the etag when one is known (Google
    * branch), else of the workbook bytes. */
  def workbookDigest(path: String, etag: Option[String] = None): String =
    org.apache.commons.codec.digest.DigestUtils.sha1Hex(
      etag.map(_.getBytes("UTF-8")).getOrElse(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))))

  /** All-strings sheet read, cached by provenance digest: an unchanged
    * workbook (same digest) is served from the parquet cache without
    * re-parsing — the conditional-fetch semantics of the reference's
    * etag check. Returns (frame, digest); thread the digest into
    * `_provenance` downstream exactly as manifest.py:316-331 does.
    */
  def readWorkbookCached(
      spark: SparkSession, path: String, sheet: Option[String],
      cacheDir: String, etag: Option[String] = None): (DataFrame, String) = {
    val digest = workbookDigest(path, etag)
    val dest = new java.io.File(
      cacheDir, digest + sheet.map("_" + _).getOrElse(""))
    if (!new java.io.File(dest, "_SUCCESS").exists()) {
      val wb = if (path.toLowerCase.endsWith(".xls")) Xls.read(spark, path, sheet)
        else Xlsx.read(spark, path, sheet)
      wb.write.mode("overwrite").parquet(dest.getPath)
    }
    (spark.read.parquet(dest.getPath), digest)
  }

  /** Extension-dispatched all-strings loader (reference
    * lib/id3c/cli/io/pandas.py:48-75 `load_file_as_dataframe`):
    * csv / tsv / xls / xlsx; anything else raises, matching
    * `UnsupportedFileExtensionError`.
    */
  def loadFileAsDataFrame(spark: SparkSession, path: String): DataFrame = {
    val p = path.toLowerCase
    if (p.endsWith(".csv")) readCsvAllStrings(spark, path)
    else if (p.endsWith(".tsv")) readCsvAllStrings(spark, path, sep = "\t")
    else if (p.endsWith(".xls")) Xls.read(spark, path)
    else if (p.endsWith(".xlsx")) Xlsx.read(spark, path)
    else throw new IllegalArgumentException(
      s"Unsupported file extension for «$path»; choose csv/tsv/xls/xlsx")
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

  /** S5 — ESRI shapefile (.shp) reader (public spec: ESRI Shapefile
    * Technical Description, 1998), completing the reference's fiona-based
    * location import (cli/command/location.py:63-230) for its second
    * format. Emits the same row convention as [[readGeoJson]]:
    * `geometry_type` + `geometry_json`, so downstream geo predicates are
    * format-agnostic. Supported shapes: Null(0), Point(1), PolyLine(3),
    * Polygon(5), MultiPoint(8) — the types the reference's location
    * hierarchies use.
    *
    * Scale shape: `binaryFile` scan; one file = one task. Shapefiles are
    * dimension-scale inputs (location/tract boundaries) — parallelism
    * across files is the right unit, and the parsed output is the thing
    * that joins (broadcast) against fact data.
    */
  def readShapefile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.shp")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => parseShp(path, bytes) }
      .toDF()
  }

  final case class ShpRecord(
      path: String, record: Int, geometry_type: String, geometry_json: String)

  /** One .shp file → records. Header: 100 bytes, file code 9994 (BE),
    * file length in 16-bit words (BE @24). Records: number+content-length
    * (BE) then little-endian shape data.
    */
  private[sources] def parseShp(path: String, bytes: Array[Byte]): Seq[ShpRecord] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val buf = ByteBuffer.wrap(bytes)
    require(buf.order(ByteOrder.BIG_ENDIAN).getInt(0) == 9994,
      s"$path: not a shapefile (bad file code)")
    val fileLenBytes = buf.getInt(24).toLong * 2
    def num(d: Double): String =
      if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15 && d == d.toLong.toDouble)
        d.toLong.toString
      else d.toString
    def pointAt(off: Int): String = {
      val le = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
      s"[${num(le.getDouble(off))},${num(le.getDouble(off + 8))}]"
    }
    val out = Seq.newBuilder[ShpRecord]
    var pos = 100
    while (pos + 8 <= math.min(fileLenBytes, bytes.length)) {
      val recNum = buf.order(ByteOrder.BIG_ENDIAN).getInt(pos)
      val contentBytes = buf.getInt(pos + 4) * 2
      val c = pos + 8 // content start
      val le = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
      val shapeType = le.getInt(c)
      // parts+points block shared by PolyLine(3)/Polygon(5):
      // box(32) numParts(4) numPoints(4) parts[] points[]
      def parts(): Seq[String] = {
        val nParts = le.getInt(c + 36)
        val nPoints = le.getInt(c + 40)
        val partsOff = c + 44
        val pointsOff = partsOff + 4 * nParts
        val starts = (0 until nParts).map(i => le.getInt(partsOff + 4 * i))
        val ends = starts.drop(1) :+ nPoints
        starts.zip(ends).map { case (s, e) =>
          (s until e).map(i => pointAt(pointsOff + 16 * i)).mkString("[", ",", "]")
        }
      }
      val (gtype, coords) = shapeType match {
        case 0 => (null, null)
        case 1 => ("Point", pointAt(c + 4))
        case 3 =>
          val ps = parts()
          if (ps.length == 1) ("LineString", ps.head)
          else ("MultiLineString", ps.mkString("[", ",", "]"))
        case 5 => ("Polygon", parts().mkString("[", ",", "]"))
        case 8 =>
          val n = le.getInt(c + 36)
          ("MultiPoint",
            (0 until n).map(i => pointAt(c + 40 + 16 * i)).mkString("[", ",", "]"))
        case t => throw new IllegalArgumentException(
          s"$path record $recNum: unsupported shape type $t")
      }
      out += ShpRecord(path, recNum, gtype,
        if (gtype == null) null
        else s"""{"type":"$gtype","coordinates":$coords}""")
      pos = c + contentBytes
    }
    out.result()
  }

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
