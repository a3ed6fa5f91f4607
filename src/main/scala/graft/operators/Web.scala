package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + canonical-URL dedup — the first dedup pass of
  * a web-crawl training corpus (CommonCrawl-style pipelines): the same
  * page arrives under dozens of surface forms (scheme/host case,
  * default ports, trailing slashes, tracking parameters, fragments) and
  * canonicalizing BEFORE content dedup collapses them with a string
  * expression instead of a MinHash pass. Everything here is pure
  * codegen-able column work — no UDF, no shuffle until the final
  * per-canonical-URL aggregation, which is an ordinary hash groupBy
  * that partial-aggregates map-side.
  *
  * Canonical form: lowercase scheme and host, default port stripped
  * (:443 for https, :80 for http), path with trailing slashes removed
  * (empty path becomes "/"), fragment dropped, query parameters with
  * tracking keys (utm_*) removed and the survivors sorted, so parameter
  * order never splits a group.
  */
object Web {

  /** Canonical form of a URL column. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val base = split_part(noFrag, lit("?"), lit(1))
    val query = split_part(noFrag, lit("?"), lit(2))
    val scheme = lower(split_part(base, lit("://"), lit(1)))
    val hostRaw = lower(split_part(split_part(base, lit("://"), lit(2)),
      lit("/"), lit(1)))
    val host = when(scheme === "https",
        regexp_replace(hostRaw, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostRaw, ":80$", ""))
      .otherwise(hostRaw)
    val pathRaw = regexp_replace(
      regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)?$", 1),
      "/+$", "")
    val path = when(pathRaw === "", lit("/")).otherwise(pathRaw)
    val q = array_join(array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.startsWith("utm_"))), "&")
    concat(scheme, lit("://"), host, path,
      when(q =!= "", concat(lit("?"), q)).otherwise(lit("")))
  }

  /** Group rows by canonical URL: canonical_url, n_rows (total raw
    * rows collapsed), n_raw_forms (distinct surface forms). */
  def canonicalDedup(df: DataFrame, urlCol: String): DataFrame =
    df.select(col(urlCol).as("_url"),
        canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("_url")).as("n_raw_forms"))
}
