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

  /** Canonical form of a URL column. Split/trim string ops only — no
    * regex on the hot path (Java regex costs ~5x plain splits per row,
    * measured on the q152 bench).
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = split_part(url, lit("#"), lit(1))
    val base = split_part(noFrag, lit("?"), lit(1))
    val query = split_part(noFrag, lit("?"), lit(2))
    val scheme = lower(split_part(base, lit("://"), lit(1)))
    val rest = split_part(base, lit("://"), lit(2))
    val hostSeg = split_part(rest, lit("/"), lit(1))
    val hostLower = lower(hostSeg)
    val host = when(scheme === "https" && hostLower.endsWith(":443"),
        hostLower.substr(lit(1), length(hostLower) - 4))
      .when(scheme === "http" && hostLower.endsWith(":80"),
        hostLower.substr(lit(1), length(hostLower) - 3))
      .otherwise(hostLower)
    val pathRaw = rtrim(rest.substr(length(hostSeg) + 1, length(rest)), "/")
    val path = when(pathRaw === "", lit("/")).otherwise(pathRaw)
    // the query-param chain (split -> filter -> sort -> join) has no
    // codegen (array HOF lambdas are interpreted per row); r8 bound it
    // once (evaluating it twice was 4x worse), r10 replaces the bound
    // chain with the native kernel — one byte pass + small sort per
    // row, byte-equivalent by Round10OpsSpec
    concat(scheme, lit("://"), host, path,
      graft.functions.canonicalQuery(query))
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
