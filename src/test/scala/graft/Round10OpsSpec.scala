package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Round-10 specs: the optimization round's kernel-equivalence pins —
  * each rewritten hot path is asserted byte-equal to the Column
  * formulation it replaced, on the edge shapes that differ between
  * naive implementations.
  */
class Round10OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** The r9 HOF formulation of the canonical query suffix, verbatim
    * (the interpreted chain [[graft.functions.canonicalQuery]]
    * replaced).
    */
  private def hofSuffix(q: org.apache.spark.sql.Column) =
    Dedup.bind(
      array_join(array_sort(filter(split(q, "&", -1),
        p => p =!= "" && !p.startsWith("utm_"))), "&"),
      j => when(j =!= "", concat(lit("?"), j)).otherwise(lit("")))

  test("canonicalQuery kernel == HOF chain on every edge shape") {
    import spark.implicits._
    val cases = Seq(
      "",                       // empty query -> ""
      "a=1",                    // single param
      "b=2&a=1",                // unsorted -> sorted
      "utm_source=x",           // all params stripped -> ""
      "utm_source=x&utm_medium=y",
      "a=1&utm_source=x&b=2",   // strip interleaved
      "&&a=1&&",                // doubled/lead/trail separators
      "&",                      // only separators -> ""
      "a=1&a=1",                // duplicates kept, adjacent after sort
      "A=1&a=2",                // case-sensitive byte order: 'A' < 'a'
      "k",                      // bare key, no '='
      "k=",                     // empty value
      "=v",                     // empty key
      "utm=1",                  // "utm" without underscore survives
      "utm_",                   // bare tracking prefix stripped
      "xutm_source=1",          // prefix must anchor at start
      "名前=値&a=1",            // multi-byte UTF-8 sorts after ASCII
      "a=%E2%82%AC&b=2",        // percent-encoded bytes pass through
      "z=26%26&y=1&x=2"         // encoded '&' inside a value
    )
    val df = cases.toDF("q")
    val out = df.select(
        graft.functions.canonicalQuery(col("q")).as("kernel"),
        hofSuffix(col("q")).as("hof"))
      .collect()
    out.zip(cases).foreach { case (r, c) =>
      assert(r.getString(0) == r.getString(1),
        s"mismatch for query '$c': kernel=${r.getString(0)} hof=${r.getString(1)}")
    }
  }

  test("canonicalQuery: null propagates (concat-compatible)") {
    import spark.implicits._
    val df = Seq[Option[String]](None, Some("a=1")).toDF("q")
    val rows = df.select(graft.functions.canonicalQuery(col("q")))
      .collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getString(0) == "?a=1")
  }

  test("canonicalizeUrl end-to-end: unchanged on the q152 surface forms") {
    import spark.implicits._
    val urls = Seq(
      "HTTPS://WWW.Shop3.Example.COM:443/Catalog/Item/42/?utm_source=feed&b=2&a=1#Sec2",
      "http://Host.Example.com:80/Path?b=2&a=1",
      "https://h.example.com/",
      "https://h.example.com",
      "https://h.example.com:8443/x?utm_source=f",
      "http://h/x//?a=1&b=2")
    val out = Web.canonicalDedup(urls.toDF("url"), "url")
      .orderBy("canonical_url").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("http://h/x?a=1&b=2", 1L, 1L),
      ("http://host.example.com/Path?a=1&b=2", 1L, 1L),
      ("https://h.example.com/", 2L, 2L),
      ("https://h.example.com:8443/x", 1L, 1L),
      ("https://www.shop3.example.com/Catalog/Item/42?a=1&b=2", 1L, 1L)))
  }
}
