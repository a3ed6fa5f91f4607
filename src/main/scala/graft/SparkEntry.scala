package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators._
import graft.shipping.Views

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] demonstrates one operator of SURVEY.md §2 on
  * the driver's synthetic star schema (TESTDATA.md); [[oracleSql]] holds
  * the DuckDB-equivalent SQL for the hash-compare correctness gate.
  *
  * Determinism rules applied throughout (the driver hash-compares values):
  *   - money sums go through decimal(18,2) so neither Spark partial-agg
  *     order nor DuckDB's accumulation order can change the result;
  *   - timestamps are emitted as epoch seconds (long) — the source data is
  *     nanosecond-precision, which Spark truncates to micros and engines
  *     render differently;
  *   - every query ends in a total orderBy so output files are stable.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q1Agg(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- helpers

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Exact decimal sum of a 2-decimal money column, surfaced as double. */
  private def moneySum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Timestamp (ns in the source parquet) → epoch seconds as long. */
  private def epochS(c: Column): Column =
    unix_timestamp(c.cast("timestamp"))

  // ---------------------------------------------------------------- queries

  /** A1/A4 — grouped aggregation with exact decimal money sums. */
  private def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum($("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        moneySum($("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  private def $(n: String): Column = col(n)

  /** J1/J3 — star join region ⋈ nation ⋈ customer, dims broadcast. */
  private def q2StarJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), $("c_nationkey") === $("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), $("n_regionkey") === $("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_cust"), moneySum($("c_acctbal")).as("sum_bal"))
      .orderBy("r_name")

  /** J2 — left outer join + grouped count (count ignores nulls, like SQL). */
  private def q3LeftJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), $("c_custkey") === $("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count($("o_orderkey")).as("n_orders"),
        coalesce(moneySum($("o_totalprice")), lit(0.0)).as("sum_spent"))
      .orderBy("c_custkey")

  /** J11 — anti join: customers with no large order. */
  private def q4AntiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter($("o_totalprice") > 250000),
        $("c_custkey") === $("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** J11 — semi join: customers with at least one order. */
  private def q5SemiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), $("c_custkey") === $("o_custkey"), "left_semi")
      .select("c_custkey")
      .orderBy("c_custkey")

  /** A6/W1 — DISTINCT ON: first event per user by (ts, event_id). */
  private def q6DistinctOn(s: SparkSession, dir: String): DataFrame =
    DistinctOn(
      Tables.events(s, dir).withColumn("ts_s", epochS($("ts"))),
      partitionBy = Seq("user_id"),
      orderBy = Seq($("ts_s").asc, $("event_id").asc))
      .select("user_id", "event_id", "ts_s", "event_type")
      .orderBy("user_id")

  /** W1/O2 — top-3 orders per customer by price (window + filter). */
  private def q7TopN(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy($("o_totalprice").desc, $("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rank", row_number().over(w))
      .filter($("rank") <= 3)
      .select("o_custkey", "rank", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rank")
  }

  /** J4 — range-containment join against a tiny broadcast bin table. */
  private def q8RangeBin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bins = Seq(
      (0, Option(50000), "small"),
      (50000, Option(150000), "medium"),
      (150000, Option.empty[Int], "large"))
      .toDF("lo", "hi", "bin")
    RangeBinJoin(t(s, dir, "orders"), "o_totalprice", bins)
      .groupBy("bin")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("bin")
  }

  /** C7 — ISO week bucketing of event timestamps. */
  private def q9IsoWeek(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("week", graft.functions.isoWeek($("ts").cast("timestamp")))
      .groupBy("week")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("week")

  /** F9/C12 — JSON field projection from a raw document column. */
  private def q10Json(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object($("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(sum($("k")).as("sum_k"), count(lit(1)).as("cnt"))
      .orderBy("event_type")

  /** F5/F3 — expression-string row filter (predicate pushdown to scan). */
  private def q11Filter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter("l_quantity > 45 and l_returnflag = 'R'")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  /** Dedup (exact) — hash-groupBy survivor per distinct text. */
  private def q12DedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  /** F7 — duplicate drop: remove ALL rows sharing a duplicated text. */
  private def q13DupDrop(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    t(s, dir, "documents")
      .withColumn("_n", count(lit(1)).over(Window.partitionBy("text")))
      .filter($("_n") === 1)
      .select("doc_id")
      .orderBy("doc_id")
  }

  /** Text analysis — token counting. */
  private def q14Tokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select($("doc_id"), TextAnalysis.tokenCount($("text")).as("n_tokens"))
      .orderBy("doc_id")

  /** Text analysis — language ID by marker-stopword argmax. */
  private def q15LangId(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select($("doc_id"), TextAnalysis.langId($("text")).as("lang_pred"))
      .orderBy("doc_id")

  /** C14 — de-identification: salted sha-256 of an identifier. */
  private def q16Deidentify(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select($("c_custkey"),
        graft.functions.deidentify($("c_name"), "s3cret").as("deid"))
      .orderBy("c_custkey")

  /** A3 — collect-to-array per group (emitted as a sorted joined string). */
  private def q17CollectSet(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(array_join(array_sort(collect_set($("event_type"))), ",").as("types"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")

  /** E1 — set op: all users EXCEPT users with a high-value error event. */
  private def q18Except(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    ev.select("user_id").distinct()
      .except(ev.filter($("event_type") === "error" && $("value") > 195)
        .select("user_id").distinct())
      .orderBy("user_id")
  }

  // ------------------------------------------------------------ the surface

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q2_star_join" -> (q2StarJoin _),
    "q3_left_join" -> (q3LeftJoin _),
    "q4_anti_join" -> (q4AntiJoin _),
    "q5_semi_join" -> (q5SemiJoin _),
    "q6_distinct_on" -> (q6DistinctOn _),
    "q7_topn" -> (q7TopN _),
    "q8_range_bin" -> (q8RangeBin _),
    "q9_iso_week" -> (q9IsoWeek _),
    "q10_json" -> (q10Json _),
    "q11_filter" -> (q11Filter _),
    "q12_dedup_exact" -> (q12DedupExact _),
    "q13_dup_drop" -> (q13DupDrop _),
    "q14_tokens" -> (q14Tokens _),
    "q15_lang_id" -> (q15LangId _),
    "q16_deidentify" -> (q16Deidentify _),
    "q17_collect" -> (q17CollectSet _),
    "q18_except" -> (q18Except _),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q2_star_join" ->
      """SELECT r_name, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q3_left_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS sum_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q4_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
        |ORDER BY c_custkey""".stripMargin,
    "q5_semi_join" ->
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q6_distinct_on" ->
      """SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_type
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q7_topn" ->
      """SELECT o_custkey, rank, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
        |        PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |      FROM orders)
        |WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin,
    "q8_range_bin" ->
      """SELECT bin, count(*) AS n_orders
        |FROM orders
        |LEFT JOIN (VALUES (0, 50000, 'small'), (50000, 150000, 'medium'),
        |                  (150000, NULL, 'large')) bins(lo, hi, bin)
        |  ON o_totalprice >= lo AND (hi IS NULL OR o_totalprice < hi)
        |GROUP BY bin ORDER BY bin""".stripMargin,
    "q9_iso_week" ->
      """SELECT concat(CAST(isoyear(ts) AS VARCHAR), '-W',
        |              lpad(CAST(weekofyear(ts) AS VARCHAR), 2, '0')) AS week,
        |  count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q10_json" ->
      """SELECT event_type,
        |  sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
        |  count(*) AS cnt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q11_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q12_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        |ORDER BY doc_id""".stripMargin,
    "q13_dup_drop" ->
      """SELECT doc_id FROM documents
        |QUALIFY count(*) OVER (PARTITION BY text) = 1
        |ORDER BY doc_id""".stripMargin,
    "q14_tokens" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q15_lang_id" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> x IN ('der','die','das','und','ist','nicht','ein'))) AS de,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> x IN ('the','a','of','and','to','is','in'))) AS en,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> x IN ('el','la','de','que','y','los','una'))) AS es,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> x IN ('le','la','les','et','des','une','est'))) AS fr,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> x IN ('的','是','了','在','我','有','和'))) AS zh
        |  FROM documents)
        |SELECT doc_id, CASE
        |  WHEN de >= en AND de >= es AND de >= fr AND de >= zh THEN 'de'
        |  WHEN en >= es AND en >= fr AND en >= zh THEN 'en'
        |  WHEN es >= fr AND es >= zh THEN 'es'
        |  WHEN fr >= zh THEN 'fr'
        |  ELSE 'zh' END AS lang_pred
        |FROM h ORDER BY doc_id""".stripMargin,
    "q16_deidentify" ->
      """SELECT c_custkey, sha256(c_name || 's3cret') AS deid
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q17_collect" ->
      """SELECT user_id,
        |  array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types,
        |  count(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q18_except" ->
      """SELECT DISTINCT user_id FROM events
        |EXCEPT
        |SELECT DISTINCT user_id FROM events
        |WHERE event_type = 'error' AND value > 195
        |ORDER BY user_id""".stripMargin,
  )
}
