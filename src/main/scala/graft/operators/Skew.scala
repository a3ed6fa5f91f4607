package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns for hot keys at corpus scale.
  *
  * What does NOT need these: plain count/sum/min/max group-bys (partial
  * aggregation already collapses a hot key map-side) and sort-merge joins
  * under AQE (skewed partitions are split at runtime). What does:
  *
  *   - exact count-distinct per key — the naive plan shuffles every row
  *     of the hot key to one reducer with no map-side reduction;
  *   - collect_list-style holistic aggregates — same, the buffer IS the
  *     data;
  *   - broadcast-ineligible joins where ONE key dominates — AQE splits
  *     skewed sort-merge partitions, but a single key still lands in one
  *     task's stream side; salting spreads it.
  */
object Skew {

  /** Exact distinct count per key without a skewed exchange: shuffle on
    * the (key, value) PAIR — high cardinality, uniformly distributed even
    * when `key` is hot — then a cheap count per key (partial-agg
    * friendly). Two well-spread shuffles replace one pathological one.
    */
  def countDistinctByKey(
      df: DataFrame, keys: Seq[String], valueCol: String,
      alias: String = "n_distinct"): DataFrame =
    df.select((keys :+ valueCol).map(col): _*)
      .distinct()
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(alias))

  /** Salted inner equi-join for a fact side with one (or few) dominant
    * join keys against a dim that is too large to broadcast: every dim
    * row is replicated `salts` times, each fact row picks ONE salt
    * deterministically, and the join key becomes (key, salt) — the hot
    * key's rows spread over `salts` tasks instead of one. Cost: the dim
    * side shuffles `salts`× its size; use only when a profile shows a
    * dominant key (AQE's runtime skew-split handles the long tail).
    *
    * The salt is derived from xxhash64 of the salt-by columns (pick a
    * high-cardinality fact column, e.g. its row id) — deterministic, so
    * retries and re-runs produce identical plans and results.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String, saltBy: String,
      salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(col(saltBy)), lit(salts)))
    val saltedDim = dim
      .withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
