package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data selection.
  *
  * `df.sample` is nondeterministic under re-partitioning and retries; a
  * hash-gate on a stable key is the standard large-scale alternative:
  * pure per-row filter (no shuffle, no sampling pass, codegen-friendly),
  * reproducible across engines and runs, stable under AQE re-plans, and
  * composable (train/validation splits from disjoint hash ranges never
  * leak rows across the split even when run months apart).
  */
object Sampling {

  /** Uniform 60-bit hash of (key, salt) — first 15 hex chars of md5,
    * always non-negative.
    */
  def keyHash60(key: Column, salt: String): Column =
    conv(substring(md5(concat_ws("|", key.cast("string"), lit(salt))), 1, 15),
      16, 10).cast("long")

  private val Two60 = 1152921504606846976.0 // 2^60

  /** Keep rows whose key-hash falls below rate·2^60. The salt selects an
    * independent sample; disjoint [lo, hi) bands of the same salt give
    * leak-free splits.
    */
  def hashSample(
      df: DataFrame, keyCol: String, rate: Double,
      salt: String = "graft"): DataFrame =
    df.filter(keyHash60(col(keyCol), salt) < lit((rate * Two60).toLong))

  /** Per-stratum sampling rates (e.g. per-language caps for a balanced
    * training mix): `rates` is a tiny (stratum, rate) table, broadcast;
    * rows whose stratum has no rate are dropped. floor() keeps the
    * threshold arithmetic identical across engines (double→int casts
    * round differently between engines; floor does not).
    */
  def stratifiedHashSample(
      df: DataFrame, keyCol: String, stratumCol: String,
      rates: DataFrame, // stratumCol, rate
      salt: String = "graft"): DataFrame =
    df.join(broadcast(rates), Seq(stratumCol))
      .filter(keyHash60(col(keyCol), salt) <
        floor(col("rate") * lit(Two60)).cast("long"))
      .drop("rate")
}
