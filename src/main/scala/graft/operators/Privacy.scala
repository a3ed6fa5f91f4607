package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-release auditing for training corpora and shared extracts —
  * the checks run BEFORE a de-identified dataset (cf. the salted-hash
  * de-identification of [[graft.functions]], reference
  * `lib/id3c/api/utils.py` deident patterns) leaves the warehouse:
  *
  *  - k-anonymity: every quasi-identifier combination (ZIP-ish coarse
  *    location, demographic bucket, ...) must describe at least k rows,
  *    or the combination re-identifies individuals by intersection.
  *  - l-diversity: within each quasi-identifier group, the sensitive
  *    attribute must take at least l distinct values, or group
  *    membership alone leaks the sensitive value even at high k.
  *
  * Both are single map-side-combining aggregations over the
  * quasi-identifier key — the 100 TB shape is the plain hash groupBy.
  */
object Privacy {

  /** Quasi-identifier groups violating k-anonymity (group size < k).
    * Output: the quasi columns + n_rows, one row per violating group. */
  def kAnonymityViolations(
      df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2, "need quasi columns and k >= 2")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") < k)
  }

  /** Per quasi-identifier group: size and sensitive-value diversity,
    * with both audit verdicts. Output: quasi cols + n_rows +
    * n_sensitive + k_ok + l_ok. */
  def anonymityAudit(
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2 && l >= 2,
      "need quasi columns, k >= 2, l >= 2")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("k_ok", col("n_rows") >= k)
      .withColumn("l_ok", col("n_sensitive") >= l)
  }
}
