package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage, Fellegi–Sunter style: candidate pairs
  * come from a BLOCKING equi-join (never a cross join), and each pair
  * is scored by summing per-field agreement/disagreement weights — the
  * caller supplies the weights as scaled integer log-odds (in practice
  * estimated offline by EM over a labeled sample; the cluster-scale
  * part is this inference pass, which must stay a shuffle equi-join +
  * codegen'd CASE arithmetic). Complements [[FuzzyJoin]] (string edit
  * distance on ONE field) with the multi-field weighted-evidence form
  * used for entity resolution across sources (the reference links
  * samples to encounters by barcode equality only —
  * `lib/id3c/db/datatypes.py` barcode identity; this generalizes to
  * noisy multi-evidence linkage a training-data pipeline needs for
  * author/entity reconciliation across crawled sources).
  *
  * Scale notes: the blocking key's cardinality must grow with the data
  * (a fixed-cardinality key makes per-block pairs quadratic — the same
  * lesson as fixed IVF cell counts, memory: sqrt-cells). With a
  * high-cardinality key the join output is answer-sized and the score
  * is one projection; nothing here is wider than the pair stream.
  * Integer weights keep the score engine-exact (no float log-odds).
  */
object Linkage {

  /** One scoring field: null-safe equality of `matchOn` earns
    * `agree` points, anything else costs `disagree` (both sides of the
    * Fellegi–Sunter log-odds, pre-scaled to integers by the caller). */
  final case class FieldWeight(matchOn: Column, agree: Long, disagree: Long)

  /** Blocked linkage of `a` × `b` on equality of their `_block`
    * columns; both inputs must already carry `_block` plus the columns
    * `fields` reference (disambiguate sides upstream via aliases).
    * Output: all columns of both inputs (minus `_block`) + n_agree +
    * score. Pairs are NOT thresholded here — callers filter on score so
    * the match/possible/non-match bands stay a downstream decision.
    */
  def blockedScores(
      a: DataFrame, b: DataFrame,
      fields: Seq[FieldWeight]): DataFrame = {
    require(fields.nonEmpty, "need at least one scoring field")
    val paired = a.join(b, Seq("_block")).drop("_block")
    val agree = fields.map(f =>
      when(f.matchOn, lit(1L)).otherwise(lit(0L))).reduce(_ + _)
    val score = fields.map(f =>
      when(f.matchOn, lit(f.agree)).otherwise(lit(-f.disagree)))
      .reduce(_ + _)
    paired
      .withColumn("n_agree", agree)
      .withColumn("score", score)
  }
}
