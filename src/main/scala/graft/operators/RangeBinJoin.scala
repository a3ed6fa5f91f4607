package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J4 — range-containment join (reference `left join age_bin on range @>
  * age`, shipping views@2020-01-14b.sql:57-58,175-176,277-278).
  *
  * Bin tables are tiny (≤22 rows in the reference), so the right plan at
  * any scale is a broadcast nested-loop join with the containment
  * predicate: zero shuffle of the fact side. Half-open [lo, hi) after
  * normalizing the reference's closed int ranges (SURVEY §1.4); a null hi
  * means unbounded.
  */
object RangeBinJoin {

  def contains(value: Column, lo: Column, hi: Column): Column =
    value >= lo && (hi.isNull || value < hi)

  /** fact LEFT JOIN broadcast(bins) ON bins.lo <= fact.value < bins.hi. */
  def apply(
      fact: DataFrame,
      valueCol: String,
      bins: DataFrame,
      loCol: String = "lo",
      hiCol: String = "hi",
      joinType: String = "left"): DataFrame =
    fact.join(broadcast(bins),
      contains(fact(valueCol), bins(loCol), bins(hiCol)), joinType)
}
