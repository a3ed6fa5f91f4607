package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A6/W1 — Postgres `DISTINCT ON` ≡ first row per group (reference
  * warehouse/primary-encounter-location.sql:7-14; DET dedup
  * etl/redcap_det.py:137-175).
  *
  * One shuffle on the partition key; ties must be broken by the caller's
  * orderBy for deterministic output (the reference orders by priority
  * nulls last, then implicitly by physical order — we require an explicit
  * total order).
  */
object DistinctOn {
  def apply(df: DataFrame, partitionBy: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
