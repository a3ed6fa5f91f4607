package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass table profiling — the stats a pipeline operator consults
  * before pointing a 100 TB job at an unfamiliar table: per-column
  * non-null/null counts, distinct cardinality, min and max.
  *
  * Shape: ONE scan and ONE aggregate produce every column's stats
  * simultaneously (a naive profiler runs one job per column — C full
  * scans); the single stats row then unpivots driver-free via `stack`.
  * The exact `count(DISTINCT ...)` per column makes Catalyst expand each
  * row once per distinct aggregate — still one scan, and the form the
  * DuckDB oracle can mirror; at corpus scale swap
  * `approx_count_distinct`, which drops the expand entirely — the
  * surrounding shape is unchanged.
  */
object Profile {

  /** One row per profiled column:
    * (col_name, n_nonnull, n_nulls, n_distinct, min_s, max_s) — min/max
    * rendered as strings so heterogeneous column types fit one frame.
    */
  def summarize(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs: Seq[Column] = count(lit(1)).as("__total") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__${c}__n"),
        count_distinct(col(c)).as(s"__${c}__d"),
        min(col(c)).cast("string").as(s"__${c}__min"),
        max(col(c)).cast("string").as(s"__${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', __${c}__n, `__total` - __${c}__n, __${c}__d, __${c}__min, __${c}__max"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_nonnull, n_nulls, n_distinct, min_s, max_s)")
  }
}
