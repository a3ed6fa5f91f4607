package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract validation — the dbt-tests / Great-Expectations check
  * runner as a relational operator: a declarative rule table goes in,
  * one violations report per rule comes out. The reference enforces its
  * contracts as Postgres constraints and ETL-time `assert`s
  * (`lib/id3c/db/datatypes.py`, CHECK constraints in the schema SQL); at
  * corpus scale the same checks run as ONE aggregation pass over the
  * fact table — no per-rule scans, no driver-side row loops.
  *
  * Checks: `not_null`, `min` / `max` (numeric bound, inclusive-valid),
  * `enum` (param = `|`-separated allowed values), `regex` (param must
  * fully match — anchored RLIKE), `unique` (param ignored).
  *
  * Shape: every row-level rule becomes a conditional-sum column of one
  * shared aggregate (a single scan evaluates ALL rules map-side);
  * `unique` rules need distinct counts, which ride the SAME scan as
  * count_distinct columns of that aggregate (Spark plans the expand —
  * still one source scan, no joins). Null values violate only
  * `not_null` (a null bound/enum/regex input is absence, not a
  * violation — the usual contract-runner convention).
  *
  * Output: (column, check, param, n_rows, n_violations, pass) — one row
  * per rule, deterministic.
  */
object Contracts {

  final case class Rule(column: String, check: String, param: String)

  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val allowed = Set("not_null", "min", "max", "enum", "regex", "unique")
    rules.foreach(r => require(allowed(r.check), s"unknown check ${r.check}"))
    val spark = df.sparkSession
    import spark.implicits._

    def violation(r: Rule): Column = {
      val c = col(r.column)
      r.check match {
        case "not_null" => c.isNull
        case "min" => c.isNotNull && c.cast("double") < r.param.toDouble
        case "max" => c.isNotNull && c.cast("double") > r.param.toDouble
        case "enum" =>
          c.isNotNull && !c.cast("string")
            .isin(r.param.split('|').toSeq: _*)
        case "regex" =>
          c.isNotNull && !c.cast("string").rlike("^(?:" + r.param + ")$")
        case "unique" => lit(false) // counted from the distinct column
      }
    }

    val aggs =
      count(lit(1)).as("_n") +:
        rules.zipWithIndex.map { case (r, i) =>
          if (r.check == "unique")
            // duplicate NON-NULL values (nulls are not duplicates of
            // each other — the dbt `unique` convention)
            (count(col(r.column)) - count_distinct(col(r.column)))
              .as(s"_v$i")
          else
            sum(when(violation(r), 1L).otherwise(0L)).as(s"_v$i")
        }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getLong(0)
    val report = rules.zipWithIndex.map { case (r, i) =>
      // sum(...) over zero rows is null: an empty table has 0 violations
      val v = if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1)
      (r.column, r.check, r.param, n, v, v == 0L)
    }
    report.toDF("column", "check", "param", "n_rows", "n_violations",
      "pass")
  }
}
