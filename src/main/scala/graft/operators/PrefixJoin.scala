package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Longest-prefix-match lookup join — the router/CIDR/URL-path rule
  * lookup: each key row is matched to the LONGEST rule whose prefix
  * string starts the key (CIDR tables, URL-path routing, taxonomy
  * rollup by path). Distinct from the engine's other non-equi joins
  * (as-of = latest-by-time, interval = range overlap): LPM is a
  * hierarchy lookup where specificity wins.
  */
object PrefixJoin {

  /** LPM as a chain of BROADCAST equi-joins, longest prefix length
    * first, each level filling only rows still unmatched — ZERO
    * shuffles at any key-side scale. The trick: for a fixed prefix
    * length l, "rule is a prefix of key" IS an equi-join on
    * substring(key, 1, l), so LPM decomposes into one broadcast
    * equi-join per DISTINCT rule length, and precedence is a coalesce
    * chain. Rule tables are dimension-sized by nature (a routing table
    * fits an executor many times over) and their distinct length set
    * is structurally bounded (CIDR ≤ 32; path rules ≤ depth·digits),
    * so the one driver round-trip collecting the length set is the
    * same class of planning step as the broadcast itself.
    *
    * `rules` must have unique prefixes; payload columns ride along.
    * Unmatched keys keep null rule columns (left semantics).
    *
    * Output: keys columns + match_prefix + the rule payload columns.
    */
  def longestPrefixJoin(
      keys: DataFrame, keyCol: String,
      rules: DataFrame, prefixCol: String): DataFrame = {
    val payload = rules.schema.fields.filter(_.name != prefixCol)
    require(!payload.map(_.name).contains(keyCol),
      "rule payload must not shadow the key column")
    // distinct rule lengths, longest first — dim-sized driver round-trip
    val lengths = rules
      .select(length(col(prefixCol)).cast("int").as("l"))
      .distinct().collect().map(_.getInt(0)).sortBy(-_).toSeq
    val init = payload.foldLeft(
      keys.withColumn("match_prefix", lit(null).cast("string"))) {
      (d, f) => d.withColumn(f.name, lit(null).cast(f.dataType))
    }
    lengths.foldLeft(init) { (acc, l) =>
      val level = broadcast(
        rules.filter(length(col(prefixCol)) === l)
          .select((col(prefixCol).as("_p") +:
            payload.map(f => col(f.name).as("_" + f.name)).toSeq): _*))
      val joined = acc.join(level,
        substring(col(keyCol), 1, l) === col("_p") &&
          col("match_prefix").isNull, // already matched by a longer rule
        "left")
      val filled = payload.foldLeft(
        joined.withColumn("match_prefix",
          coalesce(col("match_prefix"), col("_p")))) { (d, f) =>
        d.withColumn(f.name, coalesce(col(f.name), col("_" + f.name)))
      }
      filled.drop(("_p" +: payload.map("_" + _.name).toSeq): _*)
    }
  }
}
