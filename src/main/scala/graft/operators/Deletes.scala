package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M10 — warehouse deletes (reference lib/id3c/db/__init__.py:329-403 and
  * the redcap-sync delete routine, cli/command/redcap_sync.py:44-260).
  *
  * The reference deletes row-at-a-time with `id = ANY(list)` and
  * `identifier LIKE ANY(patterns)`; here a delete is a filter producing
  * the next snapshot (copy-on-write), so each verb returns (kept,
  * deleted) and the caller persists `kept` via snapshotSwap — the same
  * transactional shape as [[Receiving.snapshotSwap]].
  */
object Deletes {

  /** `DELETE WHERE idCol = ANY(ids)` (db/__init__.py:329-403): anti-join
    * for kept, semi-join for deleted — both shuffle on the id only, and
    * AQE broadcasts a small id list.
    */
  def byIds(table: DataFrame, idCol: String, ids: DataFrame): (DataFrame, DataFrame) = {
    // explicit condition (not usingColumns) so the left table's column
    // order is preserved in the output
    val idFrame = ids.toDF("_del_id")
    (table.join(idFrame, col(idCol) === col("_del_id"), "left_anti"),
      table.join(idFrame, col(idCol) === col("_del_id"), "left_semi"))
  }

  /** SQL LIKE pattern → Java regex: `%` → `.*`, `_` → `.`, everything
    * else literal.
    */
  def likeToRegex(pattern: String): String =
    pattern.flatMap {
      case '%' => ".*"
      case '_' => "."
      case c if "\\.[]{}()*+-?^$|".contains(c) => "\\" + c
      case c => c.toString
    }

  /** `DELETE WHERE col LIKE ANY(patterns)` (redcap_sync.py:157-174:
    * `encounter.identifier LIKE ANY(%s)` with
    * `<base_url><project>/<record>/%` patterns). The pattern list is
    * compiled into ONE anchored alternation regex evaluated by codegen'd
    * RLIKE — a per-row scan predicate, not a join, so it costs one pass
    * over the table regardless of pattern count.
    */
  def byLikePatterns(
      table: DataFrame, colName: String,
      patterns: Seq[String]): (DataFrame, DataFrame) = {
    if (patterns.isEmpty) return (table, table.limit(0))
    val regex = "^(?:" + patterns.map(likeToRegex).mkString("|") + ")$"
    val hit = col(colName).rlike(regex)
    (table.filter(!hit || col(colName).isNull), table.filter(hit))
  }

  /** The redcap-sync delete cascade (redcap_sync.py:157-260): encounters
    * matching the deleted-record patterns are removed together with their
    * encounter_locations, samples and presence_absence rows; individuals
    * are removed only when no OTHER encounter still references them (the
    * routine's "so long as they are linked to other encounters" rule).
    *
    * Returns next snapshots keyed by table name.
    */
  def redcapSyncDelete(
      encounters: DataFrame, // encounter_id, individual_id, identifier
      encounterLocations: DataFrame, // encounter_id, ...
      samples: DataFrame, // sample_id, encounter_id, ...
      presenceAbsence: DataFrame, // presence_absence_id, sample_id, ...
      individuals: DataFrame, // individual_id, ...
      patterns: Seq[String]): Map[String, DataFrame] = {
    val (keptEnc, deletedEnc) = byLikePatterns(encounters, "identifier", patterns)
    val deletedEncIds = deletedEnc.select("encounter_id")
    val (keptEncLoc, _) = byIds(encounterLocations, "encounter_id", deletedEncIds)
    val (keptSamples, deletedSamples) = byIds(samples, "encounter_id", deletedEncIds)
    val (keptPa, _) = byIds(presenceAbsence, "sample_id",
      deletedSamples.select("sample_id"))
    // individuals: drop only those whose every encounter was deleted
    val stillReferenced = keptEnc.select("individual_id").distinct()
    val orphaned = deletedEnc.select("individual_id").distinct()
      .join(stillReferenced, Seq("individual_id"), "left_anti")
    val (keptIndividuals, _) = byIds(individuals, "individual_id", orphaned)
    Map(
      "encounter" -> keptEnc,
      "encounter_location" -> keptEncLoc,
      "sample" -> keptSamples,
      "presence_absence" -> keptPa,
      "individual" -> keptIndividuals)
  }
}
