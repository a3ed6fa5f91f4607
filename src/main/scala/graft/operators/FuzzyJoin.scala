package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity join (record linkage / entity dedup) via
  * SymSpell deletion-variant blocking: if lev(a, b) <= k then a and b
  * share at least one string reachable by deleting <= k characters from
  * each (delete the substituted/inserted positions from both sides), so
  * an equi-join on the deletion-variant postings is a recall-complete
  * candidate generator and only candidates pay the exact Levenshtein
  * verify. The naive plan is the all-pairs cross join — O(n²)
  * Levenshtein calls — which no amount of cluster buys back at corpus
  * scale; here candidate generation is a plain shuffle equi-join on
  * variants (O(L^k) postings per string, L = string length) and the
  * verify runs on the candidate sliver only.
  *
  * This is the relational form of the trigram-similarity barcode check
  * in the reference's database (identifier minting rejects barcodes too
  * similar to existing ones — see reference `lib/id3c/db/` usage of
  * pg_trgm; [[Barcodes]] covers that exact semantics), generalized to
  * true edit distance for vocabulary / entity-name deduplication in a
  * training-data pipeline (author names, titles, OCR'd labels).
  *
  * Scale notes: postings skew is bounded — a variant string is shared
  * only by strings within edit distance 2k of each other, so hot
  * variants mirror genuinely hot near-duplicate families, and the
  * downstream `distinct` is keyed by the pair, not the variant. For a
  * corpus with heavy value repetition, run [[vocabFuzzyPairs]]: distinct
  * the vocabulary with counts first (one hash aggregation), fuzzy-join
  * the (much smaller) vocabulary, and let callers join back by value.
  */
object FuzzyJoin {

  /** Array of all strings obtainable by deleting exactly one character,
    * plus the string itself (distinct). Empty string maps to [""]. */
  private[operators] def deleteOne(s: Column): Column =
    Dedup.bind(s, v =>
      array_distinct(concat(
        array(v),
        transform(sequence(lit(1), greatest(length(v), lit(1))),
          i => concat(
            v.substr(lit(1), i - 1),
            v.substr(i + 1, greatest(length(v), lit(1))))))))

  /** All <= maxDist-deletion variants (distinct), maxDist in {1, 2}. */
  private[operators] def variants(s: Column, maxDist: Int): Column =
    maxDist match {
      case 1 => deleteOne(s)
      case 2 => Dedup.bind(deleteOne(s), d1 =>
        array_distinct(flatten(transform(d1, v => deleteOne(v)))))
      case _ => throw new IllegalArgumentException(
        s"maxDist $maxDist not in {1, 2}")
    }

  /** Self-join: pairs (id_a < id_b) with levenshtein(name_a, name_b)
    * <= maxDist. Output: id_a, id_b, name_a, name_b, dist. */
  def symspellJoin(
      df: DataFrame, idCol: String, strCol: String,
      maxDist: Int): DataFrame = {
    val posting = df
      .select(col(idCol).as("_id"), col(strCol).as("_s"))
      .select(col("_id"), col("_s"),
        explode(variants(col("_s"), maxDist)).as("_v"))
    val a = posting.select(col("_id").as("id_a"), col("_s").as("name_a"),
      col("_v"))
    val b = posting.select(col("_id").as("id_b"), col("_s").as("name_b"),
      col("_v"))
    a.join(b, Seq("_v"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "name_a", "name_b")
      .distinct()
      // exact verify on the candidate sliver only; strings here are
      // vocabulary-entry-sized, so the 2-arg form (reports the true
      // distance for the output) is as cheap as the thresholded one
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
  }

  /** Vocabulary-level fuzzy dedup: distinct the value column with
    * occurrence counts (one hash aggregation — the step that collapses
    * a 100 TB corpus with heavy value repetition to its vocabulary),
    * then fuzzy-join the vocabulary. Output: name_a < name_b
    * lexicographically, their corpus occurrence counts, and dist.
    */
  def vocabFuzzyPairs(
      df: DataFrame, strCol: String, maxDist: Int): DataFrame = {
    val vocab = df.groupBy(col(strCol).as("name"))
      .agg(count(lit(1)).as("n_rows"))
    val pairs = symspellJoin(vocab, "name", "name", maxDist)
    pairs
      .join(vocab.select(col("name").as("id_a"), col("n_rows").as("n_a")),
        Seq("id_a"))
      .join(vocab.select(col("name").as("id_b"), col("n_rows").as("n_b")),
        Seq("id_b"))
      .select(col("id_a").as("name_a"), col("id_b").as("name_b"),
        col("n_a"), col("n_b"), col("dist"))
  }
}
