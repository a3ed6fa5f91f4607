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
    * <= maxDist. Output: id_a, id_b, name_a, name_b, dist.
    *
    * maxDist = 1 takes the POSITION-TAGGED path ([[lev1Pairs]]):
    * substitution candidates are exactly the answer set, which keeps
    * template corpora (zero-padded codes, shared prefixes) linear where
    * untagged deletion variants collide every pair within two edits —
    * measured 15.4s → 6.1s (output-bound) at the 10× scale run.
    * maxDist = 2 uses the classic untagged variant postings (positions
    * stop aligning once an indel is involved); its known degenerate
    * corpus is documented at q150 in dev/PERF_r6.md.
    *
    * `maxCandidatePairs` is the [[Dedup.candidateMassStats]]-family
    * circuit breaker: a linear pre-estimate of the variant-posting
    * self-join mass (Σ_v df·(df−1)/2) fails fast with
    * [[CandidateMassExceededException]] instead of writing a doomed
    * pair-mass shuffle on a degenerate vocabulary (shared templates,
    * saturated code spaces). Callers with heavy value repetition
    * should collapse to the vocabulary first ([[vocabFuzzyPairs]]).
    */
  def symspellJoin(
      df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, maxCandidatePairs: Option[Long] = None): DataFrame = {
    if (maxDist == 1) return lev1Pairs(df, idCol, strCol, maxCandidatePairs)
    val posting0 = df
      .select(col(idCol).as("_id"), col(strCol).as("_s"))
      .select(col("_id"), col("_s"),
        explode(variants(col("_s"), maxDist)).as("_v"))
    // checkpoint ONLY when guarded: the estimate job and the join both
    // consume the posting explode — without the pin it runs twice
    val posting = if (maxCandidatePairs.isDefined)
      posting0.localCheckpoint(false) else posting0
    maxCandidatePairs.foreach { budget =>
      val d = col("_c").cast("decimal(38,0)")
      Dedup.requireCandidateBudget("symspellJoin",
        posting.groupBy(col("_v")).agg(count(lit(1)).as("_c"))
          .agg(coalesce(sum(d * (d - lit(1))), lit(0).cast("decimal(38,0)"))),
        budget,
        "Collapse repeated values to the vocabulary first " +
          "(vocabFuzzyPairs), shorten maxDist, or raise " +
          "maxCandidatePairs deliberately.")
    }
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

  /** The lev ≤ 1 fast path: substitution/equal pairs meet on a
    * position-tagged deletion key — (i, del_i(a)) == (i, del_i(b)) ⟺
    * a and b agree everywhere except position i, so those candidates
    * are EXACTLY the answers, with no blow-up on template keys.
    * Insert/delete pairs (lengths differ by 1) surface where the
    * shorter string equals a deletion of the longer — an asymmetric
    * identity-vs-deletions equi-join whose buckets are bounded by
    * alphabet·length one-insert extensions. The i = -1 identity key
    * catches exact duplicates.
    */
  private def lev1Pairs(
      df: DataFrame, idCol: String, strCol: String,
      maxCandidatePairs: Option[Long] = None): DataFrame = {
    val base = df.select(col(idCol).as("_id"), col(strCol).as("_s"))
    def delAt(s: Column, i: Column): Column =
      concat(s.substr(lit(1), i), s.substr(i + 2, length(s)))
    val keyed0 = base
      .select(col("_id"), col("_s"),
        explode(sequence(lit(-1), length(col("_s")) - 1)).as("_i"))
      .select(col("_id"), col("_s"),
        concat(col("_i").cast("string"), lit("|"),
          when(col("_i") === -1, col("_s"))
            .otherwise(delAt(col("_s"), col("_i")))).as("_k"))
    val keyed = if (maxCandidatePairs.isDefined) keyed0.localCheckpoint(false)
      else keyed0
    maxCandidatePairs.foreach { budget =>
      // the position-tagged substitution keys are the only self-join in
      // this path (the indel side is an identity-vs-deletions equi-join
      // bounded by one-insert extensions) — their Σ df·(df−1)/2 is the
      // candidate mass that can degenerate on a saturated code space
      val d = col("_c").cast("decimal(38,0)")
      Dedup.requireCandidateBudget("symspellJoin(maxDist=1)",
        keyed.groupBy(col("_k")).agg(count(lit(1)).as("_c"))
          .agg(coalesce(sum(d * (d - lit(1))), lit(0).cast("decimal(38,0)"))),
        budget,
        "Collapse repeated values to the vocabulary first " +
          "(vocabFuzzyPairs) or raise maxCandidatePairs deliberately.")
    }
    val subPairs = keyed.select(col("_id").as("id_a"),
        col("_s").as("name_a"), col("_k"))
      .join(keyed.select(col("_id").as("id_b"), col("_s").as("name_b"),
        col("_k")), Seq("_k"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "name_a", "name_b")
    // distinct first: repeated characters make several deletion
    // positions yield the same variant ("0001" has one distinct
    // zero-deletion, not three)
    val dels = base
      .select(col("_id"), col("_s"),
        explode(sequence(lit(0), length(col("_s")) - 1)).as("_i"))
      .select(col("_id").as("_did"), col("_s").as("_ds"),
        delAt(col("_s"), col("_i")).as("_k"))
      .distinct()
    val indelPairs = base.join(dels, col("_s") === col("_k"))
      .filter(col("_id") =!= col("_did"))
      .select(
        least(col("_id"), col("_did")).as("id_a"),
        greatest(col("_id"), col("_did")).as("id_b"),
        when(col("_id") < col("_did"), col("_s")).otherwise(col("_ds"))
          .as("name_a"),
        when(col("_id") < col("_did"), col("_ds")).otherwise(col("_s"))
          .as("name_b"))
    subPairs.unionByName(indelPairs)
      .distinct()
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 1)
  }

  /** Vocabulary-level fuzzy dedup: distinct the value column with
    * occurrence counts (one hash aggregation — the step that collapses
    * a 100 TB corpus with heavy value repetition to its vocabulary),
    * then fuzzy-join the vocabulary. Output: name_a < name_b
    * lexicographically, their corpus occurrence counts, and dist.
    */
  def vocabFuzzyPairs(
      df: DataFrame, strCol: String, maxDist: Int,
      maxCandidatePairs: Option[Long] = None): DataFrame = {
    val vocab = df.groupBy(col(strCol).as("name"))
      .agg(count(lit(1)).as("n_rows"))
    val pairs = symspellJoin(vocab, "name", "name", maxDist, maxCandidatePairs)
    pairs
      .join(vocab.select(col("name").as("id_a"), col("n_rows").as("n_a")),
        Seq("id_a"))
      .join(vocab.select(col("name").as("id_b"), col("n_rows").as("n_b")),
        Seq("id_b"))
      .select(col("id_a").as("name_a"), col("id_b").as("name_b"),
        col("n_a"), col("n_b"), col("dist"))
  }
}
