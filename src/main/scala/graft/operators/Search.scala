package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index text retrieval: exact phrase search over a positional
  * index and substring search over a character-trigram index — the two
  * index shapes a relational engine uses where Postgres would reach for
  * `tsvector` positions and `pg_trgm` GIN indexes (the reference's
  * database uses trigram indexes for its barcode similarity checks;
  * here the same structure serves corpus-scale text search). Ranked
  * retrieval over the same postings layout is
  * [[TextAnalysis.bm25TopK]]; hybrid fusion is
  * [[SimilaritySearch.rrfFuse]].
  */
object Search {

  /** Exact phrase occurrences via a positional inverted index, ONE scan
    * and one aggregation for any phrase length: a token at position p
    * matching phrase word j is evidence for a phrase start at p − j, so
    * matching tokens emit (doc, start, j) votes and a start is an
    * occurrence iff it collected all m distinct j's. No m-way self-join
    * (the naive positional-index plan), no per-row regex: work is
    * proportional to occurrences of the phrase's WORDS, which the
    * broadcast phrase join prunes from the postings stream at the scan.
    *
    * Output: id, n_occurrences, first_pos (1-based token position) for
    * documents containing the phrase at least once.
    */
  def phraseSearch(
      df: DataFrame, idCol: String, textCol: String,
      phrase: String): DataFrame = {
    val words = phrase.trim.split("\\s+").toSeq
    require(words.nonEmpty && words.head.nonEmpty, "empty phrase")
    val m = words.length
    val spark = df.sparkSession
    import spark.implicits._
    val ph = words.zipWithIndex.map { case (w, j) => (j.toLong, w) }
      .toDF("j", "w")
    df.select(col(idCol).as("id"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("_p0", "tok")))
      .select(col("id"), (col("_p0") + 1).as("p"), col("tok"))
      .join(broadcast(ph), col("tok") === col("w"))
      // (id, start, j) votes are unique by construction — postings are
      // unique per (id, p) and (start, j) maps back to (p, j) — so the
      // vote count needs no dedup pass
      .select(col("id"), (col("p") - col("j")).as("start"), col("j"))
      .groupBy("id", "start").agg(count(lit(1)).as("_c"))
      .filter(col("_c") === m && col("start") >= 1)
      .groupBy("id")
      .agg(count(lit(1)).as("n_occurrences"), min("start").as("first_pos"))
      .select(col("id").as(idCol), col("n_occurrences"), col("first_pos"))
  }

  /** Substring search via a character-trigram index (the `pg_trgm`
    * plan): candidate documents must contain EVERY trigram of the
    * needle — an inverted-index intersection that prunes the corpus to
    * a sliver — and only candidates pay the exact `contains` verify.
    * The index is recall-complete (any document containing the needle
    * contains all its trigrams), so results equal a full-scan LIKE; the
    * trigram stage exists purely to keep the verify off 99% of a
    * 100 TB corpus. Needles shorter than 3 characters fall back to the
    * full-scan filter.
    *
    * Output: id, first_ix (1-based character position of the first
    * occurrence) for matching documents.
    */
  def trigramSearch(
      df: DataFrame, idCol: String, textCol: String,
      needle: String): DataFrame = {
    require(needle.nonEmpty, "empty needle")
    val verified =
      if (needle.length < 3) df
      else {
        val grams = needle.sliding(3).toSeq.distinct
        val tg = df.select(col(idCol).as("id"),
            explode(Dedup.bind(col(textCol).cast("string"), t =>
              array_distinct(transform(
                sequence(lit(1), greatest(length(t) - 2, lit(1))),
                i => t.substr(i, lit(3))))))
              .as("g"))
        val cands = tg // (id, g) already unique: grams are array_distinct'd
          .filter(col("g").isin(grams: _*))
          .groupBy("id").agg(count(lit(1)).as("_c"))
          .filter(col("_c") === grams.length)
          .select("id")
        df.join(cands.withColumnRenamed("id", idCol), Seq(idCol), "left_semi")
      }
    verified
      .filter(col(textCol).contains(needle))
      .select(col(idCol), instr(col(textCol), needle).cast("long")
        .as("first_ix"))
  }

  /** Boolean retrieval over the postings layout: documents containing
    * ALL `must` terms, at least `minShould` of the `should` terms, and
    * NONE of the `mustNot` terms — the Lucene `+a b -c` query form on
    * the same index shape as [[phraseSearch]]/[[TextAnalysis.bm25TopK]].
    *
    * One distinct-token explode, a broadcast term-role join that prunes
    * the postings stream to the query's terms at the scan, and one
    * per-doc count aggregate carrying all three role counters — work is
    * proportional to the query terms' postings, never the corpus, and
    * the exclusion check rides the same aggregate (a doc with a
    * `mustNot` hit has n_not > 0) instead of an anti-join pass.
    *
    * At least one positive term is required (a pure-negation query is a
    * corpus scan, not an index lookup — by construction every hit has a
    * positive posting, so the aggregate's domain covers all hits).
    * Terms match RAW tokens (case-sensitive, like [[phraseSearch]]) —
    * for case-insensitive retrieval lowercase both the corpus and the
    * query terms upstream.
    *
    * Output: (idCol, n_must, n_should) for matching documents.
    */
  def booleanSearch(
      df: DataFrame, idCol: String, textCol: String,
      must: Seq[String], should: Seq[String] = Nil,
      mustNot: Seq[String] = Nil, minShould: Int = 1): DataFrame = {
    require(must.nonEmpty || should.nonEmpty,
      "need at least one positive term")
    require((must ++ should ++ mustNot).forall(w =>
      w.nonEmpty && !w.exists(_.isWhitespace)),
      "terms must be single non-blank tokens")
    val spark = df.sparkSession
    import spark.implicits._
    val roles = (must.map((_, "must")) ++ should.map((_, "should")) ++
      mustNot.map((_, "not"))).toDF("w", "role")
    df.select(col(idCol),
        explode(array_distinct(TextAnalysis.tokens(col(textCol))))
          .as("tok"))
      .join(broadcast(roles), col("tok") === col("w"))
      .groupBy(idCol)
      .agg(
        sum(when(col("role") === "must", 1L).otherwise(0L)).as("n_must"),
        sum(when(col("role") === "should", 1L).otherwise(0L))
          .as("n_should"),
        sum(when(col("role") === "not", 1L).otherwise(0L)).as("_n_not"))
      .filter(col("n_must") === must.length && col("_n_not") === 0 &&
        (if (should.isEmpty) lit(true)
         else col("n_should") >= minShould))
      .select(col(idCol), col("n_must"), col("n_should"))
  }
}
