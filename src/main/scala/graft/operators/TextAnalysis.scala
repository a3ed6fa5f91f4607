package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: language ID, quality
  * scoring, token counting, fingerprinting. All pure column expressions —
  * per-row, embarrassingly parallel, no shuffle, codegen-friendly.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count (0 for empty/blank text). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(tokens(text)))

  /** BPE-ish subword count estimate: word-piece regex split — words,
    * numbers, and individual punctuation marks each count.
    */
  def subwordCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(
      size(filter(split(text, "(?=[^\\p{L}\\p{N}])|(?<=[^\\p{L}\\p{N}])"),
        t => length(t) > 0)))

  private val markerWords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "una"),
    "fr" -> Seq("le", "la", "les", "et", "des", "une", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和"))

  /** n-gram/stopword-heuristic language ID: score each language by marker
    * token hits, argmax with lexicographic tie-break (deterministic).
    */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scored = markerWords.map { case (lang, markers) =>
      struct(size(filter(toks, t => t.isin(markers.map(lit): _*))).as("hits"),
        lit(lang).as("lang"))
    }
    // max by (hits, then *reversed* lang) so ties pick the lexicographically
    // smallest language deterministically.
    val best = scored.reduce((a, b) =>
      when(b.getField("hits") > a.getField("hits"), b)
        .when(b.getField("hits") === a.getField("hits") &&
          b.getField("lang") < a.getField("lang"), b)
        .otherwise(a))
    best.getField("lang")
  }

  private val stopwords =
    Seq("the", "a", "of", "and", "to", "is", "in", "that", "it", "for")

  /** Quality signals (length, punctuation/digit/stopword ratios, mean
    * word length) and a composite score in [0,1].
    */
  def qualitySignals(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = tokenCount(t)
    val nChar = length(t)
    val punct = nChar - length(regexp_replace(t, "[\\p{Punct}]", ""))
    val digits = nChar - length(regexp_replace(t, "[0-9]", ""))
    val stopHits = size(filter(toks, w => lower(w).isin(stopwords.map(lit): _*)))
    df.withColumn("n_chars", nChar)
      .withColumn("n_tokens", nTok)
      .withColumn("punct_ratio",
        when(nChar === 0, 0.0).otherwise(punct.cast("double") / nChar))
      .withColumn("digit_ratio",
        when(nChar === 0, 0.0).otherwise(digits.cast("double") / nChar))
      .withColumn("stopword_ratio",
        when(nTok === 0, 0.0).otherwise(stopHits.cast("double") / nTok))
      .withColumn("mean_word_len",
        when(nTok === 0, 0.0)
          .otherwise((nChar - nTok + 1).cast("double") / nTok))
  }

  /** Canonical-text fingerprint: md5 over lowercased, whitespace-collapsed,
    * punctuation-stripped text — robust to formatting-only edits.
    */
  def canonicalFingerprint(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "[\\p{Punct}]", ""), "\\s+", " ")))

  /** Winnowing-style rolling fingerprint set: the distinct minima of
    * hash60 over every window of `window` consecutive k-gram hashes
    * (Schleimer et al., SIGMOD 2003 — public algorithm). Used for robust
    * partial-overlap detection; per-row column math only.
    */
  def winnowingFingerprints(text: Column, k: Int = 5, window: Int = 4): Column = {
    val grams = Dedup.wordShingles(text, k)
    val hashes = transform(grams, g => Dedup.hash60(g, 7))
    val nWin = greatest(size(hashes) - (window - 1), lit(1))
    array_distinct(
      transform(sequence(lit(1), nWin),
        i => array_min(slice(hashes, i, lit(window)))))
  }
}
