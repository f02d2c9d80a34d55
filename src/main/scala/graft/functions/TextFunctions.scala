package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines (beyond the
  * reference's surface; BASELINE.json north star). All pure built-in
  * expressions — codegen-friendly, shuffle-free, and each has an exact
  * ANSI-SQL twin for the DuckDB oracle.
  */
object TextFunctions {

  /** Whitespace word tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Distinct w-word shingles as an array of strings. Empty/whitespace-only
    * text yields an empty array — NOT a single "" shingle, which would make
    * every empty document a jaccard-1.0 near-dup of every other and put
    * them all in one pathological LSH bucket.
    */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(
          sequence(lit(0), greatest(size(toks) - w, lit(0))),
          i => array_join(slice(toks, i + 1, lit(w)), " "))))
  }

  /** Canonical text normalization: lowercase, collapse whitespace, trim. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Document fingerprint: md5 of the normalized text. Identical on any
    * engine with md5 — the portable form of a rolling hash (only the
    * collision behavior differs, not the dedup semantics).
    */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: whitespace tokens plus an extra
    * token per 6 characters of long words (a deterministic, regex-only
    * stand-in for a real tokenizer's subword splitting).
    */
  def subwordCountEstimate(text: Column): Column =
    size(tokens(text)) +
      size(filter(tokens(text), t => length(t) > 6))

  /** Type-token ratio: distinct/total tokens (lexical diversity). */
  def typeTokenRatio(text: Column): Column = {
    val toks = tokens(text)
    size(array_distinct(toks)).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Count of tokens contained in `words` (stopword hits). */
  def wordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(words)))

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "in", "to", "is", "it", "that")

  /** Binary half-up rounding to 4dp: `floor(x·10⁴ + 0.5)/10⁴`. Unlike
    * `round()`, whose half-way handling differs between Spark (decimal-
    * string HALF_UP) and DuckDB (binary), this is a pure double computation
    * — identical wherever the unrounded double is identical. Use it for
    * outputs that are ratios of small integers (type-token ratio, Jaccard,
    * averages over power-of-two counts), whose exact decimal expansion can
    * terminate exactly one digit past the rounding scale.
    */
  def round4hu(c: Column): Column = floor(c * 10000.0 + 0.5) / 10000.0

  /** Heuristic quality score in [0,100]:
    * 40% length saturation (chars/500 capped), 40% lexical diversity,
    * 20% stopword-rate sanity (rate·5 capped at 1). The weights mirror the
    * reference's additive capped-component style (U5/U7).
    */
  def qualityScore(text: Column, nChars: Column): Column = {
    val lenScore = least(nChars.cast("double") / 500.0, lit(1.0))
    val ttr = typeTokenRatio(text)
    val stopRate = wordHits(text, EnglishStopwords).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")
    round4hu(lit(100.0) * (lit(0.4) * lenScore + lit(0.4) * ttr +
      lit(0.2) * least(stopRate * 5.0, lit(1.0))))
  }

  def qualityLabel(score: Column): Column =
    when(score >= 70, "high").when(score >= 40, "medium").otherwise("low")

  /** Tiny per-language marker lists for the n-gram/stopword language-ID
    * heuristic. Deterministic priority order en > fr > es > de > zh on ties.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "zh" -> Seq("的", "是", "和", "了", "在"))

  /** Argmax over precomputed per-language hit counts (same priority-order
    * tie-break as [[langId]]). Use with hit columns materialized once via
    * explode+aggregate — referencing [[langId]]'s internal hits many times
    * makes Catalyst re-split the text per reference.
    */
  def langIdFromHits(hits: Seq[(String, Column)]): Column = {
    val total = hits.map(_._2).reduce(_ + _)
    // priority-ordered when-chain: the first language whose hit count is
    // positive and beats every earlier (strictly) / later (weakly) count
    // wins — same argmax + tie-break as a first-match fold, without the
    // degenerate lit === lit seed comparison Spark 4 warns about
    val best = hits.zipWithIndex.foldRight(lit("und")) {
      case (((lang, h), i), acc) =>
        val winConds = hits.take(i).map(_._2).map(h > _) ++
          hits.drop(i + 1).map(_._2).map(h >= _)
        // single-language lists have no competitors — winning is vacuous
        val wins = if (winConds.isEmpty) lit(true) else winConds.reduce(_ && _)
        when(h > 0 && wins, lang).otherwise(acc)
    }
    when(total === 0, "und").otherwise(best)
  }

  /** Language-ID: argmax of marker-hit counts with fixed priority-order
    * tie-break; no hits at all → "und" (undetermined).
    */
  def langId(text: Column): Column =
    langIdFromHits(LangMarkers.map { case (lang, words) => lang -> wordHits(text, words) })
}
