package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  * All pure Column expressions (no UDFs) so a 100 TB documents table
  * processes these inside the parquet scan stage with zero shuffles.
  */
object TextFunctions {

  /** Whitespace token count. Empty/blank strings count 0. Trims with a
    * regex: `trim()` strips spaces only, so text padded with \n or \t
    * would otherwise produce phantom empty tokens that skew every
    * ratio dividing by tokenCount.
    */
  def tokenCount(text: Column): Column = {
    val t = regexp_replace(text, "^\\s+|\\s+$", "")
    when(t === "", lit(0)).otherwise(size(split(t, "\\s+")))
  }

  /** BPE-ish token count: word pieces + standalone punctuation — a cheap
    * proxy for subword tokenizers (`\w+` runs + single non-word marks).
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Occurrences of `word` as a standalone whitespace token. */
  def wordOccurrences(text: Column, word: String): Column =
    size(filter(split(text, "\\s+"), t => t === lit(word)))

  /** Language-ID by stopword evidence: scores each candidate language by
    * marker-token hits, returns the argmax (ties → alphabetical-first).
    * An n-gram-heuristic language detector reduced to pure SQL ops.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "los", "las", "una", "es"))

  def langScore(text: Column, lang: String): Column =
    langMarkers(lang)
      .map(w => wordOccurrences(lower(text), w))
      .reduce(_ + _)

  /** Argmax language. Sorted ascending by (score, reverseAlphaRank); the
    * last element has max score, ties resolved to the alphabetically
    * FIRST language (its reverse rank is greatest).
    */
  def langId(text: Column): Column = {
    val langs = langMarkers.keys.toSeq.sorted
    val ranked = langs.zipWithIndex.map { case (l, i) =>
      struct(
        langScore(text, l).as("score"),
        lit(langs.size - i).as("rank"),
        lit(l).as("lang"))
    }
    element_at(sort_array(array(ranked: _*), asc = true), -1)("lang")
  }

  def charCount(text: Column): Column = length(text)

  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", "")))
        .cast("double") / length(text))

  def stopwordRatio(text: Column): Column = {
    val stops = Seq("the", "a", "and", "of", "to", "in", "is")
    val hits = stops.map(w => wordOccurrences(lower(text), w)).reduce(_ + _)
    when(tokenCount(text) === 0, lit(0.0))
      .otherwise(hits.cast("double") / tokenCount(text))
  }

  def meanWordLength(text: Column): Column =
    when(tokenCount(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "\\s+", "")).cast("double")
        / tokenCount(text))

  /** Quality score in [0,1]: blends length, punctuation density, mean
    * word length, and stopword ratio — the classic cheap pre-filters for
    * web-scale corpus cleaning. Rounded to 6dp for cross-engine
    * comparability.
    */
  def qualityScore(text: Column): Column = {
    val lenScore =
      least(charCount(text).cast("double") / lit(200.0), lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5)
    val wordLenScore = when(
      meanWordLength(text).between(3.0, 10.0), lit(1.0)).otherwise(lit(0.5))
    val stopScore = least(stopwordRatio(text) * 4, lit(1.0))
    round(
      lenScore * 0.3 + punctPenalty * 0.2 + wordLenScore * 0.2
        + stopScore * 0.3, 6)
  }

  /** PII scrubbing: redacts emails, international-ish phone numbers and
    * long digit runs (ids/cards) — the standard pre-training text
    * hygiene pass. Pure regexp_replace chain (RE2-compatible patterns,
    * replayable by the DuckDB oracle).
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"
  val longDigitsRe = "[0-9]{9,}"

  /** Order matters: long digit runs (cards/ids) are scrubbed BEFORE the
    * phone pattern, which would otherwise claim any ≥9-digit run.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        longDigitsRe, "<NUM>"),
      phoneRe, "<PHONE>")

  /** Character shingles (n-grams): substrings at positions 1..len-n+1. */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(
        transform(sequence(lit(1), length(text) - n + 1),
          i => text.substr(i, lit(n))))

  /** Word shingles (n-grams of whitespace tokens), space-joined. */
  def wordShingles(text: Column, n: Int): Column = {
    val words = split(regexp_replace(text, "^\\s+|\\s+$", ""), "\\s+")
    when(size(words) < n, array().cast("array<string>"))
      .otherwise(
        transform(sequence(lit(0), size(words) - n),
          i => array_join(slice(words, i + 1, lit(n)), " ")))
  }
}
