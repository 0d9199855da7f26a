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

  /** Whitespace tokens (regex-trimmed; empty/blank text → empty array,
    * NOT `[""]` — the `split`-on-empty-string footgun every ratio here
    * would otherwise inherit).
    */
  def tokens(text: Column): Column = {
    val t = regexp_replace(text, "^\\s+|\\s+$", "")
    when(t === "", array().cast("array<string>")).otherwise(split(t, "\\s+"))
  }

  /** Overlapping token-window chunks of a document — the context-length
    * prep step of a training pipeline (documents exceed the model's
    * window; training wants `maxTokens`-sized pieces with `overlap`
    * tokens of continuity). Returns an array of chunk strings; chunk i
    * covers tokens `[i*stride, i*stride + maxTokens)` with
    * `stride = maxTokens - overlap`, and the number of chunks is
    * `1 + ceil(max(0, n - maxTokens) / stride)` — the final chunk may
    * be short, a document within one window yields exactly itself, and
    * an empty document yields no chunks. Pure scan-stage array math: at
    * 100 TB chunking is a flatMap inside the parquet scan, no shuffle,
    * no state.
    */
  def chunkTokens(text: Column, maxTokens: Int, overlap: Int): Column = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens,
      "overlap must be in [0, maxTokens)")
    val stride = maxTokens - overlap
    val ts = tokens(text)
    val n = size(ts)
    // integer ceil((n - maxTokens)/stride) via double division — exact
    // for any realistic document length (< 2^53 tokens)
    val nChunks = lit(1) +
      ceil(greatest(lit(0), n - lit(maxTokens)).cast("double") /
        lit(stride.toDouble)).cast("int")
    // empty doc → no chunks; guarded BEFORE sequence(), which would
    // otherwise happily generate the DESCENDING [0, -1]
    when(n === 0, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), nChunks - 1),
        i => array_join(slice(ts, i * stride + 1, lit(maxTokens)), " ")))
  }

  /** Occurrences of `word` as a standalone whitespace token. */
  def wordOccurrences(text: Column, word: String): Column =
    size(filter(split(text, "\\s+"), t => t === lit(word)))

  /** Space-joined token n-grams; fewer than n tokens → empty array. */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1)
    val ts = tokens(text)
    when(size(ts) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), size(ts) - (n - 1)),
        i => array_join(slice(ts, i, lit(n)), " ")))
  }

  /** Fraction of token n-grams that are repeats of an earlier one —
    * the Gopher-style repetition signal (machine-generated and
    * boilerplate text repeats itself; high duplicate-n-gram fractions
    * are the cheapest reliable tell). 0.0 for docs with no n-grams.
    * Scan-stage array math, no shuffle.
    */
  def dupNgramFraction(text: Column, n: Int): Column = {
    val g = wordNgrams(text, n)
    when(size(g) === 0, lit(0.0)).otherwise(
      (size(g) - size(array_distinct(g))).cast("double") /
        size(g).cast("double"))
  }

  /** Fraction of the document taken by its single most frequent token
    * (the other half of the repetition battery: keyword-stuffed or
    * templated text concentrates mass on one token). O(unique·n) per
    * document — bounded by document length, never by corpus size.
    */
  def topTokenFraction(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, lit(0.0)).otherwise(
      array_max(transform(array_distinct(ts),
        t => size(filter(ts, x => x === t)))).cast("double") /
        size(ts).cast("double"))
  }

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
