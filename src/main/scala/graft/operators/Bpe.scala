package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE-style vocabulary induction over word tokens — the iterative
  * extension of the one-shot bigram counting in `vocab_top_ngrams`
  * (tokenizer-training's counting loop, run as N rounds of
  * merge-the-most-frequent-adjacent-pair with recount).
  *
  * Corpus representation: one STRING per document, tokens joined by a
  * DOUBLE space and padded with one space each side
  * (`" tok1  tok2  tok3 "`); a MERGED token glues its parts with the
  * non-space [[Joiner]] control char (`"a\u0001b"`), so tokens NEVER
  * contain spaces. That encoding makes the greedy merge a plain literal
  * `replace(" a  b ", " a\u0001b ")`:
  *
  *  - `replace` substitutes non-overlapping occurrences left-to-right
  *    in BOTH Spark and DuckDB — exactly BPE's greedy merge order
  *    (`"a a a"` with pair (a,a) merges once, not twice);
  *  - each match consumes one of the two separator spaces on either
  *    side, and the replacement restores it, so the double-space
  *    invariant survives every round;
  *  - the pattern's outer single-space boundaries can only ever match
  *    separator spaces, because no token contains a space. (A previous
  *    revision joined merged tokens with a single INTERNAL space; then
  *    pattern `" cat  sat "` also matched inside `" the cat  sat "`
  *    starting at "the cat"'s internal space, silently three-way
  *    merging a pair that never won — the joiner char closes that
  *    hole, and `BpeSpec` pins the exact scenario.)
  *
  * The joiner is stripped from raw input by [[encode]] (folded into
  * whitespace) so user text can never forge a merged token, and
  * translated back to a space in the returned merge table.
  *
  * Everything is DataFrame ops: pair counts are a map-side zip over the
  * token array plus one count shuffle; the round's winning pair is a
  * 1-row frame broadcast back into the merge `replace` (no driver-side
  * collect). Each round's corpus is pinned ([[Par.pin]]) — the round
  * output feeds both the next count and the next merge, and without the
  * pin the plan (and the recompute) doubles per round, the same hazard
  * pointer-jumping CC hit. At 100 TB each round is one scan + one
  * near-balanced count shuffle; N rounds = N passes, the unavoidable
  * BPE shape (real tokenizer trainers batch several non-interfering
  * merges per pass — same plumbing, more bookkeeping).
  */
object Bpe {

  /** Internal glue between the parts of a merged token (never a space,
    * never in normalized input).
    */
  val Joiner = "\u0001"

  /** `" tok1  tok2  ... "` encoding of a raw text column. Runs of
    * whitespace AND any raw [[Joiner]] chars collapse into the
    * double-space separator.
    */
  def encode(text: Column): Column =
    concat(lit(" "),
      regexp_replace(trim(lower(text)), "[\\s\\u0001]+", "  "), lit(" "))

  /** Tokens of an encoded doc (merged tokens carry [[Joiner]]s; the
    * double space is the separator).
    */
  private def tokens(s: Column): Column = split(trim(s), "  ")

  /** Adjacent-pair (a, b) structs of an encoded doc. */
  private def pairs(s: Column): Column = {
    val ts = tokens(s)
    zip_with(
      slice(ts, lit(1), size(ts) - 1),
      slice(ts, lit(2), size(ts) - 1),
      (a, b) => struct(a.as("a"), b.as("b")))
  }

  /** The round's winner: most frequent adjacent pair, ties broken
    * lexicographically on (a, b) so induction is deterministic.
    */
  private def topPair(docs: DataFrame, encCol: String): DataFrame =
    docs.select(explode(pairs(col(encCol))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("a").asc, col("b").asc)
      .limit(1)

  /** One greedy merge of the 1-row (a, b) winner into the corpus —
    * exposed for direct testing of the application step.
    */
  private[graft] def applyMerge(
      corpus: DataFrame, encCol: String, top: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(top)).select(
      replace(col(encCol),
        concat(lit(" "), col("a"), lit("  "), col("b"), lit(" ")),
        concat(lit(" "), col("a"), lit(Joiner), col("b"), lit(" ")))
        .as(encCol))

  /** Learn up to `nMerges` BPE merges. Returns the merge table:
    * (step 1..n, pair_a, pair_b, n = pair count at merge time) with
    * merged-token parts space-separated — the induced vocabulary
    * additions in application order.
    *
    * Stops EARLY (returning fewer than nMerges rows) when the corpus
    * runs out of adjacent pairs — every document collapsed to a single
    * token, the vocabulary is complete. The alternative — cross-joining
    * the corpus with the 0-row winner — would silently EMPTY the corpus
    * and make every later round vacuous; a fully merged corpus is a
    * success state, not an error, so the loop ends cleanly. A corpus
    * with no pairs at all (nothing to learn) still fails loudly.
    */
  def learnMerges(
      docs: DataFrame,
      textCol: String,
      nMerges: Int): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    var corpus = Par.pin(
      Par.widen(docs).select(encode(col(textCol)).as("__enc")))
    val steps = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      // the 1-row winner is consumed twice (merge broadcast + final
      // output union) — pin it so the corpus-wide count pass behind it
      // runs once per round, not once per consumer. The pin also makes
      // the emptiness probe below free (1-row checkpointed frame).
      val top = Par.pinLocal(topPair(corpus, "__enc"))
      if (top.isEmpty) {
        exhausted = true
      } else {
        if (step < nMerges) {
          // pinLocal (not pin) — round intermediates are transient and
          // reliable checkpoints would leak files
          corpus = Par.pinLocal(applyMerge(corpus, "__enc", top))
        }
        steps += top.select(lit(step).as("step"),
          translate(col("a"), Joiner, " ").as("pair_a"),
          translate(col("b"), Joiner, " ").as("pair_b"), col("n"))
        step += 1
      }
    }
    require(steps.nonEmpty,
      "BPE: corpus has no adjacent token pairs at all — nothing to learn " +
        "(every document is empty or a single character)")
    steps.reduce(_.unionByName(_)).orderBy("step")
  }

  /** Apply a learned merge table ([[learnMerges]] output) to encode a
    * corpus: every merge replayed in step order. The merge table is a
    * VOCABULARY artifact (nMerges rows, not data), so it collects to
    * the driver and each merge becomes one literal `replace` in a
    * single fused projection — encoding costs ONE corpus scan
    * regardless of vocabulary size, vs the training loop's pass per
    * round. This is the tokenizer-application side: train once
    * ([[learnMerges]]), encode any corpus any number of times.
    *
    * Adds `bpe_enc` (the encoded string, merged tokens glued with
    * [[Joiner]]) and `bpe_tokens` (the token array with joiners
    * restored to spaces) to `docs`.
    */
  def applyMerges(
      docs: DataFrame,
      textCol: String,
      merges: DataFrame): DataFrame = {
    // step order matters: later merges may consume earlier merged
    // tokens (("the cat"), then ("the cat","sat"))
    val ms = merges.orderBy("step").select("pair_a", "pair_b").collect()
      .map(r => (r.getString(0).replace(" ", Joiner),
        r.getString(1).replace(" ", Joiner)))
    val enc = ms.foldLeft(encode(col(textCol))) { case (e, (a, b)) =>
      replace(e, lit(s" $a  $b "), lit(s" $a$Joiner$b "))
    }
    docs
      .withColumn("bpe_enc", enc)
      .withColumn("bpe_tokens",
        transform(split(trim(col("bpe_enc")), "  "),
          t => translate(t, Joiner, " ")))
  }
}
