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
  * (`" tok1  tok2  tok3 "`). That encoding makes the greedy merge a
  * plain literal `replace(" a  b ", " a b ")`:
  *
  *  - `replace` substitutes non-overlapping occurrences left-to-right
  *    in BOTH Spark and DuckDB — exactly BPE's greedy merge order
  *    (`"a a a"` with pair (a,a) merges once, not twice);
  *  - each match consumes one of the two separator spaces on either
  *    side, and the replacement restores it, so the double-space
  *    invariant survives every round;
  *  - a MERGED token keeps a single internal space (`"a b"`), which can
  *    never be confused with the double-space separator — so later
  *    rounds can merge merged tokens with zero escaping or re-encoding.
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

  /** `" tok1  tok2  ... "` encoding of a raw text column. */
  def encode(text: Column): Column =
    concat(lit(" "),
      regexp_replace(trim(lower(text)), "\\s+", "  "), lit(" "))

  /** Tokens of an encoded doc (inner single spaces belong to merged
    * tokens; the double space is the separator).
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

  /** Learn `nMerges` BPE merges. Returns the merge table:
    * (step 1..n, pair_a, pair_b, n = pair count at merge time) —
    * the induced vocabulary additions in application order.
    */
  def learnMerges(
      docs: DataFrame,
      textCol: String,
      nMerges: Int): DataFrame = {
    var corpus = Par.pin(
      Par.widen(docs).select(encode(col(textCol)).as("__enc")))
    val steps = (1 to nMerges).map { step =>
      // the 1-row winner is consumed twice (merge broadcast + final
      // output union) — pin it so the corpus-wide count pass behind it
      // runs once per round, not once per consumer
      val top = Par.pinLocal(topPair(corpus, "__enc"))
      if (step < nMerges) {
        // apply the merge: the 1-row winner rides in via broadcast
        // crossJoin; pinLocal (not pin) — round intermediates are
        // transient and reliable checkpoints would leak files
        corpus = Par.pinLocal(
          corpus.crossJoin(broadcast(top)).select(
            replace(col("__enc"),
              concat(lit(" "), col("a"), lit("  "), col("b"), lit(" ")),
              concat(lit(" "), col("a"), lit(" "), col("b"), lit(" ")))
              .as("__enc")))
      }
      top.select(lit(step).as("step"), col("a").as("pair_a"),
        col("b").as("pair_b"), col("n"))
    }
    steps.reduce(_.unionByName(_)).orderBy("step")
  }
}
