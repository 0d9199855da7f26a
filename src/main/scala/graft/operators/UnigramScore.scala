package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Unigram language-model quality scoring — the corpus-statistics
  * filter of a CCNet-style pipeline (score documents against an LM of
  * the corpus itself; junk, boilerplate and wrong-language text sits
  * far from the corpus distribution). Expressed LOG-FREE: a document's
  * score is the total corpus FREQUENCY MASS of its tokens (exact
  * integer sums — `ln`-based perplexity would hang the strict
  * cross-engine compare on libm rounding), normalized by token count
  * downstream. High mean mass = distribution-typical text; near-zero =
  * out-of-vocabulary garbage.
  *
  * Two phases, matching the tokenizer-artifact shape of [[Bpe]]:
  *  1. TRAIN ([[vocabulary]]): one explode + one count shuffle over
  *     the corpus, keep the top-K tokens by (count desc, token asc) —
  *     K is vocabulary-sized, a driver artifact;
  *  2. SCORE ([[scoreWith]]): the vocabulary rides as a broadcast map
  *     LITERAL inside a scan-stage fold — scoring a 100 TB corpus is a
  *     pure map pass, zero shuffles, zero joins.
  */
object UnigramScore {

  /** Top-K corpus vocabulary: (token, freq), deterministic cut by
    * (freq desc, token asc).
    */
  def vocabulary(docs: DataFrame, textCol: String, topK: Int): DataFrame =
    docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(topK)

  /** Collect a trained vocabulary as the driver-side artifact. */
  def collectVocabulary(vocab: DataFrame): Map[String, Long] =
    vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Score expression: total vocabulary frequency mass of `textCol`'s
    * tokens (OOV tokens contribute 0). Exact long arithmetic.
    */
  def massExpr(text: Column, vocab: Map[String, Long]): Column = {
    require(vocab.nonEmpty, "empty vocabulary")
    val m = typedLit(vocab)
    aggregate(TextFunctions.tokens(text), lit(0L),
      (acc, t) => acc + coalesce(element_at(m, t), lit(0L)))
  }

  /** Adds `common_u` (frequency mass) and `n_tokens` to `docs` —
    * consumers threshold `common_u / n_tokens` against the corpus
    * mean.
    */
  def scoreWith(
      docs: DataFrame, textCol: String, vocab: Map[String, Long]): DataFrame =
    docs
      .withColumn("common_u", massExpr(col(textCol), vocab))
      .withColumn("n_tokens",
        TextFunctions.tokenCount(col(textCol)).cast("long"))
}
