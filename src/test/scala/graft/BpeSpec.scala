package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def learn(texts: Seq[String], n: Int): Seq[(Int, String, String, Long)] =
    Bpe.learnMerges(texts.toDF("text"), "text", n)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)

  test("most frequent pair merges first; recount sees the merged token") {
    // "the cat" ×3 beats everything; after merging, ("the cat", "sat")
    // appears twice and wins round 2 — proving the recount runs on the
    // MERGED corpus, not the original
    val texts = Seq(
      "the cat sat",
      "the cat sat",
      "the cat ran",
      "dog ran far")
    val got = learn(texts, 2)
    assert(got(0) == ((1, "the", "cat", 3L)))
    assert(got(1) == ((2, "the cat", "sat", 2L)))
  }

  test("count ties break lexicographically on (a, b)") {
    // every adjacent pair occurs exactly once → pure tie; ("a b") is
    // the lexicographically smallest pair
    val texts = Seq("c d", "a b", "b c")
    val got = learn(texts, 1)
    assert(got == Seq((1, "a", "b", 1L)))
  }

  test("greedy left-to-right merge: 'a a a' yields one merge, and the " +
      "merged-pair count matches what replace() can actually apply") {
    // zip counting sees (a,a) twice in "a a a" but greedy replace merges
    // only the first occurrence — round 2's recount must then see
    // ("a a", "a") once, NOT ("a", "a") again at full strength
    val texts = Seq("a a a")
    val got = learn(texts, 2)
    assert(got(0) == ((1, "a", "a", 2L)))
    assert(got(1) == ((2, "a a", "a", 1L)))
  }

  test("whitespace normalization: runs of whitespace and case fold away") {
    val got = learn(Seq("The\t Cat", "the  cat"), 1)
    assert(got == Seq((1, "the", "cat", 2L)))
  }

  test("merge application cannot fire across a merged token's boundary") {
    // corpus state after some round merged ("the","cat"): the doc holds
    // tokens ["the·cat", "sat"] (· = the joiner char). Applying winner
    // ("cat","sat") must NOT match inside the merged token — the
    // space-joined encoding had exactly this hole (pattern " cat  sat "
    // matched starting at "the cat"'s internal space, three-way merging
    // a pair that never won)
    val enc = Seq(s" the${Bpe.Joiner}cat  sat ").toDF("__enc")
    val top = Seq(("cat", "sat", 1L)).toDF("a", "b", "n")
    val out = Bpe.applyMerge(enc, "__enc", top).as[String].head()
    assert(out == s" the${Bpe.Joiner}cat  sat ")
  }

  test("end-to-end: a standalone pair's merge leaves merged-token " +
      "contexts intact for later rounds") {
    // round 1: ("aa","cat") n=6. round 2: ("cat","sat") n=4 — applies
    // ONLY to the standalone "cat sat" docs, not inside "aa·cat  sat".
    // round 3 then still sees the ("aa cat","sat") pair; under the old
    // boundary bug that doc had collapsed to one token and round 3
    // would find a different winner
    val texts = Seq.fill(5)("aa cat") ++ Seq("aa cat sat") ++
      Seq.fill(4)("cat sat")
    val got = learn(texts, 3)
    assert(got == Seq(
      (1, "aa", "cat", 6L),
      (2, "cat", "sat", 4L),
      (3, "aa cat", "sat", 1L)))
  }

  test("nMerges must be positive") {
    intercept[IllegalArgumentException] {
      Bpe.learnMerges(Seq("x y").toDF("text"), "text", 0)
    }
  }

  test("applyMerges replays the learned vocabulary in step order: " +
      "multi-part tokens chain and later docs encode identically") {
    val train = Seq(
      "the cat sat", "the cat sat", "the cat ran", "dog ran far")
      .toDF("text")
    val merges = Bpe.learnMerges(train, "text", 2)
    // ("the","cat") then ("the cat","sat") — applying to NEW text must
    // replay both, producing the 3-part token on matching docs
    val fresh = Seq((1L, "the cat sat here"), (2L, "the dog sat"))
      .toDF("id", "text")
    val out = Bpe.applyMerges(fresh, "text", merges)
      .select("id", "bpe_tokens").orderBy("id")
      .as[(Long, Seq[String])].collect().toSeq
    assert(out == Seq(
      (1L, Seq("the cat sat", "here")), // both merges chained
      (2L, Seq("the", "dog", "sat")))) // no partial merge fires
    // and application agrees with the training loop's own corpus state:
    // token counts on the training corpus itself
    val counts = Bpe.applyMerges(train, "text", merges)
      .select(org.apache.spark.sql.functions.size($"bpe_tokens"))
      .as[Int].collect().toSeq
    assert(counts == Seq(1, 1, 2, 3))
  }
}
