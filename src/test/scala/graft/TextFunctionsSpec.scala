package graft

import org.apache.spark.sql.functions._
import graft.functions.{FingerprintExpr, TextFunctions}
import graft.operators.Normalize

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("t")

  test("tokenCount: empty, blank, and multi-space strings") {
    val df = Seq("", "   ", "a b", " a  b\tc ").toDF("t")
      .select(TextFunctions.tokenCount(col("t")).as("n"))
    assert(df.as[Int].collect().toSeq == Seq(0, 0, 2, 3))
  }

  test("bpeish token count splits words and punctuation") {
    val n = one("don't stop, world!")
      .select(TextFunctions.bpeishTokenCount(col("t"))).head().getInt(0)
    // don / ' / t / stop / , / world / !
    assert(n == 7)
  }

  test("charShingles produces len-n+1 shingles; short text → empty") {
    val s = one("abcdef")
      .select(TextFunctions.charShingles(col("t"), 4)).head().getSeq[String](0)
    assert(s == Seq("abcd", "bcde", "cdef"))
    val empty = one("abc")
      .select(TextFunctions.charShingles(col("t"), 4)).head().getSeq[String](0)
    assert(empty.isEmpty)
  }

  test("wordShingles joins n-token windows") {
    val s = one("a b c d")
      .select(TextFunctions.wordShingles(col("t"), 2)).head().getSeq[String](0)
    assert(s == Seq("a b", "b c", "c d"))
  }

  test("langId picks the language with most marker hits") {
    val preds = Seq(
      "the cat and the dog is of to",
      "le chat et les chiens des la",
      "der hund und die katze ist das",
      "el gato los perros las casas es")
      .toDF("t").select(TextFunctions.langId(col("t")))
      .as[String].collect().toSeq
    assert(preds == Seq("en", "fr", "de", "es"))
  }

  test("fingerprint Expression matches the shared JVM implementation") {
    val s = "hello world"
    val got = one(s).select(FingerprintExpr.fingerprint(col("t")))
      .head().getLong(0)
    assert(got == FingerprintExpr.hash(s))
    // and the SQL registration path
    FingerprintExpr.register(spark)
    one(s).createOrReplaceTempView("fp_in")
    val viaSql = spark.sql("SELECT graft_fingerprint(t) FROM fp_in")
      .head().getLong(0)
    assert(viaSql == got)
  }

  test("fingerprint is order-sensitive and stable") {
    assert(FingerprintExpr.hash("ab") != FingerprintExpr.hash("ba"))
    assert(FingerprintExpr.hash("") == 7L)
  }

  test("Normalize.trimAll strips CR/LF/tabs from every string column") {
    val df = Seq(("  a\r\n", 1), ("\tb ", 2)).toDF("s", "i")
    val out = Normalize.trimAll(df).as[(String, Int)].collect().toSet
    assert(out == Set(("a", 1), ("b", 2)))
  }

  test("fuzzyKey collapses case and internal spaces") {
    val k = one("  Prompt  Small ")
      .select(Normalize.fuzzyKey(col("t"))).head().getString(0)
    assert(k == "promptsmall")
  }

  test("quality score is bounded in [0,1]") {
    val docs = Tables.load(spark, sfDir, "documents")
    val bad = docs.select(TextFunctions.qualityScore(col("text")).as("q"))
      .where(col("q") < 0 || col("q") > 1)
    assert(bad.count() == 0)
  }

  test("chunkTokens: windows tile with overlap, short docs give one " +
      "chunk, empty docs none, chunks reassemble the document") {
    import spark.implicits._
    def chunks(s: String, max: Int, ov: Int): Seq[String] =
      Seq(s).toDF("t")
        .select(TextFunctions.chunkTokens(col("t"), max, ov).as("c"))
        .as[Seq[String]].head()
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    assert(chunks(ten, 4, 1) == Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    // non-dividing tail: last chunk short
    assert(chunks(ten, 4, 0) == Seq(
      "w1 w2 w3 w4", "w5 w6 w7 w8", "w9 w10"))
    assert(chunks("a b", 40, 8) == Seq("a b"))
    assert(chunks("", 40, 8).isEmpty)
    assert(chunks("  \n\t ", 40, 8).isEmpty)
    // overlap-stripped concatenation reassembles the original
    val got = chunks(ten, 4, 1)
    val reassembled = (got.head +:
      got.tail.map(_.split(" ").drop(1).mkString(" "))).mkString(" ")
    assert(reassembled == ten)
    intercept[IllegalArgumentException] {
      TextFunctions.chunkTokens(col("t"), 4, 4)
    }
  }

  test("repetition metrics: clean text scores low, repeated text high, " +
      "degenerate inputs are 0") {
    import spark.implicits._
    def m(s: String): (Double, Double) =
      Seq(s).toDF("t").select(
        TextFunctions.dupNgramFraction(col("t"), 3).as("d3"),
        TextFunctions.topTokenFraction(col("t")).as("tf"))
        .as[(Double, Double)].head()
    val (d3clean, tfClean) = m("one two three four five six seven eight")
    assert(d3clean == 0.0 && tfClean == 0.125)
    val (d3rep, tfRep) = m("spam spam spam spam spam spam")
    assert(d3rep == 0.75 && tfRep == 1.0) // 4 trigrams, 1 distinct
    assert(m("") == ((0.0, 0.0)))
    assert(m("a b") == ((0.0, 0.5))) // too short for any trigram
  }
}
