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
}
