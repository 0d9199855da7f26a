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

  test("SimHash64Expr equals the explode + 64-SUM aggregate " +
      "formulation bit-for-bit (incl. empty and repeated-token docs), " +
      "and registers for SQL") {
    import spark.implicits._
    import graft.functions.SimHash64Expr
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, ""), // trim+split yields [""] — one empty-string token
      (3L, "a a a b"), // repeats vote multiple times
      (4L, "  spaced   out   tokens  "),
      (5L, "Unicode café über straße 😀"))
      .toDF("id", "text")
    val toksOf = split(trim(lower(col("text"))), "\\s+")
    val viaExpr = docs
      .select(col("id"), SimHash64Expr.simhash64(toksOf).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the ORIGINAL pipeline, inlined
    val toks = docs
      .select(col("id"), explode(toksOf).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val voteCols = (0 until 64).map(i =>
      sum(when(col("h").bitwiseAND(shiftleft(lit(1L), i)) =!= 0, 1)
        .otherwise(-1)).as(s"v$i"))
    val votes = toks.groupBy(col("id")).agg(voteCols.head, voteCols.tail: _*)
    val sig = (0 until 64)
      .map(i => when(col(s"v$i") > 0, shiftleft(lit(1L), i))
        .otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    val viaAgg = votes.select(col("id"), sig.as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaAgg,
      s"signatures diverged:\n expr=$viaExpr\n agg =$viaAgg")
    SimHash64Expr.register(spark)
    val viaSql = docs.createOrReplaceTempView("simhash_docs")
    val sqlSigs = spark.sql(
      "SELECT id, graft_simhash64(split(trim(lower(text)), '\\\\s+')) " +
        "FROM simhash_docs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sqlSigs == viaExpr)
  }

  test("MinHashSigsExpr equals the explode + MIN-aggregate formulation " +
      "bit-for-bit, and a no-shingle doc yields NULL (absent), not a " +
      "signature") {
    import spark.implicits._
    import graft.functions.MinHashSigsExpr
    val n = 16
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "xyz"), // shorter than the shingle size -> no shingles
      (3L, "repetition repetition repetition repetition"),
      (4L, "unicode café über straße and some more text here"))
      .toDF("id", "text")
    val shingles = TextFunctions.charShingles(col("text"), 8)
    val viaExpr = docs.select(col("id"),
        MinHashSigsExpr.minhashSigs(shingles, n).as("sig"))
      .where(col("sig").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // the ORIGINAL pipeline, inlined
    val sh = docs.select(col("id"),
      explode(array_distinct(transform(shingles, s => xxhash64(s))))
        .as("shingle"))
    val aggs = (0 until n).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    val viaAgg = sh.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to n).map(r.getLong(_)).toSeq).toMap
    assert(viaExpr == viaAgg,
      s"signatures diverged:\n expr=$viaExpr\n agg =$viaAgg")
    assert(!viaExpr.contains(2L), "no-shingle doc must be absent")
    // the FUSED text form (byte-walking shingle windows) agrees too —
    // multibyte characters land on correct boundaries by construction
    val viaFused = docs.select(col("id"),
        MinHashSigsExpr.minhashOfText(col("text"), 8, n).as("sig"))
      .where(col("sig").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaFused == viaAgg,
      s"fused text form diverged:\n fused=$viaFused\n agg =$viaAgg")
  }
}
