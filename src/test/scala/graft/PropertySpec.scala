package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.FingerprintExpr
import graft.operators.{KeyMapUpsert, SqlRunner}

/** Property-based invariants (SURVEY §5.3) — raw ScalaCheck generators
  * sampled with a fixed seed (scalatest's forAll bridge isn't in the
  * offline dependency set).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val keyGen: Gen[List[String]] =
    Gen.listOfN(12, Gen.oneOf(Gen.alphaNumStr.suchThat(_.nonEmpty),
      Gen.oneOf("a", "A", "b", "k1", "k2")))

  test("keymap: surrogate keys are dense, unique, strictly above prior max") {
    for ((keys, maxK) <- samples(keyGen, 8).zip(samples(Gen.chooseNum(0L, 50L), 8))) {
      val tgt = Seq(("existing", maxK)).toDF("nk", "sk")
      val fresh = KeyMapUpsert
        .newKeys(keys.toDF("nk"), tgt, "nk", "sk")
        .select("sk").as[Long].collect().sorted.toSeq
      val expectN = keys.map(_.toLowerCase).distinct.count(_ != "existing")
      assert(fresh == (maxK + 1 to maxK + expectN),
        s"keys=$keys maxK=$maxK fresh=$fresh")
    }
  }

  test("keymap: union of target and fresh keys never collides") {
    for (keys <- samples(keyGen, 8)) {
      val tgt = Seq(("a", 1L), ("b", 2L)).toDF("nk", "sk")
      val out = KeyMapUpsert.upsert(keys.toDF("nk"), tgt, "nk", "sk")
      assert(out.select("sk").distinct().count() == out.count(), s"keys=$keys")
    }
  }

  test("fingerprint: stays within [0, 2^31-1) and is deterministic") {
    for (s <- samples(Gen.asciiPrintableStr, 200)) {
      val h = FingerprintExpr.hash(s)
      assert(h >= 0 && h < FingerprintExpr.Mod, s"input=$s")
      assert(h == FingerprintExpr.hash(s))
    }
  }

  test("SqlRunner substitution is exact and idempotent") {
    for ((k, v) <- samples(Gen.identifier, 50).zip(samples(Gen.identifier, 50))) {
      val once = SqlRunner.substitute(s"SELECT '{$k}'", Map(k -> v))
      assert(once == s"SELECT '$v'")
      assert(SqlRunner.substitute(once, Map(k -> v)) == once)
    }
  }
}
