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

  // random key-value table states over a SMALL key space (collisions
  // guaranteed, so every diff has genuine I/U/D mix) with nullable
  // values (exercises null-safe change detection)
  private val stateGen: Gen[List[(Long, Option[String])]] =
    Gen.listOfN(8,
      Gen.zip(Gen.chooseNum(1L, 6L),
        Gen.option(Gen.oneOf("x", "y", "z"))))
      .map(_.distinctBy(_._1)) // one row per key: a valid table state

  test("changelog round-trip: apply(before, changelog(before, after)) " +
      "== after, for random states with NULL values") {
    import graft.operators.Cdc
    val pairs = samples(stateGen, 12).zip(samples(stateGen, 12).reverse)
    for ((b, a) <- pairs) {
      val before = b.toDF("id", "v")
      val after = a.toDF("id", "v")
      val tripped = Cdc
        .apply(before, Cdc.changelog(before, after, Seq("id")), Seq("id"))
        .as[(Long, Option[String])].collect().toSet
      assert(tripped == a.toSet, s"before=$b after=$a got=$tripped")
      // and the signed changelog retracts sums exactly: weighted count
      // of the normalized log equals the cardinality delta
      val log = Cdc.changelogSigned(before, after, Seq("id"))
        .as[(Long, Option[String], String)].collect()
      val delta = log.map(r => if (r._3 == "D") -1 else 1).sum
      assert(delta == a.size - b.size, s"before=$b after=$a log=${log.toSeq}")
    }
  }

  test("scd2 then scd2Cdc deletes: every surviving chain tiles without " +
      "overlap and has at most one open version, for random batches") {
    import graft.operators.Merge
    val effs = Seq(100L, 200L, 300L)
    for ((b0, b1) <- samples(stateGen, 6).zip(samples(stateGen, 6).reverse)) {
      val target = b0.toDF("id", "v")
        .withColumn("effective_from", org.apache.spark.sql.functions.lit(100L))
        .withColumn("effective_to",
          org.apache.spark.sql.functions.lit(null).cast("long"))
        .withColumn("is_current", org.apache.spark.sql.functions.lit(true))
      // batch: every key of b1 updated @200, every ODD key deleted @300
      val batch = b1.map { case (k, v) => (k, v, 200L, "U") } ++
        b1.collect { case (k, _) if k % 2 == 1 => (k, None, 300L, "D") }
      val out = Merge.scd2Cdc(target, batch.toDF("id", "v", "eff", "oper"),
        Seq("id"), "eff")
      val rows = out
        .select("id", "effective_from", "effective_to", "is_current")
        .as[(Long, Long, Option[Long], Boolean)].collect()
      // at most one open per key
      assert(rows.filter(_._4).groupBy(_._1).forall(_._2.length == 1))
      // intervals within a key never overlap (sorted froms strictly
      // increase and each close is <= successor's open)
      rows.groupBy(_._1).values.foreach { vs =>
        val sorted = vs.sortBy(_._2)
        sorted.sliding(2).foreach {
          case Array(x, y) =>
            assert(x._3.exists(_ <= y._2),
              s"overlap: $x then $y (batch=$batch)")
          case _ => ()
        }
      }
    }
  }

  test("scd2Restate: fixed point on every scd2Cdc-built history, and " +
      "idempotent under repeated application of the same corrections, " +
      "for random states") {
    import graft.operators.Merge
    import org.apache.spark.sql.functions.lit
    def tiles(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "v", "effective_from", "effective_to", "is_current")
      .as[(Long, Option[String], Long, Option[Long], Boolean)]
      .collect().toSet
    val noCorr = Seq.empty[(Long, Option[String], Long, String)]
      .toDF("id", "v", "eff", "oper")
    for ((b0, b1) <- samples(stateGen, 6).zip(samples(stateGen, 6).reverse)) {
      val target = b0.toDF("id", "v")
        .withColumn("effective_from", lit(100L))
        .withColumn("effective_to", lit(null).cast("long"))
        .withColumn("is_current", lit(true))
      val batch = b1.map { case (k, v) => (k, v, 200L, "U") } ++
        b1.collect { case (k, _) if k % 2 == 1 => (k, None, 300L, "D") }
      val h = Merge.scd2Cdc(target, batch.toDF("id", "v", "eff", "oper"),
        Seq("id"), "eff")
      // fixed point: decompile → retile reproduces the table exactly
      assert(tiles(Merge.scd2Restate(h, noCorr, Seq("id"), "eff"))
        == tiles(h), s"not a fixed point for batch=$batch")
      // idempotence under a LATE correction (behind the 300 frontier
      // for deleted keys — the case the incremental path drops)
      val corr = b1.collect { case (k, _) if k % 2 == 1 =>
        (k, Option("late"), 250L, "U") }
      if (corr.nonEmpty) {
        val once = Merge.scd2Restate(h,
          corr.toDF("id", "v", "eff", "oper"), Seq("id"), "eff")
        val twice = Merge.scd2Restate(once,
          corr.toDF("id", "v", "eff", "oper"), Seq("id"), "eff")
        assert(tiles(once) == tiles(twice),
          s"not idempotent for batch=$batch corr=$corr")
      }
    }
  }
}
