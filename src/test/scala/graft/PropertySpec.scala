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

  // -----------------------------------------------------------------
  // Data-skipping stats layer (sinks/CowTable.scala): the invariants
  // every pruning decision rests on. A violation here silently DROPS
  // ROWS at scale — the highest-consequence pure logic in the repo
  // (round 10's overlap-guard bug was exactly a violation of the
  // fold-returns-an-element property, via lexicographic ordering).
  // -----------------------------------------------------------------

  import org.apache.spark.sql.types._
  import graft.sinks.{CowFile, CowTable}

  test("foldStat: returns an ELEMENT of its input, is permutation-" +
      "invariant, orders numerically for numeric types, and goes " +
      "unknown (None) the moment any file's stat is unknown") {
    val longs: Gen[List[Long]] = Gen.nonEmptyListOf(
      Gen.chooseNum(-1000000L, 1000000L))
    for (vs <- samples(longs, 120)) {
      val side = vs.map(v => Option(v.toString))
      val lo = CowTable.foldStat(LongType, side, takeMax = false)
      val hi = CowTable.foldStat(LongType, side, takeMax = true)
      assert(lo == Some(vs.min.toString) && hi == Some(vs.max.toString),
        s"numeric fold wrong for $vs: lo=$lo hi=$hi")
      // permutation invariance (the merge-order property)
      val shuffled = scala.util.Random.shuffle(side)
      assert(CowTable.foldStat(LongType, shuffled, takeMax = true) == hi)
      // one unknown stat poisons the bound — never a guess
      assert(CowTable.foldStat(LongType, None +: side, takeMax = true)
        .isEmpty)
    }
    // NaN in a double column: incomparable → unknown, not an answer
    assert(CowTable.foldStat(DoubleType,
      Seq(Some("1.5"), Some("NaN"), Some("2.5")), takeMax = true).isEmpty)
  }

  test("mayMatch never false-skips: any value inside a file's envelope " +
      "and the probe range keeps the file (numeric and string forms)") {
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("s", StringType)))
    val cases: Gen[(List[Long], Long, Long)] = for {
      vs <- Gen.nonEmptyListOf(Gen.chooseNum(-999L, 9999L))
      a <- Gen.chooseNum(-999L, 9999L)
      b <- Gen.chooseNum(-999L, 9999L)
    } yield (vs, math.min(a, b), math.max(a, b))
    for ((vs, lo, hi) <- samples(cases, 150)) {
      val f = CowFile("p", Map.empty, vs.size.toLong, 1L,
        mins = Map("k" -> vs.min.toString, "s" -> vs.map(_.toString).min),
        maxs = Map("k" -> vs.max.toString, "s" -> vs.map(_.toString).max))
      val hit = vs.exists(v => v >= lo && v <= hi)
      val kept = CowTable.mayMatch(schema, f, "k",
        Some(lo.toString), Some(hi.toString))
      // soundness: a file holding a qualifying value MUST be kept.
      // (keeping a non-qualifying file is allowed — skipping is only
      // an optimization — so no assertion the other way.)
      if (hit) assert(kept,
        s"false skip: vs=$vs range=[$lo,$hi] — rows would be DROPPED")
      // a stat-less file is always kept
      assert(CowTable.mayMatch(schema, f.copy(mins = Map.empty,
        maxs = Map.empty), "k", Some(lo.toString), Some(hi.toString)))
    }
    // string form: UTF-8 byte order, where lexicographic-on-chars and
    // numeric intuition both fail ("10" < "9" as strings)
    val sf = CowFile("p", Map.empty, 2L, 1L,
      mins = Map("s" -> "10"), maxs = Map("s" -> "9"))
    assert(CowTable.mayMatch(schema, sf, "s", Some("5"), Some("50")),
      "string envelope must compare as strings, not numbers")
  }

  test("fuzzy join: deletion-neighborhood blocking equals brute force " +
      "for random short words at k=1 and k=2 (dense near-collisions)") {
    import org.apache.spark.sql.functions.{col, levenshtein}
    // tiny alphabet + short words ⇒ many true near-pairs per sample
    val wordGen = Gen.listOfN(10,
      Gen.choose(0, 5).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
    for ((words, k) <- samples(wordGen, 6).zip(
        Iterator.continually(Seq(1, 2)).flatten)) {
      val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("id", "w")
      val got = graft.operators.FuzzyJoin
        .editDistancePairs(df, "id", "w", maxDist = k)
        .select("id_a", "id_b", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val a = df.select(col("id").as("ia"), col("w").as("wa"))
      val b = df.select(col("id").as("ib"), col("w").as("wb"))
      val want = a.crossJoin(b).where(col("ia") < col("ib"))
        .withColumn("d", levenshtein(col("wa"), col("wb")))
        .where(col("d") <= k)
        .select("ia", "ib", "d").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == want, s"words=$words k=$k")
    }
  }

  test("join view: random alternating mutation rounds keep the " +
      "maintained view equal to the recomputed join") {
    import graft.operators.{Cdc, JoinMv}
    val mutGen = Gen.listOfN(6, Gen.zip(
      Gen.chooseNum(1L, 8L), Gen.chooseNum(-5L, 100L)))
    val allMuts = samples(mutGen, 12)
    for (i <- 0 until 4) {
      var a = (1L to 5L).map(k => (k, k * 10)).toDF("k", "av")
      var b = (2L to 8L).map(k => (k, k + 100)).toDF("k", "bv")
      var mv = JoinMv.init(a, b, Seq("k"))
      for (round <- 0 until 3) {
        val muts = allMuts(i * 3 + round)
          .groupBy(_._1).map(_._2.head).toSeq // unique keys per batch
        if (round % 2 == 0) {
          // mutate A: value < 0 deletes the key, else upsert
          val aNew = (a.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
            -- muts.filter(_._2 < 0).map(_._1)
            ++ muts.filter(_._2 >= 0)).toSeq.toDF("k", "av")
          val d = Cdc.changelogSigned(a, aNew, Seq("k"))
          mv = JoinMv.applyDelta(mv, d, b, Seq("k"), deltaIsLeft = true)
          a = aNew
        } else {
          val bNew = (b.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
            -- muts.filter(_._2 < 0).map(_._1)
            ++ muts.filter(_._2 >= 0)).toSeq.toDF("k", "bv")
          val d = Cdc.changelogSigned(b, bNew, Seq("k"))
          mv = JoinMv.applyDelta(mv, d, a, Seq("k"), deltaIsLeft = false)
          b = bNew
        }
      }
      val expect = JoinMv.init(a, b, Seq("k"))
      assert(mv.exceptAll(expect).isEmpty && expect.exceptAll(mv).isEmpty,
        s"sample $i: maintained view diverged")
    }
  }

  test("multi-clause MERGE matches a row-by-row reference interpreter " +
      "for random data and thresholds") {
    import graft.operators._
    val rowsGen = Gen.listOfN(8, Gen.zip(
      Gen.chooseNum(1L, 10L), Gen.chooseNum(-50L, 50L)))
    for ((tRows0, (sRows0, (t1, t2))) <- samples(rowsGen, 5).zip(
        samples(Gen.zip(rowsGen,
          Gen.zip(Gen.chooseNum(-20L, 20L), Gen.chooseNum(-20L, 20L))), 5))) {
      val tRows = tRows0.groupBy(_._1).map(_._2.head).toSeq.sortBy(_._1)
      val sRows = sRows0.groupBy(_._1).map(_._2.head).toSeq.sortBy(_._1)
      val target = tRows.toDF("k", "v")
      val source = sRows.toDF("k", "v")
      val out = MergeInto(target, source, Seq("k"), Seq(
        MatchedDelete(condition = Some(s"s.v < $t1")),
        MatchedUpdate(Map("v" -> "t.v + s.v")),
        NotMatchedInsert(condition = Some(s"s.v >= $t2")),
        NotMatchedBySourceUpdate(Map("v" -> "t.v - 1"),
          condition = Some(s"t.v < $t1"))))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // reference interpreter
      val sMap = sRows.toMap
      val tKeys = tRows.map(_._1).toSet
      val fromTarget = tRows.flatMap { case (k, tv) =>
        sMap.get(k) match {
          case Some(sv) if sv < t1 => None // matched delete
          case Some(sv) => Some(k -> (tv + sv)) // matched update
          case None if tv < t1 => Some(k -> (tv - 1)) // by-source update
          case None => Some(k -> tv)
        }
      }
      val inserted = sRows.collect {
        case (k, sv) if !tKeys.contains(k) && sv >= t2 => k -> sv
      }
      val want = (fromTarget ++ inserted).toSet
      assert(out == want,
        s"t=$tRows s=$sRows t1=$t1 t2=$t2\n got=$out\nwant=$want")
    }
  }
}
