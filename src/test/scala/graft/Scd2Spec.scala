package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Merge

/** SCD-2 history-tracking merge: close-and-insert on change, interval
  * tiling, no-change suppression, replay idempotence.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  // (key, name, segment, effective_from, effective_to, is_current)
  private type Row6 = (Long, String, String, Long, Option[Long], Boolean)

  private def dim = Seq(
    (1L, "alpha", "NA", 100L, Option.empty[Long], true),
    (2L, "beta", "EU", 100L, Option.empty[Long], true),
    (3L, "gamma", "APAC", 100L, Option.empty[Long], true))
    .toDF("id", "name", "seg", "effective_from", "effective_to", "is_current")

  private def rows(df: DataFrame): Seq[Row6] =
    df.orderBy("id", "effective_from").as[Row6].collect().toSeq

  private def batch(rs: (Long, String, String, Long)*): DataFrame =
    rs.toDF("id", "name", "seg", "eff")

  test("close-and-insert on change; untouched and inserted keys behave") {
    val out = Merge.scd2(dim,
      batch((2L, "beta2", "EU", 200L), (9L, "iota", "NA", 200L)),
      Seq("id"), "eff")
    assert(rows(out) == Seq(
      (1L, "alpha", "NA", 100L, None, true),
      (2L, "beta", "EU", 100L, Some(200L), false), // closed at successor
      (2L, "beta2", "EU", 200L, None, true),
      (3L, "gamma", "APAC", 100L, None, true),
      (9L, "iota", "NA", 200L, None, true))) // brand-new key opens
  }

  test("no-change suppression: a re-extracted identical row creates no " +
      "version") {
    val out = Merge.scd2(dim, batch((2L, "beta", "EU", 200L)), Seq("id"), "eff")
    assert(rows(out) == rows(dim))
  }

  test("re-applying the same batch is a no-op (idempotent replay)") {
    val b = batch((2L, "beta2", "EU", 200L), (9L, "iota", "NA", 200L))
    val once = Merge.scd2(dim, b, Seq("id"), "eff")
    val twice = Merge.scd2(once, b, Seq("id"), "eff")
    assert(rows(twice) == rows(once))
  }

  test("two batches tile: effective_to equals the successor's " +
      "effective_from, exactly one open version per key, closed history " +
      "survives verbatim") {
    val s1 = Merge.scd2(dim, batch((2L, "beta2", "EU", 200L)), Seq("id"), "eff")
    val s2 = Merge.scd2(s1, batch((2L, "beta3", "LATAM", 300L)), Seq("id"), "eff")
    assert(rows(s2.where($"id" === 2L)) == Seq(
      (2L, "beta", "EU", 100L, Some(200L), false),
      (2L, "beta2", "EU", 200L, Some(300L), false),
      (2L, "beta3", "LATAM", 300L, None, true)))
    // invariants over the whole table: one open version per key; every
    // closed version's end = its successor's start (no gaps/overlaps)
    val opens = s2.groupBy("id").agg(sum(when($"is_current", 1).otherwise(0)))
      .as[(Long, Long)].collect()
    assert(opens.forall(_._2 == 1L), s"open-version counts: ${opens.toSeq}")
    val gaps = s2.as("a").join(s2.as("b"),
        $"a.id" === $"b.id" && $"a.effective_to" === $"b.effective_from",
        "left_anti")
      .where($"a.effective_to".isNotNull).count()
    assert(gaps == 0, "a closed interval has no successor starting at its end")
  }

  test("two versions of one key in a single batch both apply, in eff order") {
    val out = Merge.scd2(dim,
      batch((2L, "beta2", "EU", 200L), (2L, "beta3", "EU", 300L)),
      Seq("id"), "eff")
    assert(rows(out.where($"id" === 2L)) == Seq(
      (2L, "beta", "EU", 100L, Some(200L), false),
      (2L, "beta2", "EU", 200L, Some(300L), false),
      (2L, "beta3", "EU", 300L, None, true)))
  }

  test("duplicate (key, eff) rows collapse deterministically; an update " +
      "sharing the open version's effective_from is ignored") {
    val out = Merge.scd2(dim,
      batch((2L, "dup-b", "EU", 200L), (2L, "dup-a", "EU", 200L), // tie
        (3L, "backdated", "APAC", 100L)), // same from as open version
      Seq("id"), "eff")
    assert(rows(out.where($"id" === 2L)) == Seq(
      (2L, "beta", "EU", 100L, Some(200L), false),
      (2L, "dup-a", "EU", 200L, None, true))) // lexicographic tiebreak
    assert(rows(out.where($"id" === 3L)) == Seq(
      (3L, "gamma", "APAC", 100L, None, true)))
  }

  test("late updates older than the open version are dropped") {
    val out = Merge.scd2(dim, batch((2L, "ancient", "EU", 50L)), Seq("id"), "eff")
    assert(rows(out) == rows(dim))
  }

  test("NULL-keyed rows route around the windows: target rows survive, " +
      "updates insert as standalone open versions") {
    val t = dim.unionByName(Seq(
      (Option.empty[Long], "nk-old", "NA", 100L, Option.empty[Long], true))
      .toDF("id", "name", "seg", "effective_from", "effective_to", "is_current"))
    val b = Seq((Option.empty[Long], "nk-new1", "EU", 200L),
      (Option.empty[Long], "nk-new2", "EU", 200L))
      .toDF("id", "name", "seg", "eff")
    val out = Merge.scd2(t, b, Seq("id"), "eff")
    val nulls = out.where($"id".isNull)
      .as[(Option[Long], String, String, Long, Option[Long], Boolean)]
      .collect().toSet
    assert(nulls == Set(
      (None, "nk-old", "NA", 100L, None, true),
      (None, "nk-new1", "EU", 200L, None, true),
      (None, "nk-new2", "EU", 200L, None, true)))
  }

  test("NULL data columns compare null-safely in change detection") {
    val t = Seq((1L, Option.empty[String], "NA", 100L, Option.empty[Long], true))
      .toDF("id", "name", "seg", "effective_from", "effective_to", "is_current")
    // same NULL name → suppressed; a real value → new version
    val same = Seq((1L, Option.empty[String], "NA", 200L)).toDF("id", "name", "seg", "eff")
    assert(Merge.scd2(t, same, Seq("id"), "eff").count() == 1)
    val diff = Seq((1L, Option("named"), "NA", 200L)).toDF("id", "name", "seg", "eff")
    assert(Merge.scd2(t, diff, Seq("id"), "eff").count() == 2)
  }

  test("one shuffle for the open∪delta chain — closed history never " +
      "exchanges") {
    val s1 = Merge.scd2(dim, batch((2L, "beta2", "EU", 200L)), Seq("id"), "eff")
    val plan = s1.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("point-in-time lookup joins each fact to the version effective " +
      "at the fact's own time; never fans out") {
    val s1 = Merge.scd2(dim, batch((2L, "beta2", "EU", 200L)), Seq("id"), "eff")
    val s2 = Merge.scd2(s1, batch((2L, "beta3", "LATAM", 300L)), Seq("id"), "eff")
    val facts = Seq(
      (10L, 2L, 150L), // v0 era → beta
      (11L, 2L, 200L), // boundary: effective_from inclusive → beta2
      (12L, 2L, 299L), // still beta2
      (13L, 2L, 999L), // open version → beta3
      (14L, 2L, 50L), // before first version → NULL
      (15L, 9L, 200L)) // unknown key → NULL
      .toDF("fid", "id", "ts")
    val out = Merge.scd2Lookup(facts, s2.drop("is_current"), Seq("id"), "ts")
      .select("fid", "name").orderBy("fid")
      .as[(Long, Option[String])].collect().toSeq
    assert(out == Seq(
      (10L, Some("beta")), (11L, Some("beta2")), (12L, Some("beta2")),
      (13L, Some("beta3")), (14L, None), (15L, None)))
    assert(Merge.scd2Lookup(facts, s2.drop("is_current"), Seq("id"), "ts")
      .count() == facts.count()) // tiling ⇒ no fan-out
  }

  test("scd2Cdc: a D closes the open version, leaves the key with no " +
      "current row, and a later I re-opens as a NEW version across a gap") {
    val b1 = Seq(
      (2L, null, null, 200L, "D"), // delete beta
      (3L, "gamma2", "APAC", 200L, "U")) // ordinary update
      .toDF("id", "name", "seg", "eff", "oper")
    val s1 = Merge.scd2Cdc(dim, b1, Seq("id"), "eff")
    assert(rows(s1.where($"id" === 2L)) == Seq(
      (2L, "beta", "EU", 100L, Some(200L), false))) // closed, none open
    assert(rows(s1.where($"id" === 3L)) == Seq(
      (3L, "gamma", "APAC", 100L, Some(200L), false),
      (3L, "gamma2", "APAC", 200L, None, true)))
    // rebirth with IDENTICAL data is still a new version; the deleted
    // span [200, 300) stays a gap
    val s2 = Merge.scd2Cdc(s1,
      Seq((2L, "beta", "EU", 300L, "I")).toDF("id", "name", "seg", "eff", "oper"),
      Seq("id"), "eff")
    assert(rows(s2.where($"id" === 2L)) == Seq(
      (2L, "beta", "EU", 100L, Some(200L), false),
      (2L, "beta", "EU", 300L, None, true)))
  }

  test("scd2Cdc: D of an unknown/already-deleted key is a no-op; " +
      "consecutive D's collapse; U-then-D in one batch closes the chain") {
    val b = Seq(
      (9L, null, null, 200L, "D"), // unknown key
      (1L, null, null, 200L, "D"), (1L, null, null, 250L, "D"), // double D
      (2L, "beta2", "EU", 200L, "U"), (2L, null, null, 300L, "D"))
      .toDF("id", "name", "seg", "eff", "oper")
    val out = Merge.scd2Cdc(dim, b, Seq("id"), "eff")
    assert(out.where($"id" === 9L).count() == 0)
    assert(rows(out.where($"id" === 1L)) == Seq(
      (1L, "alpha", "NA", 100L, Some(200L), false))) // closed ONCE at 200
    assert(rows(out.where($"id" === 2L)) == Seq(
      (2L, "beta", "EU", 100L, Some(200L), false),
      (2L, "beta2", "EU", 200L, Some(300L), false))) // U applied, then closed
    // at most one open version per key everywhere
    val opens = out.groupBy("id")
      .agg(sum(when($"is_current", 1).otherwise(0)).as("n"))
      .where($"n" > 1).count()
    assert(opens == 0)
  }

  test("scd2Cdc: a late change older than a DELETED key's closed " +
      "frontier is dropped — never inserted overlapping closed history") {
    val s1 = Merge.scd2Cdc(dim,
      Seq((2L, null, null, 200L, "D")).toDF("id", "name", "seg", "eff", "oper"),
      Seq("id"), "eff")
    // key 2 is now only closed history [100, 200); a change at 150
    // must NOT open a version inside that interval
    val s2 = Merge.scd2Cdc(s1,
      Seq((2L, "late", "EU", 150L, "I")).toDF("id", "name", "seg", "eff", "oper"),
      Seq("id"), "eff")
    assert(rows(s2.where($"id" === 2L)) == Seq(
      (2L, "beta", "EU", 100L, Some(200L), false)))
    // while a change AT/after the frontier re-opens cleanly
    val s3 = Merge.scd2Cdc(s1,
      Seq((2L, "ok", "EU", 200L, "I")).toDF("id", "name", "seg", "eff", "oper"),
      Seq("id"), "eff")
    assert(rows(s3.where($"id" === 2L)) == Seq(
      (2L, "beta", "EU", 100L, Some(200L), false),
      (2L, "ok", "EU", 200L, None, true)))
  }

  test("scd2Cdc: NULL oper is an upsert, never a silent delete") {
    val out = Merge.scd2Cdc(dim,
      Seq((2L, "beta2", "EU", 200L, null)).toDF("id", "name", "seg", "eff", "oper"),
      Seq("id"), "eff")
    assert(rows(out.where($"id" === 2L)) == Seq(
      (2L, "beta", "EU", 100L, Some(200L), false),
      (2L, "beta2", "EU", 200L, None, true)))
  }

  test("scd2Cdc: among same-instant changes the DELETE wins (terminal " +
      "state without a sequence number is deleted, not resurrected)") {
    val out = Merge.scd2Cdc(dim,
      Seq((2L, "b2", "EU", 200L, "U"), (2L, null, null, 200L, "D"))
        .toDF("id", "name", "seg", "eff", "oper"),
      Seq("id"), "eff")
    assert(rows(out.where($"id" === 2L)) == Seq(
      (2L, "beta", "EU", 100L, Some(200L), false))) // closed, none open
  }

  test("point-in-time lookup over a deletion gap enriches to NULL — " +
      "facts during the key's non-existence see no dimension row") {
    val s1 = Merge.scd2Cdc(dim,
      Seq((2L, null, null, 200L, "D"), (2L, "reborn", "EU", 300L, "I"))
        .toDF("id", "name", "seg", "eff", "oper"),
      Seq("id"), "eff")
    val facts = Seq((10L, 2L, 150L), (11L, 2L, 250L), (12L, 2L, 350L))
      .toDF("fid", "id", "ts")
    val out = Merge.scd2Lookup(facts, s1.drop("is_current"), Seq("id"), "ts")
      .select("fid", "name").orderBy("fid")
      .as[(Long, Option[String])].collect().toSeq
    assert(out == Seq(
      (10L, Some("beta")), // before deletion: original version
      (11L, None), // inside the gap [200, 300): key did not exist
      (12L, Some("reborn")))) // after rebirth
  }

  test("scd2Cdc rejects merge keys that are SCD bookkeeping columns") {
    intercept[IllegalArgumentException] {
      Merge.scd2Cdc(dim,
        Seq((2L, "x", "EU", 200L, "U")).toDF("id", "name", "seg", "eff", "oper"),
        Seq("effective_from"), "eff")
    }
  }

  test("scd2Cdc replay is a no-op, including for deleted and reborn keys") {
    val b = Seq(
      (1L, null, null, 200L, "D"),
      (2L, null, null, 200L, "D"), (2L, "beta-re", "EU", 300L, "I"))
      .toDF("id", "name", "seg", "eff", "oper")
    val once = Merge.scd2Cdc(dim, b, Seq("id"), "eff")
    val twice = Merge.scd2Cdc(once, b, Seq("id"), "eff")
    assert(rows(twice) == rows(once))
  }

  test("scd2Cdc: null-keyed D deletes nothing; one exchange total") {
    val b = Seq((Option.empty[Long], Option.empty[String], Option.empty[String],
      200L, "D")).toDF("id", "name", "seg", "eff", "oper")
    val t = dim.unionByName(Seq(
      (Option.empty[Long], Option("nk"), Option("NA"), 100L,
        Option.empty[Long], true))
      .toDF("id", "name", "seg", "effective_from", "effective_to", "is_current"))
    val out = Merge.scd2Cdc(t, b, Seq("id"), "eff")
    assert(out.where($"id".isNull).count() == 1) // target null row survives
    val plan = Merge.scd2Cdc(dim,
      Seq((2L, null, null, 200L, "D")).toDF("id", "name", "seg", "eff", "oper"),
      Seq("id"), "eff").queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges")
  }

  test("output keeps the target's column order even with non-leading keys") {
    val t = Seq(("alpha", 1L, 100L, Option.empty[Long], true))
      .toDF("name", "id", "effective_from", "effective_to", "is_current")
    val b = Seq(("alpha2", 1L, 200L)).toDF("name", "id", "eff")
    val out = Merge.scd2(t, b, Seq("id"), "eff")
    assert(out.columns.toSeq ==
      Seq("name", "id", "effective_from", "effective_to", "is_current"))
  }

  // -------------------------------------------------------------------
  // Restatement
  // -------------------------------------------------------------------

  private def cdcBatch(rs: (Long, String, String, Long, String)*): DataFrame =
    rs.toDF("id", "name", "seg", "eff", "oper")

  private def noCorrections: DataFrame = cdcBatch().limit(0)

  test("restate lands a LATE change the incremental merge dropped, " +
      "retiling around it") {
    // key 1: [100,200) then deleted at 200 — closed frontier is 200
    val h = Merge.scd2Cdc(dim, cdcBatch((1L, null, null, 200L, "D")),
      Seq("id"), "eff")
    // incremental path drops the late change entirely
    val lateIncr = Merge.scd2Cdc(h,
      cdcBatch((1L, "alpha-late", "NA", 150L, "U")), Seq("id"), "eff")
    assert(rows(lateIncr.where($"id" === 1L)) == rows(h.where($"id" === 1L)))
    // restatement rebuilds: [100,150) alpha, [150,200) alpha-late, gap
    val restated = Merge.scd2Restate(h,
      cdcBatch((1L, "alpha-late", "NA", 150L, "U")), Seq("id"), "eff")
    assert(rows(restated.where($"id" === 1L)) == Seq(
      (1L, "alpha", "NA", 100L, Some(150L), false),
      (1L, "alpha-late", "NA", 150L, Some(200L), false)))
    // the deletion at 200 survived the rebuild (no open version)
    assert(restated.where($"id" === 1L && $"is_current").count() == 0)
  }

  test("a correction at an EXISTING instant replaces that version's " +
      "data (restatement semantics), leaving the tiling intact") {
    val h = Merge.scd2(dim, batch((2L, "beta2", "EU", 200L)), Seq("id"), "eff")
    val restated = Merge.scd2Restate(h,
      cdcBatch((2L, "beta-corrected", "EU", 100L, "U")), Seq("id"), "eff")
    assert(rows(restated.where($"id" === 2L)) == Seq(
      (2L, "beta-corrected", "EU", 100L, Some(200L), false),
      (2L, "beta2", "EU", 200L, None, true)))
  }

  test("restate with no corrections is a FIXED POINT of a well-formed " +
      "history (deleted keys, rebirth gaps and all); restate∘restate " +
      "with the same corrections is idempotent") {
    // build a gnarly history: update, delete, rebirth
    val h = Merge.scd2Cdc(dim, cdcBatch(
      (1L, "alpha2", "NA", 200L, "U"),
      (2L, null, null, 200L, "D"),
      (2L, "beta-reborn", "EU", 300L, "I"),
      (3L, "gamma2", "APAC", 250L, "U")), Seq("id"), "eff")
    assert(rows(Merge.scd2Restate(h, noCorrections, Seq("id"), "eff"))
      == rows(h))
    val corr = cdcBatch(
      (1L, "alpha-corr", "NA", 150L, "U"),
      (3L, null, null, 400L, "D"))
    val once = Merge.scd2Restate(h, corr, Seq("id"), "eff")
    val twice = Merge.scd2Restate(once, corr, Seq("id"), "eff")
    val thrice = Merge.scd2Restate(twice, noCorrections, Seq("id"), "eff")
    assert(rows(once) == rows(twice))
    assert(rows(twice) == rows(thrice))
  }

  test("restate preserves null-keyed standalone rows and routes " +
      "null-keyed corrections like scdCore") {
    val t = dim.unionByName(Seq(
      (Option.empty[Long], "orphan", "NA", 100L, Option.empty[Long], true))
      .toDF("id", "name", "seg", "effective_from", "effective_to",
        "is_current"))
    val out = Merge.scd2Restate(t,
      cdcBatch((0L, "zero", "NA", 200L, "I"))
        .union(Seq((Option.empty[Long], "null-ins", "EU", 200L, "I"))
          .toDF("id", "name", "seg", "eff", "oper"))
        .union(Seq((Option.empty[Long], null.asInstanceOf[String],
          null.asInstanceOf[String], 300L, "D"))
          .toDF("id", "name", "seg", "eff", "oper")),
      Seq("id"), "eff")
    assert(out.where($"id".isNull).count() == 2) // orphan + inserted; D no-op
    assert(out.where($"id" === 0L).count() == 1)
  }

  test("restate uses two exchanges (decompile + rebuild): the collapse " +
      "and every scdCore window share the key partitioning") {
    val plan = Merge.scd2Restate(dim,
      cdcBatch((1L, "x", "NA", 150L, "U")), Seq("id"), "eff")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges:\n$plan")
  }
}
