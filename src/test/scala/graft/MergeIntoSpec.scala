package graft

import org.apache.spark.sql.functions._

import graft.operators._

class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", -5.0), (3L, "c", 30.0), (4L, "d", -1.0))
    .toDF("id", "name", "bal")

  test("five-clause MERGE: conditional delete, update, guarded insert, " +
      "and both not-matched-by-source actions — SQL semantics per group") {
    val source = Seq(
      (2L, "B!", 100.0),  // matched, bal>=0 -> update
      (3L, "C!", -50.0),  // matched, s.bal<0 -> delete
      (5L, "e", 50.0),    // not matched, bal>=0 -> insert
      (6L, "f", -9.0))    // not matched, bal<0 -> guarded out (dropped)
      .toDF("id", "name", "bal")
    val out = MergeInto(target, source, Seq("id"), Seq(
      MatchedDelete(condition = Some("s.bal < 0")),
      MatchedUpdate(Map("name" -> "s.name", "bal" -> "t.bal + s.bal")),
      NotMatchedInsert(condition = Some("s.bal >= 0")),
      NotMatchedBySourceUpdate(Map("name" -> "'DORMANT'"),
        condition = Some("t.bal < 0")),
      NotMatchedBySourceDelete(condition = Some("t.bal = -1.0"))))
    assert(out.columns.toSeq == Seq("id", "name", "bal"))
    val got = out.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    // id=1: no source row, bal>=0 -> no by-source clause fires -> kept
    // id=2: updated (-5 + 100); id=3: deleted (s.bal<0)
    // id=4: hits the FIRST by-source clause (update) — order matters,
    //       the by-source delete never sees it
    // id=5: inserted; id=6: dropped by the insert guard
    assert(got == Set(
      (1L, "a", 10.0), (2L, "B!", 95.0), (5L, "e", 50.0),
      (4L, "DORMANT", -1.0)))
  }

  test("clause order is first-wins within a group") {
    val source = Seq((2L, "x", 1.0)).toDF("id", "name", "bal")
    val firstUpdate = MergeInto(target, source, Seq("id"), Seq(
      MatchedUpdate(Map("name" -> "'FIRST'")),
      MatchedDelete()))
    assert(firstUpdate.where($"id" === 2).select("name")
      .as[String].head() == "FIRST")
    val firstDelete = MergeInto(target, source, Seq("id"), Seq(
      MatchedDelete(),
      MatchedUpdate(Map("name" -> "'FIRST'"))))
    assert(firstDelete.where($"id" === 2).isEmpty)
  }

  test("a NULL merge key never matches: the source row flows to the " +
      "not-matched group, the target rows to not-matched-by-source") {
    val source = Seq(
      (Option.empty[Long], "n", 1.0)).toDF("id", "name", "bal")
    val out = MergeInto(target, source, Seq("id"), Seq(
      MatchedUpdate(Map("name" -> "'TOUCHED'")),
      NotMatchedInsert()))
    // the null-keyed row inserts as-is; no target row was "matched"
    assert(out.count() == 5)
    assert(out.where($"name" === "TOUCHED").isEmpty)
    assert(out.where($"id".isNull).select("name").as[String].head() == "n")
  }

  test("INSERT * fills target-only columns with NULL and casts to the " +
      "target type") {
    val tgt = Seq((1L, "a", 10)).toDF("id", "name", "qty")
    val source = Seq((2L, "b")).toDF("id", "name")
    val out = MergeInto(tgt, source, Seq("id"), Seq(NotMatchedInsert()))
    // names and types match; nullability relaxes (inserted rows may
    // carry NULL for target-only columns — that is the point)
    assert(out.schema.map(f => (f.name, f.dataType)) ==
      tgt.schema.map(f => (f.name, f.dataType)))
    val r = out.where($"id" === 2).collect().head
    assert(r.getString(1) == "b" && r.isNullAt(2))
  }

  test("more than one source match per TARGET key is a cardinality " +
      "violation; duplicate NOT-matched keys are legal inserts (ANSI)") {
    val source = Seq((2L, "x", 1.0), (2L, "y", 2.0))
      .toDF("id", "name", "bal")
    intercept[IllegalArgumentException] {
      MergeInto(target, source, Seq("id"),
        Seq(MatchedUpdate(Map("name" -> "s.name"))))
    }
    // same duplication on a key the target does NOT hold: both insert
    val newKeys = Seq((9L, "x", 1.0), (9L, "y", 2.0))
      .toDF("id", "name", "bal")
    val out = MergeInto(target, newKeys, Seq("id"),
      Seq(MatchedUpdate(Map("name" -> "s.name")), NotMatchedInsert()))
    assert(out.where($"id" === 9L).count() == 2,
      "duplicate not-matched source rows must both insert")
  }

  test("the plan is ONE full-outer join with one exchange per side — " +
      "the CASE chain rides the join output, no extra shuffle") {
    val source = Seq((2L, "x", 1.0)).toDF("id", "name", "bal")
    val out = MergeInto(target, source, Seq("id"), Seq(
      MatchedUpdate(Map("bal" -> "t.bal + s.bal")),
      NotMatchedInsert()))
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges <= 2, s"expected <=2 exchanges:\n$plan")
    assert(plan.contains("FullOuter") || plan.contains("full_outer"),
      s"merge lost its full-outer join:\n$plan")
  }
}
