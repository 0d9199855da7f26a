package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Cdc

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def dim = Seq(
    (1L, "alpha", "NA"),
    (2L, "beta", "EU"),
    (3L, "gamma", "APAC"))
    .toDF("id", "name", "region")

  private def rows(df: DataFrame): Seq[(Long, String, String)] =
    df.orderBy("id").as[(Long, String, String)].collect().toSeq

  test("I inserts, U updates, D deletes") {
    val batch = Seq(
      (2L, "beta2", "EU", "U", 1L),
      (3L, null, null, "D", 1L),
      (4L, "delta", "NA", "I", 1L))
      .toDF("id", "name", "region", "oper", "ver")
    val out = Cdc.apply(dim, batch, Seq("id"), versionCol = Some("ver"))
    assert(rows(out) == Seq(
      (1L, "alpha", "NA"), (2L, "beta2", "EU"), (4L, "delta", "NA")))
    assert(out.columns.toSeq == Seq("id", "name", "region"))
  }

  test("only the final operation per key acts: D→I re-inserts, U→D deletes") {
    val batch = Seq(
      (2L, null, null, "D", 1L), (2L, "reborn", "NA", "I", 2L),
      (3L, "renamed", "EU", "U", 1L), (3L, null, null, "D", 2L))
      .toDF("id", "name", "region", "oper", "ver")
    val out = Cdc.apply(dim, batch, Seq("id"), versionCol = Some("ver"))
    assert(rows(out) == Seq((1L, "alpha", "NA"), (2L, "reborn", "NA")))
  }

  test("deleting an absent key is a no-op; I on an existing key replaces " +
      "(snapshot/stream overlap)") {
    val batch = Seq(
      (99L, null, null, "D", 1L),
      (1L, "alpha-snap", "NA", "I", 1L))
      .toDF("id", "name", "region", "oper", "ver")
    val out = Cdc.apply(dim, batch, Seq("id"), versionCol = Some("ver"))
    assert(rows(out) == Seq(
      (1L, "alpha-snap", "NA"), (2L, "beta", "EU"), (3L, "gamma", "APAC")))
  }

  test("replaying the same batch is idempotent") {
    val batch = Seq(
      (2L, "beta2", "EU", "U", 1L),
      (3L, null, null, "D", 1L),
      (4L, "delta", "NA", "I", 1L))
      .toDF("id", "name", "region", "oper", "ver")
    val once = Cdc.apply(dim, batch, Seq("id"), versionCol = Some("ver"))
    val twice = Cdc.apply(once, batch, Seq("id"), versionCol = Some("ver"))
    assert(rows(twice) == rows(once))
  }

  test("oper is case/whitespace-insensitive") {
    val batch = Seq((3L, null, null, " d ", 1L))
      .toDF("id", "name", "region", "oper", "ver")
    val out = Cdc.apply(dim, batch, Seq("id"), versionCol = Some("ver"))
    assert(rows(out) == Seq((1L, "alpha", "NA"), (2L, "beta", "EU")))
  }

  test("NULL-keyed: D is a no-op, I/U insert as-is") {
    val batch = Seq(
      (Option.empty[Long], Option("nk"), Option("EU"), "I", 1L),
      (Option.empty[Long], Option.empty[String], Option.empty[String], "D", 1L))
      .toDF("id", "name", "region", "oper", "ver")
    val out = Cdc.apply(dim, batch, Seq("id"), versionCol = Some("ver"))
    assert(out.count() == 4) // 3 target rows + 1 null-keyed insert
    assert(out.where($"id".isNull).count() == 1)
  }

  test("batch shuffles once: collapse window and full-outer join share " +
      "the merge-key partitioning") {
    val batch = Seq((2L, "x", "EU", "U", 1L))
      .toDF("id", "name", "region", "oper", "ver")
    val plan = Cdc.apply(dim, batch, Seq("id"), versionCol = Some("ver"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$plan")
  }

  test("changelog emits I/U/D with the right row images; unchanged keys " +
      "emit nothing") {
    val after = Seq(
      (1L, "alpha", "NA"), // unchanged → silent
      (2L, "beta2", "EU"), // changed → U, after-image
      (4L, "delta", "NA")) // new → I
      .toDF("id", "name", "region") // 3L gone → D, before-image
    val out = Cdc.changelog(dim, after, Seq("id"))
      .orderBy("id").as[(Long, String, String, String)].collect().toSeq
    assert(out == Seq(
      (2L, "beta2", "EU", "U"),
      (3L, "gamma", "APAC", "D"),
      (4L, "delta", "NA", "I")))
  }

  test("round-trip: apply(before, changelog(before, after)) == after") {
    val after = Seq(
      (1L, "alpha", "NA"),
      (2L, null, "EU"), // update to NULL must survive the trip
      (5L, "eps", "APAC"))
      .toDF("id", "name", "region")
    val log = Cdc.changelog(dim, after, Seq("id"))
    val roundTripped = Cdc.apply(dim, log, Seq("id"))
    assert(roundTripped.orderBy("id")
      .as[(Long, Option[String], String)].collect().toSeq ==
      after.orderBy("id")
        .as[(Long, Option[String], String)].collect().toSeq)
    // and an identical state diffs to an EMPTY changelog
    assert(Cdc.changelog(dim, dim, Seq("id")).isEmpty)
  }

  test("changelog NULL-data change detection is null-safe both ways") {
    val b = Seq((1L, Option("x")), (2L, Option.empty[String])).toDF("id", "v")
    val a = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("id", "v")
    val out = Cdc.changelog(b, a, Seq("id"))
      .as[(Long, Option[String], String)].collect().toSeq
    assert(out == Seq((1L, None, "U"))) // NULL==NULL is no change
  }

  test("target carrying the oper column is rejected loudly") {
    intercept[IllegalArgumentException] {
      Cdc.apply(dim.withColumn("oper", lit("I")),
        dim.withColumn("oper", lit("I")), Seq("id"))
    }
  }
}
