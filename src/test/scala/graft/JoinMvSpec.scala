package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Cdc, JoinMv}

class JoinMvSpec extends SparkSpec {
  import spark.implicits._

  private def custs = Seq(
    (1L, "a", "S1"), (2L, "b", "S1"), (3L, "c", "S2"))
    .toDF("ck", "name", "seg")
  private def ords = Seq(
    (10L, 1L, 100L), (11L, 1L, 110L), (12L, 2L, 120L))
    .toDF("ok", "ck", "cents")

  private def assertSame(a: DataFrame, b: DataFrame): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"views differ:\n${a.collect().mkString("\n")}\nvs\n${b.collect().mkString("\n")}")

  test("A-side signed delta (update = D+I, delete = D, insert = I) " +
      "maintains the view exactly") {
    val mv0 = JoinMv.init(custs, ords, Seq("ck"))
    val custsNew = Seq(
      (1L, "a2", "S9"),          // updated
      (3L, "c", "S2"),           // unchanged
      (4L, "d", "S3"))           // inserted (no orders -> no view rows)
      .toDF("ck", "name", "seg") // ck=2 deleted (kills ok=12's row)
    val delta = Cdc.changelogSigned(custs, custsNew, Seq("ck"))
    val mv1 = JoinMv.applyDelta(mv0, delta, ords, Seq("ck"),
      deltaIsLeft = true)
    assertSame(mv1, JoinMv.init(custsNew, ords, Seq("ck")))
    // the update RETRACTED both of ck=1's old rows and re-inserted the
    // new image; nothing carries stale data
    assert(JoinMv.finish(mv1).where($"name" === "a").isEmpty)
  }

  test("B-side delta composes after an A-side delta (each step against " +
      "the other side's state as of that step)") {
    val mv0 = JoinMv.init(custs, ords, Seq("ck"))
    val custsNew = Seq((1L, "a2", "S9"), (2L, "b", "S1"), (3L, "c", "S2"))
      .toDF("ck", "name", "seg")
    val dA = Cdc.changelogSigned(custs, custsNew, Seq("ck"))
    val mv1 = JoinMv.applyDelta(mv0, dA, ords, Seq("ck"),
      deltaIsLeft = true)
    val ordsNew = Seq(
      (10L, 1L, 100L), (12L, 2L, 125L), (13L, 3L, 130L))
      .toDF("ok", "ck", "cents") // ok=11 deleted, 12 updated, 13 added
    val dB = Cdc.changelogSigned(ords, ordsNew, Seq("ok"))
    val mv2 = JoinMv.applyDelta(mv1, dB, custsNew, Seq("ck"),
      deltaIsLeft = false)
    assertSame(mv2, JoinMv.init(custsNew, ordsNew, Seq("ck")))
  }

  test("multiset weights: duplicate join rows accumulate, cancel to " +
      "zero on retraction, and finish refuses non-unit multiplicities") {
    val dupOrds = ords.unionAll(Seq((10L, 1L, 100L)).toDF("ok", "ck", "cents"))
    val mv = JoinMv.init(custs, dupOrds, Seq("ck"))
    assert(mv.where(col("mv_w") === 2).count() == 1,
      "the duplicated order row must carry weight 2")
    intercept[IllegalArgumentException] { JoinMv.finish(mv) }
    // retracting the customer cancels BOTH copies
    val delta = Seq((1L, "a", "S1", "D")).toDF("ck", "name", "seg", "oper")
    val mv1 = JoinMv.applyDelta(mv, delta, dupOrds, Seq("ck"),
      deltaIsLeft = true)
    assert(mv1.where($"ck" === 1L).isEmpty,
      "retraction must cancel every accumulated copy")
  }

  test("the netted I/U/D diff form is rejected — only SIGNED D/I " +
      "deltas maintain the view") {
    val mv = JoinMv.init(custs, ords, Seq("ck"))
    val netted = Seq((1L, "a2", "S9", "U")).toDF("ck", "name", "seg", "oper")
    intercept[IllegalArgumentException] {
      JoinMv.applyDelta(mv, netted, ords, Seq("ck"), deltaIsLeft = true)
    }
  }

  test("shared non-key columns are refused") {
    val b = Seq((1L, "x")).toDF("ck", "name")
    intercept[IllegalArgumentException] {
      JoinMv.init(custs, b, Seq("ck"))
    }
  }
}
