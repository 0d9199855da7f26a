package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval matches a driver-side exact computation, " +
      "including negative-axis values and inclusive bounds") {
    val points = Seq(-25L, -10L, -1L, 0L, 5L, 10L, 99L, 100L, 250L)
      .map(t => (t, s"p$t")).toDF("t", "pname")
    val intervals = Seq(
      (1L, -30L, -20L), // fully negative
      (2L, -5L, 5L),    // straddles zero
      (3L, 0L, 100L),   // multi-bucket at width 10
      (4L, 100L, 100L), // degenerate single point
      (5L, 300L, 400L)  // no matches
    ).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, "t", intervals, "s", "e", 10L)
      .select("t", "iid").as[(Long, Long)].collect().toSet
    val expect = (for {
      t <- Seq(-25L, -10L, -1L, 0L, 5L, 10L, 99L, 100L, 250L)
      (iid, s, e) <- Seq((1L, -30L, -20L), (2L, -5L, 5L), (3L, 0L, 100L),
        (4L, 100L, 100L), (5L, 300L, 400L))
      if t >= s && t <= e
    } yield (t, iid)).toSet
    assert(got == expect)
    // sanity: bounds are inclusive on both ends and nothing matched twice
    assert(expect.contains((0L, 3L)) && expect.contains((100L, 3L)))
    val n = RangeJoin.pointInInterval(points, "t", intervals, "s", "e", 10L)
      .count()
    assert(n == expect.size, "a pair must meet in exactly one cell")
  }

  test("bucket width does not change the result, only the plan constants") {
    val points = spark.range(0, 500).select((col("id") * 7).as("t"))
    val intervals = spark.range(0, 50)
      .select(col("id").as("iid"), (col("id") * 61).as("s"))
      .withColumn("e", col("s") + 40)
    def run(w: Long) =
      RangeJoin.pointInInterval(points, "t", intervals, "s", "e", w)
        .select("t", "iid").as[(Long, Long)].collect().toSet
    assert(run(10L) == run(1000L))
    assert(run(10L).nonEmpty)
  }

  test("intervalOverlap matches a driver-side computation exactly once " +
      "per pair, across bucket widths and the negative axis") {
    val ls = Seq((1L, -30L, -5L), (2L, -10L, 10L), (3L, 0L, 100L),
      (4L, 50L, 60L), (5L, 200L, 210L))
    val rs = Seq((10L, -40L, -25L), (20L, -6L, 4L), (30L, 90L, 150L),
      (40L, 55L, 58L), (50L, 300L, 310L))
    val left = ls.toDF("lid", "ls", "le")
    val right = rs.toDF("rid", "rs", "re")
    val expect = (for {
      (lid, a, b) <- ls; (rid, c, d) <- rs if a <= d && c <= b
    } yield (lid, rid)).toSet
    for (w <- Seq(3L, 10L, 1000L)) {
      val out = RangeJoin.intervalOverlap(left, "ls", "le", right, "rs", "re", w)
        .select("lid", "rid").as[(Long, Long)].collect()
      assert(out.toSet == expect, s"width $w")
      assert(out.length == expect.size,
        s"width $w: a pair must be emitted from exactly one canonical cell")
    }
    assert(expect.nonEmpty)
  }

  test("plan is an equi-join on the cell, not a nested-loop cross product") {
    val points = spark.range(0, 1000).select((col("id") * 3).as("t"))
    val intervals = spark.range(0, 100)
      .select(col("id").as("iid"), (col("id") * 29).as("s"))
      .withColumn("e", col("s") + 50)
    val joined =
      RangeJoin.pointInInterval(points, "t", intervals, "s", "e", 50L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
