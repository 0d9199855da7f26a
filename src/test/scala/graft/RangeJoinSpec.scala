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

  test("splitIntervals bounds per-row amplification on a pathological " +
      "long-tail distribution and keeps the join exactly-once") {
    val w = 10L
    val k = 64
    // long tail: one interval spanning 1e6 cells, one spanning 100k,
    // plus ordinary short ones — the distribution the scaladoc warns
    // about (unsplit, the big one explodes a 1e6-element array in one
    // task)
    val ivs = Seq(
      (1L, 0L, 10_000_000L - 1),  // 1e6 cells
      (2L, 500L, 1_000_499L),     // 100k cells
      (3L, -35L, 5L),             // crosses zero
      (4L, 42L, 42L),             // degenerate
      (5L, 70L, 130L))
    val intervals = ivs.toDF("iid", "s", "e")
    val split = RangeJoin.splitIntervals(intervals, "s", "e", w, k)
      .cache()

    // per-interval chunk count = ceil(cells / k); every chunk ≤ k cells
    def cellsOf(s: Long, e: Long) = Math.floorDiv(e, w) - Math.floorDiv(s, w) + 1
    val chunkCounts = split.groupBy("iid").count()
      .as[(Long, Long)].collect().toMap
    ivs.foreach { case (iid, s, e) =>
      val cells = cellsOf(s, e)
      assert(chunkCounts(iid) == (cells + k - 1) / k,
        s"iid=$iid cells=$cells chunks=${chunkCounts(iid)}")
    }
    val maxChunkCells = split
      .select(col("iid"), col("__cs"), col("__ce")).as[(Long, Long, Long)]
      .collect()
    assert(maxChunkCells.forall { case (_, cs, ce) => cellsOf(cs, ce) <= k })
    // chunks partition each interval: total covered length == span
    ivs.foreach { case (iid, s, e) =>
      val covered = maxChunkCells.filter(_._1 == iid)
        .map { case (_, cs, ce) => ce - cs + 1 }.sum
      assert(covered == e - s + 1, s"iid=$iid covers $covered of ${e - s + 1}")
    }

    // joining on the chunk bounds equals the naive answer, exactly once
    val pts = Seq(-36L, -35L, 0L, 42L, 43L, 100L, 640L, 999L, 500_000L,
      1_000_499L, 9_999_999L, 10_000_000L)
    val points = pts.toDF("t")
    val got = RangeJoin.pointInInterval(points, "t", split, "__cs", "__ce", w)
      .select("t", "iid").as[(Long, Long)].collect()
    val expect = for {
      t <- pts
      (iid, s, e) <- ivs if t >= s && t <= e
    } yield (t, iid)
    assert(got.toSet == expect.toSet)
    assert(got.length == expect.size,
      "chunks partition the interval, so each match is emitted once")
    split.unpersist()
  }

  test("pointInIntervalSkewSafe routes giant intervals to the broadcast " +
      "path and matches the naive answer exactly once") {
    val w = 10L
    val ivs = Seq(
      (1L, 0L, 100_000_000L), // 1e7 cells — would explode on the grid
      (2L, 50L, 90L),
      (3L, -25L, 5L),
      (4L, 200L, 200L))
    val intervals = ivs.toDF("iid", "s", "e")
    val pts = Seq(-30L, -25L, 0L, 55L, 90L, 91L, 200L, 5_000_000L,
      100_000_000L, 100_000_001L)
    val points = pts.toDF("t")
    val joined = RangeJoin.pointInIntervalSkewSafe(
      points, "t", intervals, "s", "e", w, maxSpanCells = 64L)
    val got = joined.select("t", "iid").as[(Long, Long)].collect()
    val expect = for {
      t <- pts; (iid, s, e) <- ivs if t >= s && t <= e
    } yield (t, iid)
    assert(got.toSet == expect.toSet)
    assert(got.length == expect.size, "disjoint routes must stay exactly-once")
    // the giant interval rides the broadcast branch: the plan contains a
    // BroadcastNestedLoopJoin (intended here), and no grid sequence ever
    // materialized 1e7 cells (the test completing at all is the signal —
    // an exploded 1e7-element array per copartition would dominate)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
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
