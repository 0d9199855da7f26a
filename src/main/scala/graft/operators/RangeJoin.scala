package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join without an equi-key — an operator Spark's
  * built-in joins only express as a BroadcastNestedLoop/cartesian with
  * a filter, which is quadratic in inputs and a non-starter at scale.
  *
  * Scale shape: grid-bucket the range axis. Each interval explodes into
  * the `ceil(span / bucketWidth) + 1` cells it overlaps; each point
  * lands in exactly ONE cell. The join becomes a plain shuffle
  * equi-join on the cell id with the exact containment predicate as a
  * post-filter — one shuffle each side, work proportional to true
  * matches per cell rather than |points| × |intervals|. Because a point
  * has a single cell, every qualifying (point, interval) pair meets in
  * exactly one cell: no duplicate pairs, no dedup pass.
  *
  * Choosing `bucketWidth`: ~the typical interval span. Much smaller →
  * interval side explodes into many cells (row amplification); much
  * larger → many false candidates share a cell before the filter. Both
  * stay correct — only the constant factor moves. Long-tail intervals
  * amplify by span/width cells; cap them by splitting upstream if the
  * distribution is extreme.
  */
object RangeJoin {

  /** All (point, interval) rows with start ≤ point ≤ end (both ends
    * inclusive). Column names must be distinct across the two inputs;
    * both range columns and `bucketWidth` share one numeric unit
    * (e.g. epoch micros).
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // fail loud instead of silently overwriting-then-dropping a caller
    // column that collides with the internal cell name
    require(!points.columns.contains("__cell") &&
      !intervals.columns.contains("__cell"),
      "__cell is reserved by RangeJoin; rename the input column")
    val pb = points.withColumn("__cell", floorDiv(pointCol, bucketWidth))
    val ib = intervals.withColumn("__cell",
      explode(sequence(
        floorDiv(startCol, bucketWidth), floorDiv(endCol, bucketWidth))))
    pb.join(ib,
      pb("__cell") === ib("__cell") &&
        col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__cell")
  }

  /** Interval × interval overlap join: all (left, right) pairs with
    * `ls ≤ re && rs ≤ le` (closed intervals). Same grid trick — both
    * sides explode into their overlapping cells and equi-join on the
    * cell — but two overlapping intervals can now share SEVERAL cells,
    * so each qualifying pair is emitted only from its canonical cell
    * (the cell of `max(ls, rs)`, the overlap's left edge, which both
    * sides necessarily cover): exactly-once output with no distinct
    * pass over the matches.
    */
  def intervalOverlap(
      left: DataFrame,
      leftStart: String,
      leftEnd: String,
      right: DataFrame,
      rightStart: String,
      rightEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(!left.columns.contains("__lcell") &&
      !right.columns.contains("__rcell"),
      "__lcell/__rcell are reserved by RangeJoin; rename the input column")
    val lb = left.withColumn("__lcell",
      explode(sequence(
        floorDiv(leftStart, bucketWidth), floorDiv(leftEnd, bucketWidth))))
    val rb = right.withColumn("__rcell",
      explode(sequence(
        floorDiv(rightStart, bucketWidth), floorDiv(rightEnd, bucketWidth))))
    lb.join(rb,
      col("__lcell") === col("__rcell") &&
        col(leftStart) <= col(rightEnd) &&
        col(rightStart) <= col(leftEnd) &&
        col("__lcell") === floorDivCol(
          greatest(col(leftStart), col(rightStart)), bucketWidth))
      .drop("__lcell", "__rcell")
  }

  /** Long-tail splitter — makes the scaladoc's "split extreme intervals
    * upstream" mitigation code. Each input interval becomes
    * `ceil(cells / maxCellsPerChunk)` chunk rows with bounds in
    * `__cs`/`__ce`; the chunks PARTITION the original value range
    * `[start, end]` and each chunk covers at most `maxCellsPerChunk`
    * grid cells. Compose with [[pointInInterval]] on the CHUNK bounds:
    *
    * {{{
    * val split = RangeJoin.splitIntervals(iv, "s", "e", w, 64)
    * RangeJoin.pointInInterval(points, "ts", split, "__cs", "__ce", w)
    *   .drop("__cs", "__ce")   // original s/e columns ride along
    * }}}
    *
    * Because the chunks partition the interval, a point inside `[s, e]`
    * lies in exactly ONE chunk — results are exactly-once with no
    * re-merge/distinct pass, and match the unsplit join row-for-row.
    *
    * What this bounds: the per-row explode. An interval spanning 10^6
    * cells otherwise materializes one 10^6-element `sequence` array in
    * a single task (a memory spike and a one-task hotspot); split, it
    * becomes 10^6/k chunk ROWS that redistribute across the cluster
    * before each explodes into ≤ k cells. Total cell rows are
    * unchanged — that amplification is inherent to a single-resolution
    * grid — but no task or allocation depends on the span any more.
    * (The other scale answer for a handful of galaxy-sized intervals:
    * route them to a broadcast nested-loop join and grid-join only the
    * short ones — both sides stay exactly-once since the two sets are
    * disjoint.)
    *
    * Bounds note: chunk arithmetic is exact as long as
    * `|start|, |end| + maxCellsPerChunk·bucketWidth` stay inside Long —
    * the cell grid itself has the same headroom requirement.
    */
  def splitIntervals(
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      maxCellsPerChunk: Int): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxCellsPerChunk > 0, "maxCellsPerChunk must be positive")
    require(!intervals.columns.contains("__cs") &&
      !intervals.columns.contains("__ce") &&
      !intervals.columns.contains("__chunk"),
      "__cs/__ce/__chunk are reserved by splitIntervals; rename the input column")
    val s = col(startCol).cast("long")
    val e = col(endCol).cast("long")
    val cs = floorDivCol(s, bucketWidth)
    val ce = floorDivCol(e, bucketWidth)
    val k = lit(maxCellsPerChunk.toLong)
    // ce - cs ≥ 0, so truncating div == floor div here
    val lastChunk = call_function("div", ce - cs, k)
    val chunkSpan = k * lit(bucketWidth)
    val base = cs * lit(bucketWidth) // cell-aligned start (≤ s)
    intervals
      .withColumn("__chunk", explode(sequence(lit(0L), lastChunk)))
      .withColumn("__cs", greatest(s, base + col("__chunk") * chunkSpan))
      .withColumn("__ce",
        least(e, base + (col("__chunk") + 1) * chunkSpan - 1))
      .drop("__chunk")
  }

  /** The complementary long-tail strategy to [[splitIntervals]]: route
    * intervals spanning more than `maxSpanCells` grid cells — assumed
    * RARE (a handful of galaxy-sized intervals in a corpus of normal
    * ones) — to a broadcast nested-loop join where they never explode
    * at all, and grid-join only the short ones. The two interval sets
    * are disjoint, so the union is exactly-once with no dedup pass.
    *
    * Pick this over [[splitIntervals]] when the tail is few-but-huge
    * (total cell rows matter: a 10^9-cell interval is 10^9 rows even
    * split); pick splitIntervals when long intervals are too many to
    * broadcast. Both bound per-task memory.
    */
  def pointInIntervalSkewSafe(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      maxSpanCells: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxSpanCells > 0, "maxSpanCells must be positive")
    val span = floorDivCol(col(endCol), bucketWidth) -
      floorDivCol(col(startCol), bucketWidth) + 1
    val gridded = pointInInterval(points, pointCol,
      intervals.where(span <= maxSpanCells), startCol, endCol, bucketWidth)
    val broadcasted = points.join(
      broadcast(intervals.where(span > maxSpanCells)),
      col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
    gridded.unionByName(broadcasted)
  }

  /** Exact integer floor division (w > 0) — `DIV` truncates toward
    * zero, which would put negative-axis values in the wrong cell, and
    * double `/` + floor can misround at cell boundaries for large
    * magnitudes.
    */
  private def floorDiv(colName: String, w: Long) =
    floorDivCol(col(colName), w)

  /** Integer-exact for the full long range — see [[IntMath.floorDiv]]. */
  private def floorDivCol(c: org.apache.spark.sql.Column, w: Long) =
    IntMath.floorDiv(c, w)
}
