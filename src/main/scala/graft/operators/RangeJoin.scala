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

  /** Exact integer floor division (w > 0) — `DIV` truncates toward
    * zero, which would put negative-axis values in the wrong cell, and
    * double `/` + floor can misround at cell boundaries for large
    * magnitudes.
    */
  private def floorDiv(colName: String, w: Long) =
    floorDivCol(col(colName), w)

  /** Integer-exact for the full long range: `div` truncates toward
    * zero, the negative-remainder adjustment restores floor semantics
    * (double-based `floor(c / w)` would misround once |c| > 2^53).
    */
  private def floorDivCol(c: org.apache.spark.sql.Column, w: Long) = {
    val q = call_function("div", c, lit(w))
    when(c % lit(w) < 0, q - 1).otherwise(q)
  }
}
