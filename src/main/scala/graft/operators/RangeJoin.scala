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
    val pb = points.withColumn("__cell", floorDiv(pointCol, bucketWidth))
    val ib = intervals.withColumn("__cell",
      explode(sequence(
        floorDiv(startCol, bucketWidth), floorDiv(endCol, bucketWidth))))
    pb.join(ib,
      pb("__cell") === ib("__cell") &&
        col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__cell")
  }

  /** Exact integer floor division (w > 0) — `DIV` truncates toward
    * zero, which would put negative-axis values in the wrong cell, and
    * double `/` + floor can misround at cell boundaries for large
    * magnitudes.
    */
  private def floorDiv(colName: String, w: Long) = {
    val q = expr(s"`$colName` DIV ${w}L")
    val r = expr(s"`$colName` % ${w}L")
    when(r < 0, q - 1).otherwise(q)
  }
}
