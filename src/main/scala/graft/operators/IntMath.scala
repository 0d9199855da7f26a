package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Integer-exact helpers shared by the grid/bucket operators. */
object IntMath {

  /** Floor division by a positive constant, exact over the full Long
    * range: SQL `div` truncates toward zero (putting negative-axis
    * values in the wrong bucket), and double-based `floor(c / w)`
    * misrounds once |c| > 2^53 — the negative-remainder adjustment
    * restores true floor semantics. Used for RangeJoin grid cells and
    * Pack range buckets.
    */
  def floorDiv(c: Column, w: Long): Column = {
    require(w > 0, "floorDiv divisor must be positive")
    val q = call_function("div", c, lit(w))
    when(c % lit(w) < 0, q - 1).otherwise(q)
  }
}
