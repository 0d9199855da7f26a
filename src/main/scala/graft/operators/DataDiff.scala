package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed DATASET DIFF — the regression-testing primitive every ETL
  * migration runs ("same pipeline, new engine/code: what changed?").
  * One full-outer join on the keys classifies every row as
  * only_left / only_right / changed / identical, and per-column
  * null-safe comparisons count exactly which columns drifted — so a
  * report reads "1 204 rows changed, all of them in `price`" instead
  * of a bare count. NULL-safe equality (`<=>`) throughout: a NULL vs
  * NULL column is identical, NULL vs value is a change.
  *
  * Scale shape: ONE shuffle of each side on the keys; the comparisons
  * ride the join output in codegen; the summary is a global aggregate
  * of booleans. No collect of row data.
  */
object DataDiff {

  /** Row-level diff: the keys + a `diff_status` column
    * (only_left / only_right / changed / identical) + one
    * `changed_<col>` flag per compared column.
    */
  def rowDiff(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diff needs at least one key column")
    val compare = left.columns.toSeq.filterNot(keyCols.contains)
    require(right.columns.toSeq.sorted == left.columns.toSeq.sorted,
      s"schemas differ: ${left.columns.toSeq} vs ${right.columns.toSeq}")
    // side-presence must be a MARKER, not key nullness: a row whose
    // key IS NULL exists on its side all the same (ANSI equality just
    // never matches it to the other side), and deriving presence from
    // isNotNull misclassified such rows as belonging to the OTHER side
    val l = left.select(left.columns.map(c => col(c).as(s"__l_$c")) :+
      lit(true).as("__dd_present_l"): _*)
    val r = right.select(right.columns.map(c => col(c).as(s"__r_$c")) :+
      lit(true).as("__dd_present_r"): _*)
    val joinCond = keyCols
      .map(k => col(s"__l_$k") === col(s"__r_$k"))
      .reduce(_ && _)
    val inLeft = coalesce(col("__dd_present_l"), lit(false))
    val inRight = coalesce(col("__dd_present_r"), lit(false))
    val anyChanged =
      if (compare.isEmpty) lit(false)
      else compare.map(c => !(col(s"__l_$c") <=> col(s"__r_$c")))
        .reduce(_ || _)
    val status = when(!inRight, lit("only_left"))
      .when(!inLeft, lit("only_right"))
      .when(anyChanged, lit("changed"))
      .otherwise(lit("identical"))
    l.join(r, joinCond, "full_outer")
      .select(keyCols.map(k =>
        coalesce(col(s"__l_$k"), col(s"__r_$k")).as(k)) ++
        Seq(status.as("diff_status")) ++
        compare.map(c =>
          // per-column drift is defined for BOTH-present rows only;
          // only_left/right rows flag no columns
          when(inLeft && inRight,
            !(col(s"__l_$c") <=> col(s"__r_$c"))).otherwise(lit(false))
            .as(s"changed_$c")): _*)
  }

  /** One-row summary: row counts per status plus per-column changed
    * counts (`n_changed_<col>`).
    */
  def summary(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val compare = left.columns.toSeq.filterNot(keyCols.contains)
    val d = rowDiff(left, right, keyCols)
    val aggs =
      Seq(sum(when(col("diff_status") === "only_left", 1L).otherwise(0L))
          .as("n_only_left"),
        sum(when(col("diff_status") === "only_right", 1L).otherwise(0L))
          .as("n_only_right"),
        sum(when(col("diff_status") === "changed", 1L).otherwise(0L))
          .as("n_changed"),
        sum(when(col("diff_status") === "identical", 1L).otherwise(0L))
          .as("n_identical")) ++
      compare.map(c =>
        sum(when(col(s"changed_$c"), 1L).otherwise(0L))
          .as(s"n_changed_$c"))
    d.agg(aggs.head, aggs.tail: _*)
  }
}
