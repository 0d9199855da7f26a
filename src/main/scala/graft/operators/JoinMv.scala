package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of an INNER EQUI-JOIN materialized view —
  * the multiset delta rule
  *
  *   A_new ⋈ B_new  =  A_old ⋈ B_old  +  ΔA ⋈ B_new  +  A_old ⋈ ΔB
  *
  * with signed deltas (a D row retracts its old image with weight −1,
  * an I row inserts the new image with +1 — exactly the form
  * [[graft.sinks.CowTable.changeLogFor]]'s write-time sidecars and
  * [[Cdc.changelogSigned]] emit, and the time-traveling `readAt`
  * supplies `A_old`/`B_new` without keeping any extra state). The view
  * carries an explicit multiplicity column `w`; applying a delta is
  * one delta-sized join plus a grouped weight-sum, so maintenance
  * costs O(Δ ⋈ side) — never a recompute of the full join. Groups
  * whose weight cancels to zero are dropped (retraction completed).
  *
  * Two-table changes compose sequentially: apply A's delta against
  * B's old snapshot, then B's delta against A's NEW snapshot (or the
  * symmetric order — each step uses the other side's state as of that
  * step). The identity above makes each step exact, so the composition
  * is too.
  *
  * Join keys must be the only shared column names (the view's schema
  * is keys ++ A-only ++ B-only columns).
  */
object JoinMv {

  private val W = "mv_w"

  private def outCols(
      a: DataFrame, b: DataFrame, joinKeys: Seq[String]): Seq[String] = {
    val aOnly = a.columns.toSeq.filterNot(joinKeys.contains)
    val bOnly = b.columns.toSeq.filterNot(joinKeys.contains)
    val overlap = aOnly.toSet.intersect(bOnly.toSet)
    require(overlap.isEmpty,
      s"non-key columns shared between sides: ${overlap.mkString(", ")}")
    joinKeys ++ aOnly ++ bOnly
  }

  /** The view's initial state: the join with multiplicities. */
  def init(a: DataFrame, b: DataFrame, joinKeys: Seq[String]): DataFrame = {
    val cols = outCols(a, b, joinKeys)
    a.join(b, joinKeys)
      .groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as(W))
  }

  /** One side's signed delta joined against the OTHER side's snapshot,
    * merged into the view. `deltaIsLeft` says whether `delta` plays
    * A's role (its columns are A's) or B's.
    *
    * @param delta  signed rows: the side's columns + `operCol` with
    *               D (retract old image) / I (insert new image)
    * @param other  the other side's snapshot AS OF this step
    */
  def applyDelta(
      mv: DataFrame,
      delta: DataFrame,
      other: DataFrame,
      joinKeys: Seq[String],
      deltaIsLeft: Boolean,
      operCol: String = "oper",
      verifySigned: Boolean = true): DataFrame =
    applyDeltas(mv,
      Seq(deltaContribution(delta, other, joinKeys, deltaIsLeft,
        operCol, verifySigned)),
      joinKeys)

  /** One delta step's SIGNED JOIN CONTRIBUTION — [[applyDelta]] without
    * the merge: the delta joined against its step's other-side snapshot,
    * weights ±1, columns in view order with the weight column last.
    * Because the merge is an associative grouped weight-sum, a k-step
    * maintenance batch can collect k contributions (each against ITS
    * OWN other-side state) and fold them into the view with ONE
    * aggregation via [[applyDeltas]] — one exchange instead of k, same
    * result by associativity (intermediate zero-weight groups only
    * disappear later; they were never observable mid-batch).
    */
  def deltaContribution(
      delta: DataFrame,
      other: DataFrame,
      joinKeys: Seq[String],
      deltaIsLeft: Boolean,
      operCol: String = "oper",
      verifySigned: Boolean = true): DataFrame = {
    // SIGNED deltas only (D = retract old image, I = insert new image —
    // changelogSigned / the write-time sidecars). The NETTED I/U/D diff
    // form would silently corrupt the view (a U's +1 without the old
    // image's retraction), so reject it eagerly — one delta-sized scan,
    // the same price MergeInto pays for its cardinality check.
    // `verifySigned = false` skips that scan for deltas that are signed
    // BY CONSTRUCTION (CowTable's own write-time sidecars, which only
    // changelogSigned produces) — per-commit maintenance loops pay one
    // job less; arbitrary caller-supplied deltas keep the guard.
    if (verifySigned) {
      val badOps = delta
        .where(!upper(trim(col(operCol))).isin("D", "I"))
        .limit(1).count()
      require(badOps == 0,
        s"applyDelta needs the SIGNED changelog form (oper D/I only); " +
          "a U row means this is the netted I/U/D diff — use " +
          "Cdc.changelogSigned or the write-time sidecars")
    }
    val sign = when(upper(trim(col(operCol))) === "D", lit(-1L))
      .otherwise(lit(1L))
    val signed = delta.withColumn(W, sign).drop(operCol)
    // the side flag fixes the view's column ORDER; the inner equi-join
    // itself is symmetric
    val cols =
      if (deltaIsLeft) outCols(delta.drop(operCol), other, joinKeys)
      else outCols(other, delta.drop(operCol), joinKeys)
    signed.join(other, joinKeys)
      .select(cols.map(col) :+ col(W): _*)
  }

  /** Merge any number of [[deltaContribution]]s into the view with ONE
    * grouped weight-sum. All contributions must share the view's column
    * set (same two table schemas — the multi-step case this serves).
    */
  def applyDeltas(
      mv: DataFrame,
      contributions: Seq[DataFrame],
      joinKeys: Seq[String]): DataFrame = {
    if (contributions.isEmpty) return mv
    val cols = contributions.head.columns.toSeq.filterNot(_ == W)
    merge(mv, contributions.reduce(_.unionByName(_)), cols)
  }

  private def merge(
      mv: DataFrame, delta: DataFrame, cols: Seq[String]): DataFrame =
    mv.select(cols.map(col) :+ col(W): _*)
      .unionByName(delta)
      .groupBy(cols.map(col): _*)
      .agg(sum(col(W)).as(W))
      .where(col(W) =!= 0)

  /** Present the view: expand multiplicities away when every row is
    * unique (the common unique-key case), refusing silently-lossy
    * output otherwise.
    */
  def finish(mv: DataFrame): DataFrame = {
    val dup = mv.where(col(W) =!= 1).limit(1).count()
    require(dup == 0,
      "view has rows with multiplicity != 1 — present the weight " +
        "column explicitly instead of dropping it")
    mv.drop(W)
  }
}
