package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Incremental aggregate maintenance — materialized-view upkeep for
  * the reporting rollups the reference rebuilds from scratch every run
  * (jobs/semantic/gosales_thin_layer/tl_sm_gosales_overview_01.sql
  * re-aggregates the full fact table daily). The engine-level fix is
  * ALGEBRAIC: keep the aggregate's mergeable STATE (count, sum, min,
  * max per group), and on each ingest merge in the DELTA's state —
  * `state(base ∪ delta) == merge(state(base), state(delta))`, so a
  * 100 TB rollup updates with delta-sized work, never rescanning the
  * base. (The same partial-state shape Spark's own partial aggregation
  * uses inside one query, lifted across runs.)
  *
  * Determinism: sums are carried as DECIMAL(25,6) — decimal addition
  * is associative, so the merged state is bit-identical to the direct
  * aggregate no matter how the data was split or partitioned
  * (property-pinned in `MaterializedAggSpec`, oracle-pinned by
  * `mv_incremental`). The state schema is stable under repeated
  * merges (sums re-cast to DECIMAL(25,6) — Spark would otherwise
  * widen the type every merge).
  *
  * Insert-only by design: counts and sums could retract with signed
  * CDC deltas, but min/max cannot (a deleted extremum needs the base
  * re-scanned) — retraction support is a different algebra (sketches
  * or full recompute), not a flag here.
  */
object MaterializedAgg {

  private val SumType = DecimalType(25, 6)

  private def stateCols(values: Seq[String]) =
    values.flatMap(c =>
      Seq(s"mv_sum_$c", s"mv_min_$c", s"mv_max_$c"))

  /** Mergeable aggregate state of `df` over `keys`:
    * keys ++ (mv_n, and per value column: mv_sum_/mv_min_/mv_max_).
    */
  def state(
      df: DataFrame, keys: Seq[String], values: Seq[String]): DataFrame = {
    require(keys.nonEmpty && values.nonEmpty)
    val aggs = count(lit(1)).as("mv_n") +: values.flatMap(c => Seq(
      sum(col(c).cast(SumType)).cast(SumType).as(s"mv_sum_$c"),
      min(col(c)).as(s"mv_min_$c"),
      max(col(c)).as(s"mv_max_$c")))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge any number of states (associative, commutative). Groups
    * present in only some states merge correctly — counts of 0 never
    * appear (state rows exist only for seen groups).
    */
  def merge(
      keys: Seq[String], values: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty)
    val aggs = sum(col("mv_n")).as("mv_n") +: values.flatMap(c => Seq(
      sum(col(s"mv_sum_$c")).cast(SumType).as(s"mv_sum_$c"),
      min(col(s"mv_min_$c")).as(s"mv_min_$c"),
      max(col(s"mv_max_$c")).as(s"mv_max_$c")))
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Present a state as the final aggregate: n, per-value sum (double,
    * via the associative decimal), min, max, avg.
    */
  def finish(state: DataFrame, values: Seq[String]): DataFrame = {
    val derived = col("mv_n").as("n") +: values.flatMap(c => Seq(
      col(s"mv_sum_$c").cast(DoubleType).as(s"sum_$c"),
      col(s"mv_min_$c").as(s"min_$c"),
      col(s"mv_max_$c").as(s"max_$c"),
      // avg via DOUBLE division (not decimal): decimal-division scale
      // and rounding rules are engine-specific, IEEE double division is
      // not — and the dividend is already the exact decimal sum
      (col(s"mv_sum_$c").cast(DoubleType) /
        col("mv_n").cast(DoubleType)).as(s"avg_$c")))
    val keyCols = state.columns.toSeq
      .filterNot(c => c == "mv_n" || stateCols(values).contains(c))
    state.select(keyCols.map(col) ++ derived: _*)
  }
}
