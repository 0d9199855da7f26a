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
  * Determinism: sums are carried as DECIMAL(38,6) — decimal addition
  * is associative, so the merged state is bit-identical to the direct
  * aggregate no matter how the data was split or partitioned
  * (property-pinned in `MaterializedAggSpec`, oracle-pinned by
  * `mv_incremental`). The state schema is stable under repeated
  * merges (sums re-cast to DECIMAL(38,6) — Spark would otherwise
  * widen the type every merge). Max precision leaves 32 integer
  * digits of headroom: a narrower carry (say 25,6) would overflow to
  * NULL without ANSI on a 100 TB sum of large values, silently
  * breaking the merge contract — 1e32 is out of reach even summing
  * 1e18 rows of 1e14-sized values.
  *
  * Insert-only by design: counts and sums could retract with signed
  * CDC deltas, but min/max cannot (a deleted extremum needs the base
  * re-scanned) — retraction support is a different algebra (sketches
  * or full recompute), not a flag here.
  */
object MaterializedAgg {

  private val SumType = DecimalType(38, 6)

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

  // ---------------------------------------------------------------------
  // DISTINCT-COUNT state: the one classic aggregate that has NO exact
  // mergeable state (count(distinct) over a 100 TB base cannot keep the
  // value set) — the standard answer is a sketch whose REGISTERS are
  // mergeable. HLL register union is max-per-register: associative and
  // commutative, so the MERGE ORDER of states never changes the result
  // — merge(a, merge(b, c)) and merge(merge(a, b), c) estimate
  // identically, which is the invariant an incremental MV needs.
  // What is NOT invariant: a union-built sketch vs the sketch built by
  // streaming all the values through one accumulator. DataSketches HLL
  // carries a per-stream HIP estimator that a union cannot preserve,
  // so the union result may estimate (slightly) differently than the
  // single-pass sketch — and the single-pass sketch itself depends on
  // partition count. Never assert merged == single-pass; assert merge-
  // order independence plus a tolerance vs the exact count instead
  // (see the hll_mv_distinct oracle row). Estimate error at the
  // default lgConfigK is ~1.6%.
  // ---------------------------------------------------------------------

  /** Mergeable distinct-count sketch state per group: keys ++ mv_hll. */
  def distinctState(
      df: DataFrame, keys: Seq[String], value: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(value)).as("mv_hll"))

  /** Merge distinct-count states. Register union is max-per-register:
    * associative and commutative, so any merge grouping of the same
    * states estimates identically (the estimate still differs from a
    * single-stream sketch's — see the class note on HIP). */
  def distinctMerge(keys: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty)
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col("mv_hll")).as("mv_hll"))
  }

  /** Present a distinct-count state as its estimate column `n_est`. */
  def distinctFinish(state: DataFrame): DataFrame =
    state.withColumn("n_est", hll_sketch_estimate(col("mv_hll")))
      .drop("mv_hll")

  // ---------------------------------------------------------------------
  // PERCENTILE state: exact percentiles are the other classic
  // non-mergeable aggregate (they need the sorted values). The
  // mergeable form is a fixed-width HISTOGRAM of exact integer counts:
  // merge = element-wise sum (associative, bit-exact), and the
  // percentile ESTIMATE — linear interpolation inside the target
  // bucket — is a deterministic double expression over those exact
  // counts, so unlike a sketch the estimate is REPLAYABLE by the
  // oracle and split-invariant by construction. Resolution is
  // (hi-lo)/nBuckets; out-of-range values clamp into the edge buckets
  // (callers pick bounds from domain knowledge or a profiling pass).
  // ---------------------------------------------------------------------

  /** Mergeable histogram state per group: keys ++ mv_hist
    * (array<long>[nBuckets] of exact counts). NULL *and NaN* values
    * are excluded — floor(NaN) plus Spark's NaN-above-everything
    * least/greatest would otherwise clamp NaNs silently into an edge
    * bucket and skew every downstream percentile. */
  def histState(
      df: DataFrame, keys: Seq[String], value: String,
      lo: Double, hi: Double, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1 && hi > lo, "need hi > lo and nBuckets >= 1")
    val w = (hi - lo) / nBuckets
    val v = col(value).cast("double")
    val bk = least(greatest(
      floor((v - lit(lo)) / lit(w)), lit(0.0)),
      lit((nBuckets - 1).toDouble)).cast("int")
    val counts = (0 until nBuckets).map(i =>
      sum(when(bk === i, 1L).otherwise(0L)))
    df.where(v.isNotNull && !isnan(v))
      .groupBy(keys.map(col): _*)
      .agg(array(counts: _*).as("mv_hist"))
  }

  /** Merge histogram states element-wise (associative, exact). */
  def histMerge(keys: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty)
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(expr(
        """aggregate(collect_list(mv_hist),
          |  CAST(NULL AS ARRAY<BIGINT>),
          |  (acc, h) -> CASE WHEN acc IS NULL THEN h
          |              ELSE zip_with(acc, h, (a, b) -> a + b) END)"""
          .stripMargin).as("mv_hist"))
  }

  /** Percentile estimates from a histogram state: one row per (group,
    * requested p) with the interpolated estimate. The arithmetic is
    * the SAME expression the oracle replays — rank target
    * ceil(p·total), containing bucket by cumulative count, linear
    * interpolation within it. */
  def histPercentiles(
      state: DataFrame, keys: Seq[String],
      lo: Double, hi: Double, nBuckets: Int,
      ps: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // p = 0 would make the containing-bucket predicate unsatisfiable
    // (rank target 0) and the group's row silently vanish — refuse
    // instead; p=0's answer is the minimum, which a histogram cannot
    // give exactly anyway
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"percentiles must lie in (0, 1], got $ps")
    val w = (hi - lo) / nBuckets
    val rows = state.select(keys.map(col) :+
      posexplode(col("mv_hist")).as(Seq("bk", "n")): _*)
    val win = Window.partitionBy(keys.map(col): _*).orderBy(col("bk"))
    val cum = rows
      .withColumn("cum", sum(col("n")).over(win))
      .withColumn("tot", sum(col("n")).over(
        Window.partitionBy(keys.map(col): _*)))
    val pdf = state.sparkSession
      .createDataFrame(ps.map(Tuple1(_))).toDF("p")
    cum.crossJoin(broadcast(pdf))
      .withColumn("target", ceil(col("p") * col("tot")).cast("long"))
      .where(col("cum") >= col("target") &&
        (col("cum") - col("n")) < col("target"))
      .select(keys.map(col) :+ col("p") :+ col("tot").as("n_rows") :+
        (lit(lo) + lit(w) * (col("bk").cast("double") +
          (col("target") - (col("cum") - col("n"))).cast("double")
            / col("n").cast("double"))).as("estimate"): _*)
  }

  // ---------------------------------------------------------------------
  // RETRACTABLE (CDC-aware) variant: counts and sums under ±1 weights,
  // so a normalized changelog (U expressed as D-old + I-new, see
  // Cdc.changelogSigned) updates the rollup under deletes and updates
  // too. Min/max deliberately absent — a deleted extremum cannot
  // retract without rescanning the base; that is the algebra's limit,
  // not an implementation gap. Decimal arithmetic makes retraction
  // EXACT: -x cancels +x to the last digit, so a mutate-then-aggregate
  // equals aggregate-of-mutated bit-for-bit.
  // ---------------------------------------------------------------------

  /** Weighted count/sum state: rows contribute `weight` (±1) to the
    * count and `weight * value` to each sum.
    */
  def retractState(
      df: DataFrame,
      keys: Seq[String],
      values: Seq[String],
      weight: org.apache.spark.sql.Column): DataFrame = {
    val aggs = sum(weight.cast("long")).as("mv_n") +: values.map(c =>
      sum((col(c).cast(SumType) * weight).cast(SumType))
        .cast(SumType).as(s"mv_sum_$c"))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** [[retractState]] of a normalized changelog: D rows weigh −1,
    * everything else +1.
    */
  def retractStateOf(
      changelog: DataFrame,
      keys: Seq[String],
      values: Seq[String],
      operCol: String = "oper"): DataFrame =
    retractState(changelog, keys, values,
      when(upper(trim(col(operCol))) === "D", lit(-1)).otherwise(lit(1)))

  /** Merge retractable states; groups whose count cancels to zero are
    * DROPPED (the group no longer exists — keeping a 0-count row would
    * leak a tombstone per deleted group forever).
    */
  def mergeRetract(
      keys: Seq[String], values: Seq[String], states: DataFrame*): DataFrame = {
    val aggs = sum(col("mv_n")).as("mv_n") +: values.map(c =>
      sum(col(s"mv_sum_$c")).cast(SumType).as(s"mv_sum_$c"))
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .where(col("mv_n") =!= 0)
  }

  /** Present a retractable state: n, sum (double), avg. */
  def finishRetract(state: DataFrame, values: Seq[String]): DataFrame = {
    val derived = col("mv_n").as("n") +: values.flatMap(c => Seq(
      col(s"mv_sum_$c").cast(DoubleType).as(s"sum_$c"),
      (col(s"mv_sum_$c").cast(DoubleType) /
        col("mv_n").cast(DoubleType)).as(s"avg_$c")))
    val keyCols = state.columns.toSeq
      .filterNot(c => c == "mv_n" || values.exists(v => c == s"mv_sum_$v"))
    state.select(keyCols.map(col) ++ derived: _*)
  }
}
