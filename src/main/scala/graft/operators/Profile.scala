package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, NumericType}

/** Column-level data profiling — the quality gate a training-data
  * pipeline runs before ingesting a new drop: per-column null rates,
  * distinct counts, numeric ranges. One pass over the data (a single
  * aggregate with map-side partials), output pivoted long-form.
  *
  * Robustness: helper aliases are POSITIONAL (`__n_0`, `__n_1`, …), so
  * dotted/backticked/duplicate column names — routine in profiled-
  * before-cleaning data — can't break resolution. Numeric bounds are
  * NULL (not garbage) for NaN/±Inf and for magnitudes beyond micro-unit
  * range (|x| > 9e12, where floor(x*1e6) would saturate or lose
  * precision through the double cast).
  */
object Profile {

  private def microsOrNull(v: Column): Column =
    when(isnan(v) || abs(v) > lit(9.0e12), lit(null))
      .otherwise(floor(v * 1e6)).cast("long")

  private def build(
      df: DataFrame,
      distinctAgg: Column => Column,
      distinctName: String): DataFrame = {
    val cols = df.schema.fields.toSeq
    require(cols.nonEmpty, "cannot profile a zero-column DataFrame")
    // positional rename sidesteps dotted/duplicate source names entirely
    val positional = df.toDF(cols.indices.map(i => s"__c_$i"): _*)
    val aggs = cols.zipWithIndex.flatMap { case (f, i) =>
      val c = col(s"__c_$i")
      Seq(
        count(lit(1)).as(s"__n_$i"),
        count(when(c.isNull, 1)).as(s"__nulls_$i"),
        distinctAgg(c).as(s"__dist_$i")) ++
        (f.dataType match {
          case _: NumericType => Seq(
            microsOrNull(min(c).cast(DoubleType)).as(s"__min_$i"),
            microsOrNull(max(c).cast(DoubleType)).as(s"__max_$i"))
          case _ => Seq(
            lit(null).cast("long").as(s"__min_$i"),
            lit(null).cast("long").as(s"__max_$i"))
        })
    }
    val wide = positional.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.zipWithIndex.map { case (f, i) =>
      struct(
        lit(f.name).as("col_name"),
        col(s"__n_$i").as("n_rows"),
        col(s"__nulls_$i").as("n_nulls"),
        col(s"__dist_$i").as(distinctName),
        col(s"__min_$i").as("min_num_u"),
        col(s"__max_$i").as("max_num_u"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }

  /** Approximate-distinct profile (HLL — constant memory per column;
    * the 100 TB default).
    */
  def profile(df: DataFrame): DataFrame =
    build(df, approx_count_distinct(_), "n_distinct_approx")

  /** Exact-distinct profile (Expand-based multi-distinct — one logical
    * pass, heavier shuffle).
    */
  def profileExact(df: DataFrame): DataFrame =
    build(df, countDistinct(_), "n_distinct")

  /** Equi-width histogram of a numeric column: `nBins` bins spanning
    * [min, max], the top edge closed (a value equal to max lands in
    * the last bin, not an overflow bin). Empty bins are absent from
    * the output (counts are per seen bin). Two passes: one min/max
    * aggregate (broadcast back as a 1-row frame) + one group-by on the
    * computed bin — at 100 TB that is two scans and one tiny shuffle,
    * the profiling shape, not a sort. NULLs are excluded (they have no
    * bin; count them via [[profile]]).
    */
  def histogram(df: DataFrame, c: String, nBins: Int): DataFrame = {
    require(nBins >= 1, "nBins must be positive")
    val bounds = df.agg(
      min(col(c).cast("double")).as("__lo"),
      max(col(c).cast("double")).as("__hi"))
    df.where(col(c).isNotNull)
      .crossJoin(broadcast(bounds))
      // min==max (or a single row) degenerates to bin 0
      .withColumn("bin",
        when(col("__hi") === col("__lo"), lit(0)).otherwise(
          least(
            floor((col(c).cast("double") - col("__lo")) * nBins /
              (col("__hi") - col("__lo"))).cast("int"),
            lit(nBins - 1))))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .orderBy("bin")
  }

  /** Exact equi-depth histogram: k buckets of (near-)equal row count in
    * `(value, tie)` order, each reporting its count and value bounds.
    * Bucket of global rank r (1-based) is `(r-1)·k div n` — pure
    * integer arithmetic, so bucket boundaries are engine-exact.
    *
    * The global rank is NEVER a single-partition window. Same
    * decomposition as [[graft.operators.Pack.packGreedy]]: a coarse
    * value bucket (`floor(value/coarseWidth)` — monotone in value)
    * scopes parallel within-bucket row_numbers; per-coarse-bucket
    * counts (tiny: one row per occupied coarse bucket) cumsum into
    * exclusive offsets on the driver-side-free broadcast path; global
    * rank = offset + local rank. No stage materializes more than one
    * coarse bucket per task, so the op survives a value column whose
    * total order would never fit one machine. `tie` must make
    * `(value, tie)` unique or ranks — and therefore bucket counts —
    * would be nondeterministic.
    */
  def equidepth(
      df: DataFrame,
      valueCol: String,
      tieCol: String,
      k: Int,
      coarseWidth: Double): DataFrame = {
    require(k >= 1, "k must be positive")
    require(coarseWidth > 0, "coarseWidth must be positive")
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol)
    val b = df.where(v.isNotNull)
      .withColumn("__cb", floor(v / lit(coarseWidth)).cast("long"))
    val wLocal = Window.partitionBy(col("__cb"))
      .orderBy(v.asc, col(tieCol).asc)
    val local = b.withColumn("__lr", row_number().over(wLocal).cast("long"))
    val wB = Window.orderBy(col("__cb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = b.groupBy(col("__cb")).agg(count(lit(1)).as("__bn"))
      .withColumn("__off", sum(col("__bn")).over(wB) - col("__bn"))
    val total = offs.agg(sum(col("__bn")).as("__n")) // no second fact scan
    local
      .join(broadcast(offs.select(col("__cb").as("__ob"), col("__off"))),
        col("__cb") === col("__ob"))
      .crossJoin(broadcast(total))
      .withColumn("bucket", expr(s"(__off + __lr - 1) * $k div __n"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(v).as("lo"), max(v).as("hi"))
      .orderBy("bucket")
  }
}
