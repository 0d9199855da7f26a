package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) clustering — the multi-column completion of
  * [[CowTable]]'s data skipping. A layout sorted on ONE column gives
  * tight per-file min/max envelopes on that column only; interleaving
  * the bits of several columns' quantile-bucket ranks and range-
  * partitioning on the interleaved value gives every file a tight
  * envelope on EVERY clustered column simultaneously (each file covers
  * a small hyper-rectangle of the key space). This is Delta/Iceberg's
  * OPTIMIZE ZORDER, built from three Spark primitives:
  *
  *  1. per-column quantile boundaries from ONE mergeable
  *     `approx_percentile` sketch pass (no sort — rank error n/10000
  *     only blurs bucket edges, never correctness);
  *  2. a codegen'd scan-stage bucket+interleave expression (a literal
  *     boundary array probed with `size(filter(...))` — 2^bits
  *     comparisons per row per column, no shuffle, no UDF);
  *  3. `repartitionByRange` + in-partition sort on the z-value — the
  *     one shuffle, identical in shape to any global sort.
  *
  * Correctness is untouched either way: skipping reads stats from the
  * manifest and keeps any file whose envelope intersects (see
  * [[CowTable.readWhereBetween]]); clustering only changes HOW MANY
  * files survive the pruning. `CowTableSpec` pins that a 2-column
  * z-layout skips on BOTH columns where a linear sort skips on one.
  *
  * Columns must be castable to double (numerics, dates, timestamps).
  * NULLs land in the lowest bucket — they cluster together, which is
  * what a skipping read wants.
  */
object ZOrder {

  /** The z-value column for `cols`, given per-column sorted bucket
    * boundaries (length 2^bits - 1 each, from [[boundariesFor]]).
    * Bucketing runs through the codegen'd
    * [[graft.functions.QuantileBucketExpr]] binary search (O(bits)
    * comparisons/row, stays in whole-stage codegen) rather than a
    * higher-order filter over the literal array (O(2^bits)
    * interpreted comparisons, codegen-breaking); NULLs take bucket 0.
    */
  def zvalue(cols: Seq[Column], boundaries: Seq[Seq[Double]], bits: Int): Column = {
    require(cols.nonEmpty && cols.size == boundaries.size)
    require(bits >= 1 && bits * cols.size <= 62, "z-value must fit a long")
    val k = cols.size
    val bucketExprs = cols.zip(boundaries).map { case (c, bs) =>
      require(bs.size == (1 << bits) - 1,
        s"need ${(1 << bits) - 1} boundaries, got ${bs.size}")
      coalesce(
        graft.functions.QuantileBucketExpr.bucket(c.cast("double"), bs.sorted),
        lit(0L))
    }
    (0 until bits).flatMap { i =>
      bucketExprs.zipWithIndex.map { case (b, j) =>
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * k + j)
      }
    }.reduce(_ + _)
  }

  /** Per-column quantile boundaries for `bits`-bit buckets — one
    * sketch aggregate over the table.
    */
  def boundariesFor(
      df: DataFrame, cols: Seq[String], bits: Int): Seq[Seq[Double]] = {
    val n = (1 << bits) - 1
    val qs = (1 to n).map(i => i.toDouble / (1 << bits)).mkString(", ")
    val aggs = cols.map(c => expr(
      s"approx_percentile(CAST($c AS DOUBLE), array($qs), 10000)").as(s"__b_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    cols.indices.map { i =>
      Option(row.getAs[scala.collection.Seq[Double]](i))
        .map(_.toSeq).getOrElse(Seq.fill(n)(0.0))
    }
  }

  /** Cluster `df` on the z-order of `cols` into ~`nFiles` range
    * partitions (→ files, when written). The z helper column is
    * dropped again — the LAYOUT carries the information; readers and
    * stats see only the table's own columns.
    */
  def cluster(
      df: DataFrame, cols: Seq[String],
      nFiles: Int, bits: Int = 8): DataFrame = {
    require(nFiles > 0, "need at least one output file")
    val z = zvalue(cols.map(col), boundariesFor(df, cols, bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
