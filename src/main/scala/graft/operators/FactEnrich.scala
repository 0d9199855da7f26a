package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-way dimension-enrichment join (SURVEY §2.3 J1; reference:
  * .../dl_ct_gosales_sales_fact_01.py:55-73 — fact LEFT JOIN 4 dims on
  * lower()-normalized codes).
  *
  * Scale contract: the fact side is never shuffled — every dimension is
  * broadcast (dims are small by star-schema definition). A dimension too
  * big to broadcast should instead be bucketed/pre-partitioned on its
  * key and joined with a shuffle hash join; pass `broadcastDim = false`
  * for that case and let AQE pick.
  */
object FactEnrich {

  /** One dimension to attach. `keys` maps factColumn -> dimColumn;
    * comparison runs through `normalize` on string keys.
    */
  final case class Dim(
      df: DataFrame,
      keys: Seq[(String, String)],
      select: Seq[(String, String)], // (dimColumn, outputAlias)
      joinType: String = "left",
      normalize: Option[Column => Column] = None,
      broadcastDim: Boolean = true)

  /** A dimension stored as a [[graft.sinks.CowTable]], with the
    * broadcast-vs-shuffle decision taken from the table's MANIFEST —
    * the snapshot's live-data byte count, metadata the commit already
    * computed — instead of a static flag. Planning therefore costs
    * ZERO data I/O and no collect: the one manifest read yields both
    * the DataFrame and the size. The static decision this replaces is
    * exactly the thing that rots at scale — a dimension that was
    * broadcast-sized at launch grows past the executor-memory budget
    * and the job starts OOMing executors; sized from the manifest, the
    * same pipeline flips that dimension to a shuffle join at the next
    * snapshot, unprompted. `broadcastOverride` keeps the operator's
    * explicit word as the final one (e.g. force-broadcast a table of
    * skewed hot keys regardless of size).
    *
    * `maxBroadcastBytes` compares against the manifest's PARQUET bytes
    * — compressed, so an in-memory hash relation is typically 2-5×
    * larger; the 32 MB default leaves that headroom under Spark's own
    * broadcast limits.
    */
  def dimFromCow(
      spark: org.apache.spark.sql.SparkSession,
      root: String,
      keys: Seq[(String, String)],
      select: Seq[(String, String)],
      joinType: String = "left",
      normalize: Option[Column => Column] = None,
      broadcastOverride: Option[Boolean] = None,
      maxBroadcastBytes: Long = 32L * 1024 * 1024): Dim = {
    import graft.sinks.CowTable
    val m = CowTable.currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(
        s"no committed snapshot at $root — a dimension must exist " +
          "before the fact enrich plans against it"))
    val bytes = m.files.map(_.bytes).sum
    // data frame from the SAME manifest the size came from — a second
    // currentManifest read could land on a newer snapshot and size one
    // commit while joining another
    val df = CowTable.readSnapshot(spark, root, m)
    Dim(df, keys, select, joinType, normalize,
      broadcastDim = broadcastOverride.getOrElse(bytes <= maxBroadcastBytes))
  }

  def enrich(fact: DataFrame, dims: Seq[Dim]): DataFrame =
    dims.zipWithIndex.foldLeft(fact) { case (acc, (d, i)) =>
      val alias = s"__dim$i"
      val dimDf = d.df.as(alias)
      val cond = d.keys
        .map { case (fk, dk) =>
          val l = acc(fk)
          val r = col(s"$alias.$dk")
          d.normalize.fold(l === r)(n => n(l) === n(r))
        }
        .reduce(_ && _)
      val side = if (d.broadcastDim) broadcast(dimDf) else dimDf
      acc
        .join(side, cond, d.joinType)
        .select(
          acc.columns.map(acc(_)) ++
            d.select.map { case (c, a) => col(s"$alias.$c").as(a) }: _*)
    }
}
