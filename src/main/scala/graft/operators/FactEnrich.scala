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
