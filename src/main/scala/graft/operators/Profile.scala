package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, NumericType}

/** Column-level data profiling — the quality gate a training-data
  * pipeline runs before ingesting a new drop: per-column null rates,
  * distinct counts, numeric ranges. One pass over the data (a single
  * aggregate with map-side partials), output pivoted long-form.
  */
object Profile {

  /** One row per column: (column, n_rows, n_nulls, n_distinct,
    * min_num_u, max_num_u) — numeric bounds as floor-micros (null for
    * non-numeric columns).
    */
  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.schema.fields
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(lit(1)).as(s"__n_${f.name}"),
        count(when(c.isNull, 1)).as(s"__nulls_${f.name}"),
        approx_count_distinct(c).as(s"__dist_${f.name}")) ++
        (f.dataType match {
          case _: NumericType => Seq(
            floor(min(c).cast(DoubleType) * 1e6).cast("long").as(s"__min_${f.name}"),
            floor(max(c).cast(DoubleType) * 1e6).cast("long").as(s"__max_${f.name}"))
          case _ => Seq(
            lit(null).cast("long").as(s"__min_${f.name}"),
            lit(null).cast("long").as(s"__max_${f.name}"))
        })
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { f =>
      struct(
        lit(f.name).as("col_name"),
        col(s"__n_${f.name}").as("n_rows"),
        col(s"__nulls_${f.name}").as("n_nulls"),
        col(s"__dist_${f.name}").as("n_distinct_approx"),
        col(s"__min_${f.name}").as("min_num_u"),
        col(s"__max_${f.name}").as("max_num_u"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }

  /** Exact-distinct variant (one extra pass per column is avoided by
    * count(distinct) in a single agg — Spark expands to Expand+2-phase).
    */
  def profileExact(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val cols = df.schema.fields
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(lit(1)).as(s"__n_${f.name}"),
        count(when(c.isNull, 1)).as(s"__nulls_${f.name}"),
        countDistinct(c).as(s"__dist_${f.name}")) ++
        (f.dataType match {
          case _: NumericType => Seq(
            floor(min(c).cast(DoubleType) * 1e6).cast("long").as(s"__min_${f.name}"),
            floor(max(c).cast(DoubleType) * 1e6).cast("long").as(s"__max_${f.name}"))
          case _ => Seq(
            lit(null).cast("long").as(s"__min_${f.name}"),
            lit(null).cast("long").as(s"__max_${f.name}"))
        })
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { f =>
      struct(
        lit(f.name).as("col_name"),
        col(s"__n_${f.name}").as("n_rows"),
        col(s"__nulls_${f.name}").as("n_nulls"),
        col(s"__dist_${f.name}").as("n_distinct"),
        col(s"__min_${f.name}").as("min_num_u"),
        col(s"__max_${f.name}").as("max_num_u"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }
}
