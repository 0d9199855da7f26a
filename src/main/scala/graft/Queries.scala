package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The operator-inventory queries (SURVEY.md §2 + training-data ops)
  * expressed Spark-first on the driver's test tables, with matching
  * DuckDB oracle SQL.
  *
  * Determinism rules used throughout (so the DuckDB hash-compare is
  * stable): (1) sums over doubles go through an exact DECIMAL cast in
  * BOTH engines, then back to double — decimal addition is associative
  * so partial-aggregation order cannot change the result; (2) doubles
  * that feed order-dependent arithmetic travel as integer micro-units
  * (`floor(x*1e6)`); (3) every query ends in an ORDER BY over a unique
  * key set; (4) aggregate / computed columns are aliased identically in
  * Spark and SQL; (5) Spark's double→int cast truncates while DuckDB's
  * rounds — oracles use `trunc()` explicitly.
  */
object Queries {

  /** l_quantity etc. are doubles; sum via decimal for associativity. */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(25, 6))).cast(DoubleType)

  // ---------------------------------------------------------------------
  // A2+J5: thin-layer star aggregation (reference:
  // jobs/semantic/gosales_thin_layer/tl_sm_gosales_overview_01.sql:5-26 —
  // 8-key GROUP BY with SUM(qty), SUM(price), SUM(price*qty), COUNT(*)).
  // ---------------------------------------------------------------------
  def a2ThinLayerAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val a2ThinLayerAggSql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_base_price,
      | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc_price,
      | COUNT(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------

  def all: Map[String, (SparkSession, String) => DataFrame] =
    Map("a2_thin_layer_agg" ->
      ((s: SparkSession, d: String) => a2ThinLayerAgg(s, d))) ++
      QueriesCore.all ++ QueriesText.all ++ QueriesVector.all ++
      QueriesExtra.all ++ QueriesCurated.all ++ QueriesCow.all ++
      QueriesAnalytics.all ++ QueriesCorpus.all

  def oracles: Map[String, String] =
    Map("a2_thin_layer_agg" -> a2ThinLayerAggSql) ++
      QueriesCore.oracles ++ QueriesText.oracles ++ QueriesVector.oracles ++
      QueriesExtra.oracles ++ QueriesCurated.oracles ++ QueriesCow.oracles ++
      QueriesAnalytics.oracles ++ QueriesCorpus.oracles
}
