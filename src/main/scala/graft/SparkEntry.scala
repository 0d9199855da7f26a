package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2, expressed
  * Spark-first on the driver's test tables; `oracleSql` carries the
  * DuckDB-equivalent ANSI SQL. Column aliases match exactly between the
  * two (the driver sorts columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The thin-layer star aggregation (reference:
    * jobs/semantic/gosales_thin_layer/tl_sm_gosales_overview_01.sql).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.a2ThinLayerAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}
