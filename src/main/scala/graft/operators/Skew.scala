package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed and
  * whose build side is too large to broadcast: **key salting**.
  *
  * The probe (skewed) side gets a random salt in [0, factor); the build
  * side is replicated `factor`× with every salt value; the join key
  * becomes (key, salt), spreading each hot key over `factor` reducers.
  *
  * Use AQE's skew-join handling first (`spark.sql.adaptive.skewJoin`,
  * on by default in GraftSession) — salting is for the cases AQE can't
  * split, e.g. a single key exceeding one executor's memory in a
  * sort-merge join, or skewed aggregations (saltedCount two-phase agg).
  */
object Skew {

  /** Salted inner/left equi-join on one key column. */
  def saltedJoin(
      probe: DataFrame, // large, skewed
      build: DataFrame, // large, not broadcastable
      key: String,
      factor: Int = 16,
      joinType: String = "inner"): DataFrame = {
    // right/full outer would emit `factor` phantom null-extended rows
    // per unmatched build row (every salted replica misses)
    require(
      Set("inner", "left", "left_outer", "leftouter", "cross")
        .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins, got $joinType")
    val salted = probe.withColumn("__salt",
      (rand(seed = 42) * factor).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted
      .join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Two-phase (salted) aggregation: partial agg on (key, salt), final
    * agg on key — caps any single reducer's load at ~1/factor of the
    * hottest key. For algebraic aggregates Spark's own partial
    * aggregation already does this; use for positional/exotic aggs or
    * when partials are disabled by distinct.
    */
  def saltedCountDistinct(
      df: DataFrame,
      key: String,
      distinctCol: String,
      factor: Int = 16): DataFrame =
    df.withColumn("__salt", (xxhash64(col(distinctCol)) % factor).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(distinctCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"n_distinct_$distinctCol"))
}
