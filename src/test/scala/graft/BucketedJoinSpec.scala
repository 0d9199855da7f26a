package graft

import org.apache.spark.sql.functions._
import graft.sinks.Bucketing

/** Plan-shape contract for the bucketed co-located join: when both
  * sides are bucketed on the join key with the same bucket count, the
  * join must run with ZERO shuffle exchanges — the write-time layout
  * replaces the per-query shuffle. This is the 100 TB repeated-join
  * path; the spec pins that the layout actually elides the Exchange
  * (a silent bucket-spec mismatch would quietly reintroduce it).
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of two same-bucketed tables runs with zero Exchange") {
    val orders = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")

    Bucketing.writeBucketed(orders, "b_orders", Seq("o_orderkey"), 8,
      sortBy = Seq("o_orderkey"))
    Bucketing.writeBucketed(lineitem, "b_lineitem", Seq("l_orderkey"), 8,
      sortBy = Seq("l_orderkey"))

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a shuffle-capable join path; broadcast would hide the
      // layout's effect on a real large-×-large join
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(sum("l_quantity").as("qty"), max("o_totalprice").as("price"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("bucket-spec mismatch (different counts) does reintroduce the shuffle") {
    // negative control: proves the zero-Exchange assertion above is
    // measuring the bucket layout, not some other optimization
    val orders = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey")
    Bucketing.writeBucketed(orders, "b_o8", Seq("o_orderkey"), 8)
    Bucketing.writeBucketed(orders, "b_o4", Seq("o_orderkey"), 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_o8").as("a")
        .join(spark.table("b_o4").as("b"),
          col("a.o_orderkey") === col("b.o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"), s"expected a shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_o8")
      spark.sql("DROP TABLE IF EXISTS b_o4")
    }
  }
}
