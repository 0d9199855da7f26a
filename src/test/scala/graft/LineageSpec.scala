package graft

import org.apache.spark.sql.functions._

import graft.plans.Lineage

class LineageSpec extends SparkSpec {
  import spark.implicits._

  test("join + aggregate + alias chains trace every output column to " +
      "its source columns across both tables") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    val q = o.join(c, o("o_custkey") === c("c_custkey"))
      .withColumn("price_cents", floor(col("o_totalprice") * 100))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(sum(col("price_cents")).as("cents"),
        countDistinct(col("o_orderkey"), col("c_custkey")).as("nd"),
        count(lit(1)).as("n"))
    val lin = Lineage.columnLineage(q)
    def srcsOf(out: String): Set[(String, String)] = lin(out)
    assert(srcsOf("segment").map(_._2) == Set("c_mktsegment"))
    assert(srcsOf("segment").forall(_._1.contains("customer.parquet")))
    assert(srcsOf("cents").map(_._2) == Set("o_totalprice"))
    assert(srcsOf("nd").map(_._2) == Set("o_orderkey", "c_custkey"),
      s"multi-input aggregate lost a source: ${srcsOf("nd")}")
    assert(srcsOf("nd").exists(_._1.contains("orders.parquet")) &&
      srcsOf("nd").exists(_._1.contains("customer.parquet")))
    assert(srcsOf("n").isEmpty, "count(lit(1)) derives from nothing")
  }

  test("union merges branches positionally even when column names " +
      "differ; renames ride ExprIds for free") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("k"), col("c_acctbal").as("v"))
    val lin = Lineage.columnLineage(o.union(c))
    assert(lin("k").map(_._2) == Set("o_orderkey", "c_custkey"))
    assert(lin("v").map(_._2) == Set("o_totalprice", "c_acctbal"))
  }

  test("generators (explode) trace their outputs to the generator's " +
      "inputs; window functions to their expression inputs") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val exploded = d.select(col("doc_id"),
      explode(split(col("text"), "\\s+")).as("token"))
    val lin1 = Lineage.columnLineage(exploded)
    assert(lin1("token").map(_._2) == Set("text"))
    assert(lin1("doc_id").map(_._2) == Set("doc_id"))
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderstatus")).orderBy(col("o_orderkey"))
    val ranked = o.select(col("o_orderkey"),
      row_number().over(w).as("rn"),
      sum(col("o_totalprice")).over(w).as("running"))
    val lin2 = Lineage.columnLineage(ranked)
    assert(lin2("running").map(_._2).contains("o_totalprice"))
    assert(lin2("rn").map(_._2) ==
      Set("o_orderstatus", "o_orderkey"),
      "window ordering/partitioning columns are lineage inputs")
  }

  test("Expand-produced outputs (unpivot) and scalar subqueries trace " +
      "— neither reads as 'derived from nothing'") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val melted = li.select(col("l_orderkey"), col("l_quantity"),
        col("l_discount"))
      .unpivot(Array(col("l_orderkey")),
        Array(col("l_quantity"), col("l_discount")),
        "metric", "value")
    val lin = Lineage.columnLineage(melted)
    assert(lin("value").map(_._2) == Set("l_quantity", "l_discount"),
      s"unpivoted value column lost its sources: ${lin("value")}")
    assert(lin("l_orderkey").map(_._2) == Set("l_orderkey"))
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val withSub = o.select(col("o_orderkey"),
      (col("o_totalprice") > li.select(avg(col("l_extendedprice")))
        .as[Double].head()).as("above_flat"))
    assert(Lineage.columnLineage(withSub)("above_flat").map(_._2) ==
      Set("o_totalprice"))
    // a REAL correlated scalar subquery via SQL
    o.createOrReplaceTempView("lin_orders")
    li.createOrReplaceTempView("lin_items")
    val sq = spark.sql(
      """SELECT o_orderkey,
        |  (SELECT sum(l_quantity) FROM lin_items
        |   WHERE l_orderkey = o_orderkey) AS qty
        |FROM lin_orders""".stripMargin)
    val linSq = Lineage.columnLineage(sq)
    assert(linSq("qty").map(_._2).contains("l_quantity"),
      s"scalar subquery lost its inner source: ${linSq("qty")}")
  }
}
