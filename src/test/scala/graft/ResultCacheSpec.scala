package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Metrics, ResultCache}

/** Plan-fingerprint result cache (pipeline/ResultCache.scala). */
class ResultCacheSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String = java.nio.file.Files
    .createTempDirectory("graft_rescache").toString

  private def q() = spark.read.parquet(s"$sfDir/orders.parquet")
    .where($"o_orderstatus" === "O")
    .groupBy($"o_orderpriority")
    .agg(count(lit(1)).as("n"))
    .orderBy("o_orderpriority")

  test("a repeated query hits the cache: identical rows, zero source " +
      "bytes read") {
    val root = freshRoot()
    val first = ResultCache.through(q(), root).collect().toSeq
    assert(first == q().collect().toSeq, "cached answer must equal direct")
    val listener = Metrics.register(spark)
    val served = ResultCache.through(q(), root)
    val got = served.collect().toSeq
    assert(got == first)
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("orders.parquet"),
      s"hit still reads the source:\n$plan")
    assert(plan.contains("graft_rescache"))
    // the hit's read touched only cache bytes — far less than the
    // source table. Attribute by the hit's OWN QueryExecution (suites
    // share one SparkContext and run in parallel, so min/max over the
    // shared listener bus can latch another suite's action instead)
    val hitMetrics = listener.drainFor(served.queryExecution)
    assert(hitMetrics.nonEmpty, "no metrics recorded for the hit's collect")
    val hitBytes = hitMetrics.map(_.bytesRead).max
    val sourceBytes = new java.io.File(s"$sfDir/orders.parquet").length()
    assert(hitBytes < sourceBytes,
      s"hit read $hitBytes bytes vs source $sourceBytes")
  }

  test("logically identical but syntactically different queries share " +
      "one key; a changed source misses") {
    val a = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderpriority", $"o_orderstatus")
      .where($"o_orderstatus" === "O")
    val b = spark.read.parquet(s"$sfDir/orders.parquet")
      .where($"o_orderstatus" === "O")
      .select($"o_orderpriority", $"o_orderstatus")
    assert(ResultCache.fingerprint(a) == ResultCache.fingerprint(b),
      "optimizer-equal plans must share a cache key")
    // a rewritten source changes the inventory and must change the key
    val copy = freshRoot() + "/orders"
    spark.read.parquet(s"$sfDir/orders.parquet").write.parquet(copy)
    def onCopy() = spark.read.parquet(copy)
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
    val k1 = ResultCache.fingerprint(onCopy())
    spark.read.parquet(s"$sfDir/orders.parquet").limit(10)
      .write.mode("append").parquet(copy)
    val k2 = ResultCache.fingerprint(onCopy())
    assert(k1 != k2, "appended source must invalidate")
  }

  test("wide plans differing only past maxToStringFields (default 25) " +
      "get DIFFERENT keys — the tree string elides the tail, the JSON " +
      "key must not") {
    // two 30-column projections identical in the first 29 expressions,
    // different only in the last — a toString-based key elides
    // everything past field 25 and would collide them
    def wide(last: org.apache.spark.sql.Column) =
      spark.read.parquet(s"$sfDir/orders.parquet").select(
        (0 until 29).map(i => ($"o_orderkey" + lit(i)).as(s"c$i")) :+
          last.as("c29"): _*)
    val a = wide($"o_orderkey" * 2)
    val b = wide($"o_orderkey" * 3)
    // sanity: the truncated STRING forms collide (the bug ADVICE named)
    val sa = a.queryExecution.optimizedPlan.canonicalized.toString
    val sb = b.queryExecution.optimizedPlan.canonicalized.toString
    assert(sa == sb, "premise: tree strings elide the differing tail")
    assert(ResultCache.fingerprint(a) != ResultCache.fingerprint(b),
      "full-fidelity key must distinguish the elided tail")
  }

  test("non-deterministic plans and non-file sources are refused") {
    intercept[IllegalArgumentException] {
      ResultCache.fingerprint(
        spark.read.parquet(s"$sfDir/orders.parquet")
          .withColumn("r", rand()))
    }
    intercept[IllegalArgumentException] {
      ResultCache.fingerprint(Seq(1, 2, 3).toDF("x"))
    }
  }
}
