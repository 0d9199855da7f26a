package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.{CowBucketSpec, CowTable, CowV2}

/** CowTable-native bucketing declared to the PLANNER: a table
  * registered with [[graft.sinks.CowTable.setBucketSpec]] and written
  * with `bucketId(keys, n)` partition values surfaces a real
  * `BucketSpec` through [[graft.sinks.CowV2]], so co-bucketed joins
  * and key aggregations run with ZERO exchange — the write-time layout
  * replaces the per-query shuffle, across every CowTable write path.
  */
class CowBucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"cowbkt_$tag").toString

  private val N = 8

  private def mkTable(root: String, df: org.apache.spark.sql.DataFrame,
      id: Long, keys: Seq[String]): Unit =
    CowTable.commitFull(
      df.withColumn("pb", CowTable.bucketId(keys, N)),
      root, id, Seq("pb"), keep = 10)

  private def withNoBroadcast[A](body: => A): A = {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("co-bucketed CowTable join runs with zero Exchange and the " +
      "right rows; layout survives an upsert commit") {
    val a = tmp("a"); val b = tmp("b")
    CowTable.setBucketSpec(spark, a, CowBucketSpec("pb", N, Seq("k")))
    CowTable.setBucketSpec(spark, b, CowBucketSpec("pb", N, Seq("k")))
    val left = spark.range(500).select($"id".as("k"),
      concat(lit("L"), $"id").as("lv"))
    val right = spark.range(300).select($"id".as("k"),
      concat(lit("R"), $"id").as("rv"))
    mkTable(a, left, 1L, Seq("k"))
    mkTable(b, right, 1L, Seq("k"))
    // a second write path (upsert) must keep the files tagged
    CowTable.upsert(spark, b, 2L,
      spark.range(250, 320).select($"id".as("k"),
        concat(lit("R2"), $"id").as("rv"),
        CowTable.bucketId(Seq("k"), N).as("pb")),
      Seq("k"), Seq("pb"), keep = 10)
    withNoBroadcast {
      val joined = CowV2.read(spark, a).get.drop("pb")
        .join(CowV2.read(spark, b).get.drop("pb"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"co-bucketed CowTable join must not shuffle:\n$plan")
      val got = joined.select($"k", $"rv").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val want = (0L until 250L).map(k => (k, s"R$k")).toSet ++
        (250L until 320L).map(k => (k, s"R2$k")).toSet
      assert(got == want, "bucketed join returned wrong rows")
    }
  }

  test("key aggregation over a bucketed CowTable needs no exchange, " +
      "and bucket pruning fires on a key-equality filter") {
    val root = tmp("agg")
    CowTable.setBucketSpec(spark, root, CowBucketSpec("pb", N, Seq("k")))
    mkTable(root, spark.range(1000).select($"id".as("k"),
      ($"id" % 10).as("v")), 1L, Seq("k"))
    withNoBroadcast {
      val agg = CowV2.read(spark, root).get
        .groupBy("k").agg(sum("v").as("sv"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed key-agg must not shuffle:\n$plan")
      assert(agg.count() == 1000)
      // bucket pruning: equality on the bucket key reads 1 of N
      // buckets. A bare filter has no operator that NEEDS the bucket
      // distribution, so DisableUnnecessaryBucketedScan would turn the
      // bucketed read off for it — hold it on to observe the pruning.
      val auto = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
      val savedAuto = spark.conf.get(auto)
      spark.conf.set(auto, "false")
      try {
        val one = CowV2.read(spark, root).get.where($"k" === 42L)
        val p1 = one.queryExecution.executedPlan.toString
        assert(p1.contains(s"SelectedBucketsCount: 1 out of $N"),
          s"bucket pruning did not fire:\n$p1")
        assert(one.select("v").as[Long].collect().toSeq == Seq(2L))
      } finally spark.conf.set(auto, savedAuto)
    }
  }

  test("an unregistered table keeps the shuffle (negative control) " +
      "and a miswritten bucket value fails the COMMIT, not the join") {
    val root = tmp("neg")
    mkTable(root, spark.range(100).select($"id".as("k"),
      $"id".as("v")), 1L, Seq("k"))
    withNoBroadcast {
      val agg = CowV2.read(spark, root).get.groupBy("k").count()
      assert(agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "control: un-bucket-spec'd table should shuffle")
    }
    val bad = tmp("bad")
    CowTable.setBucketSpec(spark, bad, CowBucketSpec("pb", N, Seq("k")))
    val e = intercept[IllegalArgumentException] {
      CowTable.commitFull(
        spark.range(10).select($"id".as("k"), lit(3).as("pb")),
        bad, 1L, Seq("pb"), keep = 10)
    }
    assert(e.getMessage.contains("bucket spec"),
      s"wrong failure: ${e.getMessage}")
  }

  test("OPTIMIZE ZORDER and compaction keep the bucket layout " +
      "declarable: the join stays exchange-free afterwards") {
    val a = tmp("opt_a"); val b = tmp("opt_b")
    CowTable.setBucketSpec(spark, a, CowBucketSpec("pb", N, Seq("k")))
    CowTable.setBucketSpec(spark, b, CowBucketSpec("pb", N, Seq("k")))
    mkTable(a, spark.range(400).select($"id".as("k"),
      ($"id" % 11).as("v")), 1L, Seq("k"))
    mkTable(b, spark.range(400).select($"id".as("k"),
      ($"id" * 3).as("w")), 1L, Seq("k"))
    require(CowTable.optimizeZorder(spark, a, 2L, Seq("k", "v"),
      targetFileBytes = 32 * 1024, keep = 10))
    // fragment b, then compact it
    (0 until 2).foreach(i => CowTable.commitAppend(
      spark.range(400 + i * 50, 450 + i * 50).select($"id".as("k"),
        ($"id" * 3).as("w"),
        CowTable.bucketId(Seq("k"), N).as("pb")),
      b, 2L + i, Seq("pb"), keep = 10))
    CowTable.compactPartitions(spark, b, 10L,
      targetFileBytes = 8 * 1024 * 1024, keep = 10)
    withNoBroadcast {
      val joined = CowV2.read(spark, a).get.drop("pb")
        .join(CowV2.read(spark, b).get.drop("pb"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"maintenance commits broke the bucket layout:\n$plan")
      assert(joined.count() == 400)
    }
  }

  test("setBucketSpec refuses a table that already committed") {
    val root = tmp("late")
    mkTable(root, spark.range(10).select($"id".as("k"), $"id".as("v")),
      1L, Seq("k"))
    intercept[IllegalArgumentException] {
      CowTable.setBucketSpec(spark, root, CowBucketSpec("pb", N, Seq("k")))
    }
  }
}
