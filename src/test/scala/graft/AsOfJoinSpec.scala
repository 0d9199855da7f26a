package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    ("u1", 10L, "p1"), ("u1", 20L, "p2"), ("u2", 5L, "p3"))
    .toDF("k", "t", "tag")
  private def right = Seq(
    ("u1", 5L, 100L), ("u1", 15L, 200L), ("u3", 1L, 999L))
    .toDF("k", "t", "v")

  test("inclusive as-of picks the latest right row at or before left time") {
    val out = AsOfJoin.asof(left, right, "k", "t", "t", Seq("v"))
      .select("k", "t", "tag", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.toString.toLong))).toSet
    assert(out == Set(
      ("u1", 10L, "p1", Some(100L)),
      ("u1", 20L, "p2", Some(200L)),
      ("u2", 5L, "p3", None))) // no right rows for u2
  }

  test("equal timestamps: inclusive matches, strict does not") {
    val l = Seq(("k", 15L, "x")).toDF("k", "t", "tag")
    val incl = AsOfJoin.asof(l, right, "k", "t", "t", Seq("v"))
    val strict = AsOfJoin.asof(l, right, "k", "t", "t", Seq("v"), strict = true)
    // right has ("u1",15,200) but key "k" ≠ "u1": build matching fixture
    val r2 = Seq(("k", 15L, 7L), ("k", 3L, 1L)).toDF("k", "t", "v")
    val inclV = AsOfJoin.asof(l, r2, "k", "t", "t", Seq("v"))
      .select("v").head().getLong(0)
    val strictV = AsOfJoin.asof(l, r2, "k", "t", "t", Seq("v"), strict = true)
      .select("v").head().getLong(0)
    assert(inclV == 7L) // ts=15 row included
    assert(strictV == 1L) // only ts<15 rows eligible
    assert(incl.count() == 1 && strict.count() == 1)
  }

  test("FactEnrich non-broadcast path falls back to a shuffle join") {
    import graft.operators.FactEnrich
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.load(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey")
      val out = FactEnrich.enrich(li, Seq(
        FactEnrich.Dim(Tables.load(spark, sfDir, "part"),
          keys = Seq("l_partkey" -> "p_partkey"),
          select = Seq("p_brand" -> "p_brand"),
          broadcastDim = false)))
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), plan.take(500))
      assert(out.count() == li.count())
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("matches the oracle-checked asof query shape on events") {
    // sanity on real data: every purchase row appears exactly once
    val out = QueriesCore.asofJoin(spark, sfDir)
    val purchases = Tables.load(spark, sfDir, "events")
      .where($"event_type" === "purchase")
    assert(out.count() == purchases.count())
  }
}
