package graft

import org.apache.spark.sql.functions._

import graft.plans.MvRewrite
import graft.plans.MvRewrite.MvCatalog

/** Transparent materialized-view rewrite (plans/MvRewrite.scala). */
class MvRewriteSpec extends SparkSpec {

  private val factPath = s"$sfDir/lineitem.parquet"

  private def freshView(): Unit = {
    val mvPath = java.nio.file.Files
      .createTempDirectory("graft_mv_spec").toString + "/mv"
    MvRewrite.createView(spark, "spec_mv", factPath, mvPath,
      groupCols = Seq("l_returnflag", "l_linestatus"),
      sumCols = Seq("l_quantity"),
      minMaxCols = Seq("l_quantity"))
    MvRewrite.install(spark)
  }

  private def rollup() =
    spark.read.parquet(factPath)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("l_quantity").cast("decimal(25,6)")).cast("double").as("s"),
        count(lit(1)).cast("long").as("n"),
        min(col("l_quantity")).as("mn"),
        max(col("l_quantity")).as("mx"))
      .orderBy("l_returnflag")

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("a coarser rollup over the fact path is re-pointed at the view " +
      "and the results are bit-identical to the un-rewritten query") {
    MvCatalog.clear()
    val direct = rollup().collect() // catalog empty -> no rewrite
    assert(plan(rollup()).contains("lineitem.parquet"))
    freshView()
    val rewritten = rollup()
    val p = plan(rewritten)
    assert(!p.contains("lineitem.parquet"),
      s"fact table still scanned after rewrite:\n$p")
    assert(p.contains("graft_mv_spec"), s"view not scanned:\n$p")
    assert(rewritten.collect().toSeq == direct.toSeq)
    // view-granularity grouping rewrites too
    val fine = spark.read.parquet(factPath)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).cast("long").as("n"))
    assert(!plan(fine).contains("lineitem.parquet"))
  }

  test("ineligible queries are left untouched: filters, distinct " +
      "aggregates, unregistered measures, non-subset grouping") {
    MvCatalog.clear(); freshView()
    val filtered = spark.read.parquet(factPath)
      .where(col("l_quantity") > 10)
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    assert(plan(filtered).contains("lineitem.parquet"),
      "a filtered query must not use the unfiltered view")
    val distinctAgg = spark.read.parquet(factPath)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
    assert(plan(distinctAgg).contains("lineitem.parquet"))
    val otherMeasure = spark.read.parquet(factPath)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_extendedprice").cast("decimal(25,6)")).as("s"))
    assert(plan(otherMeasure).contains("lineitem.parquet"),
      "a measure outside the registered set must not rewrite")
    val otherGroup = spark.read.parquet(factPath)
      .groupBy(col("l_shipdate")).agg(count(lit(1)).as("n"))
    assert(plan(otherGroup).contains("lineitem.parquet"))
    // double-sum (non-decimal) must NOT rewrite: float re-association
    val floatSum = spark.read.parquet(factPath)
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("s"))
    assert(plan(floatSum).contains("lineitem.parquet"))
  }

  test("an incrementally-maintained view (MaterializedAgg state merge, " +
      "no fact rescan) serves rewrites bit-identically after the fact " +
      "grows") {
    import graft.operators.MaterializedAgg
    MvCatalog.clear()
    val dirRoot = java.nio.file.Files
      .createTempDirectory("graft_mv_inc").toString
    val (fact, mv) = (s"$dirRoot/fact", s"$dirRoot/mv")
    val li = spark.read.parquet(factPath)
    val base = li.where(col("l_orderkey") % 5 =!= 0)
    val delta = li.where(col("l_orderkey") % 5 === 0)
    base.write.parquet(fact)
    val keys = Seq("l_returnflag")
    val vals = Seq("l_quantity")

    def publish(state: org.apache.spark.sql.DataFrame): Unit = {
      state.select(col("l_returnflag"), col("mv_n").as("cnt"),
          col("mv_sum_l_quantity").cast("decimal(25,6)")
            .as("sum_l_quantity"),
          col("mv_min_l_quantity").as("min_l_quantity"),
          col("mv_max_l_quantity").as("max_l_quantity"))
        .write.mode("overwrite").parquet(mv)
      MvRewrite.registerView(spark, "inc_mv", fact, mv, keys, vals, vals)
    }
    def query() = spark.read.parquet(fact)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(25,6)")).cast("double")
        .as("s"), count(lit(1)).cast("long").as("n"),
        min(col("l_quantity")).as("mn"), max(col("l_quantity")).as("mx"))
      .orderBy("l_returnflag")

    val s1 = MaterializedAgg.state(base, keys, vals).cache()
    publish(s1); MvRewrite.install(spark)
    assert(!plan(query()).contains("/fact"), "v1 rewrite missed")
    val v1 = query().collect()

    // the fact grows; the view refreshes by MERGING the delta's state —
    // the base is never rescanned
    delta.write.mode("append").parquet(fact)
    publish(MaterializedAgg.merge(keys, vals, s1,
      MaterializedAgg.state(delta, keys, vals)))
    val served = query()
    assert(!plan(served).contains("/fact"), "v2 rewrite missed")
    val got = served.collect()
    MvCatalog.clear() // direct recompute over the grown fact
    val want = query().collect()
    assert(got.toSeq == want.toSeq,
      "incrementally-refreshed view diverged from direct recompute")
    assert(got.toSeq != v1.toSeq, "delta should have changed the answer")
  }

  test("count(NULL) stays 0 per group, and a global count over an " +
      "EMPTY fact stays 0 through the rewrite") {
    MvCatalog.clear(); freshView()
    // count of an always-null expression is 0, not the row count.
    // Catalyst usually constant-folds it away before this rule runs
    // (leaving a groups-only aggregate that rewrites legitimately);
    // whichever path planned it, the VALUES must stay 0 — the rule's
    // own non-null-literal guard covers orderings where the fold
    // hasn't happened yet
    val nullCount = spark.read.parquet(factPath)
      .groupBy(col("l_returnflag")).agg(count(lit(null)).as("n"))
    assert(nullCount.collect().forall(_.getLong(1) == 0L),
      "count(NULL) must be 0 per group")
    // empty fact: Sum over the empty view is NULL; the rewritten
    // global count must still be 0
    MvCatalog.clear()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mv_empty").toString
    val (ef, emv) = (s"$dir/fact", s"$dir/mv")
    spark.read.parquet(factPath).where(lit(false)).write.parquet(ef)
    MvRewrite.createView(spark, "empty_mv", ef, emv,
      groupCols = Seq("l_returnflag"), sumCols = Seq("l_quantity"),
      minMaxCols = Nil)
    val cnt = spark.read.parquet(ef).agg(count(lit(1)).cast("long").as("n"))
    assert(!plan(cnt).contains("/fact"), "global count should rewrite")
    assert(cnt.first().getLong(0) == 0L,
      "rewritten count over an empty fact must be 0, not NULL")
    MvCatalog.clear()
  }

  test("registering a view with a missing layout column fails LOUD at " +
      "registration, not inside the optimizer") {
    MvCatalog.clear()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mv_bad").toString
    // a "view" lacking cnt and the min_/max_ measures
    spark.read.parquet(factPath)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("decimal(25,6)"))
        .cast("decimal(25,6)").as("sum_l_quantity"))
      .write.mode("overwrite").parquet(s"$dir/mv")
    val e = intercept[IllegalArgumentException] {
      MvRewrite.registerView(spark, "bad_mv", factPath, s"$dir/mv",
        groupCols = Seq("l_returnflag", "l_linestatus"),
        sumCols = Seq("l_quantity"), minMaxCols = Seq("l_quantity"))
    }
    assert(e.getMessage.contains("missing column"))
    assert(MvCatalog.isEmpty, "a refused view must not register")
    // queries over the fact keep working, un-rewritten
    assert(plan(rollup()).contains("lineitem.parquet"))
  }

  test("other tables and joins are never touched by the rule") {
    MvCatalog.clear(); freshView()
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    assert(plan(orders).contains("orders.parquet"))
    val joined = spark.read.parquet(factPath)
      .join(spark.read.parquet(s"$sfDir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    assert(plan(joined).contains("lineitem.parquet"))
  }
}
