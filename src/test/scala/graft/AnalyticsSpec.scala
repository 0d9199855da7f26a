package graft

import org.apache.spark.sql.functions._

/** Gap-fill, data-quality expectations, and integer-exact PageRank
  * (QueriesAnalytics). */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  /** Executed-plan string truncated to AQE's final plan (the full
    * toString repeats every node once more under "== Initial Plan ==",
    * which would double every occurrence count). */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    val s = df.queryExecution.executedPlan.toString
    val cut = s.indexOf("== Initial Plan ==")
    if (cut >= 0) s.substring(0, cut) else s
  }

  test("gapFill emits a complete date spine per group, zero-count gaps " +
      "and carried-forward revenue") {
    val out = QueriesAnalytics.gapFill(spark, sfDir)
    val rows = out.collect()
    val prios = rows.map(_.getString(0)).distinct
    val days = rows.map(_.getString(1)).distinct
    // complete cross product: every (prio, day) appears exactly once
    assert(rows.length == prios.length * days.length)
    // the spine is contiguous: consecutive day strings differ by one day
    val sorted = days.sorted
    assert(java.time.LocalDate.parse(sorted.head)
      .plusDays(sorted.length - 1) ==
      java.time.LocalDate.parse(sorted.last))
    // gap rows have zero orders; their ffill equals the previous
    // non-gap revenue within the group
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val byDay = g.sortBy(_.getString(1))
      var lastRev = 0.0
      byDay.foreach { r =>
        val (n, isGap, ffill) = (r.getLong(2), r.getBoolean(3), r.getDouble(4))
        if (isGap) {
          assert(n == 0L)
          assert(ffill == lastRev, s"gap ffill $ffill != carried $lastRev")
        } else lastRev = ffill
      }
    }
  }

  test("dqExpectations reports the seeded pass/fail pattern and scans " +
      "lineitem at most twice (agg rules share one scan)") {
    val out = QueriesAnalytics.dqExpectations(spark, sfDir)
    val byRule = out.collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    assert(byRule.size == 7)
    // testdata invariants: keys are clean, quantity in [1,50] but
    // frequently above 30, statuses in {O,F,P}, no orphan lineitems
    assert(byRule("not_null:l_orderkey") == ((0L, true)))
    assert(byRule("range:l_quantity:1-50") == ((0L, true)))
    assert(byRule("unique:o_orderkey") == ((0L, true)))
    assert(byRule("accepted:o_orderstatus") == ((0L, true)))
    assert(byRule("ref:l_orderkey->orders") == ((0L, true)))
    val (v30, pass30) = byRule("range:l_quantity:<=30")
    assert(v30 > 0L && !pass30, "the <=30 canary rule should fail")
    // adding N agg rules must not add N scans: lineitem appears once
    // for the shared conditional aggregate + once for the anti-join
    val liScans = "lineitem\\.parquet".r.findAllIn(finalPlan(out)).size
    assert(liScans <= 1, s"expected <=1 lineitem scan in the final " +
      s"report plan (agg rules are pinned), got $liScans")
  }

  test("pageRank is integer-exact: rerun is bit-identical, mass stays " +
      "bounded, and hub suppliers outrank leaf parts") {
    val a = QueriesAnalytics.pageRank(spark, sfDir).collect()
    val b = QueriesAnalytics.pageRank(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq, "reruns must be bit-identical")
    assert(a.length == 20)
    val prs = a.map(_.getLong(1))
    assert(prs.sameElements(prs.sorted.reverse), "not sorted desc")
    // every pr positive and below total mass
    assert(prs.forall(_ > 0L))
    // suppliers aggregate the mass of their many parts, so they form
    // the head of the ranking (the tail is uniform tied part nodes,
    // deterministically ordered by the node-asc tiebreak)
    assert(a.take(10).forall(_.getString(0).startsWith("s")),
      s"expected supplier hubs on top, got ${a.map(_.getString(0)).toSeq}")
  }

  test("grouping sets compute three granularities in one scan via " +
      "Expand") {
    val df = QueriesAnalytics.aggGroupingSets(spark, sfDir)
    val rows = df.collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    val byStatus = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    val fine = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(grand.length == 1 && byStatus.nonEmpty && fine.nonEmpty)
    assert(grand.head.getLong(2) == fine.map(_.getLong(2)).sum)
    val plan = finalPlan(df)
    assert(plan.contains("Expand"), "grouping sets should plan as Expand")
    assert("orders\\.parquet".r.findAllIn(plan).size == 1)
  }

  test("ewma and corr are bit-identical at any parallelism (exact " +
      "sufficient statistics / ordered-array folds)") {
    val e1 = QueriesAnalytics.ewmaUser(spark, sfDir).collect()
    val c1 = QueriesAnalytics.corrExact(spark, sfDir).collect()
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      assert(QueriesAnalytics.ewmaUser(spark, sfDir).collect()
        .toSeq == e1.toSeq, "ewma drifted with parallelism")
      assert(QueriesAnalytics.corrExact(spark, sfDir).collect()
        .toSeq == c1.toSeq, "corr drifted with parallelism")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    c1.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.0 && c <= 1.0, s"corr out of range: $c")
    }
  }

  test("HLL distinct states merge split-invariantly: any partition of " +
      "the base yields the single-pass estimate") {
    import graft.operators.MaterializedAgg
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderpriority").as("prio"), col("o_custkey"))
    val single = MaterializedAgg.distinctFinish(
      MaterializedAgg.distinctState(o, Seq("prio"), "o_custkey"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (ways <- Seq(2, 5)) {
      val parts = (0 until ways).map(r =>
        o.where(pmod(col("o_custkey"), lit(ways)) === r))
      val merged = MaterializedAgg.distinctFinish(
        MaterializedAgg.distinctMerge(Seq("prio"),
          parts.map(MaterializedAgg.distinctState(_, Seq("prio"),
            "o_custkey")): _*))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(merged == single, s"$ways-way merge drifted")
    }
  }

  test("histogram percentile states are split-invariant and the " +
      "estimate lands within one bucket width of the exact percentile") {
    import graft.operators.MaterializedAgg
    val (lo, hi, nb) = (0.0, 500000.0, 64)
    val w = (hi - lo) / nb
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderpriority").as("prio"), col("o_totalprice"))
    def est(states: Seq[org.apache.spark.sql.DataFrame]) =
      MaterializedAgg.histPercentiles(
        MaterializedAgg.histMerge(Seq("prio"), states: _*),
        Seq("prio"), lo, hi, nb, Seq(0.5, 0.95))
        .orderBy("prio", "p").collect()
        .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(3)).toMap
    val single = est(Seq(
      MaterializedAgg.histState(o, Seq("prio"), "o_totalprice", lo, hi, nb)))
    val fiveWay = est((0 until 5).map(r =>
      MaterializedAgg.histState(
        o.where(pmod(col("o_totalprice").cast("long"), lit(5)) === r),
        Seq("prio"), "o_totalprice", lo, hi, nb)))
    assert(single == fiveWay, "merge must be split-invariant")
    // accuracy contract: estimate within one bucket width of exact
    val exact = o.groupBy("prio").agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.95)").as("p95"))
      .collect().flatMap(r => Seq(
        (r.getString(0), 0.5) -> r.getDouble(1),
        (r.getString(0), 0.95) -> r.getDouble(2))).toMap
    exact.foreach { case (k, v) =>
      assert(math.abs(single(k) - v) <= w,
        s"$k: estimate ${single(k)} vs exact $v exceeds bucket width $w")
    }
    // NaN values are excluded from the state, not clamped into a bucket
    val withNan = o.unionByName(spark.createDataFrame(Seq(
      ("1-URGENT", Double.NaN))).toDF("prio", "o_totalprice"))
    val cleanTotals = MaterializedAgg.histState(
      withNan, Seq("prio"), "o_totalprice", lo, hi, nb)
      .select(expr("aggregate(mv_hist, 0L, (a, x) -> a + x)")).collect()
      .map(_.getLong(0)).sum
    assert(cleanTotals == o.count(), "NaN leaked into the histogram")
    // p outside (0,1] is refused, not silently dropped
    intercept[IllegalArgumentException] {
      MaterializedAgg.histPercentiles(
        MaterializedAgg.histState(o, Seq("prio"), "o_totalprice",
          lo, hi, nb), Seq("prio"), lo, hi, nb, Seq(0.0))
    }
  }

  test("unpivotMetrics melts 4 measures through ONE scan (Expand), " +
      "not a 4-way self-union") {
    val df = QueriesAnalytics.unpivotMetrics(spark, sfDir)
    val rows = df.collect()
    assert(rows.map(_.getString(1)).distinct.sorted.toSeq ==
      Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))
    // every (flag, metric) cell has the same n: the melt is lossless
    assert(rows.map(_.getLong(2)).groupBy(identity).size ==
      rows.map(_.getString(0)).distinct.length)
    val plan = finalPlan(df)
    assert("lineitem\\.parquet".r.findAllIn(plan).size == 1,
      s"expected exactly 1 lineitem scan:\n$plan")
    assert(plan.contains("Expand"), "unpivot should plan as Expand")
  }

  test("anomalyZscore: stats shuffle only |event_type| rows, the fact " +
      "table is scored map-side") {
    val df = QueriesAnalytics.anomalyZscore(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty, "the skewed value distribution has outliers")
    assert(rows.forall(r => math.abs(r.getDouble(3)) >= 3.0))
    // one hash exchange (the per-type aggregate); the scoring join is
    // broadcast, so the events scan is never hash-repartitioned
    val plan = finalPlan(df)
    val ex = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(ex == 1, s"expected 1 hash exchange (stats agg), got $ex:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), "stats must broadcast")
  }

  test("equidepth buckets are balanced to within one row and tile the " +
      "value range in order") {
    val out = QueriesAnalytics.histogramEquidepth(spark, sfDir).collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(0)).toSeq == (0L until 10L))
    val counts = out.map(_.getLong(1))
    assert(counts.max - counts.min <= 1L,
      s"equi-depth violated: ${counts.toSeq}")
    val total = Tables.load(spark, sfDir, "orders").count()
    assert(counts.sum == total)
    // bucket value ranges are non-overlapping and ascending
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2),
        s"bucket overlap: ${a.getDouble(3)} > ${b.getDouble(2)}")
    }
  }
}
