package graft

/** Plan-shape pins for composed queries whose scaladoc makes explicit
  * shuffle-count claims (the per-operator suites pin their own).
  */
class PlanShapeSpec extends SparkSpec {

  test("funnel_events: three chained stage windows share ONE user_id " +
      "exchange (no self-joins)") {
    val plan = QueriesExtra.funnelEvents(spark, sfDir)
      .queryExecution.executedPlan.toString
    val userExchanges = "Exchange hashpartitioning\\(user_id".r
      .findAllIn(plan).size
    assert(userExchanges == 1,
      s"expected 1 user_id exchange, got $userExchanges:\n$plan")
    assert(!plan.contains("Join"), s"funnel must not self-join:\n$plan")
  }

  test("chunk_docs: chunking is scan-stage — no exchange before the " +
      "explode") {
    val plan = QueriesText.chunkDocs(spark, sfDir)
      .queryExecution.executedPlan.toString
    // only the final presentation sort shuffles; generation itself is
    // a flatMap over the scan
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 0,
      s"chunk generation must not hash-shuffle:\n$plan")
  }

  test("unigram scoring pass is scan-stage: the vocabulary rides as a " +
      "map literal, zero shuffles and zero joins after training") {
    import graft.operators.UnigramScore
    val docs = Tables.load(spark, sfDir, "documents")
    val vocab = UnigramScore.collectVocabulary(
      UnigramScore.vocabulary(docs, "text", 100))
    val scored = UnigramScore.scoreWith(
      docs.select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")), "text", vocab)
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring pass shuffled:\n$plan")
    assert(!plan.contains("Join"), s"scoring pass joined:\n$plan")
    // junk text scores zero mass; corpus text scores positive
    import spark.implicits._
    val junk = UnigramScore.scoreWith(
      Seq((1L, "zzqqx vvkkw")).toDF("doc_id", "text"), "text", vocab)
      .select("common_u").as[Long].head()
    assert(junk == 0L)
    assert(scored.where($"common_u" > 0).count() > 0)
  }

  /** Executed-plan string truncated before AQE's "== Initial Plan =="
    * echo (it repeats every node and would double-count).
    */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    val s = df.queryExecution.executedPlan.toString
    val cut = s.indexOf("== Initial Plan ==")
    if (cut >= 0) s.substring(0, cut) else s
  }

  test("tpch_q4: the correlated EXISTS runs as a LEFT SEMI hash join " +
      "with the non-equi lateness predicate riding it — no cartesian, " +
      "no aggregate-then-join-back") {
    val plan = finalPlan(QueriesAnalytics.tpchQ4(spark, sfDir))
    assert(plan.contains("LeftSemi"), s"no semi join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"EXISTS degenerated to a product:\n$plan")
    // the lateness comparison is the semi join's extra condition, not
    // a post-join filter over a fanned-out product
    assert(plan.contains("l_shipdate") && plan.contains("LeftSemi"),
      s"non-equi predicate lost:\n$plan")
  }

  test("tpch_q21: double correlation = one LEFT SEMI + one LEFT ANTI " +
      "hash join on l_orderkey, disequality as join condition") {
    val plan = finalPlan(QueriesAnalytics.tpchQ21(spark, sfDir))
    assert(plan.contains("LeftSemi"), s"no semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"no anti join:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"correlation degenerated to a product:\n$plan")
  }

  test("tpch_q22: NOT EXISTS is a LEFT ANTI hash join; the scalar " +
      "threshold broadcasts (single 1-row BNLJ), never a cartesian") {
    val plan = finalPlan(QueriesAnalytics.tpchQ22(spark, sfDir))
    assert(plan.contains("LeftAnti"), s"no anti join:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"scalar subquery became a cartesian:\n$plan")
  }

  test("tpch_q13: the per-customer count REUSES the outer join's " +
      "custkey partitioning — exactly one c_custkey exchange, and the " +
      "ON-clause filter reaches the orders scan") {
    val df = QueriesAnalytics.tpchQ13(spark, sfDir)
    val plan = finalPlan(df)
    val cEx = "Exchange hashpartitioning\\(c_custkey".r.findAllIn(plan).size
    assert(cEx == 1,
      s"expected 1 c_custkey exchange (join reused by groupBy), " +
        s"got $cEx:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderpriority), " +
      "Not(EqualTo(o_orderpriority,1-URGENT))]") ||
      plan.contains("Not(EqualTo(o_orderpriority,1-URGENT))"),
      s"ON-clause filter not pushed to the orders scan:\n$plan")
  }

  test("tpch_q2: dims collapse to broadcasts before partsupp; the " +
      "min-cost scalar subquery decorrelates to an aggregate joined " +
      "back — no cartesian anywhere") {
    val plan = finalPlan(QueriesAnalytics.tpchQ2(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), s"dims not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"min-cost correlation degenerated to a product:\n$plan")
  }

  test("tpch_q9: the part-name slice broadcasts into BOTH fact legs; " +
      "no cartesian; the composite-key partsupp join stays a hash join") {
    val plan = finalPlan(QueriesAnalytics.tpchQ9(spark, sfDir))
    val bc = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bc >= 2, s"expected >=2 broadcast joins (part slice into " +
      s"both legs + dims), got $bc:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"product in q9:\n$plan")
  }

  test("tpch_q11: the grand total is a 1-row broadcast (J4 idiom) and " +
      "the HAVING threshold is integer-exact — no cartesian, one " +
      "ps_partkey aggregate") {
    val plan = finalPlan(QueriesAnalytics.tpchQ11(spark, sfDir))
    assert(!plan.contains("CartesianProduct"),
      s"scalar total became a product:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"total not broadcast:\n$plan")
  }

  test("tpch_q16: the excluded-supplier NOT IN runs as a broadcast " +
      "anti join, never a product") {
    val plan = finalPlan(QueriesAnalytics.tpchQ16(spark, sfDir))
    assert(plan.contains("LeftAnti"), s"no anti join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"product in q16:\n$plan")
  }

  test("tpch_q20: the supplier IN chain is a LEFT SEMI join; the " +
      "correlated shipped-quantity sum decorrelates to a composite-key " +
      "aggregate join — no cartesian") {
    val plan = finalPlan(QueriesAnalytics.tpchQ20(spark, sfDir))
    assert(plan.contains("LeftSemi"), s"no semi join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"product in q20:\n$plan")
  }

  test("tpch_q19: the three-arm disjunction rides ONE p_partkey join " +
      "as its condition — a single join node, no cartesian, no " +
      "join-then-filter over the unrestricted product") {
    val plan = finalPlan(QueriesAnalytics.tpchQ19(spark, sfDir))
    assert(!plan.contains("CartesianProduct"),
      s"disjunction degenerated to a product:\n$plan")
    val joins = "Join".r.findAllIn(plan).size
    assert(joins >= 1 && plan.contains("p_partkey"),
      s"lost the partkey join:\n$plan")
    // the quantity/brand/size arms appear in the join or its inputs,
    // not as a filter ABOVE the join's aggregate
    assert(plan.contains("Brand#1") || plan.contains("p_brand"),
      s"arm predicates vanished:\n$plan")
  }

  test("dimFromCow: the broadcast decision comes from the MANIFEST's " +
      "byte count (no data read, no collect) — small dim plans a " +
      "BroadcastHashJoin, a dim past the byte budget falls back to a " +
      "shuffle join, the override wins") {
    import org.apache.spark.sql.functions._
    import graft.operators.FactEnrich
    import graft.sinks.CowTable
    val dimRoot = java.nio.file.Files
      .createTempDirectory("graft_dimcow").toString
    CowTable.commitFull(
      spark.range(0, 500).select(col("id").as("d_key"),
        concat(lit("n"), col("id")).as("d_name")),
      dimRoot, 1L, Nil)
    val fact = spark.range(0, 10000)
      .select((col("id") % 500).as("f_key"), col("id").as("v"))
    def mkDim(maxBytes: Long, over: Option[Boolean] = None) =
      FactEnrich.dimFromCow(spark, dimRoot,
        Seq("f_key" -> "d_key"), Seq("d_name" -> "name"),
        broadcastOverride = over, maxBroadcastBytes = maxBytes)
    val small = mkDim(32L * 1024 * 1024)
    val big = mkDim(1L)
    val forced = mkDim(1L, over = Some(true))
    assert(small.broadcastDim, "under-budget dim must broadcast")
    assert(!big.broadcastDim, "over-budget dim must not broadcast")
    assert(forced.broadcastDim, "explicit override must win over size")
    // plan under auto-broadcast OFF so only the manifest-driven hint
    // decides; window kept to plan construction only
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val (pSmall, pBig) =
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        (finalPlan(FactEnrich.enrich(fact, Seq(small))),
          finalPlan(FactEnrich.enrich(fact, Seq(big))))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    assert(pSmall.contains("BroadcastHashJoin"),
      s"small dim lost its broadcast:\n$pSmall")
    assert(!pBig.contains("BroadcastHashJoin") &&
      (pBig.contains("SortMergeJoin") || pBig.contains("ShuffledHashJoin")),
      s"oversized dim did not fall back to a shuffle join:\n$pBig")
  }

  test("knn_label_eval: scoring runs as the broadcast nested-loop " +
      "cross join (corpus streams), and the label/truth joins broadcast " +
      "the SMALL side — no corpus-sized exchange anywhere") {
    val df = QueriesVector.knnLabelEval(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // ONLY bruteForceTopK's scoring produces a BNLJ — a regression that
    // shuffles the corpus for scoring removes it (a BroadcastHashJoin
    // elsewhere cannot satisfy this)
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"scoring lost its broadcast cross join:\n$plan")
    // every hash exchange in the plan is over the SMALL frames
    // (votes/pred aggregations keyed by qid/label) — none over the
    // corpus id. Corpus-sized shuffles would partition on id#.
    assert(!"Exchange hashpartitioning\\(id#".r.findFirstIn(plan).isDefined,
      s"corpus-sized exchange appeared:\n$plan")
  }

  test("dpp_partition_prune: the month-partitioned fact scan carries a " +
      "DYNAMIC partition filter (runtime pruning, not a static litmus) " +
      "and the runtime-filtered scan reads fewer partitions than the " +
      "layout holds") {
    val fact = QueriesAnalytics.factByShipMonth(spark, sfDir)
    val dim = QueriesAnalytics.busyMonths(spark, sfDir)
    val joined = fact.join(
      org.apache.spark.sql.functions.broadcast(dim),
      org.apache.spark.sql.functions.col("l_sm") ===
        org.apache.spark.sql.functions.col("om"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"fact scan lost its dynamic partition filter:\n$plan")
    // the filter must sit on the PARTITION side of the scan — a
    // post-scan dynamic filter would still read every directory
    assert("PartitionFilters: \\[[^\\]]*dynamicpruning".r
        .findFirstIn(plan).isDefined,
      s"dynamicpruning is not a partition filter:\n$plan")
    // and it prunes for REAL: execute and read the fact scan's
    // partitions-read metric — it must equal the dim's qualifying
    // months, not the layout's total (AQE off so the executed plan is
    // directly traversable; DPP is an optimizer rule and unaffected)
    val monthsTotal = fact.select("l_sm").distinct().count()
    val monthsBusy = dim.count()
    assert(monthsBusy < monthsTotal,
      s"premise broken: dim keeps $monthsBusy of $monthsTotal months")
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val agg = fact.join(
        org.apache.spark.sql.functions.broadcast(dim),
        org.apache.spark.sql.functions.col("l_sm") ===
          org.apache.spark.sql.functions.col("om"))
        .groupBy().count()
      assert(agg.collect().head.getLong(0) > 0, "join must produce rows")
      val scan = agg.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.metadata.get("Location").exists(_.contains("graft_dpp"))
          => s
      }.headOption.getOrElse(fail("no fact scan in the executed plan"))
      val partsRead = scan.metrics.get("numPartitions").map(_.value)
        .getOrElse(fail(
          s"no numPartitions metric; keys=${scan.metrics.keys}"))
      assert(partsRead == monthsBusy,
        s"runtime pruning read $partsRead partitions, expected the " +
          s"$monthsBusy qualifying months (of $monthsTotal)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
  }

  test("runtime row-level filtering: a selective dim filter injects a " +
      "bloom_filter_might_contain onto the fact side of a shuffle join, " +
      "so non-qualifying fact rows die at the scan instead of riding " +
      "the exchange") {
    import org.apache.spark.sql.functions.col
    // the production thresholds target 10GB+ probe scans; scale them to
    // the test SF so the rule fires here, and restore after. Broadcast
    // is disabled because the bloom filter exists precisely for joins
    // too big to broadcast — the 100 TB case.
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
        "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val l = Tables.load(spark, sfDir, "lineitem")
      val p = Tables.load(spark, sfDir, "part").where(col("p_size") === 1)
      val plan = l.join(p, l("l_partkey") === p("p_partkey"))
        .groupBy(col("p_size")).count()
        .queryExecution.executedPlan.toString
      // the injected filter renders as might_contain(<bloom subquery>)
      // over the probe key, with bloom_filter_agg building the filter
      // from the dim's qualifying keys
      assert(plan.contains("might_contain") &&
          plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter on the probe side:\n$plan")
      // and it guards the PROBE scan (tree prints parent-first, so the
      // filter's text precedes its child scan): rows die before the
      // l_partkey exchange, not after the join
      assert("might_contain[\\s\\S]*FileScan parquet \\[l_partkey".r
          .findFirstIn(plan).isDefined,
        s"bloom filter must guard the probe-side scan:\n$plan")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("ANALYZE TABLE statistics drive the cost model: row counts " +
      "surface in plan stats and a selective filter shrinks the " +
      "estimate under CBO") {
    val saved = Seq("spark.sql.cbo.enabled")
      .map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val name = "graft_cbo_orders"
      spark.sql(s"DROP TABLE IF EXISTS $name")
      spark.read.parquet(s"$sfDir/orders.parquet")
        .write.saveAsTable(name)
      spark.sql(
        s"ANALYZE TABLE $name COMPUTE STATISTICS FOR COLUMNS " +
          "o_orderkey, o_orderstatus")
      val full = spark.table(name)
      val fullStats = full.queryExecution.optimizedPlan.stats
      val trueCount = full.count()
      assert(fullStats.rowCount.contains(BigInt(trueCount)),
        s"ANALYZE row count must surface in plan stats: $fullStats")
      val filtered = full.where(
        org.apache.spark.sql.functions.col("o_orderstatus") === "F")
      val filteredStats = filtered.queryExecution.optimizedPlan.stats
      assert(filteredStats.rowCount.exists(_ < BigInt(trueCount)),
        "column stats must shrink the filtered estimate " +
          s"(got $filteredStats vs $trueCount rows)")
      spark.sql(s"DROP TABLE $name")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
