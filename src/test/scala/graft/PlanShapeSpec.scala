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
}
