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

  test("knn_label_eval: corpus side never shuffles before scoring (the " +
      "broadcast top-k contract survives the vote/join composition)") {
    val plan = QueriesVector.knnLabelEval(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"expected broadcast joins in kNN eval:\n$plan")
  }
}
