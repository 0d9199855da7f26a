package graft

import org.apache.spark.sql.functions._

/** Boilerplate segment removal, eval decontamination, BM25 retrieval
  * (QueriesCorpus). */
class CorpusSpec extends SparkSpec {

  test("boilerplateStrip keeps every document, strips only repeated " +
      "segments, and leaves clean documents byte-identical") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = QueriesCorpus.boilerplateStrip(spark, sfDir)
    val rows = out.collect()
    assert(rows.length == docs.count(), "every doc must appear exactly once")
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)),
      "removed segments cannot exceed total segments")
    // the planted near-dup pairs share nearly all segments, so some
    // docs must have had boilerplate stripped
    assert(rows.exists(_.getLong(2) > 0L), "expected boilerplate hits")
    // a doc with ZERO removed segments reassembles to exactly its
    // whitespace-normalized self
    val clean = rows.filter(_.getLong(2) == 0L).map(_.getLong(0)).toSet
    assert(clean.nonEmpty)
    val expected = docs
      .where(col("doc_id").isInCollection(clean))
      .select(col("doc_id"), md5(concat_ws(" ",
        graft.functions.TextFunctions.tokens(col("text")))).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.filter(r => clean(r.getLong(0))).foreach { r =>
      assert(r.getString(3) == expected(r.getLong(0)),
        s"clean doc ${r.getLong(0)} was rewritten")
    }
  }

  test("decontaminate flags the planted cross-split near-duplicates " +
      "and nothing else") {
    val out = QueriesCorpus.decontaminate(spark, sfDir).collect()
    assert(out.nonEmpty, "the planted dup pairs straddle the split")
    // by construction every reported doc clears the >=50% hit bar;
    // random docs share individual tokens but not 5-gram runs, so the
    // flagged set is exactly the near-dup partners: hit ratios are
    // near-total, far above the bar
    out.foreach { r =>
      val (n, h) = (r.getLong(1), r.getLong(2))
      assert(n > 0 && 2 * h >= n)
      assert(h * 10 >= n * 9, s"doc ${r.getLong(0)}: weak hit ratio " +
        s"$h/$n — threshold artifact, not a near-duplicate")
    }
  }

  test("bm25TopK serves top-k from a broadcast stats row: scores " +
      "descend, and the serving pass has no hash exchange") {
    val df = QueriesCorpus.bm25TopK(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted.reverse))
    assert(scores.forall(_ > 0.0))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"scoring pass should be map-side + TakeOrdered only:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k must be TakeOrdered, not a global sort")
  }
}
