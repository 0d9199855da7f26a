package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bpe, Merge, Sample, Similarity}

/** Regression pins for the round-6 advisor findings (ADVICE.md r6). */
class AdviceFixesSpec extends SparkSpec {
  import spark.implicits._

  test("BPE stops cleanly when the corpus runs out of adjacent pairs") {
    // "a b" merges once, then the corpus is a single token — asking for
    // 3 merges must return the 1 learnable merge, not cross-join the
    // corpus away and return garbage rows
    val got = Bpe.learnMerges(Seq("a b").toDF("text"), "text", 3)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "b", 1L)))
  }

  test("BPE fails loudly when there is nothing to learn at all") {
    intercept[IllegalArgumentException] {
      Bpe.learnMerges(Seq("solo", "tok").toDF("text"), "text", 2).count()
    }
  }

  test("MERGE output keeps the target's column ORDER when merge keys " +
      "are not leading") {
    val target = Seq(("alice", 1L, "GOLD"), ("bob", 2L, "BASE"))
      .toDF("name", "id", "tier") // key `id` is the MIDDLE column
    val updates = Seq(("bob2", 2L, "GOLD"), ("carol", 3L, "BASE"))
      .toDF("name", "id", "tier")
    val out = Merge.upsert(target, updates, Seq("id"))
    assert(out.columns.toSeq == Seq("name", "id", "tier"),
      s"column order broke: ${out.columns.toSeq}")
    val rows = out.as[(String, Long, String)].collect().toSet
    assert(rows == Set(("alice", 1L, "GOLD"), ("bob2", 2L, "GOLD"),
      ("carol", 3L, "BASE")))
  }

  test("a degenerate all-zero centroid never wins the IVF argmax") {
    // cosine(v, 0-vector) = 0/0 = NaN, and Spark sorts NaN above every
    // double — unguarded, cell 1 (the zero centroid) would claim all rows
    val corpus = Seq((10L, Seq(1.0, 0.0)), (11L, Seq(0.0, 1.0)))
      .toDF("id", "vec")
    val cents = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 0.0)),
      (3L, Seq(0.0, 1.0))).toDF("cid", "cvec")
    val cells = Similarity.ivfAssignTo(corpus, cents)
      .select("id", "cell").as[(Long, Long)].collect().toMap
    assert(cells == Map(10L -> 2L, 11L -> 3L), s"got $cells")
  }

  test("kmeans retains the previous centroid when a cell's sums cancel " +
      "to the zero vector") {
    // two antipodal vectors in one cell: micro-unit sums cancel exactly,
    // so the fresh centroid is all-zero → the update must keep the old
    // centroid instead of poisoning the index with a NaN cell
    val corpus = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(-1.0, 0.0)))
      .toDF("id", "vec")
    val init = Seq((0L, Seq(1.0, 0.0))).toDF("cid", "cvec")
    val out = Similarity.kmeansCentroids(corpus, dim = 2, init, iters = 1)
      .as[(Long, Seq[Double])].collect().toSeq
    assert(out == Seq((0L, Seq(1.0, 0.0))), s"got $out")
  }

  test("stratified sampling treats NULL content as the empty document") {
    val df = Seq((1L, Option("some text"), "s"), (2L, None: Option[String], "s"),
      (3L, None: Option[String], "s")).toDF("id", "text", "stratum")
    // rate 1000‰ keeps EVERYTHING, including NULL-content rows (a NULL
    // fingerprint made the predicate NULL and silently dropped them)
    assert(Sample.stratifiedPermille(df, col("stratum"), col("text"),
      Map.empty, 1000).count() == 3)
    // and NULL rows are content-addressed together: all in or all out
    val n = Sample.stratifiedPermille(df.where(col("id") > 1),
      col("stratum"), col("text"), Map.empty, 500).count()
    assert(n == 0 || n == 2)
  }
}
