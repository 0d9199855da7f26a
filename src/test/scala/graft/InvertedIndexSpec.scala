package graft

import org.apache.spark.sql.functions._

import graft.operators.InvertedIndex
import graft.pipeline.Metrics

/** Persisted inverted index: build, blocked postings, pruned probes
  * (operators/InvertedIndex.scala). */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshIndex(blockSize: Long = 10000L): String = {
    val p = java.nio.file.Files
      .createTempDirectory("graft_idx_spec").toString + "/index"
    InvertedIndex.build(Tables.load(spark, sfDir, "documents"),
      "doc_id", "text", p, blockSize = blockSize)
    p
  }

  test("searchAnd equals a direct corpus scan, and posting blocks are " +
      "bounded even for corpus-wide tokens") {
    // blockSize=64 forces every frequent token into MANY bounded rows
    val idx = freshIndex(blockSize = 64L)
    val got = InvertedIndex.searchAnd(spark, idx, Seq("spark", "vector"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = Tables.load(spark, sfDir, "documents")
    val want = docs.select($"doc_id",
        size(expr("filter(split(trim(text), '\\\\s+'), x -> x = 'spark')"))
          .cast("long").as("a"),
        size(expr("filter(split(trim(text), '\\\\s+'), x -> x = 'vector')"))
          .cast("long").as("b"))
      .where($"a" > 0 && $"b" > 0).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && got.sameElements(want))
    // no posting row exceeds the block bound
    val maxPosting = spark.read.parquet(idx)
      .select(max(size($"posting"))).first().getInt(0)
    assert(maxPosting <= 64, s"posting block overflowed: $maxPosting")
  }

  test("a probe partition-prunes to the terms' hash buckets: fewer " +
      "bytes than a full index scan, plan shows the partition filter") {
    val idx = freshIndex()
    val listener = Metrics.register(spark)
    val probed = InvertedIndex.probe(spark, idx, Seq("spark"))
    probed.collect()
    val mProbe = listener.drainWhen(_.exists(_.bytesRead > 0))
    spark.read.parquet(idx).collect()
    val mFull = listener.drainWhen(_.exists(_.bytesRead > 0))
    val (bProbe, bFull) =
      (mProbe.map(_.bytesRead).max, mFull.map(_.bytesRead).max)
    assert(bProbe < bFull,
      s"probe read $bProbe bytes, full scan $bFull — no pruning")
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("(tb#"),
      s"expected a tb partition filter:\n$plan")
  }

  test("a query term colliding with an output column name cannot " +
      "break resolution (positional tf columns, no pivot)") {
    val idx = freshIndex()
    // 'doc_id' is a plausible corpus token; here it simply matches no
    // postings — the query must return empty, not throw on duplicate
    // column names
    val out = InvertedIndex.searchAnd(spark, idx, Seq("doc_id", "spark"))
    assert(out.columns.toSeq == Seq("doc_id", "tf_0", "tf_1"))
    assert(out.count() == 0L)
    intercept[IllegalArgumentException] {
      InvertedIndex.searchAnd(spark, idx, Seq("spark", "spark"))
    }
  }

  test("incremental append: indexing a delta batch O(batch) serves " +
      "searches identically to a full rebuild") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, sfDir, "documents")
    val base = docs.where(col("doc_id") % 3 =!= 0)
    val delta = docs.where(col("doc_id") % 3 === 0)
    val p = java.nio.file.Files
      .createTempDirectory("graft_idx_inc").toString
    // non-default layout: append and probe must take it from the
    // persisted _meta, not re-guess defaults
    InvertedIndex.build(base, "doc_id", "text", s"$p/inc", nBuckets = 8)
    InvertedIndex.append(delta, "doc_id", "text", s"$p/inc")
    InvertedIndex.build(docs, "doc_id", "text", s"$p/full", nBuckets = 8)
    val got = InvertedIndex.searchAnd(spark, s"$p/inc",
      Seq("spark", "vector")).collect().map(_.toSeq).toSeq
    val want = InvertedIndex.searchAnd(spark, s"$p/full",
      Seq("spark", "vector")).collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == want,
      "appended index diverged from full rebuild")
  }

  test("the corpus is never rescanned at query time") {
    val idx = freshIndex()
    val q = InvertedIndex.searchAnd(spark, idx, Seq("spark", "vector"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      s"query-time plan touches the corpus:\n$plan")
  }
}
