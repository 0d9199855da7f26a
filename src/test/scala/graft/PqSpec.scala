package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}

/** Product-quantization ANN (operators/Pq.scala). */
class PqSpec extends SparkSpec {

  private def corpus() =
    Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private def queries() =
    Tables.load(spark, sfDir, "embeddings")
      .where(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  test("encode emits one m-length code row per vector, codes bounded " +
      "by the codebook, bit-identical across reruns") {
    val c = corpus()
    val cb = Pq.codebook(c, dim = 64, m = 8, k = 16)
    assert(cb.count() == 8 * 16)
    val enc = Pq.encode(c, cb, dim = 64, m = 8)
    val rows = enc.select(col("id"), col("codes")).collect()
    assert(rows.length == c.count())
    rows.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length == 8)
      assert(codes.forall(x => x >= 0 && x < 16),
        s"code out of range for id ${r.getLong(0)}: $codes")
    }
    val again = Pq.encode(c, cb, dim = 64, m = 8)
      .select(col("id"), col("codes")).collect()
    assert(rows.map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1)
      .sameElements(again.map(r => (r.getLong(0), r.getSeq[Int](1)))
        .sortBy(_._1)))
  }

  test("with a corpus-wide shortlist the PQ pipeline degrades to the " +
      "exact brute force — approximation lives ONLY in the shortlist cut") {
    val c = corpus()
    val cb = Pq.codebook(c, dim = 64, m = 8, k = 16)
    val enc = Pq.encode(c, cb, dim = 64, m = 8)
    val n = c.count().toInt
    val pq = Pq.topK(enc, queries(), cb, dim = 64, m = 8,
      k = 5, shortlist = n)
      .orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val bf = Similarity.bruteForceTopK(c, queries(), k = 5)
      .select(col("qid"), col("id"), col("cosine"), col("rank"))
      .orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(pq.sameElements(bf),
      s"full-shortlist PQ diverged from brute force")
  }
}
