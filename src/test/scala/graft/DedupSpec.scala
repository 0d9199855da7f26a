package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents").cache()

  /** The testdata's planted ground truth: pairs with exact char-8-shingle
    * Jaccard ≥ 0.5 (25 pairs at every sf).
    */
  private lazy val truth: Set[(Long, Long)] =
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", 8, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("exact dedup keeps exactly the min-id row per key") {
    val df = Seq((1L, 10L, "x"), (1L, 11L, "y"), (2L, 5L, "z"))
      .toDF("k", "id", "v")
    val out = Dedup.exact(df, col("k"), "id")
      .select("k", "id", "v").as[(Long, Long, String)].collect().toSet
    assert(out == Set((1L, 10L, "x"), (2L, 5L, "z")))
  }

  test("planted near-dup ground truth is non-trivial") {
    // 25 planted pairs at sf0.01; sf0.001 has 28 (one dup clique)
    assert(truth.size >= 20 && truth.size <= 40)
  }

  test("minhash-LSH recovers the planted pairs with exact-verify precision") {
    val got = Dedup
      .minhashLshPairs(docs, "doc_id", "text",
        shingleSize = 8, numHashes = 16, bands = 4, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // verification stage enforces precision = 1.0
    assert(got.subsetOf(truth), s"false positives: ${got -- truth}")
    // near-identical docs (J≈0.99) collide in ≥1 of 4 bands w.h.p.
    assert(got.size >= (truth.size * 0.8).toInt,
      s"recall too low: ${got.size}/${truth.size}")
  }

  test("simhash finds near-identical pairs with tight hamming distance") {
    val got = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert((got intersect truth).size >= (truth.size * 0.6).toInt,
      s"simhash recall: ${(got intersect truth).size}/${truth.size}")
  }

  test("simhash 8-band blocking is EXHAUSTIVE for hamming ≤ 7 (pigeonhole " +
      "guarantee backing the dedup_simhash oracle row)") {
    val sigMap = Dedup.simhashSignatures(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val ids = sigMap.keys.toSeq.sorted
    val expect = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      h = java.lang.Long.bitCount(sigMap(a) ^ sigMap(b)) if h <= 7
    } yield (a, b)).toSet
    val got = Dedup.simhashPairs(docs, "doc_id", "text",
      maxHamming = 7, bands = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
    assert(expect.nonEmpty)
  }

  test("simhash property bridge: emitted pairs re-verify hamming ≤ 6 and " +
      "include every planted pair whose banding guarantees recall") {
    // the signature itself is not DuckDB-replayable (xxhash64); the
    // dedup_simhash query row closes the loop via exact-Jaccard
    // verification, and this is the signature-level contract.
    // Everything here is deterministic (fixed data, xxhash64), so the
    // assertions are exact, not statistical.
    val out = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 6)
    val sigs = Dedup.simhashSignatures(docs, "doc_id", "text")
    // 1. soundness: every emitted (id_a, id_b, hamming) row re-verifies
    //    against independently recomputed signatures
    val bad = out
      .join(sigs.select(col("__id").as("id_a"), col("__sig").as("sa")), "id_a")
      .join(sigs.select(col("__id").as("id_b"), col("__sig").as("sb")), "id_b")
      .where(
        graft.functions.VectorFunctions.hamming64(col("sa"), col("sb"))
          =!= col("hamming") || col("hamming") > 6)
    assert(bad.count() == 0)
    // 2. recall: every planted exact-Jaccard pair (the oracle set for
    //    the other dedup queries) within the banding guarantee
    //    (hamming ≤ 3 ⇒ some 16-bit chunk matches, pigeonhole) is
    //    emitted; planted pairs beyond it can legitimately escape
    val got = out.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sigMap = sigs.as[(Long, Long)].collect().toMap
    val guaranteed = truth.filter { case (a, b) =>
      java.lang.Long.bitCount(sigMap(a) ^ sigMap(b)) <= 3
    }
    assert(guaranteed.nonEmpty, "no planted pair within hamming 3 — data drift?")
    assert(guaranteed.subsetOf(got),
      s"banding-guaranteed pairs missing: ${guaranteed -- got}")
  }

  test("minhash signatures: identical text → identical signature") {
    val df = Seq((1L, "the quick brown fox jumps"), (2L, "the quick brown fox jumps"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(df, "doc_id", "text", 4, 8)
      .orderBy("doc_id").drop("doc_id").collect()
    assert(sigs(0) == sigs(1))
  }

  test("incremental dedup against a persisted index == one-shot pairs " +
      "over the full corpus, restricted to batch-involving pairs") {
    val batch = docs.where($"doc_id" % 5 === 0)
    val corpus = docs.where($"doc_id" % 5 =!= 0)
    // the index is the PERSISTED artifact: storage round-trip included
    val idxPath = java.nio.file.Files
      .createTempDirectory("dedup_idx").toString + "/index"
    Dedup.minhashIndex(corpus, "doc_id", "text",
      shingleSize = 8, numHashes = 16, bands = 4)
      .write.parquet(idxPath)
    val index = spark.read.parquet(idxPath)

    val incremental = Dedup
      .minhashIncrementalPairs(corpus, index, batch, "doc_id", "text",
        shingleSize = 8, numHashes = 16, bands = 4, threshold = 0.5)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val oneShot = Dedup
      .minhashLshPairs(docs, "doc_id", "text",
        shingleSize = 8, numHashes = 16, bands = 4, threshold = 0.5)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
      .filter(p => p._1 % 5 == 0 || p._2 % 5 == 0)
    assert(incremental == oneShot,
      s"missing: ${oneShot -- incremental}; extra: ${incremental -- oneShot}")
    // the split is non-degenerate: at least one CROSS pair (index hit)
    // and the equality above covers batch-internal pairs too
    assert(incremental.exists(p => (p._1 % 5 == 0) != (p._2 % 5 == 0)),
      "no cross corpus/batch pair — split exercises nothing")
  }
}
