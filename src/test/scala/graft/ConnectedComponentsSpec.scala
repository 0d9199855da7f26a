package graft

import org.apache.spark.sql.functions._
import graft.operators.{ConnectedComponents, Dedup}

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("components labels chains, cliques and singleton edges correctly") {
    // chain 1-2-3-4 (diameter 3), clique {10,11,12}, pair {20,21}
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("id_a", "id_b")
    val got = ConnectedComponents.components(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("a 300-node path converges to the chain minimum (pointer jumping: " +
      "O(log d) rounds, far inside the iteration backstop)") {
    // worst case for plain min-label propagation — a diameter-299 chain
    // would need 299 one-hop rounds; with pointer jumping the distance
    // to the minimum halves each round, so ~9 rounds suffice. A wrong
    // (capped, unconverged) run returns non-zero labels for far nodes.
    val pairs = (0L until 299L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = ConnectedComponents.components(pairs)
      .as[(Long, Long)].collect()
    assert(got.length == 300)
    assert(got.forall(_._2 == 0L),
      s"unconverged labels: ${got.filter(_._2 != 0L).take(5).mkString(",")}")
  }

  test("an exhausted iteration budget fails loud instead of returning " +
      "partial (wrong) component labels") {
    // the 30-node path needs ~log2(29)+2 ≈ 7 rounds; maxIter=2 cannot
    // even confirm convergence (two equal consecutive checksums), so
    // the backstop must throw — silent partial labels would be wrong
    // components with no signal
    val pairs = (0L until 29L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      ConnectedComponents.components(pairs, maxIter = 2).count()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("canonicalize keeps one doc per dup cluster plus all unpaired docs") {
    val docs = (1L to 8L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 5L), (6L, 7L)).toDF("id_a", "id_b")
    val kept = ConnectedComponents.canonicalize(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L, 6L, 8L)) // {1,2,5}→1, {6,7}→6
  }

  test("end-to-end: minhash pairs → clusters → deduped corpus") {
    val docs = Tables.load(spark, sfDir, "documents")
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleSize = 8, numHashes = 16, bands = 4, threshold = 0.5)
      .select("id_a", "id_b")
    val nPairs = pairs.count()
    val deduped = ConnectedComponents.canonicalize(docs, pairs, "doc_id")
    val removed = docs.count() - deduped.count()
    // every pair removes at least... clusters: removed = nodes - clusters
    assert(removed > 0 && removed <= nPairs)
    // no two surviving docs are still a known near-dup pair
    val survivors = deduped.select(col("doc_id")).as[Long].collect().toSet
    val livePairs = pairs.as[(Long, Long)].collect()
      .count { case (a, b) => survivors(a) && survivors(b) }
    assert(livePairs == 0)
  }
}
