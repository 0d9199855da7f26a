package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def words = Seq(
    (1L, "spark"), (2L, "spork"), (3L, "sparks"), (4L, "park"),
    (5L, "stark"), (6L, "sharks"), (7L, "quartz"), (8L, "spark"),
    (9L, "sprk"), (10L, "saprk"))
    .toDF("id", "w")

  /** Ground truth: brute-force all-pairs levenshtein. */
  private def bruteForce(k: Int): Set[(Long, Long, Int)] = {
    val a = words.select($"id".as("ia"), $"w".as("wa"))
    val b = words.select($"id".as("ib"), $"w".as("wb"))
    a.crossJoin(b).where($"ia" < $"ib")
      .withColumn("d", levenshtein($"wa", $"wb"))
      .where($"d" <= k)
      .select("ia", "ib", "d").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("deletion-neighborhood join equals brute force at k=1 " +
      "(substitution, insertion, deletion, exact-dup cases all present)") {
    val got = FuzzyJoin.editDistancePairs(words, "id", "w", maxDist = 1)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == bruteForce(1))
    // premise: the fixture really exercises all edit kinds
    assert(got.contains((1L, 2L, 1)))  // substitution spark/spork
    assert(got.contains((1L, 3L, 1)))  // insertion spark/sparks
    assert(got.contains((1L, 4L, 1)))  // deletion spark/park
    assert(got.contains((1L, 8L, 0)))  // exact duplicate
  }

  test("k=2 blocking still has recall 1 (transposition = two edits, " +
      "double insertion, etc.)") {
    val got = FuzzyJoin.editDistancePairs(words, "id", "w", maxDist = 2)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == bruteForce(2))
    assert(got.contains((1L, 10L, 2)),
      "transposition saprk must appear at distance 2")
    assert(got.contains((2L, 3L, 2)),
      "spork/sparks (substitution + insertion) at distance 2")
  }

  test("over-long strings are refused, not truncated") {
    val long = Seq((1L, "x" * 300)).toDF("id", "w")
    intercept[IllegalArgumentException] {
      FuzzyJoin.editDistancePairs(long, "id", "w", maxDist = 1)
    }
  }

  test("the plan is an equi-join on the variant column — no cartesian " +
      "product, no broadcast nested loop") {
    val df = FuzzyJoin.editDistancePairs(words, "id", "w", maxDist = 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"blocking degenerated to all-pairs:\n$plan")
  }
}
