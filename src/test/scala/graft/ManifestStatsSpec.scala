package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike

import graft.sinks.{CowTable, CowV2}

/** CBO statistics FROM THE MANIFEST (round-15, the round-14 verdict's
  * #7): the planner's broadcast decision sees real numbers without a
  * hint or an ANALYZE — the whole-table size is the manifest's byte
  * sum ([[graft.sinks.CowFileIndex.sizeInBytes]]), and a
  * partition/skipping-pruned scan re-estimates from exactly the files
  * the manifest keeps, so a filtered slice of a big table broadcasts
  * when the surviving bytes are small.
  */
class ManifestStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("maniststats").toString

  private def hasBroadcast(plan: SparkPlan): Boolean =
    plan.toString.contains("BroadcastHashJoin")

  test("a small cow table joins BROADCAST with no hint: the manifest's " +
      "byte sum is the logical size estimate") {
    val dimRoot = s"${tmp()}/dim"
    CowTable.commitFull(
      spark.range(50).select($"id".as("k"), concat(lit("d"), $"id").as("dv")),
      dimRoot, 1L, Nil)
    val fact = spark.range(200000)
      .select(($"id" % 50).as("k"), $"id".as("amt"))
    val joined = fact.join(CowV2.read(spark, dimRoot).get, Seq("k"))
    joined.collect()
    assert(hasBroadcast(joined.queryExecution.executedPlan),
      "a tiny manifest-sized dim must broadcast without a hint:\n" +
        joined.queryExecution.executedPlan)
  }

  test("a partition-filtered slice of a BIG cow table broadcasts: the " +
      "estimate shrinks to the surviving files' manifest bytes") {
    val bigRoot = s"${tmp()}/big"
    // ~200 partitions; one partition is tiny relative to the whole.
    // The table total is far above the broadcast threshold we pin
    // below; one partition's bytes are far below it.
    CowTable.commitFull(
      spark.range(400000).select(($"id" % 200).as("p"), $"id".as("k"),
        concat(lit("x"), $"id").as("pad")),
      bigRoot, 1L, Seq("p"))
    val total = CowTable.currentManifest(spark, bigRoot).get
      .files.map(_.bytes).sum
    val fact = spark.range(100000).select(($"id" % 2000).as("k"),
      $"id".as("amt"))
    val threshold = math.max(total / 20, 64L * 1024)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      threshold.toString)
    try {
      val slice = CowV2.read(spark, bigRoot).get.where($"p" === 7)
      // the STATIC estimate (what the non-adaptive planner and join
      // reorder consume) must already reflect partition pruning —
      // manifest-derived, not the whole-table size
      val est = slice.queryExecution.optimizedPlan.stats.sizeInBytes
      assert(est < BigInt(threshold),
        s"static estimate $est must shrink below $threshold " +
          s"(table total $total)")
      val joined = fact.join(slice, Seq("k"))
      joined.collect()
      assert(hasBroadcast(joined.queryExecution.executedPlan),
        s"a one-partition slice (total $total, threshold $threshold) " +
          "must broadcast from manifest stats:\n" +
          joined.queryExecution.executedPlan)
      // and the UNFILTERED big table must NOT broadcast under the same
      // threshold — the estimate is real, not optimistic
      val full = fact.join(CowV2.read(spark, bigRoot).get, Seq("k"))
      full.collect()
      assert(!hasBroadcast(full.queryExecution.executedPlan),
        "the unfiltered big side must not broadcast under a small " +
          "threshold")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }
}
