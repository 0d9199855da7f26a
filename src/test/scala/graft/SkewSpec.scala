package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain-join result") {
    // heavy-tailed: 90% of probe rows share one key
    val probe = (1 to 1000).map(i =>
      (if (i <= 900) "hot" else s"k$i", i.toLong)).toDF("k", "pv")
    val build = Seq(("hot", 1L), ("k950", 2L), ("other", 3L)).toDF("k", "bv")

    val plain = probe.join(build, Seq("k")).select("k", "pv", "bv")
      .as[(String, Long, Long)].collect().toSet
    val salted = Skew.saltedJoin(probe, build, "k", factor = 8)
      .select("k", "pv", "bv").as[(String, Long, Long)].collect().toSet
    assert(salted == plain && plain.size == 901)
  }

  test("salted left join preserves unmatched probe rows") {
    val probe = Seq(("a", 1L), ("b", 2L)).toDF("k", "pv")
    val build = Seq(("a", 10L)).toDF("k", "bv")
    val out = Skew.saltedJoin(probe, build, "k", factor = 4, joinType = "left")
      .select("k", "pv", "bv")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.toString.toLong))).toSet
    assert(out == Set(("a", 1L, Some(10L)), ("b", 2L, None)))
  }

  test("AQE splits a skewed sort-merge join partition (skew=true) — " +
      "the first line of defense before manual salting") {
    // AQE's OptimizeSkewedJoin is the zero-code answer to join skew: at
    // runtime it splits any reduce partition larger than BOTH the skew
    // threshold and factor×median into advisory-sized slices, dup'ing
    // the matching build partition. Thresholds are lowered here so a
    // planted 'hot' key trips it at test scale. Salting (Skew.saltedJoin)
    // remains for what AQE can NOT do: skewed AGGREGATIONS (no join to
    // split — saltedCountDistinct), outer sides it may not legally
    // split, and streaming joins where AQE never runs.
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "30k")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      val pad = "x" * 64
      // 90% of probe rows share one key → one reduce partition carries
      // ~2 MB while the median is a few KB
      val probe = spark.range(30000).select(
        when(col("id") % 10 =!= 0, lit("hot"))
          .otherwise(concat(lit("k"), col("id"))).as("k"),
        concat(lit(pad), col("id")).as("payload"))
      val build = Seq.tabulate(50)(i => (if (i == 0) "hot" else s"k$i", i.toLong))
        .toDF("k", "bv")
      val joined = probe.join(build, Seq("k"))
      // collect() (not count()) so the AQE final plan materializes on
      // THIS queryExecution — count() builds a separate execution and
      // the inspected plan would still read isFinalPlan=false
      val n = joined.collect().length
      assert(n == 27000 + 4) // hot matches + k10,k20,k30,k40
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted two-phase count-distinct matches exact count-distinct") {
    val df = (1 to 500).map(i => ("hot", s"v${i % 37}")).toDF("k", "v")
      .union(Seq(("cold", "x")).toDF("k", "v"))
    val exact = df.groupBy("k").agg(countDistinct("v").as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCountDistinct(df, "k", "v", factor = 8)
      .as[(String, Long)].collect().toMap
    assert(salted == exact && exact("hot") == 37L)
  }
}
