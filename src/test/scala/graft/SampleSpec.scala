package graft

import org.apache.spark.sql.functions._
import graft.operators.Sample

class SampleSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq.tabulate(400)(i =>
    (i.toLong, s"document number $i content", if (i % 4 == 0) "rare" else "common"))
    .toDF("id", "text", "stratum")

  test("per-stratum permille rates apply; unlisted strata use the default") {
    val kept = Sample.stratifiedPermille(corpus, col("stratum"), col("text"),
      Map("common" -> 250), defaultPermille = 1000)
    val byStratum = kept.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    // rare (default 1000‰): everything kept
    assert(byStratum("rare") == 100L)
    // common at 250‰: roughly a quarter of 300 (fingerprint is
    // uniform-ish; generous bounds keep this deterministic-data stable)
    assert(byStratum("common") > 30 && byStratum("common") < 150,
      s"common kept ${byStratum("common")} of 300")
  }

  test("sampling is content-addressed: reruns identical, duplicate " +
      "content sampled identically") {
    def run() = Sample.stratifiedPermille(corpus, col("stratum"), col("text"),
      Map("common" -> 500), 1000).select("id").as[Long].collect().toSet
    assert(run() == run())
    // two rows with identical text, different ids/strata at the same
    // rate: both in or both out
    val dup = Seq((1L, "same words here", "a"), (2L, "same words here", "b"))
      .toDF("id", "text", "stratum")
    val n = Sample.stratifiedPermille(dup, col("stratum"), col("text"),
      Map.empty, 500).count()
    assert(n == 0 || n == 2)
  }

  test("rate 0 keeps nothing, rate 1000 keeps everything; bad rates throw") {
    assert(Sample.stratifiedPermille(corpus, col("stratum"), col("text"),
      Map.empty, 0).count() == 0)
    assert(Sample.stratifiedPermille(corpus, col("stratum"), col("text"),
      Map.empty, 1000).count() == 400)
    intercept[IllegalArgumentException] {
      Sample.stratifiedPermille(corpus, col("stratum"), col("text"),
        Map("x" -> 2000), 100)
    }
  }

  test("the sample predicate stays a scan-stage filter (no shuffle)") {
    val plan = Sample.stratifiedPermille(corpus, col("stratum"), col("text"),
      Map("common" -> 250), 1000).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling should not shuffle:\n$plan")
  }
}
