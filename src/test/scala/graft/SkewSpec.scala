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
