package graft

import org.apache.spark.sql.functions._

import graft.operators.DataDiff

class DataDiffSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, "a", Some(10L)), (2L, "b", Some(20L)),
    (3L, "c", None), (4L, "d", Some(40L)))
    .toDF("id", "name", "v")

  test("rowDiff classifies only_left/only_right/changed/identical and " +
      "flags exactly the drifted columns, null-safely") {
    val right = Seq(
      (1L, "a", Some(10L)),            // identical
      (2L, "B!", Some(20L)),           // changed: name
      (3L, "c", Some(33L)),            // changed: v (NULL -> value)
      (5L, "e", Some(50L)))            // only_right; 4 only_left
      .toDF("id", "name", "v")
    val d = DataDiff.rowDiff(left, right, Seq("id"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getBoolean(2), r.getBoolean(3))).toList
    assert(d == List(
      (1L, "identical", false, false),
      (2L, "changed", true, false),
      (3L, "changed", false, true),
      (4L, "only_left", false, false),
      (5L, "only_right", false, false)))
  }

  test("summary counts match, including per-column drift") {
    val right = Seq(
      (2L, "B!", Some(21L)), (3L, "c", None), (6L, "f", Some(60L)))
      .toDF("id", "name", "v")
    val s = DataDiff.summary(left, right, Seq("id")).collect().head
    assert(s.getAs[Long]("n_only_left") == 2)   // 1, 4
    assert(s.getAs[Long]("n_only_right") == 1)  // 6
    assert(s.getAs[Long]("n_changed") == 1)     // 2 (name AND v)
    assert(s.getAs[Long]("n_identical") == 1)   // 3 (NULL == NULL)
    assert(s.getAs[Long]("n_changed_name") == 1)
    assert(s.getAs[Long]("n_changed_v") == 1)
  }

  test("mismatched schemas are refused") {
    val bad = Seq((1L, "a")).toDF("id", "name")
    intercept[IllegalArgumentException] {
      DataDiff.rowDiff(left, bad, Seq("id"))
    }
  }
}
