package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.MaterializedAgg

class MaterializedAggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = Tables.load(spark, sfDir, "orders")

  private def canon(df: DataFrame): Seq[String] =
    df.orderBy("o_orderstatus").collect().map(_.toString).toSeq

  test("merge of split states equals the direct aggregate — any split") {
    val keys = Seq("o_orderstatus")
    val values = Seq("o_totalprice")
    val direct = MaterializedAgg.finish(
      MaterializedAgg.state(orders, keys, values), values)
    // three different split axes, incl. a skewed and an empty-side one
    val splits = Seq(
      col("o_orderkey") % 2 === 0,
      col("o_orderdate") <= lit("1996-06-15").cast("timestamp"),
      lit(false)) // empty base: merge(state(∅-side)...) degenerates right
    splits.foreach { pred =>
      val a = MaterializedAgg.state(orders.where(pred), keys, values)
      val b = MaterializedAgg.state(orders.where(!pred), keys, values)
      val merged = MaterializedAgg.finish(
        MaterializedAgg.merge(keys, values, a, b), values)
      assert(canon(merged) == canon(direct), s"split $pred diverged")
    }
  }

  test("merge is associative: ((a+b)+c) == (a+(b+c))") {
    val keys = Seq("o_orderstatus")
    val values = Seq("o_totalprice")
    def s(pred: org.apache.spark.sql.Column) =
      MaterializedAgg.state(orders.where(pred), keys, values)
    val (a, b, c) = (s(col("o_orderkey") % 3 === 0),
      s(col("o_orderkey") % 3 === 1), s(col("o_orderkey") % 3 === 2))
    val left = MaterializedAgg.merge(keys, values,
      MaterializedAgg.merge(keys, values, a, b), c)
    val right = MaterializedAgg.merge(keys, values,
      a, MaterializedAgg.merge(keys, values, b, c))
    assert(canon(MaterializedAgg.finish(left, values)) ==
      canon(MaterializedAgg.finish(right, values)))
  }

  test("groups present in only one side merge through") {
    val a = MaterializedAgg.state(
      Seq(("x", 1.0), ("x", 2.0)).toDF("k", "v"), Seq("k"), Seq("v"))
    val b = MaterializedAgg.state(
      Seq(("y", 5.0)).toDF("k", "v"), Seq("k"), Seq("v"))
    val out = MaterializedAgg.finish(
      MaterializedAgg.merge(Seq("k"), Seq("v"), a, b), Seq("v"))
      .select("k", "n", "sum_v", "min_v", "max_v", "avg_v")
      .orderBy("k")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    assert(out == Seq(("x", 2L, 3.0, 1.0, 2.0, 1.5), ("y", 1L, 5.0, 5.0, 5.0, 5.0)))
  }

  test("retractable state: mutate-then-merge equals aggregate-of-mutated; " +
      "fully-deleted groups vanish") {
    import graft.operators.Cdc
    val before = Seq((1L, "x", 10.0), (2L, "x", 20.0), (3L, "y", 5.0))
      .toDF("id", "grp", "v")
    // delete id 3 (kills group y entirely), update id 2, insert id 4
    val after = Seq((1L, "x", 10.0), (2L, "x", 25.0), (4L, "x", 1.0))
      .toDF("id", "grp", "v")
    val keys = Seq("grp"); val values = Seq("v")
    val base = MaterializedAgg.retractState(before, keys, values, lit(1))
    val delta = MaterializedAgg.retractStateOf(
      Cdc.changelogSigned(before, after, Seq("id")), keys, values)
    val out = MaterializedAgg.finishRetract(
        MaterializedAgg.mergeRetract(keys, values, base, delta), values)
      .select("grp", "n", "sum_v", "avg_v")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(out == Seq(("x", 3L, 36.0, 12.0))) // y is GONE, not n=0
  }

  test("changelogSigned normalizes an update into D-old + I-new") {
    import graft.operators.Cdc
    val before = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val after = Seq((1L, "a2"), (3L, "c")).toDF("id", "v")
    val out = Cdc.changelogSigned(before, after, Seq("id"))
      .orderBy("id", "oper")
      .as[(Long, String, String)].collect().toSeq
    assert(out == Seq(
      (1L, "a", "D"), (1L, "a2", "I"), // update = both images
      (2L, "b", "D"), (3L, "c", "I")))
    // unchanged state → empty signed changelog too
    assert(Cdc.changelogSigned(before, before, Seq("id")).isEmpty)
  }

  test("repeated merges keep a stable state schema (no decimal creep)") {
    val keys = Seq("o_orderstatus"); val values = Seq("o_totalprice")
    var st = MaterializedAgg.state(orders.limit(100), keys, values)
    val schema0 = st.schema.map(f => (f.name, f.dataType)).toSet
    (1 to 3).foreach { _ =>
      st = MaterializedAgg.merge(keys, values, st,
        MaterializedAgg.state(orders.limit(50), keys, values))
    }
    assert(st.schema.map(f => (f.name, f.dataType)).toSet == schema0)
  }
}
