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
