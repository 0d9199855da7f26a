package graft

import org.apache.spark.sql.functions._

/** Pins the two Spark behaviors `plans/CowBoundDml` is built on — if
  * either regresses in a Spark upgrade, the bound-subquery DML path
  * breaks and THIS suite must fail first, with a precise signal:
  *
  *  1. predicate subqueries (IN/EXISTS, correlated included) are legal
  *     in Filter AND Project positions (the updateWhere rewrite keeps
  *     its matched-row test inside a projection);
  *  2. an ANALYZED condition whose outer attributes are substituted by
  *     exprId onto a DIFFERENT DataFrame's attributes plans correctly
  *     — including negated inside coalesce (the deleteWhere rewrite
  *     shape) and under when() in a projection.
  */
class SubqProbeSpec extends SparkSpec {
  import spark.implicits._

  test("predicate subqueries are legal in SELECT-list and compound " +
      "WHERE positions") {
    Seq(1L, 2L, 3L).toDF("k").createOrReplaceTempView("subq_probe_s")
    spark.range(10).toDF("id").createOrReplaceTempView("subq_probe_t")
    assert(spark.sql(
      "SELECT id, CASE WHEN id IN (SELECT k FROM subq_probe_s) " +
        "THEN 'y' ELSE 'n' END AS f FROM subq_probe_t")
      .where($"f" === "y").count() == 3L)
    assert(spark.sql(
      "SELECT id, EXISTS(SELECT 1 FROM subq_probe_s s " +
        "WHERE s.k = t.id) AS f FROM subq_probe_t t")
      .where($"f").count() == 3L)
    assert(spark.sql(
      "SELECT count(*) FROM subq_probe_t WHERE NOT (id IN " +
        "(SELECT k FROM subq_probe_s)) OR id > 98")
      .as[Long].head() == 7L)
  }

  test("an analyzed subquery condition rebased by exprId onto a fresh " +
      "DataFrame plans in Filter, negated-coalesce and Project shapes") {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    Seq(1L, 2L).toDF("k").createOrReplaceTempView("subq_probe_s2")
    spark.range(10).toDF("id").createOrReplaceTempView("subq_probe_t2")
    val analyzed = spark.sql(
      "SELECT * FROM subq_probe_t2 t WHERE t.id IN " +
        "(SELECT k FROM subq_probe_s2) AND t.id > 0")
      .queryExecution.analyzed
    val (condExpr, oldOut) = analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        (f.condition, f.child.output)
    }.get
    val df2 = spark.range(10).toDF("id").select($"id") // fresh exprIds
    val mapping = oldOut.zip(df2.queryExecution.analyzed.output).map {
      case (o, n) => o.exprId -> n.asInstanceOf[AttributeReference]
    }.toMap
    val bound = org.apache.spark.sql.graftbridge.Bridge.column(
      condExpr.transformUp {
        case a: AttributeReference if mapping.contains(a.exprId) =>
          mapping(a.exprId)
      })
    assert(df2.where(bound).count() == 2L,
      "rebased subquery filter must match ids {1,2}")
    assert(df2.where(!coalesce(bound, lit(false))).count() == 8L,
      "negated-coalesce rewrite shape must keep the complement")
    assert(df2.select(when(coalesce(bound, lit(false)), lit("y"))
        .otherwise(lit("n")).as("f")).where($"f" === "y").count() == 2L,
      "projection shape (updateWhere's when(applies, …)) must plan")
  }
}
