package graft

import org.apache.spark.sql.functions._

class SubqProbeSpec extends SparkSpec {
  import spark.implicits._

  test("predicate subquery inside a Project (when/select)") {
    Seq(1L, 2L, 3L).toDF("k").createOrReplaceTempView("subq_probe_s")
    val df = spark.range(10).toDF("id")
    df.createOrReplaceTempView("subq_probe_t")
    // via SQL text first: CASE WHEN id IN (subquery) in SELECT list
    val viaSql = scala.util.Try(spark.sql(
      "SELECT id, CASE WHEN id IN (SELECT k FROM subq_probe_s) " +
        "THEN 'y' ELSE 'n' END AS f FROM subq_probe_t").collect())
    println(s"PROBE project-IN-subquery via SQL: $viaSql")
    // EXISTS correlated in SELECT list
    val viaSql2 = scala.util.Try(spark.sql(
      "SELECT id, EXISTS(SELECT 1 FROM subq_probe_s s WHERE s.k = t.id) AS f " +
        "FROM subq_probe_t t").collect())
    println(s"PROBE project-EXISTS-correlated via SQL: ${viaSql2.map(_.length)}")
    // NOT IN in a WHERE with nulls
    val viaSql3 = scala.util.Try(spark.sql(
      "SELECT count(*) FROM subq_probe_t WHERE NOT (id IN (SELECT k FROM subq_probe_s)) OR id > 98").collect().toSeq)
    println(s"PROBE filter-NOT-IN-compound: $viaSql3")
    assert(true)
  }

  test("bound-expression filter with rebased attrs over a fresh df") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
    // analyze a filter containing a subquery against one df, then
    // rebind its outer attrs onto a DIFFERENT df by exprId mapping
    Seq(1L, 2L).toDF("k").createOrReplaceTempView("subq_probe_s2")
    val df1 = spark.range(10).toDF("id")
    df1.createOrReplaceTempView("subq_probe_t2")
    val analyzed = spark.sql(
      "SELECT * FROM subq_probe_t2 t WHERE t.id IN (SELECT k FROM subq_probe_s2) AND t.id > 0")
      .queryExecution.analyzed
    val condExpr = analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }.get
    val oldOut = analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.child.output
    }.get
    val df2 = spark.range(10).toDF("id").select($"id")  // fresh exprIds
    val newOut = df2.queryExecution.analyzed.output
    val mapping: Map[org.apache.spark.sql.catalyst.expressions.ExprId, AttributeReference] =
      oldOut.zip(newOut).map { case (o, n) =>
        o.exprId -> n.asInstanceOf[AttributeReference] }.toMap
    val rebased = condExpr.transformUp {
      case a: AttributeReference if mapping.contains(a.exprId) => mapping(a.exprId)
    }
    val boundCol = org.apache.spark.sql.graftbridge.Bridge.column(rebased)
    val n = scala.util.Try(df2.where(boundCol).count())
    println(s"PROBE rebased-subquery-filter count: $n")
    // and negated inside coalesce (the deleteWhere rewrite shape)
    val n2 = scala.util.Try(df2.where(!coalesce(boundCol, lit(false))).count())
    println(s"PROBE negated-coalesce-subquery-filter count: $n2")
    // and in a projection (the updateWhere shape)
    val n3 = scala.util.Try(df2.select(when(coalesce(boundCol, lit(false)), lit("y")).otherwise(lit("n")).as("f")).where($"f" === "y").count())
    println(s"PROBE project-when-subquery count: $n3")
    assert(true)
  }
}
