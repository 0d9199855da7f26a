package graft

import org.apache.spark.sql.functions._

import graft.sinks.CowTable

/** Scalar subqueries in MERGE SET/VALUES (round-15 verdict #2): the
  * assignment value — `UPDATE SET c = (SELECT …)`, `INSERT … VALUES
  * ((SELECT …))`, correlated included — travels ANALYZED on the merge
  * command (the same `BoundMergeCond` carrier as WHEN-clause guards)
  * and binds against the merge's flat join frame at execution
  * (`plans/CowBoundDml.scala`, `operators/MergeInto.scala`). A bound
  * value evaluates only on the clause's ROW CLASS (matched /
  * not-matched / by-source), the same split the guards use; Spark's
  * own scalar-subquery machinery enforces at-most-one-row at runtime.
  * ON keeps refusing subqueries BY DESIGN (matchedness-per-pair) —
  * the refusal text is pinned here too (round-15 verdict #3).
  */
class MergeSetSubquerySpec extends SparkSpec {
  import spark.implicits._

  private def freshNs(tag: String): String = {
    val ns = s"$tag${System.nanoTime() % 1000000}"
    spark.sql(s"CREATE NAMESPACE cow.$ns")
    ns
  }

  test("MATCHED UPDATE SET with an uncorrelated scalar subquery " +
      "assigns the computed value; unmatched rows keep theirs") {
    val ns = freshNs("msv")
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT, v BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO cow.$ns.t SELECT id, id * 10, id % 2 " +
      "FROM range(10)")
    spark.range(4).select($"id", ($"id" % 2).as("p"))
      .createOrReplaceTempView("msv_src")
    Seq(100L, 200L).toDF("x").createOrReplaceTempView("msv_lkp")
    spark.sql(s"""MERGE INTO cow.$ns.t AS t USING msv_src AS s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v =
        (SELECT max(x) FROM msv_lkp) + t.id""")
    val got = spark.table(s"cow.$ns.t").select("id", "v").as[(Long, Long)]
      .collect().toMap
    (0L until 4L).foreach(i => assert(got(i) == 200L + i,
      s"matched row $i must take the subquery value"))
    (4L until 10L).foreach(i => assert(got(i) == i * 10,
      s"unmatched row $i must keep its value"))
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }

  test("correlated scalar SET subquery + INSERT VALUES subquery bind " +
      "per pair; each evaluates only on its own row class") {
    val ns = freshNs("msc")
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT, v BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO cow.$ns.t SELECT id, 0L, id % 2 FROM range(6)")
    // lookup: one row per MATCHED key (ids 0..5), TWO rows for id 100 —
    // a NOT MATCHED source key. The MATCHED clause's correlated scalar
    // must not abort on the multi-row key it never evaluates (class
    // split); the INSERT value uses a different, single-row lookup.
    (Seq.tabulate(6)(i => (i.toLong, i * 7L)) ++
      Seq((100L, 1L), (100L, 2L)))
      .toDF("k", "w").createOrReplaceTempView("msc_lkp")
    spark.sql("SELECT id, id % 2 AS p FROM range(6) " +
      "UNION ALL SELECT 100L, 0L").createOrReplaceTempView("msc_src")
    spark.sql(s"""MERGE INTO cow.$ns.t AS t USING msc_src AS s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v =
        (SELECT w FROM msc_lkp WHERE k = t.id)
      WHEN NOT MATCHED THEN INSERT (id, v, p) VALUES
        (s.id, (SELECT count(*) FROM msc_lkp WHERE k = s.id), s.p)""")
    val got = spark.table(s"cow.$ns.t").select("id", "v").as[(Long, Long)]
      .collect().toMap
    (0L until 6L).foreach(i => assert(got(i) == i * 7,
      s"matched row $i must take its correlated lookup"))
    assert(got(100L) == 2L,
      "inserted row must take its subquery-computed value")
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }

  test("a correlated SET subquery returning more than one row for a " +
      "row the clause DOES evaluate fails the statement") {
    val ns = freshNs("msm")
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT, v BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO cow.$ns.t SELECT id, 0L, id % 2 FROM range(4)")
    Seq((1L, 10L), (1L, 20L)).toDF("k", "w")
      .createOrReplaceTempView("msm_lkp")
    spark.range(4).select($"id", ($"id" % 2).as("p"))
      .createOrReplaceTempView("msm_src")
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO cow.$ns.t AS t USING msm_src AS s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v =
          (SELECT w FROM msm_lkp WHERE k = t.id)""")
    }
    assert(e.getMessage.toLowerCase.contains("more than one row") ||
      e.getMessage.contains("SCALAR_SUBQUERY_TOO_MANY_ROWS"),
      s"must fail with Spark's at-most-one-row error, got: ${e.getMessage}")
    // the failed statement must not have committed
    assert(spark.table(s"cow.$ns.t").where($"v" =!= 0L).isEmpty,
      "a failed MERGE must leave the table untouched")
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }

  test("textual path-form MERGE takes SET subqueries too (the two " +
      "surfaces stay in step)") {
    val root = s"/tmp/graft_msv_${System.nanoTime()}"
    CowTable.commitFull(
      spark.range(5).select($"id", lit(0L).as("v"), ($"id" % 2).as("p")),
      root, 1L, Seq("p"), keep = 10)
    spark.range(3).select($"id", ($"id" % 2).as("p"))
      .createOrReplaceTempView("msvp_src")
    Seq(42L).toDF("x").createOrReplaceTempView("msvp_lkp")
    graft.sinks.CowSql.exec(spark, 2L,
      s"""MERGE INTO cow.`$root` AS t USING msvp_src AS s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = (SELECT max(x) FROM msvp_lkp)""")
    val got = CowTable.read(spark, root).get
      .select("id", "v").as[(Long, Long)].collect().toMap
    (0L until 3L).foreach(i => assert(got(i) == 42L))
    (3L until 5L).foreach(i => assert(got(i) == 0L))
  }

  test("the textual probe re-imposes Spark's clause scope rules " +
      "(ADVICE r16): a by-source SET value or an INSERT VALUES " +
      "subquery referencing the out-of-class side refuses instead of " +
      "silently evaluating against the NULL columns") {
    val root = s"/tmp/graft_mso_${System.nanoTime()}"
    CowTable.commitFull(
      spark.range(6).select($"id", ($"id" * 10).as("v"),
        ($"id" % 2).as("p")),
      root, 1L, Seq("p"), keep = 10)
    spark.range(3).select($"id", lit(1L).as("w"), ($"id" % 2).as("p"))
      .createOrReplaceTempView("mso_src")
    Seq(5L).toDF("x").createOrReplaceTempView("mso_lkp")
    // by-source SET value reaching the source through a correlated
    // subquery's outer reference
    val e1 = intercept[Exception](graft.sinks.CowSql.exec(spark, 2L,
      s"""MERGE INTO cow.`$root` AS t USING mso_src AS s
        ON t.id = s.id
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v =
          (SELECT max(x) FROM mso_lkp WHERE x = s.w)"""))
    assert(e1.getMessage.contains("NOT MATCHED BY SOURCE") &&
      e1.getMessage.contains("source"),
      s"by-source scope violation must refuse loudly: ${e1.getMessage}")
    // INSERT VALUES subquery reaching the target
    val e2 = intercept[Exception](graft.sinks.CowSql.exec(spark, 2L,
      s"""MERGE INTO cow.`$root` AS t USING mso_src AS s
        ON t.id = s.id
        WHEN NOT MATCHED THEN INSERT (id, v, p) VALUES (s.id,
          (SELECT max(x) FROM mso_lkp WHERE x = t.v), s.p)"""))
    assert(e2.getMessage.contains("INSERT") &&
      e2.getMessage.contains("target"),
      s"insert scope violation must refuse loudly: ${e2.getMessage}")
    // TEXTUAL (no-subquery) values and conditions hit the same wall —
    // they round-trip as text and would otherwise evaluate over the
    // joined frame's NULL out-of-class struct (review r17)
    val e3 = intercept[Exception](graft.sinks.CowSql.exec(spark, 2L,
      s"""MERGE INTO cow.`$root` AS t USING mso_src AS s
        ON t.id = s.id
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = s.w + 1"""))
    assert(e3.getMessage.contains("NOT MATCHED BY SOURCE") &&
      e3.getMessage.contains("s.w"),
      s"textual by-source scope violation must refuse: ${e3.getMessage}")
    val e4 = intercept[Exception](graft.sinks.CowSql.exec(spark, 2L,
      s"""MERGE INTO cow.`$root` AS t USING mso_src AS s
        ON t.id = s.id
        WHEN NOT MATCHED AND t.v > 0 THEN INSERT (id, v, p)
          VALUES (s.id, s.w, s.p)"""))
    assert(e4.getMessage.contains("INSERT") &&
      e4.getMessage.contains("t.v"),
      s"textual insert-condition scope violation must refuse: " +
        s"${e4.getMessage}")
    // all four refusals left the table untouched
    assert(CowTable.read(spark, root).get.agg(sum("v"))
      .as[Long].head() == (0 until 6).map(_ * 10).sum)
    // the legitimate shapes still work: by-source value over target
    // columns, insert value over source columns
    graft.sinks.CowSql.exec(spark, 2L,
      s"""MERGE INTO cow.`$root` AS t USING mso_src AS s
        ON t.id = s.id
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v =
          (SELECT max(x) FROM mso_lkp) + t.id""")
    val got = CowTable.read(spark, root).get
      .select("id", "v").as[(Long, Long)].collect().toMap
    (3L until 6L).foreach(i => assert(got(i) == 5L + i,
      s"by-source row $i must take the in-scope subquery value"))
    (0L until 3L).foreach(i => assert(got(i) == i * 10,
      s"matched row $i must keep its value"))
  }

  test("a subquery value may not assign a partition column; MERGE ON " +
      "subqueries refuse BY DESIGN with the exact-position message") {
    val ns = freshNs("msr")
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT, v BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO cow.$ns.t SELECT id, 0L, id % 2 FROM range(4)")
    spark.range(2).select($"id", ($"id" % 2).as("p"))
      .createOrReplaceTempView("msr_src")
    Seq(1L).toDF("x").createOrReplaceTempView("msr_lkp")
    val e1 = intercept[Exception] {
      spark.sql(s"""MERGE INTO cow.$ns.t AS t USING msr_src AS s
        ON t.id = s.id
        WHEN NOT MATCHED THEN INSERT (id, v, p) VALUES
          (s.id, 0L, (SELECT max(x) FROM msr_lkp))""")
    }
    assert(e1.getMessage.contains("partition column"),
      s"subquery-assigned partition column must refuse: ${e1.getMessage}")
    val e2 = intercept[Exception] {
      spark.sql(s"""MERGE INTO cow.$ns.t AS t USING msr_src AS s
        ON t.id = s.id AND t.id IN (SELECT x FROM msr_lkp)
        WHEN MATCHED THEN UPDATE SET v = 1L""")
    }
    // round-15 verdict #3: the message must name ON as refused BY
    // DESIGN and must NOT claim the user's position is supported
    assert(e2.getMessage.contains("BY DESIGN") &&
      e2.getMessage.contains("matchedness"),
      s"ON refusal must state the design reason: ${e2.getMessage}")
    assert(!e2.getMessage.contains("MERGE ON/WHEN"),
      "the stale 'supported in MERGE ON' wording must be gone")
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }
}
