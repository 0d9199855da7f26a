package graft

import org.apache.spark.sql.functions._

import graft.sinks.CowTable

/** Subqueries in DML conditions over NAMED cow tables (round-13
  * verdict #2): the analyzed condition — subquery plans included —
  * travels on the command and binds per scan frame at execution
  * (`plans/CowBoundDml.scala`), feeding the same COW / positional-DV
  * primitives as every other DML. NULL semantics come from Spark's
  * own null-aware joins.
  */
class DmlSubquerySpec extends SparkSpec {
  import spark.implicits._

  private def freshNs(tag: String): String = {
    val ns = s"$tag${System.nanoTime() % 1000000}"
    spark.sql(s"CREATE NAMESPACE cow.$ns")
    ns
  }

  private def rootOf(ns: String, t: String): String =
    s"${spark.conf.get("spark.sql.catalog.cow.warehouse")}/$ns/$t"

  test("IN-subquery DELETE removes exactly the matching keys and " +
      "carries unmatched partitions by reference") {
    val ns = freshNs("inq")
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO cow.$ns.t SELECT id, id % 4 FROM range(40)")
    Seq(0L, 1L, 2L, 3L, 100L).toDF("k")
      .createOrReplaceTempView("subq_keys")
    spark.sql(
      s"DELETE FROM cow.$ns.t WHERE id IN (SELECT k FROM subq_keys)")
    val t = spark.table(s"cow.$ns.t")
    assert(t.count() == 36L)
    assert(t.where($"id" <= 3).isEmpty)
    // ids 0..3 live one per partition → every partition was touched;
    // redo with a single-partition delete to pin the carry: a delete
    // matching only p=0 must leave the p>=1 partitions' files
    // BYTE-IDENTICAL by path (carried by reference, not rewritten)
    val beforeSingle = CowTable.currentManifest(spark, rootOf(ns, "t"))
      .get.files.filter(f => f.part("p").toLong >= 1).map(_.path).toSet
    spark.sql(s"DELETE FROM cow.$ns.t WHERE id IN " +
      "(SELECT k * 4 FROM subq_keys WHERE k = 1)") // id 4 only (p=0)
    assert(spark.table(s"cow.$ns.t").count() == 35L)
    val afterPaths = CowTable.currentManifest(spark, rootOf(ns, "t"))
      .get.files.filter(f => f.part("p").toLong >= 1).map(_.path).toSet
    assert(afterPaths == beforeSingle,
      "untouched partitions must carry by path identity")
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }

  test("NOT IN with a NULL-bearing subquery deletes NOTHING; NOT " +
      "EXISTS deletes the complement") {
    val ns = freshNs("nin")
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO cow.$ns.t SELECT id, id % 2 FROM range(10)")
    Seq(Some(1L), None, Some(2L)).toDF("k")
      .createOrReplaceTempView("subq_nulls")
    spark.sql(s"DELETE FROM cow.$ns.t WHERE id NOT IN " +
      "(SELECT k FROM subq_nulls)")
    assert(spark.table(s"cow.$ns.t").count() == 10L,
      "NOT IN over a NULL-bearing list is never TRUE — nothing deletes")
    // IN deletes the two matches even with NULLs present
    spark.sql(s"DELETE FROM cow.$ns.t WHERE id IN " +
      "(SELECT k FROM subq_nulls)")
    assert(spark.table(s"cow.$ns.t").count() == 8L)
    // NOT EXISTS (correlated) deletes everything WITHOUT a match
    spark.sql(s"DELETE FROM cow.$ns.t WHERE NOT EXISTS " +
      s"(SELECT 1 FROM subq_nulls s WHERE s.k = id + 1)")
    // remaining: rows whose id+1 ∈ {1,2} → id ∈ {0,1} minus deleted {1,2}
    assert(spark.table(s"cow.$ns.t").select("id").as[Long]
      .collect().toSet == Set(0L),
      "NOT EXISTS must keep only ids with a correlated match")
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }

  test("UPDATE with a correlated EXISTS condition updates exactly the " +
      "matching rows; a SET-value subquery executes (round-15)") {
    val ns = freshNs("upd")
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT, v STRING, p BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql(
      s"INSERT INTO cow.$ns.t SELECT id, 'a', id % 2 FROM range(10)")
    Seq(2L, 3L).toDF("k").createOrReplaceTempView("subq_upd")
    spark.sql(s"UPDATE cow.$ns.t SET v = 'hit' WHERE EXISTS " +
      "(SELECT 1 FROM subq_upd s WHERE s.k = id)")
    val t = spark.table(s"cow.$ns.t")
    assert(t.where($"v" === "hit").select("id").as[Long]
      .collect().toSet == Set(2L, 3L))
    assert(t.where($"v" === "a").count() == 8L)
    spark.sql(
      s"UPDATE cow.$ns.t SET v = (SELECT CAST(max(k) AS STRING) " +
        "FROM subq_upd) WHERE id = 0")
    assert(spark.table(s"cow.$ns.t").where($"id" === 0)
      .select("v").as[String].head == "3")
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }

  test("MOR routing: an IN-subquery DELETE under dml.mode=mor lands " +
      "positional DVs, zero partitions rewritten, masked on read") {
    val ns = freshNs("morq")
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO cow.$ns.t SELECT id, id % 2 FROM range(20)")
    Seq(4L, 5L, 6L).toDF("k").createOrReplaceTempView("subq_mor")
    val root = rootOf(ns, "t")
    val dataPaths = CowTable.currentManifest(spark, root).get
      .files.map(_.path).toSet
    spark.conf.set("spark.graft.cow.dml.mode", "mor")
    try spark.sql(
      s"DELETE FROM cow.$ns.t WHERE id IN (SELECT k FROM subq_mor)")
    finally spark.conf.set("spark.graft.cow.dml.mode", "auto")
    val m = CowTable.currentManifest(spark, root).get
    assert(m.dvs.nonEmpty, "mor DELETE must land positional DVs")
    assert(m.files.map(_.path).toSet == dataPaths,
      "mor DELETE must rewrite zero data files")
    val t = spark.table(s"cow.$ns.t")
    assert(t.count() == 17L && t.where($"id".between(4, 6)).isEmpty)
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }

  test("self-referential subquery reads the PRE-statement snapshot") {
    val ns = freshNs("self")
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO cow.$ns.t SELECT id, id % 2 FROM range(10)")
    // delete the max row; the subquery must evaluate against the
    // snapshot BEFORE the delete starts (SQL evaluation order)
    spark.sql(s"DELETE FROM cow.$ns.t WHERE id IN " +
      s"(SELECT max(id) FROM cow.$ns.t)")
    assert(spark.table(s"cow.$ns.t").agg(max("id")).as[Long].head == 8L)
    assert(spark.table(s"cow.$ns.t").count() == 9L)
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }

  test("the PATH form (cow.`/root`) takes subquery conditions too — " +
      "parsed expressions inject directly instead of the text " +
      "round-trip that cannot render them") {
    val root =
      s"${java.nio.file.Files.createTempDirectory("psq").toString}/t"
    CowTable.commitFull(
      spark.range(10).select($"id", ($"id" % 2).as("p")),
      root, 1L, Seq("p"))
    Seq(1L, 2L).toDF("k").createOrReplaceTempView("psq_keys")
    spark.sql(
      s"DELETE FROM cow.`$root` WHERE id IN (SELECT k FROM psq_keys)")
    assert(CowTable.read(spark, root).get.count() == 8L)
    // correlated EXISTS through the path form
    spark.sql(s"UPDATE cow.`$root` SET id = id + 100 WHERE EXISTS " +
      "(SELECT 1 FROM psq_keys s WHERE s.k = id - 2)")
    assert(CowTable.read(spark, root).get.select("id").as[Long]
      .collect().sorted.toSeq == Seq(0L, 5L, 6L, 7L, 8L, 9L, 103L, 104L))
    // SET-value subqueries execute on this form too (round-15): the
    // value analyzes once against the current snapshot and binds per
    // scan frame
    spark.sql(
      s"UPDATE cow.`$root` SET id = (SELECT max(k) FROM psq_keys) " +
        "WHERE id = 0")
    assert(CowTable.read(spark, root).get.select("id").as[Long]
      .collect().sorted.toSeq == Seq(2L, 5L, 6L, 7L, 8L, 9L, 103L, 104L))
  }

  test("UPDATE SET values take subqueries (round-15): scalar, " +
      "correlated, mixed with plain assignments; >1-row scalar fails " +
      "with Spark's own error; the type gate still applies") {
    val ns = freshNs("setq")
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT, v BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO cow.$ns.t SELECT id, id * 10, id % 2 " +
      "FROM range(10)")
    Seq((0L, 7L), (1L, 9L)).toDF("k", "bonus")
      .createOrReplaceTempView("setq_lkp")
    // uncorrelated scalar subquery value, condition plain
    spark.sql(s"UPDATE cow.$ns.t SET v = " +
      "(SELECT max(bonus) FROM setq_lkp) WHERE id = 0")
    assert(spark.table(s"cow.$ns.t").where($"id" === 0)
      .select("v").as[Long].head == 9L)
    // CORRELATED scalar subquery value + plain assignment in one SET
    spark.sql(s"UPDATE cow.$ns.t SET v = " +
      "(SELECT l.bonus FROM setq_lkp l WHERE l.k = p) + v, id = id + 100 " +
      "WHERE id IN (SELECT k + 2 FROM setq_lkp)")
    val got = spark.table(s"cow.$ns.t")
      .where($"id" >= 100).orderBy("id")
      .select("id", "v").as[(Long, Long)].collect().toSeq
    // id 2 (p=0, bonus 7): v 20+7=27; id 3 (p=1, bonus 9): v 30+9=39
    assert(got == Seq((102L, 27L), (103L, 39L)), s"got $got")
    // a scalar subquery returning MORE THAN ONE ROW fails loudly with
    // Spark's own error, and the failed statement commits nothing
    val head = CowTable.currentManifest(spark, rootOf(ns, "t")).get.id
    val e = intercept[Exception](spark.sql(
      s"UPDATE cow.$ns.t SET v = (SELECT k FROM setq_lkp) WHERE id = 0"))
    assert(Option(e.getMessage).exists(m =>
      m.contains("MULTI_VALUE") || m.toLowerCase.contains("more than one row")),
      s"wrong >1-row failure: $e")
    assert(CowTable.currentManifest(spark, rootOf(ns, "t")).get.id == head,
      "a failed SET-subquery UPDATE must commit nothing")
    // ANSI store-assignment gate applies to bound values too
    val e2 = intercept[Exception](spark.sql(s"UPDATE cow.$ns.t SET v = " +
      "(SELECT concat('x', k) FROM setq_lkp WHERE k = 0) WHERE id = 0"))
    assert(Option(e2.getMessage).exists(_.contains("ANSI")),
      s"wrong type-gate failure: $e2")
    // MOR routing: the same bound SET goes through the DV update path
    spark.conf.set("spark.graft.cow.dml.mode", "mor")
    try spark.sql(s"UPDATE cow.$ns.t SET v = " +
      "(SELECT min(bonus) FROM setq_lkp) WHERE id = 1")
    finally spark.conf.unset("spark.graft.cow.dml.mode")
    assert(spark.table(s"cow.$ns.t").where($"id" === 1)
      .select("v").as[Long].head == 7L)
    assert(CowTable.currentManifest(spark, rootOf(ns, "t")).get
      .dvs.nonEmpty, "mor mode must mask positionally")
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }

  test("MERGE WHEN-clause conditions take subqueries (round-15): " +
      "IN and correlated EXISTS guards gate matched/not-matched/" +
      "by-source actions; ON subqueries refuse by design; SET-value " +
      "subqueries execute (round-16, MergeSetSubquerySpec)") {
    val ns = freshNs("mrg")
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO cow.$ns.t SELECT id, 'a' FROM range(5)")
    Seq((1L, "b"), (2L, "c"), (10L, "n"), (11L, "m"))
      .toDF("id", "v").createOrReplaceTempView("subq_msrc")
    Seq(1L, 10L).toDF("k").createOrReplaceTempView("subq_mkeys")
    // matched guard: ids 1,2 are source-matched but only 1 passes the
    // IN — 2's guard fails so it stays untouched (ANSI: no clause
    // applying leaves the row; matched rows never take by-source
    // clauses). not-matched guard: only id 10 inserts. by-source
    // guard (correlated NOT EXISTS): rows 3,4 flagged; 0 kept.
    Seq(0L).toDF("keep").createOrReplaceTempView("subq_mkeep")
    spark.sql(s"""
      MERGE INTO cow.$ns.t AS t USING subq_msrc AS s ON t.id = s.id
      WHEN MATCHED AND t.id IN (SELECT k FROM subq_mkeys)
        THEN UPDATE SET v = s.v
      WHEN NOT MATCHED AND s.id IN (SELECT k FROM subq_mkeys)
        THEN INSERT (id, v) VALUES (s.id, s.v)
      WHEN NOT MATCHED BY SOURCE
          AND NOT EXISTS (SELECT 1 FROM subq_mkeep w WHERE w.keep = t.id)
        THEN UPDATE SET v = 'flagged'""")
    val got = spark.table(s"cow.$ns.t").orderBy("id")
      .select("id", "v").as[(Long, String)].collect().toSeq
    assert(got == Seq((0L, "a"), (1L, "b"), (2L, "a"),
      (3L, "flagged"), (4L, "flagged"), (10L, "n")), s"got $got")
    // ON subqueries refuse (they would change matchedness)
    val e = intercept[Exception](spark.sql(s"""
      MERGE INTO cow.$ns.t AS t USING subq_msrc AS s
      ON t.id = s.id AND t.id IN (SELECT k FROM subq_mkeys)
      WHEN MATCHED THEN DELETE"""))
    assert(Option(e.getMessage).exists(m =>
      m.contains("materialize the subquery") ||
        m.contains("conjunction of t.k = s.k")), s"wrong refusal: $e")
    // SET values inside MERGE EXECUTE since round-16 (carried
    // analyzed, bound to the flat join — MergeSetSubquerySpec pins
    // the semantics; here just pin that the former refusal is gone)
    spark.sql(s"""
      MERGE INTO cow.$ns.t AS t USING subq_msrc AS s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v =
        (SELECT CAST(max(k) AS STRING) FROM subq_mkeys)""")
    assert(spark.table(s"cow.$ns.t").where($"id" === 1L)
      .select("v").as[String].head == "10",
      "MERGE SET subquery must assign the computed value")
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }

  test("review pins: a column named 'present' survives the bound-merge " +
      "flat construction; a SET subquery that is multi-row only for " +
      "UNMATCHED rows does not abort (ANSI matched-only evaluation)") {
    val ns = freshNs("rvw")
    // 'present' collides with a naive presence-flag name in the flat
    // prefixed join — must plan and run
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT, present BIGINT)")
    spark.sql(s"INSERT INTO cow.$ns.t SELECT id, id FROM range(4)")
    spark.range(2).select($"id", ($"id" + 100).as("present"))
      .createOrReplaceTempView("rvw_src")
    Seq(1L).toDF("k").createOrReplaceTempView("rvw_keys")
    spark.sql(s"""
      MERGE INTO cow.$ns.t AS t USING rvw_src AS s ON t.id = s.id
      WHEN MATCHED AND t.id IN (SELECT k FROM rvw_keys)
        THEN UPDATE SET present = s.present""")
    assert(spark.table(s"cow.$ns.t").where($"id" === 1)
      .select("present").as[Long].head == 101L)
    // correlated scalar SET: lookup has TWO rows for id=3 (unmatched
    // by the WHERE) and one for id=0 (matched) — the statement must
    // succeed, evaluating the subquery on matched rows only; COW path
    Seq((0L, 7L), (3L, 8L), (3L, 9L)).toDF("k", "v")
      .createOrReplaceTempView("rvw_lkp")
    spark.conf.set("spark.graft.cow.dml.mode", "cow")
    try spark.sql(s"UPDATE cow.$ns.t SET present = " +
      "(SELECT l.v FROM rvw_lkp l WHERE l.k = id) WHERE id = 0")
    finally spark.conf.unset("spark.graft.cow.dml.mode")
    val got = spark.table(s"cow.$ns.t").orderBy("id")
      .select("present").as[Long].collect().toSeq
    assert(got == Seq(7L, 101L, 2L, 3L), s"got $got")
    // a MERGE guard's correlated scalar subquery evaluates only on
    // its clause's row class: the lookup is multi-row ONLY for a
    // source key that matches no target (a not-matched row, which the
    // MATCHED guard never sees) — the statement must succeed
    spark.range(7, 9).select($"id", lit(0L).as("present"))
      .unionByName(spark.range(0, 2)
        .select($"id", ($"id" + 50).as("present")))
      .createOrReplaceTempView("rvw_src2")
    Seq((0L, 1L), (8L, 1L), (8L, 2L)).toDF("k", "g")
      .createOrReplaceTempView("rvw_guard")
    spark.sql(s"""
      MERGE INTO cow.$ns.t AS t USING rvw_src2 AS s ON t.id = s.id
      WHEN MATCHED AND t.present >
          (SELECT g.g FROM rvw_guard g WHERE g.k = s.id) - 2
        THEN UPDATE SET present = s.present""")
    assert(spark.table(s"cow.$ns.t").where($"id" === 0)
      .select("present").as[Long].head == 50L,
      "matched-guard merge must succeed despite a multi-row lookup " +
        "for an unmatched source key")
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }

  test("the PATH form takes MERGE clause-condition subqueries too " +
      "(analyze-once against the pre-statement snapshot)") {
    val root =
      s"${java.nio.file.Files.createTempDirectory("pmq").toString}/t"
    CowTable.commitFull(
      spark.range(6).select($"id", lit("a").as("v"), ($"id" % 2).as("p")),
      root, 1L, Seq("p"))
    spark.range(8).select($"id", lit("s").as("v"), ($"id" % 2).as("p"))
      .createOrReplaceTempView("pmq_src")
    Seq(2L, 6L).toDF("k").createOrReplaceTempView("pmq_keys")
    graft.sinks.CowSql.exec(spark, 2L, s"""
      MERGE INTO cow.`$root` AS t USING pmq_src AS s ON t.id = s.id
      WHEN MATCHED AND t.id IN (SELECT k FROM pmq_keys)
        THEN UPDATE SET v = s.v
      WHEN NOT MATCHED AND s.id IN (SELECT k FROM pmq_keys)
        THEN INSERT (id, v, p) VALUES (s.id, s.v, s.p)""")
    val got = CowTable.read(spark, root).get
      .where($"v" === "s").select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(2L, 6L), s"got $got")
  }
}
