package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.DvSidecars
import graft.sinks.{CowSql, CowTable}
import graft.streaming.{CowChangeFeedStream, CowFeedOffset, CowStream}

/** Round-13 self-review fixes, pinned:
  *
  *  1. OPTIMIZE reports OWNERSHIP: a lost race (another writer took
  *     the id) returns / fails false-loud instead of the old
  *     hard-coded `true`; a benign no-op (already-compact table, id
  *     unconsumed) still reads as success.
  *  2. An UPDATE whose SET list is ALL identity assignments
  *     (`SET v = v`) is a legal no-op rewrite, not an
  *     at-least-one-assignment error; a MERGE matched-UPDATE with
  *     identity-only assignments renders parseable text and the
  *     statement's other clauses execute.
  *  3. A MERGE whose rendered text contains the literal `{src}` in a
  *     user string is NOT corrupted by source-view substitution (the
  *     view name is rendered at conversion, never spliced by
  *     placeholder replace).
  *  4. [[CowStream.changeFeed]] resolves through whatever CowCatalog
  *     the session registered — any name, not the literal `cow`.
  *  5. The change feed's sidecar-less-commit probe re-verifies the id
  *     is still committed (vacuum deletes manifests strictly before
  *     sidecars, so "still committed + no sidecar dir" is proof of a
  *     changelog-less commit, not a silently-vacuumed gap).
  *  6. [[DvSidecars]]' load log is bounded like the position cache —
  *     a long-lived executor cannot grow it without limit.
  */
class SelfReviewR13Spec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(tag).toString

  // rerunnable against a warehouse that survives the JVM: unique names
  private def ns(tag: String): String =
    tag + java.util.UUID.randomUUID().toString.replace("-", "").take(8)

  test("OPTIMIZE ownership: a stolen commit id reads false (exec) and " +
      "fails loudly (execAuto); an already-compact no-op stays true") {
    val root = s"${tmp("optown")}/t"
    // ONE file: genuinely nothing to compact
    CowTable.commitFull(spark.range(100).select($"id",
      ($"id" % 4).as("k")).coalesce(1), root, 1L, Nil)
    // benign: one well-sized file, nothing to compact, id 2 unconsumed
    assert(CowSql.exec(spark, 2L, s"OPTIMIZE cow.`$root`"),
      "an already-compact table must report success, not a lost race")
    assert(CowTable.committedIds(spark, root) == Seq(1L),
      "the benign no-op must not have committed")
    // lost race: id 2 is taken by a concurrent append before OPTIMIZE
    CowTable.commitAppend(spark.range(100, 200).select($"id",
      ($"id" % 4).as("k")).coalesce(1), root, 2L, Nil)
    assert(!CowSql.exec(spark, 2L, s"OPTIMIZE cow.`$root`"),
      "a stolen id must read as a lost race, not success")
    assert(!CowSql.exec(spark, 2L, s"OPTIMIZE cow.`$root` ZORDER BY (id)"),
      "ZORDER on a stolen id must read as a lost race too")
  }

  test("named UPDATE with an all-identity SET list is a legal no-op " +
      "rewrite; identity-only MERGE UPDATE still runs its other clauses") {
    val t = s"cow.${ns("sr13")}.ident"
    spark.sql(s"CREATE NAMESPACE ${t.split("\\.").init.mkString(".")}")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t SELECT id, 'a' FROM range(10)")
    // all-identity UPDATE: executes, table state unchanged
    spark.sql(s"UPDATE $t SET v = v WHERE id < 5")
    assert(spark.table(t).where($"v" === "a").count() == 10)
    // identity-only matched UPDATE + a real INSERT clause: the INSERT
    // must land (pre-fix this rendered `UPDATE SET ` and died parsing)
    Seq((3L, "x"), (42L, "x")).toDF("id", "v")
      .createOrReplaceTempView("sr13_src")
    spark.sql(s"MERGE INTO $t AS t USING sr13_src AS s " +
      "ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET v = t.v " +
      "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)")
    val after = spark.table(t)
    assert(after.count() == 11)
    assert(after.where($"id" === 42L && $"v" === "x").count() == 1)
    assert(after.where($"id" === 3L && $"v" === "a").count() == 1,
      "identity matched-UPDATE must leave the matched row's values")
  }

  test("a user string literal '{src}' inside a MERGE condition survives " +
      "source-view substitution verbatim") {
    val t = s"cow.${ns("sr13b")}.lit"
    spark.sql(s"CREATE NAMESPACE ${t.split("\\.").init.mkString(".")}")
    spark.sql(s"CREATE TABLE $t (id BIGINT, tag STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, '{src}'), (2, 'keep')")
    Seq(1L, 2L).toDF("id").createOrReplaceTempView("sr13b_src")
    spark.sql(s"MERGE INTO $t AS t USING sr13b_src AS s " +
      "ON t.id = s.id " +
      "WHEN MATCHED AND t.tag = '{src}' THEN DELETE")
    val left = spark.table(t).collect()
    assert(left.length == 1 && left.head.getString(1) == "keep",
      "the literal-{src} row must have matched its DELETE clause")
  }

  test("changeFeed resolves through a CowCatalog registered under a " +
      "NON-'cow' name when 'cow' is not registered") {
    val root = s"${tmp("feedcat")}/t"
    CowTable.commitFull(Seq((1L, "a")).toDF("id", "v"), root, 1L,
      Nil, changeLogKeys = Seq("id"))
    val saved = spark.conf.getOption("spark.sql.catalog.cow")
    try {
      spark.conf.unset("spark.sql.catalog.cow")
      spark.conf.set("spark.sql.catalog.cow3",
        classOf[graft.catalog.CowCatalog].getName)
      spark.conf.set("spark.sql.catalog.cow3.warehouse", tmp("feedwh"))
      val feed = CowStream.changeFeed(spark, root)
      assert(feed.isStreaming)
      assert(feed.columns.contains("_commit_id"))
    } finally saved.foreach(spark.conf.set("spark.sql.catalog.cow", _))
  }

  test("a commit WITHOUT changeLogKeys inside the feed range serves the " +
      "surrounding sidecars and is re-verified as committed, not vacuumed") {
    val root = s"${tmp("feedless")}/t"
    CowTable.commitFull(Seq((1L, "a")).toDF("id", "v"), root, 1L,
      Nil, keep = 5, changeLogKeys = Seq("id"))
    // id 2: changelog-less commit — no _changes/2 dir exists
    CowTable.commitAppend(Seq((2L, "b")).toDF("id", "v"), root, 2L, Nil,
      keep = 5)
    CowTable.commitAppend(Seq((3L, "c")).toDF("id", "v"), root, 3L,
      Nil, keep = 5, changeLogKeys = Seq("id"))
    val stream = new CowChangeFeedStream(spark, root,
      CowTable.currentManifest(spark, root).get.schema, None)
    val parts = stream.planInputPartitions(CowFeedOffset(0L),
      CowFeedOffset(3L))
    // ids 1 and 3 serve their sidecars; id 2 is verified-benign
    assert(parts.nonEmpty)
    assert(!parts.map(_.toString).exists(_.contains("/_changes/2/")),
      "the changelog-less commit has nothing to serve")
  }

  test("DvSidecars load log is bounded") {
    val before = DvSidecars.loadLog.size()
    (0 until 200).foreach(i => DvSidecars.logLoad(s"sr13-key-$i", true))
    assert(DvSidecars.loadLog.size() <= 66,
      s"load log grew unbounded: ${DvSidecars.loadLog.size()} " +
        s"entries (was $before)")
  }
}
