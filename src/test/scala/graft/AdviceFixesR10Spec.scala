package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.DataDiff
import graft.sinks.{CowConstraintException, CowTable, CowV2}
import graft.streaming.CowStream

/** Regression pins for the round-10 advisor findings (ADVICE.md r10):
  * WAP publishes were invisible to sidecar-maintained MVs, staged
  * commits skipped constraints registered between stage and publish,
  * session-TZ timestamp partition columns could misprune through
  * CowFileIndex, and DataDiff misclassified null-keyed rows.
  */
class AdviceFixesR10Spec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"advr10_$tag").toString

  test("a WAP stage carries its pure-I sidecar and the publish makes " +
      "it servable; discard deletes the staging dir") {
    val root = tmp("wap_cdf")
    val base = spark.range(10)
      .select($"id", CowTable.keyBucket(Seq("id"), 2).as("pb"))
    CowTable.commitFull(base, root, 1L, Seq("pb"), keep = 10,
      changeLogKeys = Seq("id"))
    val batch = spark.range(100, 110)
      .select($"id", CowTable.keyBucket(Seq("id"), 2).as("pb"))
    CowTable.stageAppend(batch, root, 2L, Seq("pb"),
      changeLogKeys = Seq("id"))
    // invisible until publish: no published sidecar, table unchanged
    assert(!CowTable.hasChangeLog(spark, root, 2L),
      "staged sidecar leaked before publish")
    CowTable.publishStaged(spark, root, 2L, keep = 10)
    assert(CowTable.hasChangeLog(spark, root, 2L),
      "published WAP commit has no sidecar — streaming MVs cannot see it")
    val log = CowTable.changeLogFor(spark, root, 2L).get
    assert(log.where($"oper" =!= "I").isEmpty,
      "WAP append sidecar must be pure-I")
    assert(log.select("id").as[Long].collect().sorted.toSeq ==
      (100L until 110L).toSeq)
    // and the maintained MV path consumes it like any other commit
    val mv = tmp("wap_mv")
    def feedOf(ids: Long*) = ids.map(i =>
      CowTable.changeLogFor(spark, root, i).get
        .withColumnRenamed("oper", "_oper")
        .withColumn("_commit_id", lit(i)))
      .reduce(_.unionByName(_))
    CowStream.mvBatch(feedOf(1L, 2L), 0L, root, mv,
      Seq("pb"), Seq("id"))
    val got = graft.sinks.SnapshotTarget.read(spark, mv).get
      .agg(sum($"mv_n")).as[Long].collect().head
    assert(got == 20L, s"MV missed the WAP-published rows: $got")
    // a discarded stage leaves no sidecar staging behind
    CowTable.stageAppend(
      spark.range(200, 205)
        .select($"id", CowTable.keyBucket(Seq("id"), 2).as("pb")),
      root, 3L, Seq("pb"), changeLogKeys = Seq("id"))
    CowTable.discardStaged(spark, root, 3L)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val leftovers = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$root/_changes")).toSeq
      .map(_.getPath.getName).filter(_.startsWith(".tmp-3-"))
    assert(leftovers.isEmpty, s"discard left sidecar staging: $leftovers")
  }

  test("a constraint registered between stage and publish re-validates " +
      "the STAGED rows at publish time") {
    val root = tmp("wap_chk")
    CowTable.commitFull(
      spark.range(10).select($"id", lit("ok").as("status")),
      root, 1L, Nil, keep = 10)
    // the staged batch carries a row the NEW constraint forbids; at
    // stage time no constraint exists, so the stage itself succeeds
    CowTable.stageAppend(
      Seq((100L, "ok"), (101L, "BAD")).toDF("id", "status"),
      root, 2L, Nil)
    CowTable.setCheckConstraints(spark, root,
      Map("status_ok" -> "status = 'ok'"))
    intercept[CowConstraintException] {
      CowTable.publishStaged(spark, root, 2L, keep = 10)
    }
    assert(CowTable.read(spark, root).get.count() == 10,
      "failed publish must leave the table unchanged")
    // a conforming stage under the SAME set publishes fine
    CowTable.discardStaged(spark, root, 2L)
    CowTable.stageAppend(
      Seq((100L, "ok")).toDF("id", "status"), root, 3L, Nil)
    CowTable.publishStaged(spark, root, 3L, keep = 10)
    assert(CowTable.read(spark, root).get.count() == 11)
  }

  test("a committed id with NO sidecar below the batch frontier fails " +
      "the sidecar-maintained MV loudly instead of silently diverging") {
    val root = tmp("blind")
    val base = spark.range(10)
      .select($"id", CowTable.keyBucket(Seq("id"), 2).as("pb"))
    CowTable.commitFull(base, root, 1L, Seq("pb"), keep = 10,
      changeLogKeys = Seq("id"))
    // commit 2: NO changeLogKeys — invisible to any sidecar consumer
    CowTable.commitAppend(
      spark.range(50, 60)
        .select($"id", CowTable.keyBucket(Seq("id"), 2).as("pb")),
      root, 2L, Seq("pb"), keep = 10)
    // commit 3: sidecar'd again
    CowTable.commitAppend(
      spark.range(100, 110)
        .select($"id", CowTable.keyBucket(Seq("id"), 2).as("pb")),
      root, 3L, Seq("pb"), keep = 10, changeLogKeys = Seq("id"))
    val mv = tmp("blind_mv")
    val feed = CowTable.changeLogFor(spark, root, 3L).get
      .withColumnRenamed("oper", "_oper")
      .withColumn("_commit_id", lit(3L))
    val e = intercept[IllegalStateException] {
      CowStream.mvBatch(feed, 0L, root, mv, Seq("pb"), Seq("id"))
    }
    assert(e.getMessage.contains("no changelog sidecar"),
      s"wrong failure: ${e.getMessage}")
  }

  test("publishStaged retries cleanly after a crash between the " +
      "sidecar rename and the manifest write") {
    val root = tmp("wap_crash")
    CowTable.commitFull(
      spark.range(5).select($"id"), root, 1L, Nil, keep = 10,
      changeLogKeys = Seq("id"))
    CowTable.stageAppend(spark.range(100, 105).select($"id"),
      root, 2L, Nil, changeLogKeys = Seq("id"))
    // simulate the crash point: the sidecar staging dir was already
    // renamed into _changes/2, the manifest write never happened
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val changes = new org.apache.hadoop.fs.Path(s"$root/_changes")
    val staging = fs.listStatus(changes).toSeq
      .map(_.getPath).find(_.getName.startsWith(".tmp-2-"))
      .getOrElse(fail("no staged sidecar found"))
    assert(fs.rename(staging,
      new org.apache.hadoop.fs.Path(s"$root/_changes/2")))
    // the retry must see the published sidecar, NOT delete it, and
    // complete the manifest publish
    CowTable.publishStaged(spark, root, 2L, keep = 10)
    assert(CowTable.committedIds(spark, root).contains(2L))
    assert(CowTable.hasChangeLog(spark, root, 2L),
      "retry destroyed the already-published sidecar")
    val log = CowTable.changeLogFor(spark, root, 2L).get
    assert(log.select("id").as[Long].collect().sorted.toSeq ==
      (100L until 105L).toSeq)
  }

  test("pre-feed history is allowed: sidecar-less commits BELOW the " +
      "first sidecar'd commit do not trip the invisible-commit guard") {
    val root = tmp("prefeed")
    // commits 1-2 predate the feed (no changeLogKeys)
    CowTable.commitFull(
      spark.range(10).select($"id",
        CowTable.keyBucket(Seq("id"), 2).as("pb")),
      root, 1L, Seq("pb"), keep = 10)
    CowTable.commitAppend(
      spark.range(10, 20).select($"id",
        CowTable.keyBucket(Seq("id"), 2).as("pb")),
      root, 2L, Seq("pb"), keep = 10)
    // feed starts at commit 3
    CowTable.commitAppend(
      spark.range(20, 30).select($"id",
        CowTable.keyBucket(Seq("id"), 2).as("pb")),
      root, 3L, Seq("pb"), keep = 10, changeLogKeys = Seq("id"))
    val mv = tmp("prefeed_mv")
    val feed = CowTable.changeLogFor(spark, root, 3L).get
      .withColumnRenamed("oper", "_oper")
      .withColumn("_commit_id", lit(3L))
    // must NOT throw: ids 1-2 are below the feed floor
    CowStream.mvBatch(feed, 0L, root, mv, Seq("pb"), Seq("id"))
    val n = graft.sinks.SnapshotTarget.read(spark, mv).get
      .agg(sum($"mv_n")).as[Long].collect().head
    assert(n == 10L)
  }

  test("DataDiff tolerates a user column literally named 'present'") {
    val left = Seq((1L, true), (2L, false)).toDF("k", "present")
    val right = Seq((1L, true), (2L, true)).toDF("k", "present")
    val d = DataDiff.rowDiff(left, right, Seq("k"))
      .select($"k", $"diff_status").as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "identical", 2L -> "changed"))
  }

  test("a session-TZ timestamp partition column reads correctly under " +
      "a DIFFERENT reader timezone through the planner path") {
    val root = tmp("tzpart")
    val saved = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val rows = Seq(
        (1L, java.sql.Timestamp.valueOf("2024-03-01 23:30:00")),
        (2L, java.sql.Timestamp.valueOf("2024-03-02 01:00:00")))
        .toDF("id", "ts")
      CowTable.commitFull(rows, root, 1L, Seq("ts"), keep = 10)
      // reader in a timezone 14h ahead: partition-value reparse under
      // the reader TZ would shift both instants; the column must come
      // from the self-contained files instead
      spark.conf.set("spark.sql.session.timeZone", "Pacific/Auckland")
      val got = CowV2.read(spark, root).get
        .select($"id", unix_timestamp($"ts").as("epoch"))
        .as[(Long, Long)].collect().toMap
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val want = rows
        .select($"id", unix_timestamp($"ts").as("epoch"))
        .as[(Long, Long)].collect().toMap
      assert(got == want,
        s"timestamp partition values shifted across reader TZs: " +
          s"got=$got want=$want")
      // and a filter on the column stays exact (residual, not pruned)
      spark.conf.set("spark.sql.session.timeZone", "Pacific/Auckland")
      val one = CowV2.read(spark, root).get
        .where(unix_timestamp($"ts") === want(1L))
      assert(one.select("id").as[Long].collect().toSeq == Seq(1L))
    } finally spark.conf.set("spark.sql.session.timeZone", saved)
  }

  test("DataDiff classifies NULL-keyed rows by side presence, not key " +
      "nullness") {
    val left = Seq((Some(1L), "a"), (None, "left-null"))
      .toDF("k", "v")
    val right = Seq((Some(1L), "a"), (None, "right-null"))
      .toDF("k", "v")
    val d = DataDiff.rowDiff(left, right, Seq("k"))
      .select($"k", $"diff_status", $"changed_v")
      .collect().toSeq
    // the shared key-1 row is identical; each null-keyed row belongs to
    // exactly its own side (ANSI: null keys never join)
    val statuses = d.map(r =>
      (Option(r.get(0)), r.getString(1), r.getBoolean(2)))
    assert(statuses.count(_ == (Some(1L), "identical", false)) == 1,
      s"got $statuses")
    assert(statuses.count(_ == (None, "only_left", false)) == 1,
      s"got $statuses")
    assert(statuses.count(_ == (None, "only_right", false)) == 1,
      s"got $statuses")
    assert(statuses.size == 3)
  }
}
