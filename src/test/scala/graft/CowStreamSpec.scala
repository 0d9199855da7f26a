package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sinks.{CowTable, SnapshotTarget}
import graft.streaming.CowStream

/** Streaming change-feed source over CowTable sidecars
  * (streaming/CowStream.scala): transport, MV maintenance, frontier
  * rule, crash-replay exactly-once.
  */
class CowStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_cowstream_$tag").toString

  private def table(root: String): Unit = {
    val base = spark.range(1, 1001)
      .select($"id", ($"id" % 5).cast("int").as("seg"),
        CowTable.keyBucket(Seq("id"), 4).as("pb"))
    CowTable.commitFull(base, root, 1L, Seq("pb"), keep = 10,
      changeLogKeys = Seq("id"))
    // moves keys between groups — only retraction tracks this
    CowTable.upsert(spark, root, 2L,
      spark.range(200, 401).select($"id", lit(9).as("seg"),
        CowTable.keyBucket(Seq("id"), 4).as("pb")),
      Seq("id"), Seq("pb"), keep = 10, changeLog = true)
    CowTable.deleteKeysMor(spark, root, 3L,
      spark.range(900, 951).select($"id",
        CowTable.keyBucket(Seq("id"), 4).as("pb")),
      Seq("id"), Seq("pb"), keep = 10, changeLog = true)
  }

  test("stream-maintained MV over the sidecar feed equals a direct " +
      "rescan after full+upsert+delete commits, without table reads") {
    val root = tmp("e2e")
    table(root)
    val mv = tmp("e2e_mv")
    val q = CowStream.mvSink(spark, root, mv, Seq("seg"), Seq("id"),
      checkpoint = tmp("e2e_ck"))
    try q.processAllAvailable() finally q.stop()
    val got = SnapshotTarget.read(spark, mv).get
      .select($"seg", $"mv_n".as("n"),
        $"mv_sum_id".cast("long").as("sum_id"))
      .orderBy("seg").collect().toSeq
    val want = CowTable.read(spark, root).get
      .groupBy($"seg")
      .agg(count(lit(1)).as("n"),
        sum($"id".cast("decimal(38,0)")).cast("long").as("sum_id"))
      .orderBy("seg").collect().toSeq
    assert(got == want, s"MV diverged:\n got=$got\nwant=$want")
  }

  test("a LATER commit's sidecar arriving in a later micro-batch " +
      "updates the MV incrementally") {
    val root = tmp("inc")
    table(root)
    val mv = tmp("inc_mv")
    val ck = tmp("inc_ck")
    val q1 = CowStream.mvSink(spark, root, mv, Seq("seg"), Seq("id"), ck)
    try q1.processAllAvailable() finally q1.stop()
    // a fourth commit AFTER the stream drained
    CowTable.upsert(spark, root, 4L,
      spark.range(1001, 1101).select($"id", lit(7).as("seg"),
        CowTable.keyBucket(Seq("id"), 4).as("pb")),
      Seq("id"), Seq("pb"), keep = 10, changeLog = true)
    val q2 = CowStream.mvSink(spark, root, mv, Seq("seg"), Seq("id"), ck)
    try q2.processAllAvailable() finally q2.stop()
    val got = SnapshotTarget.read(spark, mv).get
      .select($"seg", $"mv_n".as("n"))
      .orderBy("seg").collect().toSeq
    val want = CowTable.read(spark, root).get
      .groupBy($"seg").agg(count(lit(1)).as("n"))
      .orderBy("seg").collect().toSeq
    assert(got == want)
  }

  test("crash-replay is exactly-once: a replayed micro-batch whose MV " +
      "snapshot committed is a no-op; an uncommitted orphan behind the " +
      "frontier is dropped") {
    val root = tmp("replay")
    table(root)
    val mv = tmp("replay_mv")
    def feedOf(ids: Long*) = ids.map(i =>
      CowTable.changeLogFor(spark, root, i).getOrElse(
        fail(s"commit $i wrote no sidecar"))
        .withColumnRenamed("oper", "_oper")
        .withColumn("_commit_id", lit(i)))
      .reduce(_.unionByName(_))
    CowStream.mvBatch(feedOf(1L, 2L), 0L, root, mv, Seq("seg"), Seq("id"))
    val after0 = SnapshotTarget.read(spark, mv).get.orderBy("seg")
      .collect().toSeq
    // crash BETWEEN MV commit and checkpoint write → the SAME batch id
    // replays with the same content: must change nothing
    CowStream.mvBatch(feedOf(1L, 2L), 0L, root, mv, Seq("seg"), Seq("id"))
    assert(SnapshotTarget.read(spark, mv).get.orderBy("seg")
      .collect().toSeq == after0, "replayed batch mutated the MV")
    // next batch applies exactly once too
    CowStream.mvBatch(feedOf(3L), 1L, root, mv, Seq("seg"), Seq("id"))
    CowStream.mvBatch(feedOf(3L), 1L, root, mv, Seq("seg"), Seq("id"))
    val got = SnapshotTarget.read(spark, mv).get
      .select($"seg", $"mv_n".as("n")).orderBy("seg").collect().toSeq
    val want = CowTable.read(spark, root).get
      .groupBy($"seg").agg(count(lit(1)).as("n"))
      .orderBy("seg").collect().toSeq
    assert(got == want)

    // frontier rule, dead orphan: rows claiming commit id 0 — never
    // committed, behind the frontier (3), so it can never commit
    // (replay guard) — are DROPPED; the MV's content is unchanged
    val before = SnapshotTarget.read(spark, mv).get.orderBy("seg")
      .collect().toSeq
    val dead = feedOf(1L).withColumn("_commit_id", lit(0L))
    CowStream.mvBatch(dead, 2L, root, mv, Seq("seg"), Seq("id"),
      waitMs = 200)
    assert(SnapshotTarget.read(spark, mv).get.orderBy("seg")
      .collect().toSeq == before,
      "dead orphan's rows leaked into the MV")
    // frontier rule, in-flight: an uncommitted id AT/ABOVE the
    // frontier might still land — the batch must FAIL (for replay)
    // after the bounded wait, never guess
    intercept[IllegalStateException] {
      CowStream.mvBatch(
        feedOf(1L).withColumn("_commit_id", lit(99L)),
        3L, root, mv, Seq("seg"), Seq("id"), waitMs = 200)
    }
    assert(SnapshotTarget.read(spark, mv).get.orderBy("seg")
      .collect().toSeq == before)
  }

  test("stream-maintained JOIN view: the fact sidecar feed joined " +
      "against a pinned dim equals a direct join; crash-replay is a " +
      "no-op") {
    import graft.operators.JoinMv
    val root = tmp("jmv")
    table(root)
    val dim = (0 to 9).map(s => (s, s"segment-$s")).toDF("seg", "seg_name")
    val mv = tmp("jmv_mv")
    val q = CowStream.joinMvSink(spark, root, dim, Seq("seg"), mv,
      checkpoint = tmp("jmv_ck"))
    try q.processAllAvailable() finally q.stop()
    val got = JoinMv.finish(SnapshotTarget.read(spark, mv).get)
    val want = CowTable.read(spark, root).get.join(dim, Seq("seg"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "stream-maintained join view diverged from the direct join")
    // replay: an already-committed MV snapshot id is a no-op
    val before = SnapshotTarget.read(spark, mv).get
      .orderBy("seg", "id").collect().toSeq
    val replay = CowTable.changeLogFor(spark, root, 2L).get
      .withColumnRenamed("oper", "_oper")
      .withColumn("_commit_id", lit(2L))
    CowStream.joinMvBatch(replay, 0L, root, dim, Seq("seg"), mv)
    assert(SnapshotTarget.read(spark, mv).get
      .orderBy("seg", "id").collect().toSeq == before,
      "replayed micro-batch mutated the join view")
  }

  test("retention ambiguity fails LOUD: an unknown id at or below the " +
      "vacuum high-water mark may be committed-then-vacuumed and must " +
      "never be dropped as an orphan") {
    val root = tmp("hwm")
    def bucketed(lo: Long, hi: Long, seg: Int) =
      spark.range(lo, hi).select($"id", lit(seg).as("seg"),
        CowTable.keyBucket(Seq("id"), 4).as("pb"))
    // keep=2: commits 1..4 leave {3,4} retained, manifests 1-2 vacuumed
    CowTable.commitFull(bucketed(1, 100, 1), root, 1L, Seq("pb"),
      keep = 2, changeLogKeys = Seq("id"))
    (2L to 4L).foreach(i => CowTable.upsert(spark, root, i,
      bucketed(i * 1000, i * 1000 + 10, i.toInt), Seq("id"), Seq("pb"),
      keep = 2, changeLog = true))
    // collapse the delta chain so keep=2 actually prunes (vacuum
    // auto-collapses only past the checkpoint interval)
    CowTable.checkpoint(spark, root, 3L)
    CowTable.vacuum(spark, root, keep = 2)
    assert(CowTable.committedIds(spark, root) == Seq(3L, 4L))
    assert(CowTable.vacuumHwm(spark, root) == Some(2L),
      "vacuum must record the highest committed id it removed")
    // a lagging stream still holding id 1's rows: ambiguous → loud
    val mv = tmp("hwm_mv")
    val rows = CowTable.changeLogFor(spark, root, 4L).get
      .withColumnRenamed("oper", "_oper")
      .withColumn("_commit_id", lit(1L))
    val e = intercept[IllegalStateException] {
      CowStream.mvBatch(rows, 0L, root, mv, Seq("seg"), Seq("id"),
        waitMs = 200)
    }
    assert(e.getMessage.contains("high-water mark"),
      s"wrong failure: ${e.getMessage}")
  }

  test("NAMED streaming source: readStream.table(cow.ns.t.changes) " +
      "serves the committed feed with _oper/_commit_id, offsets are " +
      "commit ids, and a new commit arrives in a later micro-batch") {
    val ns = s"feed${System.nanoTime() % 1000000}"
    spark.sql(s"CREATE NAMESPACE cow.$ns")
    spark.sql(s"CREATE TABLE cow.$ns.ev (id BIGINT, seg STRING, pb INT)")
    val root =
      s"${spark.conf.get("spark.sql.catalog.cow.warehouse")}/$ns/ev"
    def batch(lo: Long, hi: Long) = spark.range(lo, hi).select(
      $"id", concat(lit("s"), ($"id" % 3).cast("string")).as("seg"),
      CowTable.keyBucket(Seq("id"), 4).as("pb"))
    // feed-emitting commits (the catalog INSERT path doesn't declare
    // changeLogKeys; streaming feeds come from keyed write paths)
    CowTable.commitAppend(batch(0, 50), root, 2L, Nil,
      changeLogKeys = Seq("id"))
    val seen = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long)]
    val q = spark.readStream.table(s"cow.$ns.ev.changes")
      .writeStream
      .option("checkpointLocation", tmp("feedck"))
      .foreachBatch(
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) => {
          seen.synchronized {
            seen ++= b.select("id", "_oper", "_commit_id").collect()
              .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
          }
          ()
        })
      .start()
    try {
      q.processAllAvailable()
      assert(seen.synchronized(seen.size) == 50,
        s"first batch should carry 50 I rows, got ${seen.size}")
      assert(seen.synchronized(seen.forall(r =>
        r._2 == "I" && r._3 == 2L)))
      // a LATER commit arrives incrementally with its own commit id
      CowTable.commitAppend(batch(100, 120), root, 3L, Nil,
        changeLogKeys = Seq("id"))
      q.processAllAvailable()
      val later = seen.synchronized(seen.filter(_._3 == 3L))
      assert(later.size == 20 && later.forall(_._2 == "I"),
        s"later commit not served incrementally: $later")
      assert(seen.synchronized(seen.size) == 70)
    } finally q.stop()
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }
}
