package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.{CowTable, SnapshotTarget}
import graft.streaming.CowStream

/** Join view over TWO independently-streaming CowTables
  * ([[graft.streaming.CowStream.joinMv2Batch]]): deterministic
  * serialization, atomic sidecar application, persisted per-side
  * frontier, exactly-once replays.
  */
class JoinMv2Spec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"jmv2_$tag").toString

  private val NB = 4

  private def commitA(root: String, id: Long,
      rows: org.apache.spark.sql.DataFrame): Unit =
    CowTable.upsert(spark, root, id,
      rows.withColumn("pa", CowTable.keyBucket(Seq("k"), NB)),
      Seq("k"), Seq("pa"), keep = 10, changeLog = true)

  private def commitB(root: String, id: Long,
      rows: org.apache.spark.sql.DataFrame): Unit =
    CowTable.upsert(spark, root, id,
      rows.withColumn("pbk", CowTable.keyBucket(Seq("k"), NB)),
      Seq("k"), Seq("pbk"), keep = 10, changeLog = true)

  private def directJoin(a: String, b: String) =
    CowTable.read(spark, a).get.drop("pa")
      .join(CowTable.read(spark, b).get.drop("pbk"), Seq("k"))
      .select($"k", $"av", $"bv")

  test("the streamed two-table view equals the direct join after " +
      "interleaved commits on both sides, and updates incrementally " +
      "across stream restarts") {
    val ra = tmp("a"); val rb = tmp("b")
    val mv = tmp("mv"); val ck = tmp("ck")
    CowTable.commitFull(
      spark.range(100).select($"id".as("k"),
        concat(lit("a"), $"id").as("av"),
        CowTable.keyBucket(Seq("k"), NB).as("pa")),
      ra, 1L, Seq("pa"), keep = 10, changeLogKeys = Seq("k"))
    CowTable.commitFull(
      spark.range(50, 150).select($"id".as("k"),
        concat(lit("b"), $"id").as("bv"),
        CowTable.keyBucket(Seq("k"), NB).as("pbk")),
      rb, 1L, Seq("pbk"), keep = 10, changeLogKeys = Seq("k"))
    // interleaved mutations on both sides before the stream starts
    commitA(ra, 2L, spark.range(120, 160)
      .select($"id".as("k"), concat(lit("a2-"), $"id").as("av")))
    commitB(rb, 2L, spark.range(0, 30)
      .select($"id".as("k"), concat(lit("b2-"), $"id").as("bv")))
    val q1 = CowStream.joinMv2Sink(spark, ra, rb, Seq("k"), mv, ck)
    try q1.processAllAvailable() finally q1.stop()
    def mvRows() = graft.operators.JoinMv.finish(
      SnapshotTarget.read(spark, mv).get)
      .select($"k", $"av", $"bv").collect().toSet
    assert(mvRows() == directJoin(ra, rb).collect().toSet,
      "streamed view diverged from the direct join")
    // more commits after the stream drained; a RESTARTED stream (same
    // checkpoint) catches up incrementally
    commitA(ra, 3L, spark.range(40, 60)
      .select($"id".as("k"), concat(lit("a3-"), $"id").as("av")))
    commitB(rb, 3L, spark.range(140, 170)
      .select($"id".as("k"), concat(lit("b3-"), $"id").as("bv")))
    val q2 = CowStream.joinMv2Sink(spark, ra, rb, Seq("k"), mv, ck)
    try q2.processAllAvailable() finally q2.stop()
    assert(mvRows() == directJoin(ra, rb).collect().toSet,
      "restarted stream diverged after new commits on both sides")
  }

  test("MOR deletes on either side retract their join rows") {
    val ra = tmp("da"); val rb = tmp("db")
    val mv = tmp("dmv"); val ck = tmp("dck")
    CowTable.commitFull(
      spark.range(20).select($"id".as("k"), $"id".as("av"),
        CowTable.keyBucket(Seq("k"), NB).as("pa")),
      ra, 1L, Seq("pa"), keep = 10, changeLogKeys = Seq("k"))
    CowTable.commitFull(
      spark.range(20).select($"id".as("k"), ($"id" * 10).as("bv"),
        CowTable.keyBucket(Seq("k"), NB).as("pbk")),
      rb, 1L, Seq("pbk"), keep = 10, changeLogKeys = Seq("k"))
    CowTable.deleteKeysMor(spark, ra, 2L,
      spark.range(5).select($"id".as("k"),
        CowTable.keyBucket(Seq("k"), NB).as("pa")),
      Seq("k"), Seq("pa"), keep = 10, changeLog = true)
    CowTable.deleteKeysMor(spark, rb, 2L,
      spark.range(15, 20).select($"id".as("k"),
        CowTable.keyBucket(Seq("k"), NB).as("pbk")),
      Seq("k"), Seq("pbk"), keep = 10, changeLog = true)
    val q = CowStream.joinMv2Sink(spark, ra, rb, Seq("k"), mv, ck)
    try q.processAllAvailable() finally q.stop()
    val got = graft.operators.JoinMv.finish(
      SnapshotTarget.read(spark, mv).get)
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == (5L until 15L).toSeq,
      s"deletes did not retract from the two-stream view: $got")
  }

  test("a vacuumed-away frontier fails LOUD instead of joining " +
      "against a silently-empty other side") {
    val ra = tmp("va"); val rb = tmp("vb")
    val mv = tmp("vmv")
    CowTable.commitFull(
      spark.range(10).select($"id".as("k"), $"id".as("av"),
        CowTable.keyBucket(Seq("k"), NB).as("pa")),
      ra, 1L, Seq("pa"), keep = 10, changeLogKeys = Seq("k"))
    CowTable.commitFull(
      spark.range(10).select($"id".as("k"),
        concat(lit("b1-"), $"id").as("bv"),
        CowTable.keyBucket(Seq("k"), NB).as("pbk")),
      rb, 1L, Seq("pbk"), keep = 10, changeLogKeys = Seq("k"))
    // apply both sides' initial commits: frontier (1, 1)
    CowStream.joinMv2Batch(
      Seq(("a", 1L), ("b", 1L)).toDF("_side", "_commit_id"),
      0L, ra, rb, Seq("k"), mv)
    // B races ahead with keep=2. The batch loop's own vacuum fence
    // would now RETAIN id 1 (VacuumFenceSpec pins that), so this
    // failure mode needs the fence gone first — the decommissioned /
    // manually-unregistered consumer case the fence cannot protect
    (2L to 5L).foreach(i => commitB(rb, i,
      spark.range(10).select($"id".as("k"),
        concat(lit(s"b$i-"), $"id").as("bv"))))
    CowTable.unregisterStreamFrontier(spark, rb,
      CowStream.fenceNameFor(mv))
    // checkpoint first: delta-chain retention would otherwise keep
    // snapshot 1 servable as the retained head's base chain
    CowTable.checkpoint(spark, rb,
      CowTable.committedIds(spark, rb).takeRight(2).head)
    CowTable.vacuum(spark, rb, keep = 2)
    assert(!CowTable.committedIds(spark, rb).contains(1L),
      "setup: frontier manifest should be vacuumed")
    // an A-side delta must now refuse the unservable B frontier
    commitA(ra, 2L, spark.range(3)
      .select($"id".as("k"), ($"id" + 1000).as("av")))
    val e = intercept[IllegalStateException] {
      CowStream.joinMv2Batch(
        Seq(("a", 2L)).toDF("_side", "_commit_id"),
        1L, ra, rb, Seq("k"), mv)
    }
    assert(e.getMessage.contains("no longer servable"),
      s"wrong failure: ${e.getMessage}")
  }

  test("replayed micro-batch is a no-op and a crash between the MV " +
      "and frontier commits heals on replay") {
    val ra = tmp("ra"); val rb = tmp("rb")
    val mv = tmp("rmv")
    CowTable.commitFull(
      spark.range(10).select($"id".as("k"), $"id".as("av"),
        CowTable.keyBucket(Seq("k"), NB).as("pa")),
      ra, 1L, Seq("pa"), keep = 10, changeLogKeys = Seq("k"))
    CowTable.commitFull(
      spark.range(10).select($"id".as("k"), ($"id" + 100).as("bv"),
        CowTable.keyBucket(Seq("k"), NB).as("pbk")),
      rb, 1L, Seq("pbk"), keep = 10, changeLogKeys = Seq("k"))
    val feed = Seq(("a", 1L), ("b", 1L)).toDF("_side", "_commit_id")
    CowStream.joinMv2Batch(feed, 0L, ra, rb, Seq("k"), mv)
    val after0 = SnapshotTarget.read(spark, mv).get.collect().toSet
    // replay of the same batch id: nothing changes
    CowStream.joinMv2Batch(feed, 0L, ra, rb, Seq("k"), mv)
    assert(SnapshotTarget.read(spark, mv).get.collect().toSet == after0)
    // crash-between simulation: delete the frontier commit for batch 1,
    // as if the process died after the MV write; the replay re-derives
    // and re-commits it
    commitA(ra, 2L, spark.range(3)
      .select($"id".as("k"), ($"id" + 1000).as("av")))
    val feed2 = Seq(("a", 2L)).toDF("_side", "_commit_id")
    CowStream.joinMv2Batch(feed2, 1L, ra, rb, Seq("k"), mv)
    val fPath = s"$mv/_frontier"
    val after1 = SnapshotTarget.read(spark, mv).get.collect().toSet
    val fs = new org.apache.hadoop.fs.Path(fPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$fPath/batch-1"), true)
    CowStream.joinMv2Batch(feed2, 1L, ra, rb, Seq("k"), mv)
    assert(SnapshotTarget.read(spark, mv).get.collect().toSet == after1,
      "healing replay mutated the MV")
    assert(SnapshotTarget.committedIds(spark, fPath).contains(1L),
      "frontier commit was not healed on replay")
    val f = SnapshotTarget.read(spark, fPath).get
      .select("fa", "fb").as[(Long, Long)].collect().head
    assert(f == (2L, 1L), s"healed frontier wrong: $f")
  }
}
