package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.{CowTable, SnapshotTarget}
import graft.streaming.CowStream

/** Vacuum fences for streaming frontiers
  * ([[graft.sinks.CowTable.registerStreamFrontier]]): retention can no
  * longer outrun a lagging registered stream — vacuum retains
  * everything at or above the lowest fence, the joinMv2 batch loop
  * registers and advances its own fences, and unregistering returns
  * retention to `keep` alone.
  */
class VacuumFenceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"fence_$tag").toString

  test("a registered fence floors vacuum and vacuumOlderThan; " +
      "advancing and unregistering releases history") {
    val root = tmp("floor")
    (1L to 6L).foreach(i => CowTable.commitFull(
      spark.range(i).toDF("id"), root, i, Nil, keep = 10))
    CowTable.registerStreamFrontier(spark, root, "viewx", 2L)
    // keep=1 alone would leave only id 6; the fence pins 2..6
    CowTable.vacuum(spark, root, keep = 1)
    assert(CowTable.committedIds(spark, root) == (2L to 6L),
      "vacuum dropped manifests a registered frontier still needs")
    // time-based retention honors the same floor
    CowTable.vacuumOlderThan(spark, root, 0L, minKeep = 1)
    assert(CowTable.committedIds(spark, root) == (2L to 6L))
    // the fence only ever moves forward; a stale register is a no-op
    CowTable.registerStreamFrontier(spark, root, "viewx", 4L)
    CowTable.registerStreamFrontier(spark, root, "viewx", 3L)
    assert(CowTable.streamFrontiers(spark, root) == Map("viewx" -> 4L))
    CowTable.vacuum(spark, root, keep = 1)
    assert(CowTable.committedIds(spark, root) == (4L to 6L))
    // two fences: the LOWEST wins
    CowTable.registerStreamFrontier(spark, root, "viewy", -1L)
    CowTable.vacuum(spark, root, keep = 1)
    assert(CowTable.committedIds(spark, root) == (4L to 6L),
      "a never-applied fence (-1) must pin everything that remains")
    CowTable.unregisterStreamFrontier(spark, root, "viewy")
    CowTable.unregisterStreamFrontier(spark, root, "viewx")
    CowTable.vacuum(spark, root, keep = 1)
    assert(CowTable.committedIds(spark, root) == Seq(6L),
      "after unregistering, keep alone governs again")
  }

  test("fence markers parse unambiguously: a -1 frontier pins a " +
      "commit-0 table, and hyphenated names neither misparse nor " +
      "cross-match on unregister") {
    val root = tmp("parse")
    (0L to 3L).foreach(i => CowTable.commitFull(
      spark.range(i + 1).toDF("id"), root, i, Nil, keep = 10))
    // a NEGATIVE id round-trips (the old '-'-separated marker parsed
    // "viewy--1" as name "viewy-" id 1, silently unpinning commit 0)
    CowTable.registerStreamFrontier(spark, root, "viewy", -1L)
    assert(CowTable.streamFrontiers(spark, root) == Map("viewy" -> -1L))
    CowTable.vacuum(spark, root, keep = 1)
    assert(CowTable.committedIds(spark, root) == (0L to 3L),
      "a -1 fence must pin every commit, commit 0 included")
    // hyphenated names: two fences that share a dash-prefix stay
    // independent — unregistering one must not strip the other
    CowTable.registerStreamFrontier(spark, root, "etl", 3L)
    CowTable.registerStreamFrontier(spark, root, "etl-backfill", 0L)
    assert(CowTable.streamFrontiers(spark, root) ==
      Map("viewy" -> -1L, "etl" -> 3L, "etl-backfill" -> 0L))
    CowTable.unregisterStreamFrontier(spark, root, "viewy")
    CowTable.unregisterStreamFrontier(spark, root, "etl")
    assert(CowTable.streamFrontiers(spark, root) ==
      Map("etl-backfill" -> 0L),
      "unregistering 'etl' must not remove 'etl-backfill''s fence")
    CowTable.vacuum(spark, root, keep = 1)
    assert(CowTable.committedIds(spark, root) == (0L to 3L),
      "the surviving backfill fence still pins commit 0")
  }

  test("a lagging joinMv2 view survives an aggressive writer vacuum: " +
      "the batch's own fences keep its time-travel targets servable") {
    val ra = tmp("a"); val rb = tmp("b"); val mv = tmp("mv")
    val nb = 2
    def commitA(id: Long, lo: Long, hi: Long): Unit =
      CowTable.commitFull(
        spark.range(lo, hi).select($"id".as("k"),
          concat(lit("a"), $"id").as("av"),
          CowTable.keyBucket(Seq("k"), nb).as("pa")),
        ra, id, Seq("pa"), keep = 10, changeLogKeys = Seq("k"))
    CowTable.commitFull(
      spark.range(20).select($"id".as("k"),
        concat(lit("b"), $"id").as("bv"),
        CowTable.keyBucket(Seq("k"), nb).as("pbk")),
      rb, 1L, Seq("pbk"), keep = 10, changeLogKeys = Seq("k"))
    commitA(1L, 0L, 10L)
    // batch 0 applies both initial commits and fences (fa=1, fb=1)
    CowStream.joinMv2Batch(
      Seq(("a", 1L), ("b", 1L)).toDF("_side", "_commit_id"),
      0L, ra, rb, Seq("k"), mv)
    assert(CowTable.streamFrontiers(spark, ra).values.toSeq == Seq(1L))
    // the writer commits twice more and vacuums HARD while the view
    // lags: without the fence, manifest-1 (the fb the next ΔA applies
    // against) would be gone and the batch would wedge
    CowTable.commitAppend(
      spark.range(100, 105).select($"id".as("k"),
        concat(lit("b"), $"id").as("bv"),
        CowTable.keyBucket(Seq("k"), nb).as("pbk")),
      rb, 2L, Seq("pbk"), keep = 10, changeLogKeys = Seq("k"))
    CowTable.commitAppend(
      spark.range(200, 205).select($"id".as("k"),
        concat(lit("b"), $"id").as("bv"),
        CowTable.keyBucket(Seq("k"), nb).as("pbk")),
      rb, 3L, Seq("pbk"), keep = 10, changeLogKeys = Seq("k"))
    CowTable.vacuum(spark, rb, keep = 1)
    assert(CowTable.committedIds(spark, rb) == Seq(1L, 2L, 3L),
      "writer vacuum must not drop the lagging view's frontier")
    // the lagging view catches up across the retained history
    commitA(2L, 10L, 12L)
    CowStream.joinMv2Batch(
      Seq(("a", 2L), ("b", 2L), ("b", 3L))
        .toDF("_side", "_commit_id"),
      1L, ra, rb, Seq("k"), mv)
    val got = graft.operators.JoinMv.finish(
      SnapshotTarget.read(spark, mv).get)
    val expect = CowTable.read(spark, ra).get.drop("pa")
      .join(CowTable.read(spark, rb).get.drop("pbk"), Seq("k"))
    assert(got.count() == expect.count() &&
      got.select("k", "av", "bv")
        .exceptAll(expect.select("k", "av", "bv")).isEmpty)
    // fences advanced with the applied frontier; vacuum now releases
    // (checkpoint first: the head is a delta whose chain would
    // otherwise retain its bases until the auto-collapse threshold)
    assert(CowTable.streamFrontiers(spark, rb) ==
      Map(CowStream.fenceNameFor(mv) -> 3L))
    CowTable.checkpoint(spark, rb, 3L)
    CowTable.vacuum(spark, rb, keep = 1)
    assert(CowTable.committedIds(spark, rb) == Seq(3L))
  }
}
