package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.CowTable
import graft.streaming.{CowSink, CowStream}

/** Exactly-once streaming sink into CowTable (streaming/CowSink.scala):
  * per-micro-batch commits, crash-replay idempotence, checkpoint
  * resume, and the full stream→table→stream loop with CowStream.
  */
class CowSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_cowsink_$tag").toString

  private def withPb(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("pb", CowTable.keyBucket(Seq("id"), 4))

  test("file-source stream appends one commit per micro-batch; a " +
      "resumed query with the same checkpoint adds nothing twice") {
    val in = tmp("in")
    val root = tmp("tbl")
    val ck = tmp("ck")
    def file(n: Int): Unit = withPb(
      spark.range(n * 100L, n * 100L + 100)
        .select($"id", ($"id" % 3).cast("int").as("seg")))
      .coalesce(1).write.parquet(s"$in/f$n")
    (0 to 2).foreach(file)
    val stream = spark.readStream
      .schema("id BIGINT, seg INT, pb INT")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/f*")
    val q = CowSink.append(stream, root, Seq("pb"), ck, keep = 10)
    try q.processAllAvailable() finally q.stop()
    assert(CowTable.read(spark, root).get.count() == 300)
    val commits1 = CowTable.committedIds(spark, root)
    assert(commits1.size == 3,
      s"expected one commit per file, got $commits1")
    // resume with the SAME checkpoint: already-processed files must
    // not recommit; only the new file lands
    file(3)
    val q2 = CowSink.append(spark.readStream
      .schema("id BIGINT, seg INT, pb INT")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/f*"), root, Seq("pb"), ck, keep = 10)
    try q2.processAllAvailable() finally q2.stop()
    assert(CowTable.read(spark, root).get.count() == 400)
    assert(CowTable.read(spark, root).get.select(sum($"id")).as[Long]
      .head() == (0L until 400L).sum)
  }

  test("a crash-replayed micro-batch is a no-op: same batch id, same " +
      "content, zero new rows and zero new commits") {
    val root = tmp("replay")
    val b0 = withPb(spark.range(0, 50)
      .select($"id", lit(1).as("seg")))
    CowSink.appendBatch(b0, 0L, root, Seq("pb"))
    val afterFirst = CowTable.read(spark, root).get.count()
    val ids = CowTable.committedIds(spark, root)
    CowSink.appendBatch(b0, 0L, root, Seq("pb")) // replay
    assert(CowTable.read(spark, root).get.count() == afterFirst,
      "replayed append duplicated rows")
    assert(CowTable.committedIds(spark, root) == ids,
      "replayed append created a new commit")
    // keyed variant: replay of an upsert batch is a no-op too
    CowSink.upsertBatch(
      withPb(spark.range(0, 25).select($"id", lit(9).as("seg"))),
      1L, root, Seq("id"), Seq("pb"))
    val afterUpsert = CowTable.read(spark, root).get
      .where($"seg" === 9).count()
    CowSink.upsertBatch(
      withPb(spark.range(0, 25).select($"id", lit(9).as("seg"))),
      1L, root, Seq("id"), Seq("pb"))
    assert(CowTable.read(spark, root).get.where($"seg" === 9).count()
      == afterUpsert)
    assert(CowTable.read(spark, root).get.count() == afterFirst,
      "upsert of existing keys changed the row count")
  }

  test("empty micro-batches commit nothing (no empty snapshots in the " +
      "history)") {
    val root = tmp("empty")
    CowSink.appendBatch(
      withPb(spark.range(0, 10).select($"id", lit(1).as("seg"))),
      0L, root, Seq("pb"))
    CowSink.appendBatch(
      withPb(spark.range(0, 0).select($"id", lit(1).as("seg"))),
      1L, root, Seq("pb"))
    assert(CowTable.committedIds(spark, root) == Seq(2L),
      "an empty micro-batch must not commit")
    // and a later non-empty batch commits fine over the gap
    CowSink.appendBatch(
      withPb(spark.range(10, 20).select($"id", lit(1).as("seg"))),
      2L, root, Seq("pb"))
    assert(CowTable.read(spark, root).get.count() == 20)
  }

  test("a fresh checkpoint on a pre-existing table refuses loudly " +
      "instead of silently dropping batches; baseId attaches cleanly") {
    val root = tmp("foreign")
    // a batch job bootstrapped this table up to id 50
    CowTable.commitFull(
      withPb(spark.range(0, 100).select($"id", lit(1).as("seg"))),
      root, 50L, Seq("pb"), keep = 10)
    // fresh checkpoint → batch 0 → id 2, far behind the frontier: the
    // replay guard would silently no-op it — the sink must refuse
    intercept[IllegalArgumentException] {
      CowSink.appendBatch(
        withPb(spark.range(100, 150).select($"id", lit(2).as("seg"))),
        0L, root, Seq("pb"))
    }
    assert(CowTable.read(spark, root).get.count() == 100,
      "refused batch must not have committed")
    // attaching with baseId >= frontier works
    CowSink.appendBatch(
      withPb(spark.range(100, 150).select($"id", lit(2).as("seg"))),
      0L, root, Seq("pb"), keep = 10, baseId = 50L)
    assert(CowTable.read(spark, root).get.count() == 150)
    assert(CowTable.committedIds(spark, root) == Seq(50L, 52L))
  }

  test("a change-logged append whose batch updates an existing key " +
      "FAILS the micro-batch (the streaming feed has no diff fallback)") {
    val root = tmp("overlap")
    CowSink.appendBatch(
      withPb(spark.range(0, 50).select($"id", lit(1).as("seg"))),
      0L, root, Seq("pb"), changeLogKeys = Seq("id"), keep = 10)
    // duplicate key 10 in the next batch: a pure-I sidecar would lie,
    // and committing WITHOUT one would silently starve downstream MVs
    intercept[IllegalStateException] {
      CowSink.appendBatch(
        withPb(spark.range(10, 60).select($"id", lit(2).as("seg"))),
        1L, root, Seq("pb"), changeLogKeys = Seq("id"), keep = 10)
    }
    assert(CowTable.read(spark, root).get.count() == 50,
      "failed batch must not have committed")
    // a clean batch sails through and publishes its sidecar
    CowSink.appendBatch(
      withPb(spark.range(50, 60).select($"id", lit(2).as("seg"))),
      1L, root, Seq("pb"), changeLogKeys = Seq("id"), keep = 10)
    assert(CowTable.changeLogFor(spark, root, 4L).isDefined)
  }

  test("compactEvery repairs streaming small files in-band: data " +
      "commits on even ids, compactions on odd ids, content identical") {
    val in = tmp("comp_in")
    val root = tmp("comp_tbl")
    def file(n: Int): Unit = withPb(
      spark.range(n * 100L, n * 100L + 100)
        .select($"id", ($"id" % 3).cast("int").as("seg")))
      .coalesce(1).write.parquet(s"$in/f$n")
    (0 to 5).foreach(file)
    val q = CowSink.append(spark.readStream
      .schema("id BIGINT, seg INT, pb INT")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/f*"), root, Seq("pb"), tmp("comp_ck"),
      keep = 20, compactEvery = 3)
    try q.processAllAvailable() finally q.stop()
    val ids = CowTable.committedIds(spark, root)
    // 6 data commits (even) + compactions after batches 2 and 5 (odd)
    assert(ids.filter(_ % 2 == 0).size == 6, s"data commits: $ids")
    assert(ids.contains(7L) && ids.contains(13L),
      s"expected compaction commits at 7 and 13: $ids")
    // content is exactly the union of the files
    assert(CowTable.read(spark, root).get.count() == 600)
    assert(CowTable.read(spark, root).get.select(sum($"id")).as[Long]
      .head() == (0L until 600L).sum)
    // and the live file count is the compacted one: after the batch-5
    // compaction each bucket holds ONE file plus the post-compaction
    // appends (none here — compaction ran last)
    val m = CowTable.currentManifest(spark, root).get
    assert(m.files.size == 4,
      s"expected one compacted file per bucket, got ${m.files.size}")
  }

  test("stream→table→stream loop: a change-logged upsert sink feeds a " +
      "CowStream MV that matches the direct rescan") {
    val in = tmp("loop_in")
    val root = tmp("loop_tbl")
    // two waves of keyed updates: wave 2 moves keys 0..49 to seg 9.
    // Both runs RESUME the same checkpoint — the sink owns the table's
    // id space through it (a fresh checkpoint would restart batch ids
    // and the replay guard would drop the restarted batches as replays)
    val ck = tmp("loop_ck")
    withPb(spark.range(0, 100).select($"id", ($"id" % 3).cast("int")
      .as("seg"))).coalesce(1).write.parquet(s"$in/w1")
    val q = CowSink.upsert(spark.readStream
      .schema("id BIGINT, seg INT, pb INT")
      .parquet(s"$in/w*"), root, Seq("id"), Seq("pb"),
      checkpoint = ck, changeLog = true)
    try q.processAllAvailable() finally q.stop()
    withPb(spark.range(0, 50).select($"id", lit(9).as("seg")))
      .coalesce(1).write.parquet(s"$in/w2")
    val q2 = CowSink.upsert(spark.readStream
      .schema("id BIGINT, seg INT, pb INT")
      .parquet(s"$in/w*"), root, Seq("id"), Seq("pb"),
      checkpoint = ck, changeLog = true)
    try q2.processAllAvailable() finally q2.stop()
    val mv = tmp("loop_mv")
    val mq = CowStream.mvSink(spark, root, mv, Seq("seg"), Seq("id"),
      checkpoint = tmp("loop_mvck"))
    try mq.processAllAvailable() finally mq.stop()
    val got = graft.sinks.SnapshotTarget.read(spark, mv).get
      .select($"seg", $"mv_n".as("n")).orderBy("seg").collect().toSeq
    val want = CowTable.read(spark, root).get
      .groupBy($"seg").agg(count(lit(1)).as("n"))
      .orderBy("seg").collect().toSeq
    assert(got == want, s"loop MV diverged:\n got=$got\nwant=$want")
  }
}
