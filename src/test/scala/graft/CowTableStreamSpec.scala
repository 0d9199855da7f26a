package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.CowTable

/** The table itself as a named streaming source
  * (streaming/CowTableStreamSource.scala): snapshot-then-increments,
  * append-only contract, skipChangeCommits, debt/pinned refusals,
  * exactly-once across restart.
  */
class CowTableStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_tstream_$tag").toString

  private def ns(tag: String): String =
    tag + java.util.UUID.randomUUID().toString.replace("-", "").take(8)

  test("readStream.table(cow.ns.t) serves the snapshot, then each " +
      "commit's added files, exactly once across a restart") {
    val n = ns("ts")
    spark.sql(s"CREATE NAMESPACE cow.$n")
    spark.sql(s"CREATE TABLE cow.$n.ev (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO cow.$n.ev SELECT id, 'a' FROM range(5)")
    spark.sql(s"INSERT INTO cow.$n.ev SELECT id, 'b' " +
      "FROM range(5, 8)") // pre-stream second commit: still snapshot
    val ck = tmp("ts_ck")
    val out = tmp("ts_out")
    // a RECOVERABLE sink (the memory sink cannot resume a checkpoint)
    def start() = spark.readStream.table(s"cow.$n.ev")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).outputMode("append").start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() == 8,
      "first batch must serve the whole current snapshot")
    // new append arrives through a RESTARTED stream — no replays
    spark.sql(s"INSERT INTO cow.$n.ev SELECT id, 'c' FROM range(8, 10)")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out).as[(Long, String)]
      .collect().sorted.toSeq
    assert(got == (0L until 5L).map(i => (i, "a")) ++
      (5L until 8L).map(i => (i, "b")) ++ (8L until 10L).map(i => (i, "c")),
      s"snapshot + increments must arrive exactly once, got $got")
  }

  test("Trigger.AvailableNow with a startingSnapshot behind the head " +
      "serves the snapshot AND every later commit — the ReadLimit " +
      "allAvailable contract") {
    val root = s"${tmp("avnow")}/t"
    CowTable.commitFull(spark.range(3).select($"id", lit("a").as("v")),
      root, 1L, Nil, keep = 10)
    CowTable.commitAppend(spark.range(3, 6).select($"id",
      lit("b").as("v")), root, 2L, Nil, keep = 10)
    CowTable.commitAppend(spark.range(6, 9).select($"id",
      lit("c").as("v")), root, 3L, Nil, keep = 10)
    val out = tmp("avnow_out")
    // AvailableNow captures latestOffset(initialOffset, allAvailable)
    // ONCE — a source that under-delivers against allAvailable would
    // serve snapshot 1 only and report completion, silently dropping
    // commits 2 and 3
    val q = spark.readStream.option("startingSnapshot", "1")
      .table(s"cow.`$root`")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", tmp("avnow_ck"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "AvailableNow must terminate")
    assert(spark.read.parquet(out).count() == 9,
      "every commit after the starting snapshot must have been served")
  }

  test("a commit that rewrites or MOR-deletes rows fails the stream " +
      "loudly; skipChangeCommits skips it wholesale") {
    val root = s"${tmp("chg")}/t"
    CowTable.commitFull(spark.range(10).select($"id", lit("a").as("v")),
      root, 1L, Nil, keep = 10)
    val ck = tmp("chg_ck")
    val out = tmp("chg_out")
    val q = spark.readStream.table(s"cow.`$root`")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(out).count() == 10)
    // a COW delete rewrites files — the resumed stream must refuse it
    CowTable.deleteWhere(spark, root, 2L, $"id" < 3, keep = 10)
    val q2 = spark.readStream.table(s"cow.`$root`")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).start()
    val e = intercept[Exception](q2.processAllAvailable())
    try assert(e.toString.contains("append-only") ||
        e.toString.contains("changed existing rows"),
      s"change commit must fail the batch: $e")
    finally q2.stop()
    // skipChangeCommits: the change commit contributes nothing, later
    // appends still arrive
    CowTable.commitAppend(spark.range(100, 103)
      .select($"id", lit("z").as("v")), root, 3L, Nil, keep = 10)
    val q3 = spark.readStream
      .option("skipChangeCommits", "true").table(s"cow.`$root`")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).start()
    try q3.processAllAvailable() finally q3.stop()
    val ids = spark.read.parquet(out).select($"id").as[Long]
      .collect().sorted
    assert(ids.toSeq == ((0L until 10L) ++ Seq(100L, 101L, 102L)),
      s"the skip must add only the post-change append, got " +
        ids.mkString(","))
  }

  test("genesis with outstanding MOR debt refuses (OPTIMIZE first); " +
      "startingSnapshot pins genesis; pinned tables refuse streaming") {
    val root = s"${tmp("debt")}/t"
    CowTable.commitFull(spark.range(10).select($"id", lit("a").as("v")),
      root, 1L, Nil, keep = 10)
    require(CowTable.deleteWhereDv(spark, root, 2L, $"id" < 2, keep = 10))
    val q = spark.readStream.table(s"cow.`$root`")
      .writeStream.format("memory").queryName("ts_debt_" + ns("m"))
      .option("checkpointLocation", tmp("debt_ck")).start()
    val e = intercept[Exception](q.processAllAvailable())
    try assert(e.toString.contains("delete debt"), s"wrong refusal: $e")
    finally q.stop()
    // startingSnapshot = 1: the DEBT-FREE older snapshot streams fine
    // (one commit per batch, so the snapshot lands BEFORE the change
    // commit refuses — the bounded-catch-up option's observable form)
    val mem = "ts_old_" + ns("m")
    val q2 = spark.readStream.option("startingSnapshot", "1")
      .option("maxCommitsPerTrigger", "1")
      .table(s"cow.`$root`")
      .writeStream.format("memory").queryName(mem)
      .option("checkpointLocation", tmp("debt_ck2")).start()
    val e2 = intercept[Exception](q2.processAllAvailable())
    try assert(e2.toString.contains("changed existing rows") ||
        e2.toString.contains("delete debt"),
      // snapshot 1 serves, then commit 2 (the DV delete) refuses —
      // the snapshot rows must already be in the sink
      s"commit 2 must refuse as a change commit: $e2")
    finally q2.stop()
    assert(spark.table(mem).count() == 10,
      "snapshot 1 must have been served before the change refusal")
    // VERSION AS OF relations are read-only: the scan builder refuses
    // pinned tables (defensive — SQL streaming cannot even express it)
    val m1 = CowTable.manifest(spark, root, 1L)
    val pinned = graft.catalog.CowNamedTable("cow.pinned.t", root, m1,
      pinned = true)
    val e3 = intercept[IllegalArgumentException](pinned.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap())))
    assert(e3.getMessage.contains("AS OF"), s"wrong refusal: $e3")
  }
}
