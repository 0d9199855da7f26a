package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.sinks.CowTable

/** `writeStream.format("cow")` (streaming/CowStreamSink.scala) and the
  * BATCH read of the named change feed (`spark.read.option(
  * "startSnapshot", …).table("….changes")`): output modes, named
  * resolution, exactly-once across restart + replay, CDF ranges and
  * the retention guard.
  */
class CowStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_cowssink_$tag").toString

  test("format(cow) append by path: one commit per micro-batch, " +
      "exactly-once across stop/restart of the same checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val root = s"${tmp("fmt_append")}/t"
    val ck = tmp("fmt_append_ck")
    val in = MemoryStream[(Long, String)]
    def start() = in.toDF().toDF("id", "v")
      .withColumn("pb", pmod(col("id"), lit(2)).cast("int"))
      .writeStream.format("cow")
      .option("checkpointLocation", ck)
      .option("partitionBy", "pb")
      .option("changeLogKeys", "id")
      .option("keep", "10")
      .start(root)
    in.addData((1L, "a"), (2L, "b"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(CowTable.committedIds(spark, root) == Seq(2L))
    // restart the SAME checkpoint: the processed batch replays nowhere,
    // the new wave lands as the next id
    in.addData((3L, "c"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(CowTable.committedIds(spark, root) == Seq(2L, 4L),
      "restart must not re-commit batch 0 under a different id")
    val got = CowTable.read(spark, root).get
      .select($"id", $"v").orderBy("id").as[(Long, String)].collect()
    assert(got.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // the appends published their changelog sidecars (feed-ready):
    // serve the (2, 4] delta from the first committed base
    assert(CowTable.changeFeedFromLog(spark, root, 2L, 4L,
      Seq("id")).isDefined)
  }

  test("format(cow) NAMED upsert: option(table) resolves through a " +
      "registered non-'cow' catalog; keys → newest-wins merge") {
    implicit val sqlCtx = spark.sqlContext
    val wh = tmp("fmt_named_wh")
    spark.conf.set("spark.sql.catalog.cowsink",
      classOf[graft.catalog.CowCatalog].getName)
    spark.conf.set("spark.sql.catalog.cowsink.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cowsink.s")
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("id", "v")
      .withColumn("pb", CowTable.keyBucket(Seq("id"), 4))
      .writeStream.format("cow")
      .option("checkpointLocation", tmp("fmt_named_ck"))
      .option("table", "cowsink.s.t")
      .option("keys", "id")
      .option("keep", "10")
      .start()
    try {
      in.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      in.addData((2L, "B"), (3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cowsink.s.t")
      .select($"id", $"v").orderBy("id").as[(Long, String)].collect()
    assert(got.toSeq == Seq((1L, "a"), (2L, "B"), (3L, "c")),
      "second wave must newest-wins-merge, not append")
  }

  test("format(cow) Complete mode: each trigger REPLACES the table " +
      "with the aggregation's full result") {
    implicit val sqlCtx = spark.sqlContext
    val root = s"${tmp("fmt_complete")}/t"
    val in = MemoryStream[Long]
    val q = in.toDF().toDF("id")
      .groupBy(pmod(col("id"), lit(3)).as("k"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("cow")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", tmp("fmt_complete_ck"))
      .option("keep", "10")
      .start(root)
    try {
      in.addData(0L, 1L, 2L)
      q.processAllAvailable()
      in.addData(3L, 4L)
      q.processAllAvailable()
    } finally q.stop()
    val got = CowTable.read(spark, root).get
      .select($"k", $"n").orderBy("k").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((0L, 2L), (1L, 2L), (2L, 1L)),
      "the table must hold the LATEST full result, not a union")
  }

  test("Update mode without keys is refused loudly; a fresh checkpoint " +
      "against a pre-existing table without baseId is refused loudly") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Long]
    val e = intercept[Exception](in.toDF().toDF("id")
      .writeStream.format("cow")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", tmp("upd_ck"))
      .start(s"${tmp("upd")}/t"))
    assert(e.getMessage.contains("keys"), s"wrong refusal: $e")
    // pre-existing table + fresh checkpoint: frontier guard refuses the
    // first batch instead of silently no-opping it as a replay
    val root = s"${tmp("fresh")}/t"
    CowTable.commitFull(Seq((1L, "a")).toDF("id", "v"), root, 9L, Nil,
      keep = 10)
    val in2 = MemoryStream[(Long, String)]
    in2.addData((2L, "b"))
    val q = in2.toDF().toDF("id", "v").writeStream.format("cow")
      .option("checkpointLocation", tmp("fresh_ck")).start(root)
    val err = intercept[Exception](q.processAllAvailable())
    try assert(err.toString.contains("frontier"),
      s"fresh-checkpoint attach must fail the frontier guard: $err")
    finally q.stop()
  }

  test("batch CDF by name: startSnapshot/endSnapshot ranges, default " +
      "full range, and the lagging-start retention guard") {
    val root = s"${tmp("cdf")}/t"
    val pb = CowTable.keyBucket(Seq("id"), 4)
    CowTable.commitFull(spark.range(1, 6).select($"id", pb.as("pb")),
      root, 1L, Seq("pb"), keep = 10, changeLogKeys = Seq("id"))
    CowTable.commitAppend(spark.range(6, 9).select($"id", pb.as("pb")),
      root, 2L, Seq("pb"), keep = 10, changeLogKeys = Seq("id"))
    CowTable.deleteWhere(spark, root, 3L, $"id" <= 2, keep = 10,
      changeLogKeys = Seq("id"))
    // range [2, 3]: commit 2's inserts + commit 3's deletes
    val ranged = spark.read.option("startSnapshot", "2")
      .table(s"cow.`$root`.changes")
      .select($"_commit_id", $"_oper", $"id")
      .orderBy("_commit_id", "id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(ranged == Seq((2L, "I", 6L), (2L, "I", 7L), (2L, "I", 8L),
      (3L, "D", 1L), (3L, "D", 2L)))
    // default = everything retained; endSnapshot clips the tail
    assert(spark.read.table(s"cow.`$root`.changes").count() == 10L)
    assert(spark.read.option("endSnapshot", "1")
      .table(s"cow.`$root`.changes").count() == 5L)
    // vacuum past commit 1, then ask for it: loud, not a silent hole
    // (checkpoint first: delta-chain retention would otherwise keep
    // commit 1 servable under keep=2)
    CowTable.checkpoint(spark, root, 2L)
    CowTable.vacuum(spark, root, keep = 2)
    val e = intercept[Exception](spark.read
      .option("startSnapshot", "1").table(s"cow.`$root`.changes")
      .count())
    assert(e.toString.contains("lags vacuumed"),
      s"lagging batch CDF must fail the retention guard: $e")
  }
}
