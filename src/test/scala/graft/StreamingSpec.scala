package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowed counts aggregate a MemoryStream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.windowedCounts(df, lateness = "5 minutes", window_ = "10 minutes")
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try {
      in.addData((ts(1), "click", 1.5), (ts(4), "click", 2.0), (ts(12), "view", 1.0))
      q.processAllAvailable()
      val out = spark.table("wc")
        .select("event_type", "n", "sum_value_u")
        .as[(String, Long, Long)].collect().toSet
      assert(out == Set(("click", 2L, 3500000L), ("view", 1L, 1000000L)))
    } finally q.stop()
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val df = in.toDF().toDF("ts", "event_id")
    val q = StreamOps.streamingDedup(df, Seq("event_id"))
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      in.addData((ts(1), 1L), (ts(2), 1L), (ts(3), 2L))
      q.processAllAvailable()
      assert(spark.table("dd").select("event_id").as[Long].collect().sorted
        .toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("session_window merges events within the gap (batch-bound plan)") {
    val df = Seq(
      (ts(0), 1L, 1.0), (ts(10), 1L, 1.0), // session A (gap 15m holds)
      (ts(40), 1L, 1.0), // session B
      (ts(5), 2L, 1.0)) // other user
      .toDF("ts", "user_id", "value")
    val out = StreamOps.sessionAgg(df, gap = "15 minutes")
      .select("user_id", "n_events").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("mapGroupsWithState accumulates running user stats") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamOps.UserEvent]
    val q = StreamOps.runningUserStats(in.toDS())
      .writeStream.format("memory").queryName("us").outputMode("update").start()
    try {
      in.addData(StreamOps.UserEvent(1L, 10L), StreamOps.UserEvent(1L, 5L))
      q.processAllAvailable()
      in.addData(StreamOps.UserEvent(1L, 3L)) // state carries across batches
      q.processAllAvailable()
      val last = spark.table("us").as[StreamOps.UserStats].collect()
        .filter(_.user_id == 1L).maxBy(_.n)
      assert(last == StreamOps.UserStats(1L, 3L, 18L))
    } finally q.stop()
  }

  test("stream-stream interval join matches purchases within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Double)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val joined = StreamOps.clickToPurchaseJoin(
      clicks.toDF().toDF("user_id", "ts", "click_value"),
      purchases.toDF().toDF("user_id", "ts", "purchase_value"),
      horizonSeconds = 600)
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts(0), 1.0), (2L, ts(0), 2.0))
      purchases.addData((1L, ts(5), 10.0), (2L, ts(30), 20.0)) // 2L outside 10m
      // advance both watermarks far enough to emit results
      clicks.addData((9L, ts(59), 0.0))
      purchases.addData((9L, ts(59), 0.0))
      q.processAllAvailable()
      val out = spark.table("ssj")
        .select("user_id", "purchase_value").as[(Long, Double)].collect().toSet
      assert(out.contains((1L, 10.0)))
      assert(!out.exists(_._1 == 2L)) // outside horizon never joins
    } finally q.stop()
  }

  test("foreachBatch applies a batch writer per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-feb").toString
    val in = MemoryStream[Long]
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamOps.foreachBatchSink(
      in.toDF().toDF("v"), s"$dir/ckpt") { (batch, id) =>
      seen.synchronized { seen += batch.count() }
      batch.write.mode("append").parquet(s"$dir/out")
    }
    try {
      in.addData(1L, 2L, 3L)
      q.processAllAvailable()
      in.addData(4L)
      q.processAllAvailable()
      assert(seen.sum == 4)
      assert(spark.read.parquet(s"$dir/out").count() == 4)
    } finally q.stop()
  }

  test("streaming raw ingest: file source → trim → checkpointed parquet") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val src = Tables.load(spark, sfDir, "documents").limit(50)
    src.write.parquet(s"$dir/in")
    val q = StreamOps.rawIngestStream(spark, s"$dir/in", src.schema,
      s"$dir/out", s"$dir/ckpt")
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(s"$dir/out").count() == 50)
  }

  test("crash mid-batch: restart from checkpoint replays the SAME " +
      "micro-batch, so an idempotent (by batch id) sink is exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-crash").toString
    val in = MemoryStream[Long]
    // injected fault: the writer for batch 1 throws on its FIRST
    // delivery — the query dies mid-commit exactly like an executor/JVM
    // loss after the source offsets were logged but before the sink saw
    // the data
    val failOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    val received =
      new java.util.concurrent.ConcurrentHashMap[Long, Seq[Long]]()
    def writer(batch: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      if (id == 1 && failOnce.getAndSet(false))
        throw new RuntimeException("injected crash before sink commit")
      // idempotent sink contract: keyed by batch id, re-delivery
      // overwrites rather than appends
      received.put(id, batch.select("v").as[Long].collect().toSeq.sorted)
    }

    val q1 = StreamOps.foreachBatchSink(
      in.toDF().toDF("v"), s"$dir/ckpt")(writer)
    in.addData(1L, 2L, 3L)
    q1.processAllAvailable() // batch 0 lands
    in.addData(4L, 5L, 6L)
    val died = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable() // batch 1 crashes the query
    }
    assert(died.getMessage.contains("injected crash"))
    assert(!q1.isActive)
    assert(received.size() == 1) // batch 1 never reached the sink

    // restart from the SAME checkpoint: the WAL pins batch 1's exact
    // offset range, so the replay delivers the identical batch id +
    // contents — the at-least-once half of the exactly-once contract
    val q2 = StreamOps.foreachBatchSink(
      in.toDF().toDF("v"), s"$dir/ckpt")(writer)
    try {
      q2.processAllAvailable()
      assert(received.get(0L) == Seq(1L, 2L, 3L))
      assert(received.get(1L) == Seq(4L, 5L, 6L))
      // and the stream continues past the recovered batch
      in.addData(7L)
      q2.processAllAvailable()
      assert(received.get(2L) == Seq(7L))
      // exactly-once: every input value delivered once across the crash
      val all = received.values().toArray.flatMap(
        _.asInstanceOf[Seq[Long]])
      assert(all.sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    } finally q2.stop()
  }

  test("file-source ingest survives a stop/restart without duplicating " +
      "or dropping files") {
    val dir = Files.createTempDirectory("graft-restart").toString
    // deterministic slice (NOT an unordered limit, which may pick
    // different rows across the separate write/count/verify jobs)
    val src = Tables.load(spark, sfDir, "documents")
      .where(col("doc_id") < 40)
    val half1 = src.where(col("doc_id") % 2 === 0)
    val half2 = src.where(col("doc_id") % 2 === 1)
    half1.write.parquet(s"$dir/in")

    val q1 = StreamOps.rawIngestStream(spark, s"$dir/in", src.schema,
      s"$dir/out", s"$dir/ckpt")
    try q1.processAllAvailable() finally q1.stop() // ingest half 1, stop
    val n1 = spark.read.parquet(s"$dir/out").count()
    assert(n1 == half1.count())

    // new files land while the query is DOWN; restart from checkpoint
    half2.write.mode("append").parquet(s"$dir/in")
    val q2 = StreamOps.rawIngestStream(spark, s"$dir/in", src.schema,
      s"$dir/out", s"$dir/ckpt")
    try q2.processAllAvailable() finally q2.stop()

    // exactly-once across the restart: half-1 files are not re-ingested,
    // half-2 files are not missed — doc_ids are unique, so any replay
    // would show up as a duplicate here
    val total = src.count()
    assert(total > 0)
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == total)
    assert(out.select("doc_id").distinct().count() == total)
  }
}
