package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sinks.CowTable

/** Event-time streaming aggregation over the NAMED table stream
  * (round-13 verdict #7): readStream.table → watermark → windowed agg
  * → writeStream.format("cow"), with the LATE-DATA DROP pinned on
  * hand-made timestamps.
  */
class StreamEventAggSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"evagg_$tag").toString

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("named stream → watermark → 1h windows → cow sink: windows " +
      "finalize once the watermark clears them; a late row into a " +
      "finalized window is DROPPED") {
    val ns = s"evs${System.nanoTime() % 1000000}"
    spark.sql(s"CREATE NAMESPACE cow.$ns")
    spark.sql(s"CREATE TABLE cow.$ns.ev " +
      "(event_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE)")
    val wh = spark.conf.get("spark.sql.catalog.cow.warehouse")
    // wave 1: two events in the 10:00 window, one at 12:05 that (with
    // 10 min lateness) pushes the watermark to 11:55 — past the 10:00
    // and 11:00 window ends
    Seq(
      (1L, ts("2024-03-01 10:10:00"), "click", 1.0),
      (2L, ts("2024-03-01 10:20:00"), "click", 2.0),
      (3L, ts("2024-03-01 11:30:00"), "view", 3.0),
      (4L, ts("2024-03-01 12:05:00"), "view", 4.0))
      .toDF("event_id", "ts", "event_type", "value")
      .createOrReplaceTempView("evs_w1")
    spark.sql(s"INSERT INTO cow.$ns.ev SELECT * FROM evs_w1")
    val q = graft.streaming.StreamOps.windowedCounts(
        spark.readStream.table(s"cow.$ns.ev"),
        lateness = "10 minutes", window_ = "1 hour")
      .writeStream.format("cow")
      .option("checkpointLocation", tmp("ck"))
      .option("table", s"cow.$ns.agg")
      .start()
    try {
      q.processAllAvailable()
      val flush1 = CowTable.read(spark, s"$wh/$ns/agg").get.collect()
      // watermark after wave 1 = 12:05 - 10min = 11:55 → the 10:00
      // window (end 11:00) finalized; 11:00 and 12:00 windows still open
      assert(flush1.map(_.getAs[Timestamp]("win_start").toString).toSet
        == Set("2024-03-01 10:00:00.0"),
        s"only the cleared window may emit, got ${flush1.toSeq}")
      assert(flush1.head.getAs[Long]("n") == 2L)
      // wave 2: one LATE row into the already-finalized 10:00 window
      // (must be dropped — the window emitted, its state is gone) and
      // one fresh row at 14:05 pushing the watermark to 13:55
      Seq(
        (5L, ts("2024-03-01 10:40:00"), "click", 100.0), // LATE — drop
        (6L, ts("2024-03-01 14:05:00"), "view", 6.0))
        .toDF("event_id", "ts", "event_type", "value")
        .createOrReplaceTempView("evs_w2")
      spark.sql(s"INSERT INTO cow.$ns.ev SELECT * FROM evs_w2")
      q.processAllAvailable()
    } finally q.stop()
    val out = CowTable.read(spark, s"$wh/$ns/agg").get
      .orderBy("win_start", "event_type").collect()
    // final watermark 13:55: windows 10:00 (already emitted), 11:00 and
    // 12:00 now cleared; 14:00 still open (end 15:00 > 13:55). The late
    // row changed NOTHING: the 10:00 window still counts 2 clicks and
    // appears exactly once.
    assert(out.map(r => (r.getAs[Timestamp]("win_start").toString,
      r.getAs[String]("event_type"), r.getAs[Long]("n"))).toSeq == Seq(
      ("2024-03-01 10:00:00.0", "click", 2L),
      ("2024-03-01 11:00:00.0", "view", 1L),
      ("2024-03-01 12:00:00.0", "view", 1L)),
      s"late row must be dropped and open windows unemitted, got " +
        out.toSeq.mkString(", "))
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }
}
