package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.CowTable

/** A/B: the NAMED change-feed source (readStream.table(t.changes))
  * against the raw parquet file-stream transport it replaced — bounds
  * the per-commit transport overhead for the round-14 bench notes.
  * Asserts only row-count equality; prints wall times.
  */
class FeedAbSpec extends SparkSpec {
  import spark.implicits._

  test("named feed vs raw parquet transport: identical rows; timings") {
    val root = s"${Files.createTempDirectory("feedab").toString}/t"
    val nCommits = 20
    (1 to nCommits).foreach { i =>
      CowTable.commitAppend(
        spark.range(i * 1000, i * 1000 + 500)
          .select($"id", lit(s"b$i").as("v")).coalesce(1),
        root, i.toLong, Nil, changeLogKeys = Seq("id"), keep = 100)
    }
    def consumeNamed(): (Long, Long) = {
      var n = 0L
      val t0 = System.nanoTime()
      val q = spark.readStream.table(s"cow.`$root`.changes")
        .writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("abn").toString)
        .foreachBatch(
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              _: Long) => { n += b.count(); () })
        .start()
      try q.processAllAvailable() finally q.stop()
      (n, (System.nanoTime() - t0) / 1000000L)
    }
    def consumeRaw(): (Long, Long) = {
      var n = 0L
      val t0 = System.nanoTime()
      val q = spark.readStream
        .schema("id BIGINT, v STRING, _oper STRING")
        .parquet(s"$root/_changes/[0-9]*")
        .writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("abr").toString)
        .foreachBatch(
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              _: Long) => { n += b.count(); () })
        .start()
      try q.processAllAvailable() finally q.stop()
      (n, (System.nanoTime() - t0) / 1000000L)
    }
    // warm both paths once, then measure alternating twice each
    consumeNamed(); consumeRaw()
    val named = (1 to 2).map(_ => consumeNamed())
    val raw = (1 to 2).map(_ => consumeRaw())
    assert(named.map(_._1).toSet == Set(nCommits * 500L))
    assert(raw.map(_._1).toSet == Set(nCommits * 500L))
    println(s"FEED_AB named_ms=${named.map(_._2).mkString(",")} " +
      s"raw_ms=${raw.map(_._2).mkString(",")} commits=$nCommits")
  }
}
