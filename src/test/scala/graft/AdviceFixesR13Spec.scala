package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.sinks.{CowTable, MaintCommitted, MaintNoOp, MaintSuperseded}

/** Round-13 ADVICE fixes (applied in round 14):
  *
  *  1. (medium) the `.changes` feed STREAM's `startingSnapshot` is
  *     INCLUSIVE — commit X's changes are served — matching the table
  *     stream's same-named option and the batch CDF's `startSnapshot`.
  *     Under the old exclusive reading a CDC consumer passing the
  *     first id it needed silently never received that id's rows.
  *  2. (low) `writeStream.format("cow")` refuses Complete output
  *     combined with `option("keys", …)` loudly — Complete replaces
  *     the whole table, so the keys would be silently ignored.
  *  3. (low) OPTIMIZE's benign-no-op vs lost-race disambiguation comes
  *     from the ENGINE's return value ([[graft.sinks.MaintStatus]]),
  *     not a racy committed-ids re-listing after the fact.
  *  4. (low) the executor-side DV sidecar parser reads BOTH parquet
  *     list layouts — a session running with
  *     `spark.sql.parquet.writeLegacyFormat=true` writes 2-level lists
  *     the old walk could not parse.
  *  5. (low) analyzer-DML rendering quotes SET/INSERT column names
  *     with embedded-backtick doubling, so a column whose name
  *     contains a backtick round-trips.
  */
class AdviceFixesR13Spec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"advr13_$tag").toString

  test("feed stream startingSnapshot is INCLUSIVE: the named commit's " +
      "changes are served, aligned with batch CDF startSnapshot") {
    val root = s"${tmp("incl")}/t"
    def batch(lo: Long, hi: Long) =
      spark.range(lo, hi).select($"id", lit("x").as("v"))
    CowTable.commitAppend(batch(0, 10), root, 1L, Nil,
      changeLogKeys = Seq("id"), keep = 10)
    CowTable.commitAppend(batch(10, 30), root, 2L, Nil,
      changeLogKeys = Seq("id"), keep = 10)
    CowTable.commitAppend(batch(30, 35), root, 3L, Nil,
      changeLogKeys = Seq("id"), keep = 10)
    // batch CDF, the semantics the stream must match: start=2 serves
    // commits 2 and 3 (25 rows)
    assert(spark.read.option("startSnapshot", "2")
      .table(s"cow.`$root`.changes").count() == 25L)
    val seen = scala.collection.mutable.Set.empty[Long]
    val q = spark.readStream.option("startingSnapshot", "2")
      .table(s"cow.`$root`.changes")
      .writeStream.option("checkpointLocation", tmp("inclck"))
      .foreachBatch(
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) => {
          seen.synchronized {
            seen ++= b.select("_commit_id").collect().map(_.getLong(0))
          }
          ()
        })
      .start()
    try {
      q.processAllAvailable()
      assert(seen.synchronized(seen.toSet) == Set(2L, 3L),
        s"startingSnapshot=2 must serve commit 2 (inclusive) and 3, " +
          s"got commits ${seen.toSeq.sorted}")
    } finally q.stop()
  }

  test("cow streaming sink refuses Complete output combined with keys") {
    val root = s"${tmp("ck")}/t"
    val src = Files.createTempDirectory("advr13_src")
    spark.range(3).select($"id", lit("a").as("v")).write
      .parquet(s"$src/b0")
    val stream = spark.readStream
      .schema("id BIGINT, v STRING").parquet(s"$src/*")
      .groupBy("v").count()
    val e = intercept[Exception] {
      stream.writeStream.format("cow")
        .outputMode(OutputMode.Complete())
        .option("checkpointLocation", tmp("ckck"))
        .option("keys", "v")
        .start(root)
    }
    assert(e.getMessage != null && e.getMessage.contains("Complete"),
      s"wrong refusal: $e")
  }

  test("maintenance commits report no-op vs lost-race in the return " +
      "value; textual OPTIMIZE succeeds on a benign no-op without " +
      "re-listing") {
    val root = s"${tmp("maint")}/t"
    // one small file: already compact → NoOp, id unconsumed
    CowTable.commitFull(spark.range(10).toDF("id").coalesce(1),
      root, 1L, Nil)
    assert(CowTable.compactPartitionsStatus(spark, root, 2L) == MaintNoOp)
    assert(CowTable.committedIds(spark, root) == Seq(1L),
      "a no-op must not consume the id")
    // a superseded id is reported as such, not as a no-op
    assert(CowTable.compactPartitionsStatus(spark, root, 1L)
      == MaintSuperseded)
    assert(CowTable.optimizeZorderStatus(spark, root, 1L, Seq("id"))
      == MaintSuperseded)
    // fragment the table so compaction has real work → Committed
    CowTable.commitAppend(spark.range(10, 20).toDF("id"), root, 2L, Nil)
    CowTable.commitAppend(spark.range(20, 30).toDF("id"), root, 3L, Nil)
    assert(CowTable.compactPartitionsStatus(spark, root, 4L)
      == MaintCommitted)
    // the textual surface treats the benign no-op as success
    assert(graft.sinks.CowSql.exec(spark, 5L, s"OPTIMIZE cow.`$root`"))
    assert(CowTable.committedIds(spark, root).last == 4L)
  }

  test("DV sidecars written under writeLegacyFormat=true (2-level " +
      "lists) still parse executor-side") {
    val root = s"${tmp("dvleg")}/t"
    CowTable.commitFull(
      spark.range(100).select($"id", ($"id" % 5).as("seg")),
      root, 1L, Nil)
    spark.conf.set("spark.sql.parquet.writeLegacyFormat", "true")
    try {
      assert(CowTable.deleteWhereDv(spark, root, 2L,
        col("id") % 10 === 0))
    } finally
      spark.conf.set("spark.sql.parquet.writeLegacyFormat", "false")
    val m = CowTable.currentManifest(spark, root).get
    assert(m.dvs.nonEmpty, "the delete must have landed as a DV sidecar")
    // the read applies the mask via the executor-side sidecar parser —
    // under the old 3-level-only walk this threw on the legacy layout
    val left = CowTable.read(spark, root).get
    assert(left.count() == 90L)
    assert(left.where($"id" % 10 === 0).isEmpty)
  }

  test("analyzer DML renders backtick-bearing SET targets as " +
      "re-parseable identifiers (doubling, not raw wrapping)") {
    // rendering is pinned by graft.plans.DmlRenderSpec (the engine's
    // own stats collection cannot yet create a physical table with a
    // backtick-named column, so the round trip is tested at the
    // conversion seam); here pin the normal-name path stays intact
    val ns = s"bt${System.nanoTime() % 1000000}"
    spark.sql(s"CREATE NAMESPACE cow.$ns")
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO cow.$ns.t SELECT id, 'x' FROM range(5)")
    spark.sql(s"UPDATE cow.$ns.t SET v = 'y' WHERE id < 2")
    assert(spark.table(s"cow.$ns.t").where($"v" === "y").count() == 2L)
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }
}
