package graft

import java.nio.file.Files
import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.functions._

import graft.sinks.{CowConcurrentCommitException, CowTable}

/** The last untested concurrency pairing: maintenance commits
  * (OPTIMIZE … ZORDER, compaction) racing a concurrent data commit
  * (upsert). Both take the ordinary commit path, so under ANY
  * interleaving exactly one of a conflicting pair wins its based-on
  * verification; the loser throws [[CowConcurrentCommitException]]
  * BEFORE publishing and retries cleanly against the new base. The
  * invariants pinned here hold regardless of which side wins:
  * content is exactly the upsert result (optimize never changes
  * rows), no referenced file is ever lost, and the table stays
  * readable throughout.
  */
class OptimizeRaceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("optrace").toString

  /** Run `op` with a fresh id on each attempt — the documented loser
    * protocol (recompute against the new base). `op` returns whether
    * it COMMITTED; a superseded id (maintenance ops return false when
    * the frontier moved past their id) retries with a fresher one, so
    * "the loser silently did nothing" can never read as success.
    * `falseIsTerminal` accepts a genuine nothing-to-do false (e.g.
    * compaction finding no fragmentation after the racer's rewrite).
    */
  private def retrying(firstId: Long, falseIsTerminal: Boolean = false)(
      op: Long => Boolean): Boolean = {
    var id = firstId
    var attempts = 0
    while (true) {
      attempts += 1
      require(attempts <= 6, "retry loop did not converge")
      try {
        if (op(id)) return true
        else if (falseIsTerminal && attempts > 1) return false
      } catch { case _: CowConcurrentCommitException => () }
      id += 10
    }
    false
  }

  test("OPTIMIZE ZORDER racing a concurrent upsert: one wins, the " +
      "loser retries cleanly, content and file references survive " +
      "every interleaving") {
    (1 to 3).foreach { round =>
      val root = tmp()
      val base = spark.range(4000).select(
        $"id", ($"id" % 4).cast("int").as("pb"),
        (($"id" * 2654435761L) % 4096L).as("k2"), ($"id" % 7).as("v"))
      CowTable.commitFull(base, root, 1L, Seq("pb"), keep = 10)
      val delta = spark.range(3900, 4200).select(
        $"id", ($"id" % 4).cast("int").as("pb"),
        lit(0L).as("k2"), lit(99L).as("v"))
      val start = new CountDownLatch(1)
      @volatile var failure: Option[Throwable] = None
      def guard(body: => Unit): Runnable = () =>
        try { start.await(); body }
        catch { case t: Throwable => failure = Some(t) }
      @volatile var optCommitted = false
      val tOpt = new Thread(guard {
        optCommitted = retrying(2L + round * 100)(id =>
          CowTable.optimizeZorder(spark, root, id, Seq("id", "k2"),
            targetFileBytes = 64 * 1024, keep = 10))
      })
      val tUp = new Thread(guard {
        retrying(3L + round * 100) { id =>
          CowTable.upsert(spark, root, id, delta, Seq("id"), Seq("pb"),
            keep = 10)
          CowTable.committedIds(spark, root).contains(id)
        }
      })
      tOpt.start(); tUp.start(); start.countDown()
      tOpt.join(180000); tUp.join(180000)
      failure.foreach(t => fail(s"round $round: unexpected failure", t))
      assert(optCommitted,
        s"round $round: the maintenance side never actually committed")
      // content: exactly the upsert result, whoever won the race
      val got = CowTable.read(spark, root).get
        .select("id", "v").as[(Long, Long)].collect().toMap
      val want = base.select("id", "v").as[(Long, Long)].collect().toMap ++
        delta.select("id", "v").as[(Long, Long)].collect().toMap
      assert(got == want, s"round $round: content diverged after race")
      // no referenced file lost, whatever was retried or abandoned
      val report = CowTable.fsck(spark, root)
      assert(report.missing.isEmpty,
        s"round $round: lost files after race: ${report.missing}")
      // every retained snapshot still reads
      CowTable.committedIds(spark, root).foreach(i =>
        CowTable.readAt(spark, root, i).foreach(_.count()))
    }
  }

  test("compaction racing a concurrent upsert keeps the same " +
      "invariants") {
    val root = tmp()
    val base = spark.range(2000).select(
      $"id", ($"id" % 4).cast("int").as("pb"), ($"id" % 7).as("v"))
    CowTable.commitFull(base, root, 1L, Seq("pb"), keep = 10)
    // fragment the partitions so compaction has real work
    (0 until 3).foreach(i =>
      CowTable.commitAppend(
        spark.range(2000 + i * 100, 2100 + i * 100).select(
          $"id", ($"id" % 4).cast("int").as("pb"), lit(1L).as("v")),
        root, 2L + i, Seq("pb"), keep = 10))
    val delta = spark.range(50).select(
      $"id", ($"id" % 4).cast("int").as("pb"), lit(42L).as("v"))
    val start = new CountDownLatch(1)
    @volatile var failure: Option[Throwable] = None
    def guard(body: => Unit): Runnable = () =>
      try { start.await(); body }
      catch { case t: Throwable => failure = Some(t) }
    val tc = new Thread(guard {
      // false-after-retry is terminal here: the racing upsert's COW
      // rewrite may legitimately leave nothing fragmented to compact
      retrying(10L, falseIsTerminal = true)(id =>
        CowTable.compactPartitions(spark, root, id,
          targetFileBytes = 4 * 1024 * 1024, keep = 10))
    })
    val tu = new Thread(guard {
      retrying(11L) { id =>
        CowTable.upsert(spark, root, id, delta, Seq("id"), Seq("pb"),
          keep = 10)
        CowTable.committedIds(spark, root).contains(id)
      }
    })
    tc.start(); tu.start(); start.countDown()
    tc.join(180000); tu.join(180000)
    failure.foreach(t => fail("unexpected failure", t))
    val got = CowTable.read(spark, root).get
      .select("id", "v").as[(Long, Long)].collect().toMap
    val appended = (0 until 3).flatMap(i =>
      (2000 + i * 100) until (2100 + i * 100)).map(_.toLong -> 1L).toMap
    val want = base.select("id", "v").as[(Long, Long)].collect().toMap ++
      appended ++ (0L until 50L).map(_ -> 42L).toMap
    assert(got == want, "content diverged after compaction race")
    assert(CowTable.fsck(spark, root).missing.isEmpty)
  }
}
