package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._

import graft.sinks.{CowSql, CowTable}

/** The commit OWNERSHIP contract (round-13 ADVICE, medium): every
  * commit/DML entry point reports whether THIS call's effect is in
  * the table — `false` only when the superseded guard fired on a
  * commit published by someone else. Auto-allocating callers (the
  * named catalog's INSERT, `CowSql.execAuto`) treat `false` as a lost
  * race and fail loudly instead of checking
  * `committedIds.contains(id)`, which a racing writer's commit of the
  * SAME id would satisfy — the silent-lost-write hole these tests
  * pin shut. The two concurrency tests are REAL races: increments
  * and inserts from competing threads must all land exactly once,
  * with every loss surfacing as a retryable exception, never as
  * silence.
  */
class CommitRaceSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("commitrace").toString

  test("ownership contract: superseded commitAppend returns false and " +
      "its rows are NOT in the table; benign no-ops return true") {
    import spark.implicits._
    val root = s"${tmp()}/t"
    assert(CowTable.commitFull(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root, 1L, Nil))
    // a SECOND writer already owns id 1 — replaying it with different
    // rows must report false and must not merge those rows in
    assert(!CowTable.commitAppend(
      Seq((99L, "z")).toDF("id", "v"), root, 1L, Nil))
    val rows = CowTable.read(spark, root).get
    assert(rows.count() == 2 && rows.where(col("id") === 99).isEmpty)
    // benign no-ops: the statement's effect is (trivially) applied
    assert(CowTable.deleteWhere(spark, root, 2L, col("id") > 1000))
    assert(CowTable.updateWhere(spark, root, 2L, col("id") > 1000,
      Map("v" -> lit("x"))))
    // ...and the no-op consumed no id: the next append still owns 2
    assert(CowTable.commitAppend(Seq((3L, "c")).toDF("id", "v"),
      root, 2L, Nil))
    assert(CowTable.read(spark, root).get.count() == 3)
  }

  test("racing textual UPDATE increments: every lost race is loud and " +
      "retried, so no increment is ever silently dropped") {
    import spark.implicits._
    val root = s"${tmp()}/ctr"
    CowTable.commitFull(Seq((0L, 0L)).toDF("id", "v"), root, 1L, Nil)
    val threads = 2
    val perThread = 6
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(threads)
    val failures = new java.util.concurrent.atomic.AtomicReference[Throwable]
    (0 until threads).foreach { _ =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try {
            var done = 0
            while (done < perThread) {
              try {
                CowSql.execAuto(spark,
                  s"UPDATE cow.`$root` SET v = v + 1 WHERE id = 0")
                done += 1
              } catch {
                // the ONLY acceptable race outcome is a loud one —
                // retry until this thread's increment lands
                case _: IllegalArgumentException |
                     _: graft.sinks.CowConcurrentCommitException => ()
              }
            }
          } catch { case t: Throwable => failures.compareAndSet(null, t) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS), "race test hung")
    if (failures.get != null) throw failures.get
    // 12 increments attempted, each retried until owned: with the old
    // head-movement check a same-id race silently dropped one and this
    // read 11
    val v = CowTable.read(spark, root).get
      .where(col("id") === 0).select("v").head().getLong(0)
    assert(v == (threads * perThread).toLong,
      s"lost ${threads * perThread - v} increment(s) to silent races")
  }

  test("racing named-catalog INSERTs: all rows land exactly once") {
    val ns = s"race${System.nanoTime() % 1000000}"
    spark.sql(s"CREATE NAMESPACE cow.$ns")
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT, src STRING)")
    val threads = 2
    val perThread = 5
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(threads)
    val failures = new java.util.concurrent.atomic.AtomicReference[Throwable]
    (0 until threads).foreach { w =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try {
            (0 until perThread).foreach { i =>
              var landed = false
              while (!landed) {
                try {
                  spark.sql(s"INSERT INTO cow.$ns.t VALUES " +
                    s"(${w * 1000 + i}, 'w$w')")
                  landed = true
                } catch {
                  case _: IllegalArgumentException |
                       _: graft.sinks.CowConcurrentCommitException => ()
                  case e: Exception // Spark wraps command failures
                      if e.getMessage != null &&
                        (e.getMessage.contains("superseded") ||
                          e.getMessage.contains("commit race") ||
                          e.getMessage.contains("lost the commit race")) =>
                    ()
                }
              }
            }
          } catch { case t: Throwable => failures.compareAndSet(null, t) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS), "race test hung")
    if (failures.get != null) throw failures.get
    val got = spark.table(s"cow.$ns.t").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val want = (0 until threads).flatMap(w =>
      (0 until perThread).map(i => (w * 1000 + i).toLong)).sorted
    assert(got == want,
      s"INSERT race lost/duplicated rows: got $got, want $want")
  }
}
