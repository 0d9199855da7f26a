package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.functions._

import graft.sinks.CowTable

/** Shared mutable state for the non-determinism probes: a JVM-global
  * evaluation counter ticked from executor code (local[*] — one JVM).
  */
object OverwritePinProbe {
  val evals = new AtomicLong(0L)
}

/** Round-13 verdict #1: the catalog overwrite paths (dynamic
  * overwrite, replaceWhere, static PARTITION overwrite) derive their
  * TOUCHED partition set from the WRITTEN batch files instead of
  * pinning the whole insert input with `localCheckpoint` and
  * re-evaluating it for a pre-write `SELECT DISTINCT partCols`:
  *
  *  - the input query evaluates EXACTLY ONCE (the batch write),
  *    pinned here with a JVM-global counter ticked per row;
  *  - nothing is materialized to executor block storage (no
  *    locally-checkpointed RDDs left behind — the 2× write
  *    amplification and the lost-blocks-on-executor-death hazard
  *    `operators/Par.scala` documents are both gone);
  *  - a NON-DETERMINISTIC insert still commits a touched set equal to
  *    the written files: partitions written by the single evaluation
  *    are replaced, everything else carries by reference — the
  *    divergence the old pin existed to prevent cannot occur because
  *    there is no second evaluation to diverge.
  */
class OverwritePinSpec extends SparkSpec {
  import spark.implicits._

  private def ns(tag: String): String =
    s"$tag${System.nanoTime() % 1000000}"

  test("dynamic INSERT OVERWRITE evaluates its input exactly once, " +
      "leaves no locally-checkpointed RDDs, and commits " +
      "touched == written under a non-deterministic source") {
    val db = ns("pin")
    spark.sql(s"CREATE NAMESPACE cow.$db")
    spark.sql(s"CREATE TABLE cow.$db.t (id BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    // markers in partitions 0 and 1
    spark.sql(s"INSERT INTO cow.$db.t SELECT id, id % 2 FROM range(10)")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // the source ROUTES ALL ROWS to a partition decided by how many
      // evaluations have run: evaluation #1 sends every row to p=0,
      // a second evaluation would send them to p=1 — exactly the
      // divergence shape the old pin guarded against
      OverwritePinProbe.evals.set(0L)
      val src = spark.range(1000, 1100).as[Long].map { i =>
        val n = OverwritePinProbe.evals.incrementAndGet()
        (i, (n - 1) / 100)  // 0 for rows 1..100, 1 for rows 101..200
      }.toDF("id", "p")
      val before = spark.sparkContext.getPersistentRDDs.size
      src.writeTo(s"cow.$db.t").overwritePartitions()
      assert(OverwritePinProbe.evals.get() == 100L,
        s"the insert input must evaluate exactly once (100 rows), " +
          s"saw ${OverwritePinProbe.evals.get()} row evaluations")
      assert(spark.sparkContext.getPersistentRDDs.size == before,
        "the overwrite must not leave a locally-checkpointed/persisted " +
          "RDD behind (the old full-input pin)")
      val rows = spark.table(s"cow.$db.t")
      // the single evaluation wrote p=0 only: p=0 fully replaced
      // (markers gone), p=1 untouched (markers intact)
      assert(rows.where($"p" === 0 && $"id" < 10).isEmpty,
        "partition 0 was written and must be fully replaced")
      assert(rows.where($"p" === 0).count() == 100L)
      assert(rows.where($"p" === 1).count() == 5L,
        "partition 1 was not written and must carry by reference")
    } finally {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
      spark.sql(s"DROP NAMESPACE cow.$db CASCADE")
    }
  }

  test("replaceWhere derives touched from written files: no pinned " +
      "RDDs, outside-region rows still refuse loudly, untouched " +
      "partitions carry by path identity") {
    val db = ns("rw")
    spark.sql(s"CREATE NAMESPACE cow.$db")
    spark.sql(s"CREATE TABLE cow.$db.t (id BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO cow.$db.t SELECT id, id % 4 FROM range(40)")
    val root =
      s"${spark.conf.get("spark.sql.catalog.cow.warehouse")}/$db/t"
    val keepPaths = CowTable.currentManifest(spark, root).get
      .files.filter(f => f.part("p").toLong >= 2).map(_.path).toSet
    val before = spark.sparkContext.getPersistentRDDs.size
    // replace partitions p < 2 with fresh rows
    spark.range(2000, 2010).select($"id", ($"id" % 2).as("p"))
      .writeTo(s"cow.$db.t").overwrite($"p" < 2)
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "replaceWhere must not pin its input")
    val m = CowTable.currentManifest(spark, root).get
    assert(m.files.filter(f => f.part("p").toLong >= 2)
      .map(_.path).toSet == keepPaths,
      "partitions outside the region must carry by path identity")
    assert(spark.table(s"cow.$db.t").where($"p" < 2).count() == 10L)
    // a query producing rows OUTSIDE the region still refuses loudly
    val e = intercept[Exception] {
      spark.range(3000, 3010).select($"id", ($"id" % 4).as("p"))
        .writeTo(s"cow.$db.t").overwrite($"p" < 2)
    }
    assert(e.getMessage != null &&
      e.getMessage.contains("OUTSIDE the replaced region"),
      s"wrong refusal: $e")
    // ...and the failed statement committed nothing AND left no staged
    // batch files behind (a stale batch dir could otherwise be
    // absorbed by a later attempt of the same id)
    assert(CowTable.currentManifest(spark, root).get.id == m.id)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$root/batch-${m.id + 1}")),
      "a refused overwrite must clean its staged batch dir")
    spark.sql(s"DROP NAMESPACE cow.$db CASCADE")
  }

  test("static PARTITION (p=v) overwrite validates the written files " +
      "against the declared spec, without pinning") {
    val db = ns("st")
    spark.sql(s"CREATE NAMESPACE cow.$db")
    spark.sql(s"CREATE TABLE cow.$db.t (id BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO cow.$db.t SELECT id, id % 2 FROM range(10)")
    val before = spark.sparkContext.getPersistentRDDs.size
    spark.sql(s"INSERT OVERWRITE cow.$db.t PARTITION (p = 0) " +
      "SELECT id FROM range(500, 503)")
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "static overwrite must not pin its input")
    val t = spark.table(s"cow.$db.t")
    assert(t.where($"p" === 0).count() == 3L)
    assert(t.where($"p" === 1).count() == 5L)
    spark.sql(s"DROP NAMESPACE cow.$db CASCADE")
  }
}
