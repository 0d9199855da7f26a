package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sinks.CowTable

/** SHALLOW CLONE (round-13 verdict #6): the clone's first snapshot is
  * a manifest-reference copy — O(manifest) IO, zero data copies —
  * with writes diverging from the first commit on, and a vacuum fence
  * registered at the SOURCE so its retention cannot break the clone.
  */
class ShallowCloneSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"clone_$tag").toString

  private def batchDirs(root: String): Seq[String] = {
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(root))) Nil
    else fs.listStatus(new Path(root)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch-"))
      .map(_.getPath.getName)
  }

  test("clone reads identical with ZERO data copied; writes diverge; " +
      "source stays untouched") {
    val src = s"${tmp("s")}/t"
    val dst = s"${tmp("d")}/t"
    CowTable.commitFull(
      spark.range(100).select($"id", ($"id" % 4).as("p")),
      src, 1L, Seq("p"))
    spark.sql(s"CREATE TABLE cow.`$dst` SHALLOW CLONE cow.`$src`")
    // zero data IO: the clone root holds NO batch dirs, and every
    // manifest entry is an absolute reference into the source
    assert(batchDirs(dst).isEmpty, "a shallow clone must copy no data")
    val cm = CowTable.currentManifest(spark, dst).get
    assert(cm.files.nonEmpty && cm.files.forall(_.path.startsWith("/")),
      "clone entries must reference the source by absolute path")
    // reads identical (named path form through the analyzer)
    assert(spark.sql(s"SELECT * FROM cow.`$dst`").count() == 100L)
    assert(spark.sql(s"SELECT sum(id) FROM cow.`$dst`").as[Long].head()
      == spark.sql(s"SELECT sum(id) FROM cow.`$src`").as[Long].head())
    // writes diverge: UPDATE the clone — the source must not move
    val srcIds = CowTable.committedIds(spark, src)
    spark.sql(s"UPDATE cow.`$dst` SET id = id + 1000 WHERE p = 2")
    assert(CowTable.committedIds(spark, src) == srcIds,
      "a clone write must not touch the source")
    assert(spark.sql(s"SELECT count(*) FROM cow.`$dst` " +
      "WHERE id >= 1000").as[Long].head() == 25L)
    assert(spark.sql(s"SELECT count(*) FROM cow.`$src` " +
      "WHERE id >= 1000").as[Long].head() == 0L)
    // the rewritten partition now lives under the CLONE root; the
    // untouched partitions still carry from the source
    val after = CowTable.currentManifest(spark, dst).get
    assert(after.files.exists(f => !f.path.startsWith("/")) &&
      after.files.exists(_.path.startsWith("/")),
      "diverged partitions land locally, untouched ones still carry")
  }

  test("VERSION AS OF clones the historical snapshot; source vacuum " +
      "respects the clone fence") {
    val src = s"${tmp("v")}/t"
    CowTable.commitFull(spark.range(10).toDF("id"), src, 1L, Nil,
      keep = 10)
    CowTable.commitAppend(spark.range(10, 30).toDF("id"), src, 2L, Nil,
      keep = 10)
    val dst = s"${tmp("vd")}/t"
    spark.sql(s"CREATE TABLE cow.`$dst` SHALLOW CLONE cow.`$src` " +
      "VERSION AS OF 1")
    assert(spark.sql(s"SELECT count(*) FROM cow.`$dst`")
      .as[Long].head() == 10L)
    assert(CowTable.streamFrontiers(spark, src).exists {
      case (n, id) => n.startsWith("clone-") && id == 1L })
    // advance the source and vacuum aggressively: the fenced snapshot
    // (and its files) must survive, so the clone still reads
    (3L to 5L).foreach(i => CowTable.commitFull(
      spark.range(i * 100).toDF("id"), src, i, Nil))
    CowTable.vacuum(spark, src, keep = 1)
    assert(CowTable.committedIds(spark, src).contains(1L),
      "the clone fence must pin the cloned snapshot's manifest")
    assert(spark.sql(s"SELECT count(*) FROM cow.`$dst`")
      .as[Long].head() == 10L,
      "the clone must survive a keep=1 source vacuum")
  }

  test("MOR DML on a clone: a positional-DV delete masks carried " +
      "SOURCE files (absolute sidecar entries)") {
    val src = s"${tmp("m")}/t"
    val dst = s"${tmp("md")}/t"
    CowTable.commitFull(spark.range(50).toDF("id"), src, 1L, Nil)
    CowTable.shallowClone(spark, src, dst)
    assert(CowTable.deleteWhereDv(spark, dst, 2L, col("id") < 10))
    val m = CowTable.currentManifest(spark, dst).get
    assert(m.dvs.nonEmpty)
    assert(CowTable.read(spark, dst).get.count() == 40L,
      "the DV mask must apply to carried absolute-path files")
    assert(CowTable.read(spark, src).get.count() == 50L,
      "the source must be unaffected")
  }

  test("a debt-carrying source snapshot refuses with the OPTIMIZE " +
      "remedy; an existing target refuses") {
    val src = s"${tmp("r")}/t"
    CowTable.commitFull(spark.range(30).toDF("id"), src, 1L, Nil)
    assert(CowTable.deleteWhereDv(spark, src, 2L, col("id") === 3))
    val e = intercept[IllegalArgumentException](
      CowTable.shallowClone(spark, src, s"${tmp("rd")}/t"))
    assert(e.getMessage.contains("OPTIMIZE"), s"wrong refusal: $e")
    // fold the debt; clone works; cloning ONTO it refuses
    assert(CowTable.compactPartitions(spark, src, 3L))
    val dst = s"${tmp("rd2")}/t"
    CowTable.shallowClone(spark, src, dst)
    val e2 = intercept[IllegalArgumentException](
      CowTable.shallowClone(spark, src, dst))
    assert(e2.getMessage.contains("already has commits"))
  }

  test("clone lifecycle: DROP TABLE releases the source fence (vacuum " +
      "then reclaims); an out-of-band clone deletion leaves an orphan " +
      "fence that fsck reports") {
    val ns = "clonelc"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS cow.$ns")
    val wh = spark.conf.get("spark.sql.catalog.cow.warehouse")
    val src = s"${tmp("lc")}/t"
    CowTable.commitFull(spark.range(20).toDF("id"), src, 1L, Nil,
      keep = 10)
    CowTable.commitFull(spark.range(30).toDF("id"), src, 2L, Nil,
      keep = 10)
    spark.sql(s"CREATE TABLE cow.$ns.c1 SHALLOW CLONE cow.`$src` " +
      "VERSION AS OF 1")
    val cloneRoot = s"$wh/$ns/c1"
    val fence = CowTable.streamFrontiers(spark, src).keys
      .filter(_.startsWith("clone-")).toSeq
    assert(fence.size == 1, s"expected one clone fence, got $fence")
    // provenance recorded both ways; a LIVE clone is not an orphan
    assert(CowTable.cloneProvenance(spark, cloneRoot)
      .contains((src, fence.head)))
    assert(CowTable.fsck(spark, src).orphanFences.isEmpty)
    // DROP releases the fence; the source's vacuum reclaims snapshot 1
    spark.sql(s"DROP TABLE cow.$ns.c1")
    assert(CowTable.streamFrontiers(spark, src).isEmpty,
      "DROP TABLE on a clone must release its source fence")
    CowTable.commitFull(spark.range(40).toDF("id"), src, 3L, Nil)
    CowTable.vacuum(spark, src, keep = 1, collapse = true)
    assert(!CowTable.committedIds(spark, src).contains(1L),
      "a released fence must stop pinning source retention")
    // out-of-band deletion (crash between root delete and release):
    // the fence leaks, and fsck at the source surfaces it by name
    spark.sql(s"CREATE TABLE cow.$ns.c2 SHALLOW CLONE cow.`$src`")
    val fs = new Path(wh).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"$wh/$ns/c2"), true)
    val rep = CowTable.fsck(spark, src)
    assert(rep.orphanFences.size == 1 && !rep.clean,
      s"fsck must report the leaked fence, got $rep")
    CowTable.unregisterStreamFrontier(spark, src, rep.orphanFences.head)
    assert(CowTable.fsck(spark, src).orphanFences.isEmpty)
  }

  test("clone of a clone refuses while the intermediate still carries " +
      "foreign-root entries (its fence could not protect them); a " +
      "localizing rewrite makes it cloneable") {
    val src = s"${tmp("cc")}/t"
    val c1 = s"${tmp("cc1")}/t"
    val c2 = s"${tmp("cc2")}/t"
    CowTable.commitFull(spark.range(25).toDF("id"), src, 1L, Nil)
    CowTable.shallowClone(spark, src, c1)
    val e = intercept[IllegalArgumentException](
      CowTable.shallowClone(spark, c1, c2))
    assert(e.getMessage.contains("another table's root"),
      s"wrong refusal: $e")
    // a full rewrite localizes the carried files under c1's own root
    CowTable.commitFull(CowTable.read(spark, c1).get, c1, 2L, Nil)
    CowTable.shallowClone(spark, c1, c2)
    assert(CowTable.read(spark, c2).get.count() == 25L)
  }
}
