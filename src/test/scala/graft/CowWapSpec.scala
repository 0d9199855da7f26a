package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sinks.{CowConcurrentCommitException, CowTable}

/** Write-audit-publish on CowTable: staged commits are invisible until
  * published, the audit reads the would-be snapshot, publish is one
  * metadata write under the commit protocol, and a stale stage refuses
  * to publish.
  */
class CowWapSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("cowwap").toString

  private def base = Seq(
    (1L, "p1", "a"), (2L, "p1", "b"), (3L, "p2", "c"))
    .toDF("id", "part", "name")

  test("a staged append is invisible to every reader, auditable via " +
      "readStaged, and publish makes it current with zero data I/O") {
    val root = tmp()
    CowTable.commitFull(base, root, 1L, Seq("part"))
    val batch = Seq((4L, "p2", "d"), (5L, "p3", "e"))
      .toDF("id", "part", "name")
    CowTable.stageAppend(batch, root, 2L, Seq("part"))

    // invisible: current read, history, and committedIds are untouched
    assert(CowTable.read(spark, root).get.count() == 3,
      "staged rows leaked into the current snapshot")
    assert(CowTable.committedIds(spark, root) == Seq(1L))
    assert(CowTable.stagedIds(spark, root) == Seq(2L))
    // auditable: the would-be snapshot holds base + batch
    val staged = CowTable.readStaged(spark, root, 2L)
    assert(staged.count() == 5)

    // publish rewrites NO data file: record batch-2 file mtimes before
    val fs = new Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    def batchFiles() = {
      def walk(p: Path): Seq[(String, Long)] =
        fs.listStatus(p).toSeq.flatMap {
          case d if d.isDirectory => walk(d.getPath)
          case f if f.getPath.getName.endsWith(".parquet") =>
            Seq(f.getPath.toString -> f.getModificationTime)
          case _ => Nil
        }
      walk(new Path(s"$root/batch-2")).toMap
    }
    val before = batchFiles()
    CowTable.publishStaged(spark, root, 2L)
    assert(batchFiles() == before, "publish must not touch data files")
    assert(CowTable.committedIds(spark, root) == Seq(1L, 2L))
    assert(CowTable.stagedIds(spark, root).isEmpty)
    assert(CowTable.read(spark, root).get.count() == 5)
    assert(CowTable.read(spark, root).get.collect().toSet ==
      base.unionByName(batch).collect().toSet)
  }

  test("an audit that rejects discards the stage: batch dir and staged " +
      "manifest are removed, the table never changed") {
    val root = tmp()
    CowTable.commitFull(base, root, 1L, Seq("part"))
    val bad = Seq((4L, "p2", null.asInstanceOf[String]))
      .toDF("id", "part", "name")
    CowTable.stageAppend(bad, root, 2L, Seq("part"))
    val nulls = CowTable.readStaged(spark, root, 2L)
      .where($"name".isNull).count()
    assert(nulls == 1, "audit premise: the staged batch is bad")
    CowTable.discardStaged(spark, root, 2L)
    val fs = new Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    assert(!fs.exists(new Path(s"$root/batch-2")),
      "discard must remove the staged batch dir")
    assert(CowTable.stagedIds(spark, root).isEmpty)
    assert(CowTable.read(spark, root).get.count() == 3)
    // the id is reusable after discard
    val good = Seq((4L, "p2", "d")).toDF("id", "part", "name")
    CowTable.stageAppend(good, root, 2L, Seq("part"))
    CowTable.publishStaged(spark, root, 2L)
    assert(CowTable.read(spark, root).get.count() == 4)
  }

  test("a commit landing between stage and publish makes the stage " +
      "unpublishable (stale carried file list) — publish throws, " +
      "nothing published") {
    val root = tmp()
    CowTable.commitFull(base, root, 1L, Seq("part"))
    CowTable.stageAppend(
      Seq((4L, "p3", "d")).toDF("id", "part", "name"),
      root, 3L, Seq("part"))
    // interloper commits id=2 (same base) before the publish
    CowTable.upsert(spark, root, 2L,
      Seq((1L, "p1", "A!")).toDF("id", "part", "name"),
      Seq("id"), Seq("part"))
    intercept[CowConcurrentCommitException] {
      CowTable.publishStaged(spark, root, 3L)
    }
    assert(CowTable.committedIds(spark, root) == Seq(1L, 2L),
      "failed publish must not appear in history")
    assert(CowTable.read(spark, root).get.count() == 3)
    CowTable.discardStaged(spark, root, 3L)
    assert(CowTable.stagedIds(spark, root).isEmpty)
  }

  test("stage-time gates: CHECK constraints and the evolution gate " +
      "refuse a doomed batch BEFORE the audit") {
    val root = tmp()
    CowTable.commitFull(base, root, 1L, Seq("part"))
    CowTable.setCheckConstraints(spark, root,
      Map("id_positive" -> "id > 0"))
    intercept[Exception] {
      CowTable.stageAppend(
        Seq((-1L, "p1", "x")).toDF("id", "part", "name"),
        root, 2L, Seq("part"))
    }
    assert(CowTable.stagedIds(spark, root).isEmpty)
  }
}
