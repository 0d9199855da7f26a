package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sinks.{CowRange, CowTable}

/** Round-15 manifest-scalability pins (the round-14 verdict's #1):
  *
  *  - MEMOIZATION: a committed manifest parses (one Spark parquet job)
  *    at most ONCE per JVM — later reads are one directory-listing
  *    fingerprint check. A root deleted and re-created from scratch is
  *    detected by the fingerprint and re-parses.
  *  - DELTA MANIFESTS: delta-shaped commits (appends, partition
  *    rewrites, MOR/DV sidecar adds, metadata-only ALTERs) write
  *    O(Δ) manifest rows referencing their base, never the full entry
  *    list; resolution equals the full list exactly, including cold
  *    (memo-cleared) chain walks.
  *  - CHECKPOINT COMPACTION: vacuum auto-collapses a chain once it
  *    crosses the retention floor by `manifestCheckpointInterval`
  *    links (writing the atomic `_ckpt-<id>` dir), after which the
  *    below-floor manifests AND their exclusive batch dirs reclaim;
  *    explicit [[CowTable.checkpoint]] collapses eagerly.
  */
class DeltaManifestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("deltamanifest").toString

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestRows(root: String, id: Long): Long =
    spark.read.parquet(s"$root/manifest-$id").count()

  private def rows3 = Seq(
    (1L, "p1", 10.0), (2L, "p1", 20.0),
    (3L, "p2", 30.0), (4L, "p2", 40.0),
    (5L, "p3", 50.0)).toDF("id", "part", "score")

  test("one parse per (root, id) per JVM: repeated reads hit the memo; " +
      "a delete-and-recreate of the same root is fingerprint-detected") {
    val root = tmp()
    CowTable.commitFull(rows3, root, 1L, Seq("part"))
    CowTable.upsert(spark, root, 2L,
      Seq((6L, "p1", 60.0)).toDF("id", "part", "score"),
      Seq("id"), Seq("part"))
    val qroot = fs(root).makeQualified(new Path(root)).toString
    CowTable.clearManifestMemoForTest()
    CowTable.manifestParses.remove(qroot)
    (1 to 5).foreach { _ =>
      assert(CowTable.read(spark, root).get.count() == 6)
      assert(CowTable.currentManifest(spark, root).get.id == 2L)
    }
    val parses = CowTable.manifestParses.getOrDefault(qroot, 0L)
    // head (delta) + its base — each exactly once, however many reads
    assert(parses == 2L, s"expected 2 parses (head + base), got $parses")

    // delete + recreate the SAME root with different content and the
    // same ids: the memo must not serve the dead table's manifests
    fs(root).delete(new Path(root), true)
    CowTable.commitFull(
      Seq((7L, "p9", 70.0)).toDF("id", "part", "score"),
      root, 1L, Seq("part"))
    val re = CowTable.read(spark, root).get.collect()
    assert(re.length == 1 && re.head.getLong(0) == 7L,
      "memo served a deleted table's manifest")
  }

  test("delta-shaped commits write O(delta) manifest rows; resolution " +
      "equals the full list, warm and cold") {
    val root = tmp()
    CowTable.commitFull(rows3, root, 1L, Seq("part"), keep = 100)
    // an append adds 1 partition's file: its manifest must be O(1)
    CowTable.commitAppend(
      Seq((6L, "p1", 60.0)).toDF("id", "part", "score"),
      root, 2L, Seq("part"), keep = 100)
    // a partition rewrite touches p2 only
    CowTable.upsert(spark, root, 3L,
      Seq((3L, "p2", 31.0)).toDF("id", "part", "score"),
      Seq("id"), Seq("part"), keep = 100)
    // a DV delete adds one sidecar entry
    assert(CowTable.deleteWhereDv(spark, root, 4L, col("id") === 5L,
      keep = 100))
    // metadata-only ALTERs: pure-schema deltas (sentinel row only)
    assert(CowTable.evolveSchema(spark, root, 5L,
      org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, part STRING, score DOUBLE, note STRING"),
      keep = 100))
    assert(CowTable.reorderColumn(spark, root, 6L, "note", None,
      keep = 100))

    val full = manifestRows(root, 1L)
    assert(full >= 3, s"full manifest should list all files, got $full")
    assert(manifestRows(root, 2L) == 1, "append delta must be O(batch)")
    assert(manifestRows(root, 3L) == 1,
      "partition-rewrite delta must be O(touched)")
    assert(manifestRows(root, 4L) == 1, "DV delta must be O(sidecars)")
    assert(manifestRows(root, 5L) == 1, "schema delta is one sentinel")
    assert(manifestRows(root, 6L) == 1, "reorder delta is one sentinel")
    (2L to 6L).foreach(i => assert(
      fs(root).exists(new Path(root, s"_mbase-$i=${i - 1}")),
      s"delta $i must advertise its base"))

    def contents = CowTable.read(spark, root).get
      .select("note", "id", "part", "score")
      .orderBy("id").collect().toSeq.map(_.toString)
    val warm = contents
    assert(warm.size == 5, s"expected 5 rows, got ${warm.size}") // 6 - 1 DV-deleted
    // COLD chain walk: memo cleared, resolution re-parses the whole
    // chain from disk and must agree exactly
    CowTable.clearManifestMemoForTest()
    assert(contents == warm, "cold chain resolution diverged")
    // schema rode the deltas: note is FIRST, reads as NULL
    val m = CowTable.currentManifest(spark, root).get
    assert(m.schema.fieldNames.head == "note")
    // stats skipping still works across the chain (carried entries
    // kept their envelopes)
    val kept = CowTable.filesFor(spark, root,
      Seq(CowRange("id", Some("6"), Some("6"))))
    assert(kept.nonEmpty && kept.size < m.files.size,
      "carried min/max stats lost through the delta chain")
  }

  test("vacuum auto-collapses a chain past the checkpoint interval: " +
      "below-floor manifests and their exclusive batches reclaim") {
    val root = tmp()
    CowTable.commitFull(rows3, root, 1L, Seq("part"), keep = 1)
    // rewrite p1 repeatedly: each upsert is a delta; with keep=1 the
    // below-floor chain grows by one per commit until the interval
    // (default 8) trips vacuum's auto-checkpoint
    val interval = CowTable.manifestCheckpointInterval
    (2L to (1L + interval)).foreach { i =>
      CowTable.upsert(spark, root, i,
        Seq((2L, "p1", i.toDouble)).toDF("id", "part", "score"),
        Seq("id"), Seq("part"), keep = 1)
    }
    val head = 1L + interval
    assert(CowTable.committedIds(spark, root) == Seq(head),
      "auto-collapse must have pruned the whole below-floor chain")
    assert(fs(root).exists(new Path(root, s"_ckpt-$head/_SUCCESS")),
      "the floor manifest must have been checkpointed")
    // old batches whose partitions were COW'd away are gone; carried
    // partitions' batch-1 files survive (still referenced)
    assert(fs(root).exists(new Path(root, "batch-1")),
      "p2/p3 still live in batch-1")
    (2L until head).foreach(i => assert(
      !fs(root).exists(new Path(root, s"batch-$i")),
      s"batch-$i was COW'd away and must reclaim at collapse"))
    // the checkpointed head serves reads — including cold
    CowTable.clearManifestMemoForTest()
    val got = CowTable.read(spark, root).get.orderBy("id").collect()
    assert(got.length == 5 && got(1).getDouble(2) == head.toDouble)
    // and the NEXT commit deltas against the checkpointed head
    CowTable.upsert(spark, root, head + 1,
      Seq((2L, "p1", 0.5)).toDF("id", "part", "score"),
      Seq("id"), Seq("part"), keep = 1)
    assert(manifestRows(root, head + 1) == 1)
    assert(CowTable.read(spark, root).get.count() == 5)
  }

  test("a fence-retained delta chain stays fully servable: vacuum " +
      "retains every base a retained delta resolves through") {
    val root = tmp()
    CowTable.commitFull(rows3, root, 1L, Seq("part"), keep = 1,
      changeLogKeys = Seq("id"))
    // a lagging stream pins id 1; the writer churns and vacuums hard
    CowTable.registerStreamFrontier(spark, root, "lagger", 1L)
    (2L to 4L).foreach(i => CowTable.upsert(spark, root, i,
      Seq((2L, "p1", i.toDouble)).toDF("id", "part", "score"),
      Seq("id"), Seq("part"), keep = 1, changeLog = true))
    // everything from the fence up is retained AND time-travelable
    assert(CowTable.committedIds(spark, root) == Seq(1L, 2L, 3L, 4L))
    (1L to 4L).foreach { i =>
      val at = CowTable.readAt(spark, root, i).get
        .where(col("id") === 2L).select("score").collect()
      assert(at.head.getDouble(0) == (if (i == 1L) 20.0 else i.toDouble),
        s"snapshot $i unservable under the fence")
    }
    // fence released: explicit checkpoint + vacuum reclaims history
    CowTable.unregisterStreamFrontier(spark, root, "lagger")
    CowTable.checkpoint(spark, root, 4L)
    CowTable.vacuum(spark, root, keep = 1)
    assert(CowTable.committedIds(spark, root) == Seq(4L))
    assert(CowTable.read(spark, root).get.count() == 5)
  }
}
