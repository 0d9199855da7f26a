package graft

import java.util.concurrent.{Callable, Executors, TimeUnit}

import org.apache.spark.sql.functions._

import graft.sinks.{CowTable, CowV2}

/** Vacuum ↔ lazy-walk race (round-18 verdict #6): `entriesFrame`'s
  * chain walk re-reads per-link manifests from disk, and a concurrent
  * vacuum may be checkpointing a delta chain and PRUNING its bases in
  * that very window. The design's safety net is the NonFatal fallback
  * to the eager parse (`prunedManifest` / `snapshotSidecars` /
  * `nonDataEmpty`), which owns chain recovery — this spec pins that a
  * collapsing vacuum racing COLD lazy reads (pruned data entries AND
  * the sidecar slice, on a DV-debt table so both surfaces engage)
  * always converges on correct results, round after round.
  */
class VacuumRaceSpec extends SparkSpec {
  import spark.implicits._

  test("a vacuum collapsing delta chains racing cold lazy pruned and " +
      "sidecar loads converges with correct results every round") {
    val root =
      s"${java.nio.file.Files.createTempDirectory("vrace")}/t"
    // partitioned table WITH DV debt: cold reads then exercise both
    // lazy surfaces — prunedManifest for the data entries and
    // snapshotSidecars for the mask
    CowTable.commitFull(
      spark.range(400).select(($"id" % 4).as("p"), $"id".as("v")),
      root, 1L, Seq("p"), keep = 10)
    require(CowTable.deleteWhereDv(spark, root, 2L, $"v" === 7L,
      keep = 10))
    var expectAll = 399L
    var expectP1 = 100L
    val pool = Executors.newFixedThreadPool(1)
    try {
      (3 to 10).foreach { i =>
        // extend the delta chain by one append (ids 0..9 → +3 in p=1)
        assert(CowTable.commitAppend(
          spark.range(10).select(($"id" % 4).as("p"),
            ($"id" + i * 1000L).as("v")),
          root, i.toLong, Seq("p"), keep = 10))
        expectAll += 10
        expectP1 += 3
        // force the cold path: every memo gone, the walk reads disk
        CowTable.clearManifestMemoForTest()
        CowTable.clearMetaMemoForTest()
        val vac = pool.submit(new Callable[Unit] {
          override def call(): Unit =
            CowTable.vacuum(spark, root, keep = 2, collapse = true)
        })
        val p1 = CowV2.read(spark, root).get.where($"p" === 1L).count()
        val all = CowV2.read(spark, root).get.count()
        vac.get(120, TimeUnit.SECONDS)
        assert(all == expectAll,
          s"round $i: full count $all != $expectAll under vacuum race")
        assert(p1 == expectP1,
          s"round $i: pruned count $p1 != $expectP1 under vacuum race")
      }
      // the chain DID collapse along the way (the race was real): the
      // head resolves and old manifests are gone
      val ids = CowTable.committedIds(spark, root)
      assert(ids.last == 10L && ids.length <= 3,
        s"vacuum must have pruned the chain, kept $ids")
      assert(CowV2.read(spark, root).get.count() == expectAll)
    } finally pool.shutdown()
  }
}
