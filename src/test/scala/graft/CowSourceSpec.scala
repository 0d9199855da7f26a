package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.CowTable

/** `spark.read.format("cow")` — the registered data source over
  * CowTable snapshots ([[graft.sinks.CowSource]]).
  */
class CowSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("cowsrc").toString

  test("format(\"cow\") reads the head snapshot through the planner " +
      "path (pruning intact) and time-travels by snapshot id") {
    val root = tmp()
    CowTable.commitFull(
      spark.range(100).select($"id", ($"id" % 4).as("part"),
        ($"id" % 10).as("v")),
      root, 1L, Seq("part"), keep = 10)
    CowTable.upsert(spark, root, 2L,
      spark.range(100, 120).select($"id", ($"id" % 4).as("part"),
        lit(99L).as("v")),
      Seq("id"), Seq("part"), keep = 10)
    val head = spark.read.format("cow").load(root)
    assert(head.count() == 120)
    // pruning flows exactly as CowV2: partition filter lands in
    // PartitionFilters and the scan reads the CowFileIndex
    val p = head.where($"part" === 2L).queryExecution
      .executedPlan.toString
    assert(p.contains("CowFileIndex"), s"not the manifest index:\n$p")
    val t1 = spark.read.format("cow").option("snapshot", 1L).load(root)
    assert(t1.count() == 100, "snapshot option did not time-travel")
    // timestampMs: anything far in the future resolves to the head
    val tts = spark.read.format("cow")
      .option("timestampMs", System.currentTimeMillis() + 60000L)
      .load(root)
    assert(tts.count() == 120)
  }

  test("df.write.format(\"cow\") commits through the table format: " +
      "overwrite = full snapshot, append = append commit, history " +
      "and time travel intact") {
    val root = tmp()
    spark.range(50).select($"id", ($"id" % 2).as("part"))
      .write.format("cow").mode("overwrite")
      .option("partitionBy", "part").save(root)
    assert(CowTable.committedIds(spark, root) == Seq(1L))
    spark.range(50, 80).select($"id", ($"id" % 2).as("part"))
      .write.format("cow").mode("append").save(root)
    assert(CowTable.committedIds(spark, root) == Seq(1L, 2L))
    assert(spark.read.format("cow").load(root).count() == 80)
    assert(spark.read.format("cow").option("snapshot", 1L).load(root)
      .count() == 50, "write-path commits must time-travel")
    // append must not silently change the table's partitioning
    intercept[IllegalArgumentException] {
      spark.range(3).select($"id", ($"id" % 2).as("part"))
        .write.format("cow").mode("append")
        .option("partitionBy", "id").save(root)
    }
    // ErrorIfExists refuses an existing table
    intercept[IllegalArgumentException] {
      spark.range(3).select($"id", ($"id" % 2).as("part"))
        .write.format("cow").mode("errorifexists").save(root)
    }
  }

  test("a superseded write id fails LOUD instead of silently " +
      "dropping the rows; overwrite may relayout the partitioning") {
    val root = tmp()
    spark.range(10).select($"id", ($"id" % 2).as("part"))
      .write.format("cow").mode("overwrite")
      .option("partitionBy", "part").save(root)
    // explicit stale id: head is 1, asking for 1 again must throw,
    // not silently no-op (the programmatic replay guard's silence is
    // correct for crash replays, wrong for a data-source write)
    val e = intercept[IllegalArgumentException] {
      spark.range(5).select($"id", ($"id" % 2).as("part"))
        .write.format("cow").mode("append").option("id", 1L).save(root)
    }
    assert(e.getMessage.contains("not ahead of committed head"),
      e.getMessage)
    assert(spark.read.format("cow").load(root).count() == 10)
    // overwrite relayouts: commitFull is the repartitionTable mechanism
    spark.range(10).select($"id", ($"id" % 3).as("grp"),
      ($"id" % 2).as("part"))
      .write.format("cow").mode("overwrite")
      .option("partitionBy", "grp").save(root)
    assert(CowTable.currentManifest(spark, root).get.partCols ==
      Seq("grp"), "overwrite did not relayout")
  }

  test("an unfolded MOR table refuses loudly with fold guidance; " +
      "folding makes it servable") {
    val root = tmp()
    CowTable.commitFull(
      spark.range(10).select($"id", ($"id" % 2).as("part")),
      root, 1L, Seq("part"), keep = 10)
    CowTable.deleteKeysMor(spark, root, 2L,
      Seq((3L, 1L)).toDF("id", "part"), Seq("id"), Seq("part"),
      keep = 10)
    val e = intercept[IllegalArgumentException] {
      spark.read.format("cow").load(root).count()
    }
    assert(e.getMessage.contains("foldTombstones"),
      s"wrong failure: ${e.getMessage}")
    CowTable.foldTombstones(spark, root, 3L, keep = 10)
    assert(spark.read.format("cow").load(root).count() == 9)
  }
}
