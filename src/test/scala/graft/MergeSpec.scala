package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.meta.{ColumnDef, TableDef}
import graft.operators.Merge
import graft.sinks.ParquetSink

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def dim = Seq(
    (1L, "alpha", "NA"),
    (2L, "beta", "EU"),
    (3L, "gamma", "APAC"))
    .toDF("id", "name", "region")

  test("SCD-1 merge: matched rows replaced, unmatched inserted, " +
      "untouched rows survive") {
    val updates = Seq(
      (2L, "beta-renamed", "NA"), // update
      (4L, "delta", "EU")) // insert
      .toDF("id", "name", "region")
    val out = Merge.upsert(dim, updates, Seq("id"))
      .orderBy("id").as[(Long, String, String)].collect().toSeq
    assert(out == Seq(
      (1L, "alpha", "NA"),
      (2L, "beta-renamed", "NA"),
      (3L, "gamma", "APAC"),
      (4L, "delta", "EU")))
  }

  test("an update that sets a column to NULL sticks (row replacement, " +
      "not per-column coalesce)") {
    val updates = Seq((2L, Option.empty[String], Option("EU")))
      .toDF("id", "name", "region")
    val out = Merge.upsert(dim, updates, Seq("id"))
      .where($"id" === 2L).as[(Long, Option[String], String)]
      .collect().toSeq
    assert(out == Seq((2L, None, "EU")))
  }

  test("newest version wins; equal versions collapse by the " +
      "deterministic tiebreak") {
    val updates = Seq(
      (2L, "v1-name", "EU", 1L),
      (2L, "v2-name", "EU", 2L), // newest wins
      (3L, "tie-b", "APAC", 5L),
      (3L, "tie-a", "APAC", 5L)) // tie → lexicographically smallest name
      .toDF("id", "name", "region", "ver")
    val out = Merge.upsert(dim, updates, Seq("id"), versionCol = Some("ver"))
      .where($"id".isin(2L, 3L)).orderBy("id")
      .as[(Long, String, String)].collect().toSeq
    assert(out == Seq((2L, "v2-name", "EU"), (3L, "tie-a", "APAC")))
    // output schema is exactly the target's — the version column is gone
    assert(Merge.upsert(dim, updates, Seq("id"), Some("ver"))
      .columns.toSeq == Seq("id", "name", "region"))
  }

  test("NULL-merge-key update rows all insert as unmatched rows — " +
      "the newest-wins collapse never groups them") {
    val updates = Seq(
      (Option.empty[Long], Option("n1"), Option("NA")),
      (Option.empty[Long], Option("n2"), Option("EU")),
      (Option(2L), Option("beta2"), Option("EU")))
      .toDF("id", "name", "region")
    val out = Merge.upsert(dim, updates, Seq("id"))
      .as[(Option[Long], Option[String], Option[String])].collect().toSet
    assert(out == Set(
      (Some(1L), Some("alpha"), Some("NA")),
      (Some(2L), Some("beta2"), Some("EU")),
      (Some(3L), Some("gamma"), Some("APAC")),
      (None, Some("n1"), Some("NA")),
      (None, Some("n2"), Some("EU"))))
  }

  test("merge keys from metadata (merge_column contract) + idempotent " +
      "double-upsert through the parquet sink") {
    val tdef = TableDef("dl", "gosales", "region_dim", Seq(
      ColumnDef("id", "bigint", isMergeKey = true),
      ColumnDef("name", "varchar(40)"),
      ColumnDef("region", "varchar(10)")))
    val root = Files.createTempDirectory("graft-merge").toString
    ParquetSink(s"$root/dim").write(dim)

    val updates = Seq(
      (1L, "alpha-2", "NA"),
      (5L, "epsilon", "LATAM"))
      .toDF("id", "name", "region")

    def applyBatch(): Unit = {
      val current = spark.read.parquet(s"$root/dim")
      val merged = Merge.upsertFor(current, updates, tdef)
      // full refresh through a staging path: the source of the write is
      // the table being overwritten, so materialize first (the classic
      // read-merge-overwrite cycle a lakehouse MERGE INTO hides)
      ParquetSink(s"$root/dim_stage").write(merged)
      ParquetSink(s"$root/dim").write(spark.read.parquet(s"$root/dim_stage"))
    }

    applyBatch()
    val after1 = spark.read.parquet(s"$root/dim").orderBy("id")
      .as[(Long, String, String)].collect().toSeq
    assert(after1 == Seq(
      (1L, "alpha-2", "NA"),
      (2L, "beta", "EU"),
      (3L, "gamma", "APAC"),
      (5L, "epsilon", "LATAM")))

    // idempotence: re-applying the same batch changes nothing
    applyBatch()
    val after2 = spark.read.parquet(s"$root/dim").orderBy("id")
      .as[(Long, String, String)].collect().toSeq
    assert(after2 == after1)
  }

  test("schema evolution: update-only columns join the schema, " +
      "target-only columns survive matched updates") {
    val updates = Seq(
      (2L, "beta2", 42L), // matched: region survives, score arrives
      (4L, "delta", 7L)) // insert: region NULL, score set
      .toDF("id", "name", "score") // no region; NEW col score
    val out = Merge.upsertEvolve(dim, updates, Seq("id"))
    assert(out.columns.toSeq == Seq("id", "name", "region", "score"))
    val rows = out.orderBy("id")
      .as[(Long, String, Option[String], Option[Long])].collect().toSeq
    assert(rows == Seq(
      (1L, "alpha", Some("NA"), None), // untouched: new col NULL
      (2L, "beta2", Some("EU"), Some(42L)), // region KEPT, not nulled
      (3L, "gamma", Some("APAC"), None),
      (4L, "delta", None, Some(7L))))
    // strict upsert refuses the same partial batch loudly
    intercept[IllegalArgumentException] {
      Merge.upsert(dim, updates, Seq("id"))
    }
  }

  test("schema evolution composes with the snapshot target: the table " +
      "grows a column at a snapshot boundary") {
    val dir = Files.createTempDirectory("graft-evolve").toString
    val root = s"$dir/t"
    graft.streaming.StreamOps.upsertBatch(
      dim, 0L, root, Seq("id"), evolveSchema = true)
    graft.streaming.StreamOps.upsertBatch(
      Seq((2L, "beta2", 9L)).toDF("id", "name", "score"),
      1L, root, Seq("id"), evolveSchema = true)
    val out = graft.sinks.SnapshotTarget.read(spark, root).get
    assert(out.columns.toSeq == Seq("id", "name", "region", "score"))
    assert(out.where($"id" === 2L)
      .select("name", "region", "score")
      .as[(String, String, Option[Long])].head() == (("beta2", "EU", Some(9L))))
    assert(out.where($"id" === 1L).select("score")
      .as[Option[Long]].head().isEmpty)
  }

  test("updates side shuffles once: dedup window and join share the " +
      "merge-key partitioning") {
    val updates = Seq((2L, "x", "EU", 1L)).toDF("id", "name", "region", "ver")
    val plan = Merge.upsert(dim, updates, Seq("id"), Some("ver"))
      .queryExecution.executedPlan.toString
    // exactly 2 shuffles total (target side + updates side), not 3 —
    // a second exchange on the updates side would mean the window's
    // partitioning wasn't reused by the full-outer join
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$plan")
  }
}
