package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.sinks.CowTable

/** Property pin for COLUMN MAPPING: a table that interleaves RENAMEs
  * (and addresses columns by their CURRENT names) must stay
  * OBSERVATIONALLY IDENTICAL — same rows, same values — to a twin
  * that never renames (addressing the ORIGINAL names), across
  * randomized op sequences mixing appends, COW deletes/updates,
  * positional-DV deletes, compaction and the renames themselves.
  * This is the strongest statement the mapping can make: no operation
  * order can make the physical/logical split observable in data.
  */
class PropertyMappingSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(41L + i)))

  private def tmp(): String =
    Files.createTempDirectory("propmap").toString

  // op encoding: each op is (kind, k) — k parameterizes the op
  private val opGen: Gen[(Int, Long)] = for {
    kind <- Gen.chooseNum(0, 4)
    k <- Gen.chooseNum(0L, 5L)
  } yield (kind, k)
  private val seqGen: Gen[List[(Int, Long)]] = Gen.listOfN(8, opGen)

  test("a rename-interleaved op sequence ≡ the never-renamed twin " +
      "(appends, COW/DV deletes, updates, compaction)") {
    for ((ops, ci) <- samples(seqGen, 3).zipWithIndex) {
      val mapped = tmp(); val plain = tmp()
      val base = spark.range(30).select($"id", ($"id" % 3).as("part"),
        ($"id" % 7).as("v0"))
      CowTable.commitFull(base.toDF("id", "part", "v0"), mapped, 1L,
        Seq("part"), keep = 50)
      CowTable.commitFull(base.toDF("id", "part", "v0"), plain, 1L,
        Seq("part"), keep = 50)
      // the mapped table's CURRENT logical name of v0 (renames bump it)
      var gen = 0
      def cur = if (gen == 0) "v0" else s"v$gen"
      var id = 1L
      var appended = 100L
      ops.zipWithIndex.foreach { case ((kind, k), oi) =>
        id += 1
        kind match {
          case 0 => // rename on the mapped table ONLY (metadata-only).
            // The twin takes no commit for this op: ids are explicit
            // and monotone per table, so alignment is not required —
            // only the final CONTENTS are compared.
            assert(CowTable.renameColumn(spark, mapped, id, cur,
              s"v${gen + 1}", keep = 50), s"case $ci op $oi rename")
            gen += 1
          case 1 => // append the same rows to both
            val rows = spark.range(appended, appended + 5)
              .select($"id", ($"id" % 3).as("part"), ($"id" % 7).as("v0"))
            appended += 5
            assert(CowTable.commitAppend(
              rows.toDF("id", "part", cur), mapped, id, Seq("part"),
              keep = 50))
            assert(CowTable.commitAppend(
              rows.toDF("id", "part", "v0"), plain, id, Seq("part"),
              keep = 50))
          case 2 => // COW delete by the value column (current name)
            CowTable.deleteWhere(spark, mapped, id, col(cur) === k,
              keep = 50)
            CowTable.deleteWhere(spark, plain, id, col("v0") === k,
              keep = 50)
          case 3 => // positional-DV delete by id band
            CowTable.deleteWhereDv(spark, mapped, id,
              col("id") % 11 === k, keep = 50)
            CowTable.deleteWhereDv(spark, plain, id,
              col("id") % 11 === k, keep = 50)
          case 4 => // COW update through the current name
            CowTable.updateWhere(spark, mapped, id, col(cur) === k,
              Map(cur -> lit(k + 100L)), keep = 50)
            CowTable.updateWhere(spark, plain, id, col("v0") === k,
              Map("v0" -> lit(k + 100L)), keep = 50)
        }
      }
      // one compaction on each (folds any DV debt through the mapping)
      id += 1
      CowTable.compactPartitions(spark, mapped, id, targetFileBytes = 1L,
        keep = 50)
      CowTable.compactPartitions(spark, plain, id, targetFileBytes = 1L,
        keep = 50)
      val a = CowTable.read(spark, mapped).get
        .select(col("id"), col("part"), col(cur).as("v"))
        .collect().map(_.toString).sorted.toSeq
      val b = CowTable.read(spark, plain).get
        .select(col("id"), col("part"), col("v0").as("v"))
        .collect().map(_.toString).sorted.toSeq
      assert(a == b,
        s"case $ci ops=$ops diverged after ${gen} renames:\n" +
          s"mapped=${a.take(8)}...\nplain=${b.take(8)}...")
      // and the mapped table really is mapped once any rename ran
      if (gen > 0)
        assert(CowTable.currentManifest(spark, mapped).get.mapped)
    }
  }
}
