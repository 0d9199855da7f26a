package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.{CowSql, CowTable}

/** `replaceWhere` overwrites (catalog/CowCatalog.scala:
  * CowWrites.replaceWhere via `writeTo(…).overwrite(pred)`) and
  * partition-scoped `OPTIMIZE … WHERE` (CowTable.partitionsMatching):
  * matched partitions replaced/compacted, everything else carried by
  * manifest REFERENCE — the file paths prove it.
  */
class CowReplaceWhereSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_rw_$tag").toString

  private def ns(tag: String): String =
    tag + java.util.UUID.randomUUID().toString.replace("-", "").take(8)

  test("writeTo(...).overwrite(range predicate) replaces exactly the " +
      "matching partitions; others carry by reference; out-of-region " +
      "rows are refused") {
    val n = ns("rw")
    spark.sql(s"CREATE NAMESPACE cow.$n")
    spark.range(100)
      .select($"id", ($"id" % 4).cast("int").as("seg"))
      .writeTo(s"cow.$n.t").partitionedBy($"seg").create()
    val before = CowTable.currentManifest(spark,
      rootOf(n, "t")).get.files.map(f => f.part("seg") -> f.path)
    // replace segments >= 2 with a restated slice
    spark.range(200, 210)
      .select($"id", ($"id" % 2 + 2).cast("int").as("seg"))
      .writeTo(s"cow.$n.t").overwrite($"seg" >= 2)
    val after = CowTable.currentManifest(spark, rootOf(n, "t")).get
    val got = spark.table(s"cow.$n.t")
    assert(got.where($"seg" >= 2).count() == 10,
      "matched partitions must hold ONLY the restated rows")
    assert(got.where($"seg" < 2).count() == 50,
      "non-matching partitions must be untouched")
    // carried BY REFERENCE: seg 0/1 files are the same physical paths
    val beforeKept = before.filter(p => p._1 == "0" || p._1 == "1")
      .map(_._2).toSet
    val afterKept = after.files
      .filter(f => f.part("seg") == "0" || f.part("seg") == "1")
      .map(_.path).toSet
    assert(afterKept == beforeKept,
      "non-matching partitions must carry by manifest reference")
    // out-of-region rows: refused loudly, nothing committed
    val head = after.id
    val e = intercept[Exception](spark.range(0, 5)
      .select($"id", lit(0).cast("int").as("seg"))
      .writeTo(s"cow.$n.t").overwrite($"seg" >= 2))
    assert(e.getMessage.contains("OUTSIDE the replaced region"),
      s"wrong refusal: $e")
    assert(CowTable.currentManifest(spark, rootOf(n, "t")).get.id == head)
    // data-column predicate: refused with the remedy
    val e2 = intercept[Exception](spark.range(0, 5)
      .select($"id", lit(2).cast("int").as("seg"))
      .writeTo(s"cow.$n.t").overwrite($"id" > 1000))
    assert(e2.getMessage.contains("partition columns"), s"wrong: $e2")
  }

  test("OPTIMIZE ... WHERE compacts only the matching partitions and " +
      "folds only their delete debt") {
    val root = s"${tmp("optw")}/t"
    val df = spark.range(100)
      .select($"id", ($"id" % 4).cast("int").as("seg"))
    // 3 appends → 3 files per partition
    CowTable.commitFull(df.repartition(1), root, 1L, Seq("seg"), keep = 10)
    CowTable.commitAppend(spark.range(100, 200)
      .select($"id", ($"id" % 4).cast("int").as("seg")).repartition(1),
      root, 2L, Seq("seg"), keep = 10)
    CowTable.commitAppend(spark.range(200, 300)
      .select($"id", ($"id" % 4).cast("int").as("seg")).repartition(1),
      root, 3L, Seq("seg"), keep = 10)
    // DV debt in seg 0 AND seg 3
    require(CowTable.deleteWhereDv(spark, root, 4L,
      $"id" % 4 === 0 && $"id" < 8, keep = 10))
    require(CowTable.deleteWhereDv(spark, root, 5L,
      $"id" % 4 === 3 && $"id" < 8, keep = 10))
    val before = CowTable.currentManifest(spark, root).get
    assert(before.dvs.nonEmpty)
    val expected = CowTable.read(spark, root).get.collect().toSet
    // textual, partition-scoped: seg <= 1 only
    CowSql.execAuto(spark, s"OPTIMIZE cow.`$root` WHERE seg <= 1")
    val m = CowTable.currentManifest(spark, root).get
    val filesPer = m.files.groupBy(f => f.part("seg")).view
      .mapValues(_.size).toMap
    assert(filesPer("0") == 1 && filesPer("1") == 1,
      s"matched partitions must compact to one file: $filesPer")
    assert(filesPer("2") == 3 && filesPer("3") == 3,
      s"non-matching partitions must keep their files: $filesPer")
    assert(m.dvs.map(d => d.part("seg")).toSet == Set("3"),
      "seg 0's DV debt folds with its partition; seg 3's remains")
    assert(CowTable.read(spark, root).get.collect().toSet == expected,
      "OPTIMIZE is content-neutral")
    // scoped ZORDER: seg 2 only — reclusters it, leaves seg 3 alone
    val seg3Before = m.files.filter(_.part("seg") == "3").map(_.path).toSet
    CowSql.execAuto(spark,
      s"OPTIMIZE cow.`$root` WHERE seg = 2 ZORDER BY (id)")
    val m2 = CowTable.currentManifest(spark, root).get
    assert(m2.files.filter(_.part("seg") == "3").map(_.path).toSet ==
      seg3Before, "ZORDER WHERE must not rewrite non-matching partitions")
    assert(m2.files.count(_.part("seg") == "2") == 1)
    assert(CowTable.read(spark, root).get.collect().toSet == expected)
  }

  test("a NULL-evaluating predicate row is OUTSIDE the replaced region " +
      "— refused, not silently merged into an undropped partition") {
    val root = s"${tmp("nullseg")}/t"
    CowTable.commitFull(Seq((1L, Some(2)), (2L, None))
      .toDF("id", "seg"), root, 1L, Seq("seg"), keep = 10)
    val head = CowTable.currentManifest(spark, root).get.id
    val e = intercept[Exception](
      Seq((3L, Some(2)), (4L, Option.empty[Int])).toDF("id", "seg")
        .writeTo(s"cow.`$root`").overwrite($"seg" >= 2))
    assert(e.getMessage.contains("OUTSIDE the replaced region"),
      s"NULL-seg row must be refused: $e")
    assert(CowTable.currentManifest(spark, root).get.id == head,
      "nothing may commit on refusal")
  }

  test("partitionsMatching evaluates TYPED partition values (numeric " +
      "range, not string order)") {
    val root = s"${tmp("typed")}/t"
    // seg values 2 and 10: string order would put "10" < "2"
    CowTable.commitFull(
      Seq((1L, 2), (2L, 10)).toDF("id", "seg"), root, 1L, Seq("seg"),
      keep = 10)
    val m = CowTable.currentManifest(spark, root).get
    assert(CowTable.partitionsMatching(spark, m, col("seg") > 5) ==
      Set("10"), "numeric comparison must see 10 > 5")
  }

  private def rootOf(ns: String, t: String): String =
    s"${spark.conf.get("spark.sql.catalog.cow.warehouse")}/$ns/$t"
}
