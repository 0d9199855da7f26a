package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.{CowRange, CowTable}

/** [[graft.sinks.CowTable.updateWhere]] — predicate UPDATE as a COW
  * commit: touched partitions rewrite with assignments applied,
  * everything else carries by reference.
  */
class UpdateWhereSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("updw").toString

  private def base = spark.range(1000)
    .select($"id", ($"id" % 4).as("part"),
      concat(lit("n"), $"id").as("name"), ($"id" % 100).as("score"))

  test("only partitions with matches rewrite; assignments apply to " +
      "matching rows only and cast back to the column type") {
    val root = tmp()
    CowTable.commitFull(base, root, 1L, Seq("part"), keep = 10)
    // matches live ONLY in partition 0 (ids ≡ 0 mod 4 with score 96)
    CowTable.updateWhere(spark, root, 2L,
      $"part" === 0L && $"score" === 96L,
      Map("name" -> lit("HIT"), "score" -> lit(1000.5)), keep = 10)
    val m = CowTable.currentManifest(spark, root).get
    val rewritten = m.files.filter(_.path.startsWith("batch-2/"))
    assert(rewritten.nonEmpty && rewritten.forall(
      _.part.get("part").contains("0")),
      "only partition 0 should have rewritten")
    assert(m.files.filter(_.path.startsWith("batch-1/"))
      .forall(!_.part.get("part").contains("0")),
      "partition 0's old file must be superseded")
    val got = CowTable.read(spark, root).get
    // the double literal cast back to the LONG column type (1000)
    assert(got.schema("score").dataType ==
      org.apache.spark.sql.types.LongType)
    val hits = got.where($"name" === "HIT")
      .select("id", "score").as[(Long, Long)].collect().toSeq
    assert(hits.nonEmpty && hits.forall(h =>
      h._1 % 4 == 0 && h._1 % 100 == 96 && h._2 == 1000L), s"$hits")
    // non-matching rows byte-identical
    val want = base.where(!($"part" === 0L && $"score" === 96L))
      .collect().toSet
    assert(got.where($"name" =!= "HIT").collect().toSet == want)
  }

  test("NULL-predicate rows stay untouched (SQL semantics)") {
    val root = tmp()
    val rows = Seq(
      (1L, 0L, "a", Some(5L)), (2L, 0L, "b", None), (3L, 1L, "c", Some(99L)))
      .toDF("id", "part", "name", "score")
    CowTable.commitFull(rows, root, 1L, Seq("part"), keep = 10)
    CowTable.updateWhere(spark, root, 2L, $"score" > 1L,
      Map("name" -> lit("U")), keep = 10)
    val got = CowTable.read(spark, root).get
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "U", 2L -> "b", 3L -> "U"),
      s"NULL-predicate row mishandled: $got")
  }

  test("partition-column assignment refused; no-match is a no-op " +
      "with the id unconsumed; prune hint respected") {
    val root = tmp()
    CowTable.commitFull(base.repartitionByRange(8, $"id"), root, 1L, Nil,
      sortCols = Seq("id"), keep = 10)
    intercept[IllegalArgumentException] {
      CowTable.updateWhere(spark, tmp(), 2L, lit(true),
        Map.empty[String, org.apache.spark.sql.Column])
    }
    val p = tmp()
    CowTable.commitFull(base, p, 1L, Seq("part"), keep = 10)
    intercept[IllegalArgumentException] {
      CowTable.updateWhere(spark, p, 2L, lit(true),
        Map("part" -> lit(9L)))
    }
    CowTable.updateWhere(spark, root, 2L, $"id" === -1L,
      Map("name" -> lit("X")), keep = 10)
    assert(CowTable.committedIds(spark, root) == Seq(1L),
      "no-match update must not commit")
    // prune hint: only files covering the range get scanned/rewritten
    CowTable.updateWhere(spark, root, 3L, $"id" >= 900L,
      Map("name" -> lit("TAIL")),
      prune = Seq(CowRange("id", Some("900"), None)), keep = 10)
    val got = CowTable.read(spark, root).get
      .where($"name" === "TAIL").count()
    assert(got == 100L)
  }

  test("changeLogKeys emits the signed D(old)/I(new) pair sidecar") {
    val root = tmp()
    CowTable.commitFull(base, root, 1L, Seq("part"), keep = 10,
      changeLogKeys = Seq("id"))
    CowTable.updateWhere(spark, root, 2L, $"score" === 7L,
      Map("name" -> lit("S7")), keep = 10, changeLogKeys = Seq("id"))
    val log = CowTable.changeLogFor(spark, root, 2L).get
    val n = base.where($"score" === 7L).count()
    assert(log.where($"oper" === "D").count() == n)
    assert(log.where($"oper" === "I").count() == n)
    assert(log.where($"oper" === "I").select("name").distinct()
      .as[String].collect().toSeq == Seq("S7"))
  }
}
