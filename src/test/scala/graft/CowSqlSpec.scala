package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.{CowSql, CowTable}

/** [[graft.sinks.CowSql]] — ANSI DML text executed against CowTable
  * paths via Spark's own parser.
  */
class CowSqlSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("cowsql").toString

  private def mk(root: String): Unit =
    CowTable.commitFull(
      spark.range(100).select($"id", ($"id" % 4).as("pb"),
        concat(lit("n"), $"id").as("name"), ($"id" % 10).as("score")),
      root, 1L, Seq("pb"), keep = 10)

  test("DELETE FROM cow.`path` WHERE …") {
    val root = tmp(); mk(root)
    CowSql.exec(spark, 2L,
      s"DELETE FROM cow.`$root` WHERE score >= 8 OR id = 0")
    val got = CowTable.read(spark, root).get
      .select("id").as[Long].collect().sorted.toSeq
    val want = (1L until 100L).filter(_ % 10 < 8).toSeq
    assert(got == want)
  }

  test("UPDATE cow.`path` SET … WHERE … with expressions over the row") {
    val root = tmp(); mk(root)
    CowSql.exec(spark, 2L,
      s"UPDATE cow.`$root` SET name = concat('U-', id), " +
        "score = score + 100 WHERE score < 2")
    val got = CowTable.read(spark, root).get
    assert(got.where($"score" >= 100L).count() ==
      (0L until 100L).count(_ % 10 < 2))
    val one = got.where($"id" === 11L)
      .select("name", "score").as[(String, Long)].collect().head
    assert(one == ("U-11", 101L))
    assert(got.where($"id" === 5L).select("name").as[String]
      .collect().head == "n5", "non-matching row mutated")
  }

  test("MERGE INTO cow.`path` AS t USING view AS s — conditional " +
      "update, star insert, by-source delete") {
    val root = tmp(); mk(root)
    spark.range(90, 110)
      .select($"id", ($"id" % 4).as("pb"),
        concat(lit("src"), $"id").as("name"), lit(55L).as("score"))
      .createOrReplaceTempView("merge_src")
    CowSql.exec(spark, 2L, s"""
      MERGE INTO cow.`$root` AS t USING merge_src AS s
      ON t.id = s.id AND t.pb = s.pb
      WHEN MATCHED AND t.score < 5 THEN UPDATE SET name = s.name
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE AND t.id < 3 THEN DELETE""")
    val got = CowTable.read(spark, root).get
    // inserts: 100-109 arrived with source names
    assert(got.where($"id" >= 100L).count() == 10)
    // conditional matched update: ids 90..99 with score%10 < 5 renamed
    val renamed = got.where($"id".between(90L, 99L) &&
      $"name".startsWith("src")).select("id").as[Long]
      .collect().sorted.toSeq
    assert(renamed == (90L until 100L).filter(_ % 10 < 5).toSeq,
      s"conditional UPDATE wrong: $renamed")
    // by-source delete: ids 0-2 gone, 3+ intact
    assert(got.where($"id" < 3L).count() == 0)
    assert(got.where($"id" === 3L).count() == 1)
  }

  test("OPTIMIZE / VACUUM / RESTORE textual forms") {
    val root = tmp(); mk(root)
    CowSql.exec(spark, 2L,
      s"UPDATE cow.`$root` SET name = 'x' WHERE id < 10")
    // restore back to snapshot 1 (allocates its own commit id)
    CowSql.exec(spark, 0L, s"RESTORE cow.`$root` TO SNAPSHOT 1")
    assert(CowTable.read(spark, root).get
      .where($"name" === "x").count() == 0, "restore did not roll back")
    CowSql.exec(spark, 9L,
      s"OPTIMIZE cow.`$root` ZORDER BY (id, score)")
    assert(CowTable.read(spark, root).get.count() == 100,
      "optimize changed content")
    CowSql.exec(spark, 0L, s"VACUUM cow.`$root` RETAIN 2 SNAPSHOTS")
    assert(CowTable.committedIds(spark, root).size == 2,
      "vacuum did not prune to the retained window")
    // time-based retention: everything published in the last hour is
    // fresh, so nothing below minKeep vacuums
    CowSql.exec(spark, 0L, s"VACUUM cow.`$root` RETAIN 1 HOURS")
    assert(CowTable.committedIds(spark, root).size == 2,
      "hour-based vacuum pruned fresh snapshots")
  }

  test("UPDATE SET * with a source missing a target column fails " +
      "loud instead of leaving the column silently stale") {
    val root = tmp(); mk(root)
    spark.range(5).select($"id", ($"id" % 4).as("pb"),
      concat(lit("z"), $"id").as("name")) // no `score` column
      .createOrReplaceTempView("star_src_missing")
    val e = intercept[IllegalArgumentException] {
      CowSql.exec(spark, 2L, s"""
        MERGE INTO cow.`$root` AS t USING star_src_missing AS s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET *""")
    }
    assert(e.getMessage.contains("score"), s"got: ${e.getMessage}")
  }

  test("unsupported statements and non-cow references fail loud") {
    intercept[IllegalArgumentException] {
      CowSql.exec(spark, 9L, "SELECT 1")
    }
    intercept[IllegalArgumentException] {
      CowSql.exec(spark, 9L, "DELETE FROM plain_table WHERE x = 1")
    }
  }
}
