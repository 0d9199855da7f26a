package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sinks.CowTable

/** Multi-clause MERGE through the partition-granular COW commit. */
class CowMergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("cowmergeinto").toString

  private def base = Seq(
    (1L, "p1", "a", 10L), (2L, "p1", "b", 20L),
    (3L, "p2", "c", 30L), (4L, "p2", "d", 40L),
    (5L, "p3", "e", 50L))
    .toDF("id", "part", "name", "qty")

  private def fileState(root: String): Map[String, Long] = {
    val fs = new Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    def walk(p: Path): Seq[(String, Long)] =
      fs.listStatus(p).toSeq.flatMap {
        case d if d.isDirectory => walk(d.getPath)
        case f if f.getPath.getName.endsWith(".parquet") =>
          Seq(f.getPath.toString -> f.getModificationTime)
        case _ => Nil
      }
    walk(new Path(root)).toMap
  }

  test("matched update/delete + guarded insert rewrite ONLY the " +
      "source's partitions; untouched files keep path and mtime") {
    val root = tmp()
    CowTable.commitFull(base, root, 1L, Seq("part"))
    val before = fileState(root)
    // source touches p1 only: update id=1, delete id=2, insert id=6
    val source = Seq(
      (1L, "p1", "A!", 100L), (2L, "p1", "-", -1L), (6L, "p1", "f", 60L))
      .toDF("id", "part", "name", "qty")
    CowTable.mergeInto(spark, root, 2L, source, Seq("id"), Seq("part"),
      Seq(
        MatchedDelete(condition = Some("s.qty < 0")),
        MatchedUpdate(Map("name" -> "s.name", "qty" -> "t.qty + s.qty")),
        NotMatchedInsert(condition = Some("s.qty >= 0"))))
    val after = fileState(root)
    val untouched = before.filterNot(_._1.contains("__gp_part=p1"))
    untouched.foreach { case (p, m) =>
      assert(after.get(p).contains(m), s"untouched file rewritten: $p") }
    val got = CowTable.read(spark, root).get.collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, "A!", 110L), (3L, "c", 30L), (4L, "d", 40L),
      (5L, "e", 50L), (6L, "f", 60L)))
  }

  test("NOT MATCHED BY SOURCE clauses read and rewrite the whole " +
      "table, and the result matches plain MergeInto") {
    val root = tmp()
    CowTable.commitFull(base, root, 1L, Seq("part"))
    val source = Seq((1L, "p1", "A!", 100L))
      .toDF("id", "part", "name", "qty")
    val clauses = Seq(
      MatchedUpdate(Map("qty" -> "s.qty")),
      NotMatchedBySourceUpdate(Map("name" -> "'STALE'"),
        condition = Some("t.qty >= 40")))
    CowTable.mergeInto(spark, root, 2L, source, Seq("id"), Seq("part"),
      clauses)
    val expect = MergeInto(base, source, Seq("id"), clauses)
      .collect().toSet
    assert(CowTable.read(spark, root).get.collect().toSet == expect)
    assert(CowTable.read(spark, root).get
      .where($"name" === "STALE").count() == 2)
  }

  test("SET assigning a partition column is refused; an explicit-values " +
      "INSERT must assign it (NULLing it would land rows outside their " +
      "bucket)") {
    val root = tmp()
    CowTable.commitFull(base, root, 1L, Seq("part"))
    val source = Seq((1L, "p1", "x", 1L)).toDF("id", "part", "name", "qty")
    intercept[IllegalArgumentException] {
      CowTable.mergeInto(spark, root, 2L, source, Seq("id"), Seq("part"),
        Seq(MatchedUpdate(Map("part" -> "'p9'"))))
    }
    intercept[IllegalArgumentException] {
      CowTable.mergeInto(spark, root, 2L, source, Seq("id"), Seq("part"),
        Seq(NotMatchedInsert(Map("id" -> "s.id", "name" -> "s.name"))))
    }
    // assigning it from the source is the sanctioned form
    CowTable.mergeInto(spark, root, 2L,
      Seq((6L, "p1", "f", 60L)).toDF("id", "part", "name", "qty"),
      Seq("id"), Seq("part"),
      Seq(NotMatchedInsert(Map("id" -> "s.id", "part" -> "s.part",
        "name" -> "s.name", "qty" -> "s.qty"))))
    assert(CowTable.read(spark, root).get.where($"id" === 6L).count() == 1)
  }

  test("first commit: an empty table accepts a MERGE whose inserts " +
      "define the initial snapshot") {
    val root = tmp()
    val source = Seq((1L, "p1", "a", 1L), (2L, "p2", "b", 2L))
      .toDF("id", "part", "name", "qty")
    CowTable.mergeInto(spark, root, 1L, source, Seq("id"), Seq("part"),
      Seq(NotMatchedInsert()))
    assert(CowTable.read(spark, root).get.count() == 2)
  }
}
