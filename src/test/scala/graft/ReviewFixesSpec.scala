package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{AsOfJoin, ConnectedComponents, Dedup, Skew, SqlRunner}
import graft.sinks.ParquetSink
import graft.sources.TargetTable
import graft.types.SqlTypeMapper

/** Regression pins for the round-1 code-review findings. */
class ReviewFixesSpec extends SparkSpec {
  import spark.implicits._

  test("SqlTypeMapper: DECIMAL(p) defaults scale to 0, bare DECIMAL to (38,18)") {
    assert(SqlTypeMapper.toSpark("decimal(10)") == DecimalType(10, 0))
    assert(SqlTypeMapper.toSpark("decimal") == DecimalType(38, 18))
    assert(SqlTypeMapper.toSpark("numeric(5)") == DecimalType(5, 0))
  }

  test("TargetTable.readOrEmpty reads partitioned targets (not empty)") {
    val dir = Files.createTempDirectory("graft-tt").toString + "/t"
    Seq(("a", "d1", 1L), ("b", "d2", 2L)).toDF("k", "dt", "v")
      .write.partitionBy("dt").parquet(dir)
    val schema = StructType(Seq(StructField("k", StringType)))
    assert(TargetTable.readOrEmpty(spark, dir, schema).count() == 2)
  }

  test("as-of join carries a matched-but-NULL value as NULL, not stale data") {
    val l = Seq(("k", 3L, "probe")).toDF("k", "t", "tag")
    val r = Seq(("k", 1L, Some(10L)), ("k", 2L, None: Option[Long]))
      .toDF("k", "t", "v")
    val out = AsOfJoin.asof(l, r, "k", "t", "t", Seq("v")).select("v").head()
    assert(out.isNullAt(0), s"expected NULL, got ${out.get(0)}")
  }

  test("exact dedup keeps a representative for NULL-key groups") {
    val df = Seq((Some("a"), 1L), (None: Option[String], 2L),
      (None: Option[String], 3L)).toDF("k", "id")
    val out = Dedup.exact(df, col("k"), "id")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    assert(out == Set((Some("a"), 1L), (None, 2L)))
  }

  test("canonicalize works when the id column is literally named 'id'") {
    val docs = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val kept = ConnectedComponents.canonicalize(docs, pairs, "id")
    assert(kept.columns.toSeq == Seq("id", "text"))
    assert(kept.select("id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("static partitioned overwrite removes stale partitions") {
    val dir = Files.createTempDirectory("graft-po").toString + "/t"
    val v1 = Seq(("a", "d1"), ("b", "d2")).toDF("k", "dt")
    ParquetSink(dir, partitionBy = Seq("dt"), dynamicOverwrite = true).write(v1)
    // dynamic overwrite of just d1 keeps d2
    ParquetSink(dir, partitionBy = Seq("dt"), dynamicOverwrite = true)
      .write(Seq(("a2", "d1")).toDF("k", "dt"))
    assert(spark.read.parquet(dir).count() == 2)
    // static overwrite replaces EVERYTHING
    ParquetSink(dir, partitionBy = Seq("dt"), dynamicOverwrite = false)
      .write(Seq(("c", "d3")).toDF("k", "dt"))
    assert(spark.read.parquet(dir).select("dt").as[String].collect().toSeq
      == Seq("d3"))
  }

  test("SqlRunner handles semicolons inside literals and comments") {
    assert(SqlRunner.splitStatements("SELECT 'a;b' AS x") ==
      Seq("SELECT 'a;b' AS x"))
    // line comments are stripped, and their semicolons never split
    assert(SqlRunner.splitStatements("SELECT 1; -- c;mment\nSELECT 2") ==
      Seq("SELECT 1", "SELECT 2"))
    assert(SqlRunner.splitStatements("SELECT 'it''s;fine'; SELECT 2").size == 2)
    val out = SqlRunner.run(spark, "SELECT 'a;b' AS x")
    assert(out.as[String].head() == "a;b")
  }

  test("exact dedup keeps all (key, min-id) ties; replays collapse via distinct") {
    val df = Seq(("k", 1L), ("k", 1L), ("k", 2L)).toDF("key", "id")
    // ties on the winner pair are deliberately all kept (no arbitrary
    // pick among potentially non-identical rows)
    assert(Dedup.exact(df, col("key"), "id").count() == 2)
    // byte-identical replays: distinct() upstream gives exactly one
    assert(Dedup.exact(df.distinct(), col("key"), "id").count() == 1)
  }

  test("tokenCount regex-trims: newline/tab padding adds no phantom tokens") {
    import graft.functions.TextFunctions
    val df = Seq("\n", "\t", "a\n", " a\tb \n").toDF("t")
      .select(TextFunctions.tokenCount(col("t")).as("n"))
    assert(df.as[Int].collect().toSeq == Seq(0, 0, 1, 2))
  }

  test("readOrEmpty fails loudly on corrupt-but-nonempty targets") {
    val dir = Files.createTempDirectory("graft-corrupt").toString + "/t"
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.parquet"), "not parquet at all")
    val schema = StructType(Seq(StructField("k", StringType)))
    // a data file exists → must not silently bootstrap as empty
    intercept[Exception] {
      TargetTable.readOrEmpty(spark, dir, schema).count()
    }
    // but a dir holding only _temporary garbage is a first-run state
    val dir2 = Files.createTempDirectory("graft-tmponly").toString + "/t"
    new java.io.File(s"$dir2/_temporary").mkdirs()
    assert(TargetTable.readOrEmpty(spark, dir2, schema).count() == 0)
  }

  test("SqlRunner skips semicolons inside block comments") {
    assert(SqlRunner.splitStatements("SELECT 1 /* a;b */ FROM t; SELECT 2")
      .size == 2)
  }

  test("extractionSql escapes quotes in the watermark bookmark") {
    import graft.meta.{ColumnDef, TableDef}
    val td = TableDef("db", "s", "t", Seq(ColumnDef("n", "varchar")),
      extractionType = "incremental",
      watermarkColumn = Some("n"), latestWatermark = Some("O'Brien"))
    assert(td.extractionSql().endsWith("WHERE n > 'O''Brien'"))
  }

  test("saltedJoin rejects outer join types") {
    val df = Seq(("a", 1L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, df, "k", joinType = "full_outer")
    }
  }
}
