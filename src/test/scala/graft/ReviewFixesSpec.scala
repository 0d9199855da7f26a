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

  test("saltedJoin rejects outer join types") {
    val df = Seq(("a", 1L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, df, "k", joinType = "full_outer")
    }
  }
}
