package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.IncrementalIngest
import graft.sinks.CsvSink
import graft.types.SqlTypeMapper
import org.apache.spark.sql.types._

class CatalogAndIncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("catalog sinks: saveAsTable overwrite + INSERT INTO append (S10/S11)") {
    // warehouse dir is set to /tmp in GraftSession (static conf)
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").saveAsTable("graft_tbl")
    // S11: INSERT INTO … SELECT (append semantics)
    spark.sql("INSERT INTO graft_tbl SELECT 3L, 'c'")
    assert(spark.table("graft_tbl").count() == 3)
    // S10: truncate+insert == INSERT OVERWRITE
    spark.sql("INSERT OVERWRITE graft_tbl SELECT 9L, 'z'")
    assert(spark.table("graft_tbl").as[(Long, String)].collect().toSeq
      == Seq((9L, "z")))
    spark.sql("DROP TABLE graft_tbl")
  }

  test("bucketed tables join without an exchange on the join key") {
    // bucketing co-locates both sides on the key at WRITE time — the
    // 100 TB recipe for repeated large-fact joins with no per-query
    // shuffle.
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")
    try {
      val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("li_bucketed")
          .join(spark.table("o_bucketed"),
            col("l_orderkey") === col("o_orderkey"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
        assert(joined.count() == li.count())
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("CsvSink writes header CSV that round-trips") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/out"
    CsvSink(dir).write(Seq(("x", 1L)).toDF("k", "v"))
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.columns.toSeq == Seq("k", "v") && back.count() == 1)
  }

  test("incremental ingest: bookmark advances and re-pull yields nothing") {
    val src = Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-03"))
      .toDF("id", "wm")
    val first = IncrementalIngest.pull(src, "wm", None)
    assert(first.fresh.count() == 3)
    assert(first.nextWatermark.contains("2024-01-03"))

    val second = IncrementalIngest.pull(src, "wm", first.nextWatermark)
    assert(second.fresh.count() == 0)
    assert(second.nextWatermark.contains("2024-01-03")) // bookmark kept

    val grown = src.union(Seq((4L, "2024-01-04")).toDF("id", "wm"))
    val third = IncrementalIngest.pull(grown, "wm", second.nextWatermark)
    assert(third.fresh.select("id").as[Long].collect().toSeq == Seq(4L))
    assert(third.nextWatermark.contains("2024-01-04"))
  }

  test("incremental predicate reaches the parquet scan (pushdown)") {
    val dir = Files.createTempDirectory("graft-inc").toString + "/t"
    Seq((1L, "2024-01-01"), (2L, "2024-01-05")).toDF("id", "wm")
      .write.parquet(dir)
    val scan = IncrementalIngest.selectNew(
      spark.read.parquet(dir), "wm", Some("2024-01-02"))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(wm), GreaterThan(wm,2024-01-02)]"),
      plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    assert(scan.count() == 1)
  }

  test("SqlTypeMapper: legacy vs strict modes match the reference tables") {
    assert(SqlTypeMapper.toSpark("decimal(10,2)") == DecimalType(10, 2))
    assert(SqlTypeMapper.toSpark("decimal(10,2)", legacy = true) == DoubleType)
    assert(SqlTypeMapper.toSpark("datetime") == TimestampType)
    assert(SqlTypeMapper.toSpark("datetime", legacy = true) == StringType)
    assert(SqlTypeMapper.toSpark("bigint") == LongType)
    assert(SqlTypeMapper.toSpark("bit") == IntegerType)
    assert(SqlTypeMapper.toSpark("no_such_type") == StringType) // fallback
    assert(SqlTypeMapper.toStruct(Seq("a" -> "int", "b" -> "text")) ==
      StructType(Seq(StructField("a", IntegerType), StructField("b", StringType))))
  }
}
