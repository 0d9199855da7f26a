package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{CsvSource, ParquetSource, TargetTable}
import graft.sinks.ParquetSink
import graft.operators.{Mask, SqlRunner}

class SourcesSinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-test").toString

  test("TargetTable.readOrEmpty: missing path → empty frame with schema") {
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", LongType)))
    val df = TargetTable.readOrEmpty(spark, "/tmp/graft-does-not-exist", schema)
    assert(df.count() == 0 && df.schema == schema)
  }

  test("JsonSource and OrcSource round-trip a typed frame losslessly " +
      "(schema declared for JSON — no inference pass)") {
    val dir = tmp()
    val df = Seq((1L, "a", 10L), (2L, "b", -5L), (3L, "c\"quoted", 0L))
      .toDF("id", "s", "v")
    df.write.json(s"$dir/j")
    df.write.orc(s"$dir/o")
    val schema = df.schema
    val j = graft.sources.JsonSource(s"$dir/j", Some(schema)).read(spark)
    val o = graft.sources.OrcSource(s"$dir/o").read(spark)
    // file reads are nullable; compare names+types
    def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(j.schema) == shape(schema) &&
      shape(o.schema) == shape(schema))
    val want = df.collect().map(_.toSeq).toSet
    assert(j.collect().map(_.toSeq).toSet == want)
    assert(o.collect().map(_.toSeq).toSet == want)
  }

  test("parquet sink append + overwrite modes round-trip") {
    val dir = tmp() + "/t"
    val df = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    ParquetSink(dir, mode = "overwrite").write(df)
    ParquetSink(dir, mode = "append").write(df)
    assert(ParquetSource(dir).read(spark).count() == 4)
    ParquetSink(dir, mode = "overwrite").write(df)
    assert(ParquetSource(dir).read(spark).count() == 2)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = tmp() + "/p"
    val df = Seq(("x", "2024-01-01", 1L), ("y", "2024-01-02", 2L))
      .toDF("k", "dt", "v")
    ParquetSink(dir, mode = "overwrite", partitionBy = Seq("dt")).write(df)
    val scanned = ParquetSource(dir).read(spark).where(col("dt") === "2024-01-01")
    assert(scanned.count() == 1)
    // partition pruning visible in the physical plan
    val plan = scanned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || scanned.inputFiles.length == 1)
  }

  test("TableDef partition keys drive the parquet sink layout and prune " +
      "scans (the reserved partition_on contract, wired)") {
    import graft.meta.{ColumnDef, TableDef}
    val tdef = TableDef("dl", "gosales", "customer_part", Seq(
      ColumnDef("c_custkey", "bigint", isMergeKey = true),
      ColumnDef("c_name", "varchar(40)"),
      ColumnDef("c_mktsegment", "varchar(16)", isPartitionKey = true)))
    val dir = tmp() + "/meta_part"
    val cust = Tables.load(spark, sfDir, "customer")
      .select(tdef.columnNames.map(col): _*)
    ParquetSink.forTable(tdef, dir).write(cust)

    // physical layout: one directory per declared partition-key value
    val segs = cust.select("c_mktsegment").distinct()
      .as[String].collect().toSet
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("c_mktsegment=")).toSet
    assert(dirs == segs.map(s => s"c_mktsegment=$s"))

    // a predicate on the partition key prunes at the file-listing level:
    // the filtered scan touches ONLY that partition's files (strictly
    // fewer than the full table), and the plan carries it as a
    // PartitionFilter, not a post-scan row filter
    val one = segs.head
    val scan = spark.read.parquet(dir).where(col("c_mktsegment") === one)
    assert(scan.count() ==
      cust.where(col("c_mktsegment") === one).count())
    val pruned = scan.queryExecution.executedPlan
      .toString.contains(s"PartitionFilters")
    assert(pruned)
    val filesTouched = scan.queryExecution.executedPlan.collectLeaves()
      .collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }.sum
    val allFiles = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .count(_.getName.endsWith(".parquet"))
    assert(filesTouched < allFiles,
      s"no listing-level pruning: touched $filesTouched of $allFiles")
  }

  test("sorted-layout sink clusters rows for row-group skipping") {
    val dir = tmp() + "/s"
    val df = spark.range(10000).toDF("id")
      .withColumn("k", col("id") * 37 % 10000) // scrambled
    ParquetSink(dir, sortBy = Seq("k")).write(df)
    // each output file covers a disjoint k range (range partitioning)
    val perFile = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .groupBy("f").agg(min("k").as("lo"), max("k").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    perFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ => ()
    }
  }

  test("csv source round-trips header files (all-string like the reference)") {
    val dir = tmp() + "/c"
    Seq(("a", "1"), ("b", "2")).toDF("k", "v")
      .write.option("header", "true").csv(dir)
    val back = CsvSource(dir).read(spark)
    assert(back.schema.fields.forall(_.dataType == StringType))
    assert(back.count() == 2)
  }

  test("SqlRunner substitutes params incl. the env→prefix rule") {
    assert(SqlRunner.substitute("{env_prefix}_raw.{t}/{batch_id}",
      Map("env" -> "prod", "t" -> "x", "batch_id" -> "7")) == "dp_raw.x/7")
    assert(SqlRunner.substitute("{env_prefix}", Map("env" -> "dev")) == "dd")
  }

  test("SqlRunner executes multiple statements, returns the last") {
    Seq((1, "a")).toDF("id", "v").createOrReplaceTempView("sqlrunner_t")
    val out = SqlRunner.run(spark,
      "SELECT 1; SELECT v FROM sqlrunner_t WHERE id = {id}",
      Map("id" -> "1"))
    assert(out.as[String].head() == "a")
  }

  test("Mask: AES round-trip and deterministic join-safe hashing") {
    val key = "0123456789abcdef" // 16-byte AES key
    val df = Seq("secret-1", "secret-2").toDF("v")
    val enc = df.select(Mask.encryptColumn(col("v"), key).as("e"),
      col("v"))
    val dec = enc.select(Mask.decryptColumn(col("e"), key).as("d"), col("v"))
    assert(dec.where(col("d") =!= col("v")).count() == 0)
    // ECB determinism: same plaintext → same ciphertext (joinable)
    val two = Seq("x", "x").toDF("v")
      .select(Mask.encryptColumn(col("v"), key).as("e"))
      .distinct()
    assert(two.count() == 1)
    // sha2 masking stable
    val h = Seq("a").toDF("v")
      .select(Mask.hashColumn(col("v"))).head().getString(0)
    assert(h.length == 64)
  }

  test("TableDef generates extraction SQL with temporal casts + watermark") {
    import graft.meta.{ColumnDef, TableDef}
    val td = TableDef("db", "s", "t",
      Seq(ColumnDef("id", "bigint"), ColumnDef("ts", "datetime")),
      extractionType = "incremental",
      watermarkColumn = Some("ts"), latestWatermark = Some("2024-01-01"))
    assert(td.extractionSql(castTemporalsToChar = true) ==
      "SELECT id, CAST(ts AS CHAR) AS ts FROM s.t WHERE ts > '2024-01-01'")
  }
}
