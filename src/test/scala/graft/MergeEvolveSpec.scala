package graft

import org.apache.spark.sql.functions._

import graft.sinks.CowTable

/** `MERGE WITH SCHEMA EVOLUTION` (round-13 verdict #5): the
  * AUTOMATIC_SCHEMA_EVOLUTION capability lets Spark's own
  * ResolveMergeIntoSchemaEvolution compute the add-only column set
  * from the source and apply it through CowCatalog.alterTable —
  * metadata-only (zero data files rewritten; carried rows read the
  * new columns as NULL) — before the merge resolves against the
  * evolved schema, all in ONE statement.
  */
class MergeEvolveSpec extends SparkSpec {
  import spark.implicits._

  private def freshNs(tag: String): String = {
    val ns = s"$tag${System.nanoTime() % 1000000}"
    spark.sql(s"CREATE NAMESPACE cow.$ns")
    ns
  }

  private def rootOf(ns: String, t: String): String =
    s"${spark.conf.get("spark.sql.catalog.cow.warehouse")}/$ns/$t"

  test("MERGE WITH SCHEMA EVOLUTION lands a new source column as a " +
      "metadata-only ALTER + merge in one statement; carried rows " +
      "read NULL") {
    val ns = freshNs("mev")
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO cow.$ns.t SELECT id, 'a' FROM range(6)")
    val root = rootOf(ns, "t")
    val dataPathsBefore = CowTable.currentManifest(spark, root).get
      .files.map(_.path).toSet
    Seq((2L, "b", 20L), (100L, "new", 1000L))
      .toDF("id", "v", "w").createOrReplaceTempView("mev_src")
    spark.sql(s"""
      MERGE WITH SCHEMA EVOLUTION INTO cow.$ns.t AS t
      USING mev_src AS s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val t = spark.table(s"cow.$ns.t")
    assert(t.columns.toSeq == Seq("id", "v", "w"),
      s"schema must evolve to include w, got ${t.columns.toSeq}")
    // matched row updated with the new column; inserted row carries it
    assert(t.where($"id" === 2L).select("v", "w").as[(String, Long)]
      .head() == (("b", 20L)))
    assert(t.where($"id" === 100L).select("w").as[Long].head() == 1000L)
    // untouched rows read the evolved column as NULL
    assert(t.where($"id" === 1L).select("w").isEmpty === false)
    assert(t.where($"w".isNull).count() == 5L,
      "carried rows must read the evolved column as NULL")
    // the ALTER leg was metadata-only: every pre-merge data file either
    // carried or was rewritten BY THE MERGE (only the matched row's
    // partition — unpartitioned table = one rewrite); the evolution
    // itself added a snapshot with the SAME file set
    val ids = CowTable.committedIds(spark, root)
    val alterM = CowTable.manifest(spark, root, ids(ids.size - 2))
    assert(alterM.files.map(_.path).toSet == dataPathsBefore,
      "the evolution snapshot must reference the same data files " +
        "(metadata-only ALTER)")
    assert(alterM.schema.fieldNames.toSeq == Seq("id", "v", "w"))
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }

  test("plain MERGE (no evolution clause) still refuses a source " +
      "column the target lacks via SET * validation") {
    val ns = freshNs("mev2")
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO cow.$ns.t SELECT id, 'a' FROM range(3)")
    Seq((1L, "b", 9L)).toDF("id", "v", "w")
      .createOrReplaceTempView("mev2_src")
    // without WITH SCHEMA EVOLUTION the statement must not silently
    // add w: either the analyzer refuses the unknown column or the
    // merge executes WITHOUT it — the schema must stay (id, v)
    scala.util.Try(spark.sql(s"""
      MERGE INTO cow.$ns.t AS t USING mev2_src AS s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *"""))
    assert(spark.table(s"cow.$ns.t").columns.toSeq == Seq("id", "v"),
      "plain MERGE must never evolve the schema")
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }
}
