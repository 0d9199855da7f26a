package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.CowTable

/** Round-12 ADVICE fixes (applied in round 13):
  *
  *  1. (medium) same-id commit race — covered by `CommitRaceSpec`.
  *  2. (low) CowSql routing is gated on the REGISTERED catalog, not
  *     the literal first identifier `cow`: a CowCatalog registered
  *     under any other name gets the full textual surface, and a
  *     3-part reference whose head is not a registered cow catalog
  *     falls through to Spark's own semantics instead of being
  *     hijacked into a cow-reference error.
  *  3. (low) parameterized `spark.sql(sql, args)` against a cow DML
  *     target refuses loudly up front instead of failing later with
  *     unbound markers or the analyzer's unsupported-v2-DML error.
  */
class AdviceFixesR12Spec extends SparkSpec {
  import spark.implicits._

  test("a CowCatalog registered under a NON-'cow' name gets textual " +
      "DML, maintenance and DESCRIBE HISTORY") {
    val wh = Files.createTempDirectory("cow2wh").toString
    spark.conf.set("spark.sql.catalog.cow2",
      classOf[graft.catalog.CowCatalog].getName)
    spark.conf.set("spark.sql.catalog.cow2.warehouse", wh)
    spark.sql("CREATE NAMESPACE cow2.ns")
    spark.sql("CREATE TABLE cow2.ns.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO cow2.ns.t SELECT id, 'a' FROM range(100)")
    // textual DML routes by REGISTRATION, not by the name 'cow'
    spark.sql("UPDATE cow2.ns.t SET v = 'b' WHERE id < 10")
    spark.sql("DELETE FROM cow2.ns.t WHERE id >= 90")
    assert(spark.table("cow2.ns.t").count() == 90)
    assert(spark.table("cow2.ns.t").where($"v" === "b").count() == 10)
    // ...and the warehouse resolves from THE CATALOG'S OWN conf, so
    // the DML landed on the same root the analyzer serves
    // head advanced once per statement (retention keeps only the last
    // few manifests, so check the id, not the retained count)
    assert(CowTable.committedIds(spark, s"$wh/ns/t").last >= 4L)
    // maintenance + metadata statements under the alternate name
    spark.sql("OPTIMIZE cow2.ns.t ZORDER BY (id)")
    val hist = spark.sql("DESCRIBE HISTORY cow2.ns.t").collect()
    assert(hist.nonEmpty)
    assert(spark.sql("VACUUM cow2.ns.t RETAIN 2 SNAPSHOTS")
      .collect().isEmpty)
  }

  test("a 3-part reference whose head is NOT a registered cow catalog " +
      "keeps Spark's own semantics (no hijack into cow errors)") {
    val e = intercept[Exception](
      spark.sql("UPDATE notacatalog.ns.t SET v = 1"))
    val msg = e.toString
    assert(!msg.contains("warehouse") && !msg.contains("cow "),
      s"non-cow reference was hijacked into the cow executor: $msg")
  }

  test("parameterized SQL against a cow DML target refuses loudly with " +
      "an actionable message; parameterized SELECTs still work") {
    val root = s"${Files.createTempDirectory("parm").toString}/t"
    CowTable.commitFull(Seq((1L, "a")).toDF("id", "v"), root, 1L, Nil)
    val e = intercept[UnsupportedOperationException](
      spark.sql(s"UPDATE cow.`$root` SET v = ? WHERE id = ?",
        Array("x", 1L)))
    assert(e.getMessage.contains("inline the values"),
      s"wrong refusal message: ${e.getMessage}")
    // unparameterized text against the same target still executes
    spark.sql(s"UPDATE cow.`$root` SET v = 'x' WHERE id = 1")
    assert(CowTable.read(spark, root).get.where($"v" === "x").count() == 1)
    // parameter routing for NON-cow statements is untouched
    assert(spark.sql("SELECT ? + 1 AS x", Array(41)).head().getInt(0) == 42)
  }
}
