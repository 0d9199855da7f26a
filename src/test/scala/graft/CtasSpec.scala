package graft

import org.apache.spark.sql.functions._

import graft.sinks.CowTable

/** CTAS-family statements over the cow catalog (round-15 pin): the
  * DSv2 catalog + V1 write fallback already compose into working
  * `CREATE TABLE … AS SELECT` (plain and partitioned),
  * `CREATE OR REPLACE TABLE`, and `REPLACE TABLE … AS SELECT` — this
  * spec pins the composition and the crash-shape: a CTAS is an empty
  * CREATE commit followed by one atomic append commit, so a failure
  * mid-query can leave at worst a visible EMPTY table (never a
  * partial one), and the data commit is the table's ordinary
  * manifest-atomic append.
  */
class CtasSpec extends SparkSpec {
  import spark.implicits._

  private def freshNs(tag: String): String = {
    val ns = s"$tag${System.nanoTime() % 1000000}"
    spark.sql(s"CREATE NAMESPACE cow.$ns")
    ns
  }

  private def rootOf(ns: String, t: String): String =
    s"${spark.conf.get("spark.sql.catalog.cow.warehouse")}/$ns/$t"

  test("CTAS, partitioned CTAS, CREATE OR REPLACE, and RTAS compose " +
      "through the catalog; partitioning and content are exact") {
    val ns = freshNs("ctas")
    spark.sql(s"CREATE TABLE cow.$ns.t1 AS " +
      "SELECT id, id % 3 AS p FROM range(10)")
    assert(spark.table(s"cow.$ns.t1").count() == 10L)
    // partitioned CTAS: the partitioning is real (manifest partCols)
    spark.sql(s"CREATE TABLE cow.$ns.t2 PARTITIONED BY (p) AS " +
      "SELECT id, id % 3 AS p FROM range(12)")
    val m2 = CowTable.currentManifest(spark, rootOf(ns, "t2")).get
    assert(m2.partCols == Seq("p"))
    assert(m2.files.map(_.part("p")).toSet == Set("0", "1", "2"))
    // CTAS onto an existing table refuses; OR REPLACE replaces
    val e = intercept[Exception](spark.sql(
      s"CREATE TABLE cow.$ns.t1 AS SELECT 1 AS x"))
    assert(e.getMessage.toLowerCase.contains("exists"), s"got $e")
    spark.sql(s"CREATE OR REPLACE TABLE cow.$ns.t1 (x BIGINT)")
    assert(spark.table(s"cow.$ns.t1").columns.toSeq == Seq("x"))
    assert(spark.table(s"cow.$ns.t1").count() == 0L)
    // RTAS: full replace with new content and schema
    spark.sql(s"REPLACE TABLE cow.$ns.t2 AS " +
      "SELECT id AS k, concat('v', id) AS v FROM range(4)")
    val got = spark.table(s"cow.$ns.t2").orderBy("k")
      .as[(Long, String)].collect().toSeq
    assert(got == (0L until 4L).map(i => (i, s"v$i")), s"got $got")
    // REPLACE of a missing table refuses (ANSI: REPLACE needs a table)
    val e2 = intercept[Exception](spark.sql(
      s"REPLACE TABLE cow.$ns.absent AS SELECT 1 AS x"))
    assert(e2.getMessage != null)
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }
}
