package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sinks.CowTable

/** Textual constraint DDL over named cow tables — Spark 4's
  * `ALTER TABLE … ADD/DROP CONSTRAINT` (TableChange.AddConstraint /
  * DropConstraint, unlocked by the catalog's SUPPORT_TABLE_CONSTRAINT
  * capability) mapped onto [[CowTable.setCheckConstraints]]: ADD
  * validates the CURRENT data in one scan and every later commit
  * enforces; DROP is O(1) (a shrunk set cannot invalidate data);
  * non-CHECK constraints and NOT ENFORCED claims refuse loudly.
  */
class CowConstraintDdlSpec extends SparkSpec {

  private val ns = s"cst${System.nanoTime() % 1000000}"

  private def sql(s: String): DataFrame = spark.sql(s)

  private def root(table: String): String =
    s"${spark.conf.get("spark.sql.catalog.cow.warehouse")}/$ns/$table"

  test("ADD CONSTRAINT CHECK registers + every later commit enforces " +
      "(INSERT and textual UPDATE both refuse violating data, state " +
      "untouched); existing data refuses a false constraint") {
    sql(s"CREATE NAMESPACE cow.$ns")
    sql(s"CREATE TABLE cow.$ns.t (id BIGINT, p STRING, v BIGINT) " +
      "PARTITIONED BY (p)")
    sql(s"INSERT INTO cow.$ns.t SELECT id, concat('p', id % 2), id " +
      "FROM range(100)")
    sql(s"ALTER TABLE cow.$ns.t ADD CONSTRAINT v_nonneg CHECK (v >= 0)")
    assert(CowTable.checkConstraints(spark, root("t")) ==
      Map("v_nonneg" -> "v >= 0"))
    // constraint registration commits NO manifest (it is not data)
    assert(CowTable.currentManifest(spark, root("t")).get.id == 2)
    // a violating INSERT fails loud and lands nothing
    intercept[Exception] {
      sql(s"INSERT INTO cow.$ns.t VALUES (1000, 'p0', -5)") }
    assert(spark.table(s"cow.$ns.t").count() == 100)
    // a violating textual UPDATE fails loud and lands nothing
    intercept[Exception] {
      sql(s"UPDATE cow.$ns.t SET v = -1 WHERE id < 10") }
    assert(spark.table(s"cow.$ns.t").where(col("v") < 0).isEmpty)
    // a conforming UPDATE passes under the registered constraint
    sql(s"UPDATE cow.$ns.t SET v = v + 1 WHERE id < 10")
    assert(spark.table(s"cow.$ns.t").agg(sum("v")).head().getLong(0) ==
      (0L until 100L).sum + 10)
    // ADD validates existing data: a constraint the table already
    // breaks refuses at DDL time, and is NOT registered
    intercept[Exception] {
      sql(s"ALTER TABLE cow.$ns.t ADD CONSTRAINT v_small CHECK (v < 50)") }
    assert(CowTable.checkConstraints(spark, root("t")).keySet ==
      Set("v_nonneg"))
    // duplicate name refuses
    intercept[Exception] {
      sql(s"ALTER TABLE cow.$ns.t ADD CONSTRAINT v_nonneg CHECK (v >= 0)") }
  }

  test("CREATE TABLE … CHECK registers the constraint ATOMICALLY with " +
      "table creation: a violating FIRST insert fails loudly; non-CHECK " +
      "constraints refuse with nothing created") {
    sql(s"CREATE NAMESPACE cow.${ns}c")
    sql(s"CREATE TABLE cow.${ns}c.t (id BIGINT, v BIGINT, " +
      "CONSTRAINT v_pos CHECK (v > 0))")
    val r = s"${spark.conf.get("spark.sql.catalog.cow.warehouse")}/${ns}c/t"
    assert(CowTable.checkConstraints(spark, r) == Map("v_pos" -> "v > 0"))
    // the very first INSERT is already bound by the constraint
    val e = intercept[Exception] {
      sql(s"INSERT INTO cow.${ns}c.t VALUES (1, 0)") }
    assert(e.toString.contains("v_pos"),
      s"violating first INSERT did not name the constraint: $e")
    assert(spark.table(s"cow.${ns}c.t").count() == 0)
    sql(s"INSERT INTO cow.${ns}c.t VALUES (1, 5)")
    assert(spark.table(s"cow.${ns}c.t").count() == 1)
    // a PRIMARY KEY claim refuses loudly and creates NOTHING — the
    // engine cannot enforce it without a global index
    intercept[Exception] {
      sql(s"CREATE TABLE cow.${ns}c.pk (id BIGINT, " +
        "CONSTRAINT pk PRIMARY KEY (id))") }
    assert(!spark.catalog.tableExists(s"cow.${ns}c.pk"))
    // NOT ENFORCED is a lie to downstream readers — refused
    intercept[Exception] {
      sql(s"CREATE TABLE cow.${ns}c.ne (id BIGINT, " +
        "CONSTRAINT c CHECK (id > 0) NOT ENFORCED)") }
    assert(!spark.catalog.tableExists(s"cow.${ns}c.ne"))
  }

  test("DROP CONSTRAINT retires enforcement; IF EXISTS semantics; " +
      "non-CHECK and NOT ENFORCED constraints refuse loudly") {
    sql(s"ALTER TABLE cow.$ns.t DROP CONSTRAINT v_nonneg")
    assert(CowTable.checkConstraints(spark, root("t")).isEmpty)
    sql(s"INSERT INTO cow.$ns.t VALUES (1000, 'p0', -5)") // now legal
    assert(spark.table(s"cow.$ns.t").where(col("v") < 0).count() == 1)
    intercept[Exception] {
      sql(s"ALTER TABLE cow.$ns.t DROP CONSTRAINT no_such") }
    sql(s"ALTER TABLE cow.$ns.t DROP CONSTRAINT IF EXISTS no_such") // ok
    // PRIMARY KEY would be an unenforceable claim — refused
    intercept[Exception] {
      sql(s"ALTER TABLE cow.$ns.t ADD CONSTRAINT pk PRIMARY KEY (id)") }
    // NOT ENFORCED CHECK: we refuse to register a lie
    intercept[Exception] { sql(s"ALTER TABLE cow.$ns.t " +
      "ADD CONSTRAINT c2 CHECK (v > -100) NOT ENFORCED") }
    assert(CowTable.checkConstraints(spark, root("t")).isEmpty)
    sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }
}
