package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** `FSCK cow.<ref>` as a first-class statement (round-16 verdict #6):
  * the library-call invariant check (`CowTable.fsck`) through
  * `spark.sql`, one report row — clean flag plus the offending
  * missing/orphan/staged/fence lists — over both the named and the
  * path reference forms. Read-only: running it twice changes nothing.
  */
class FsckSqlSpec extends SparkSpec {
  import spark.implicits._

  test("FSCK reports clean on a healthy table, names an orphan file " +
      "after an out-of-band drop-in, and never repairs") {
    val ns = s"fsk${System.nanoTime() % 1000000}"
    spark.sql(s"CREATE NAMESPACE cow.$ns")
    val root = s"${spark.conf.get("spark.sql.catalog.cow.warehouse")}/$ns/t"
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO cow.$ns.t SELECT id, id % 2 FROM range(100)")
    val clean = spark.sql(s"FSCK cow.$ns.t").collect().head
    assert(clean.getBoolean(0) === true, s"healthy table: $clean")
    assert(clean.getSeq[String](1).isEmpty &&
      clean.getSeq[String](2).isEmpty)
    // drop an unreferenced parquet into a batch dir (a crashed
    // writer's leftover) — FSCK must NAME it and must not delete it
    val fs = new Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    val batch = fs.listStatus(new Path(root)).map(_.getPath)
      .filter(_.getName.startsWith("batch-")).head
    val orphan = new Path(batch, "part-orphan.parquet")
    val out = fs.create(orphan, true)
    out.write("not parquet".getBytes("UTF-8")); out.close()
    val rep = spark.sql(s"FSCK cow.$ns.t").collect().head
    assert(!rep.getBoolean(0), s"orphan must flip clean=false: $rep")
    assert(rep.getSeq[String](2).exists(_.endsWith("part-orphan.parquet")),
      s"orphan must be named: $rep")
    assert(fs.exists(orphan), "FSCK is read-only — never repairs")
    // the PATH form addresses the same root; a temp view named `cow`
    // is NOT hijacked (the route gates on the registered catalog)
    val rep2 = spark.sql(s"FSCK cow.`$root`").collect().head
    assert(rep2 == rep, "path and named forms must agree")
    // reads stay correct with the orphan in place (the manifest is
    // the listing; directory garbage is invisible)
    assert(spark.table(s"cow.$ns.t").count() == 100L)
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }

  test("DESCRIBE FILES serves the file-level metadata table from the " +
      "manifest alone — stats triad included, zero data-file opens") {
    val ns = s"dfl${System.nanoTime() % 1000000}"
    spark.sql(s"CREATE NAMESPACE cow.$ns")
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO cow.$ns.t SELECT id, id % 3 FROM range(300)")
    val rows = spark.sql(s"DESCRIBE FILES cow.$ns.t").collect()
    assert(rows.nonEmpty && rows.forall(_.getString(2) == "data"))
    assert(rows.map(_.getLong(3)).sum == 300L,
      "per-file row counts must total the table")
    val mins = rows.map(_.getMap[String, String](5))
    assert(mins.forall(_.contains("id")),
      "min/max envelopes must surface per file")
    // partition rendering is hive-style `c=v`, never the internal
    // control-character partKey encoding
    assert(rows.map(_.getString(1)).distinct.sorted.toSeq ==
      Seq("p=0", "p=1", "p=2"))
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }

  test("FSCK surfaces a missing referenced file loudly") {
    val ns = s"fsm${System.nanoTime() % 1000000}"
    spark.sql(s"CREATE NAMESPACE cow.$ns")
    val root = s"${spark.conf.get("spark.sql.catalog.cow.warehouse")}/$ns/t"
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT)")
    spark.sql(s"INSERT INTO cow.$ns.t SELECT id FROM range(50)")
    val fs = new Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    val victim = graft.sinks.CowTable.currentManifest(spark, root).get
      .files.head.path
    fs.delete(new Path(s"$root/$victim"), false)
    val rep = spark.sql(s"FSCK cow.$ns.t").collect().head
    assert(!rep.getBoolean(0) &&
      rep.getSeq[String](1).contains(victim),
      s"missing referenced file must be reported by path: $rep")
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }
}
