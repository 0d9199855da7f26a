package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, UpdateTable}
import org.apache.spark.sql.types.StringType

import graft.SparkSpec
import graft.sinks.CowTable

/** The analyzer-DML → text rendering seam (round-13 ADVICE, low):
  * SET/INSERT column names render with embedded backticks DOUBLED —
  * Spark's own identifier quoting — so the de-resolved statement the
  * textual engine re-parses is never corrupted by a backtick-bearing
  * name. Tested at the conversion seam because the engine's stats
  * collection cannot yet materialize a table with such a column.
  */
class DmlRenderSpec extends SparkSpec {
  import spark.implicits._

  test("a SET target whose name contains a backtick renders doubled " +
      "and re-parses to the same name") {
    val root =
      s"${Files.createTempDirectory("render").toString}/t"
    CowTable.commitFull(Seq((1L, "a")).toDF("id", "v"), root, 1L, Nil)
    spark.read.format("cow").load(root).createOrReplaceTempView("rt")
    val rel = spark.sql(
      s"SELECT * FROM cow.`$root`").queryExecution.analyzed
    val named = graft.catalog.CowNamedTable(s"cow.`$root`", root,
      CowTable.currentManifest(spark, root).get, pinned = false)
    // craft an assignment onto a backtick-bearing target name (the
    // analyzer would deliver exactly this shape for a table carrying
    // such a column); the value is a plain literal
    val update = UpdateTable(rel,
      Seq(Assignment(AttributeReference("a`b", StringType)(),
        Literal.create("y", StringType))),
      None)
    val stmt = CowAnalyzedDml.convertUpdate(update, named) match {
      case CowStatementCommand(text) => text
      case other => fail(s"expected CowStatementCommand, got $other")
    }
    assert(stmt.contains("`a``b`"),
      s"embedded backtick must double in the rendered text: $stmt")
    // the rendered statement re-parses as an UPDATE whose SET target
    // is the ORIGINAL name — under the raw s"`$name`" wrap this was
    // either a parse error or a silently different identifier
    val sets = new org.apache.spark.sql.execution.SparkSqlParser()
      .parsePlan(stmt)
      .collectFirst { case u: UpdateTable => u.assignments }
      .getOrElse(fail(s"rendered text is not an UPDATE: $stmt"))
    val names = sets.map(_.key).collect {
      case u: UnresolvedAttribute => u.nameParts.last
    }
    assert(names == Seq("a`b"),
      s"re-parsed SET target lost the backtick: $names in $stmt")
  }
}
