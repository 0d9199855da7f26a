package graft.sinks

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}

/** `spark.read.format("cow")` — the table format as a REGISTERED Spark
  * data source, so reading a CowTable needs no graft import at all:
  *
  * {{{
  * spark.read.format("cow").load("/data/events")              // head
  * spark.read.format("cow").option("snapshot", 7).load(p)     // as-of id
  * spark.read.format("cow").option("timestampMs", t).load(p)  // as-of time
  * }}}
  *
  * Resolution goes through [[CowV2]]'s planner-integrated relation
  * ([[CowFileIndex]]): partition pruning (static + dynamic), manifest
  * envelope/Bloom/null-count skipping, declared bucketing and manifest
  * statistics all apply exactly as with `CowV2.read`. Registered via
  * `META-INF/services/org.apache.spark.sql.sources.DataSourceProvider`
  * -discovery (`DataSourceRegister`), the same mechanism every
  * built-in format uses.
  *
  * `snapshot` wins over `timestampMs` when both are set; a missing
  * table or unservable snapshot fails loud (same contracts as the
  * programmatic readers).
  */
final class CowSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "cow"

  override def createRelation(
      ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = ctx.sparkSession
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "cow source needs a path: spark.read.format(\"cow\").load(root)"))
    val m = parameters.get("snapshot").map(_.toLong) match {
      case Some(id) => CowTable.manifest(spark, root, id)
      case None => parameters.get("timestampMs").map(_.toLong) match {
        case Some(ts) =>
          val ids = CowTable.committedIdsAt(spark, root, ts)
          ids.lastOption.map(CowTable.manifest(spark, root, _)).getOrElse(
            throw new IllegalStateException(
              s"no committed snapshot at or before $ts at $root"))
        case None => CowTable.currentManifest(spark, root).getOrElse(
          throw new IllegalStateException(
            s"no committed snapshot at $root"))
      }
    }
    CowV2.relationFor(spark, root, m)
  }
}
