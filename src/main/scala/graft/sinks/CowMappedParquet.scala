package graft.sinks

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{StructField, StructType}

/** [[ParquetFileFormat]] for COLUMN-MAPPED cow tables: the relation —
  * and with it the whole planner (pruning, DPP, pushdown, bucketing) —
  * speaks LOGICAL column names, while the data files store each
  * column's immutable PHYSICAL name (its name at creation; `ALTER
  * TABLE RENAME COLUMN` is metadata-only because of exactly this
  * split). This format translates at the file boundary: the requested
  * schema and the pushed filters rename logical→physical before
  * delegating to the stock parquet reader, whose output rows are
  * POSITIONAL (`InternalRow` carries no names), so nothing translates
  * back. Delta's own column-mapping read path makes the same move
  * inside `DeltaParquetFileFormat`.
  *
  * Equality includes the map: two relations over different mappings
  * must never be deduplicated into one scan by plan canonicalization.
  */
final class CowMappedParquetFileFormat(colMap: Map[String, String],
    topLevel: Set[String])
  extends ParquetFileFormat {

  /** Logical→physical for a pushed-filter column reference. NESTED
    * references arrive as dotted paths (`info.a`): only the TOP-LEVEL
    * segment maps (nested field names never change — the mapping is
    * top-level by design), so the prefix translates when an exact
    * entry is absent. Exact match first: a literal dotted column name
    * that happens to be mapped wins over prefix interpretation.
    */
  private def phys(c: String): String = colMap.get(c) match {
    case Some(p) => p
    case None =>
      val i = c.indexOf('.')
      // prefix interpretation ONLY when `c` is not itself a top-level
      // logical column: a literal dotted column name (legal with
      // backticks) whose first segment collides with a mapped column
      // must stay identity, or the pushed filter would evaluate a
      // nonexistent physical path and silently drop rows
      if (i < 0 || topLevel.contains(c)) c
      else colMap.get(c.substring(0, i))
        .map(_ + c.substring(i)).getOrElse(c)
  }

  private def physStruct(s: StructType): StructType =
    StructType(s.fields.map(f => f.copy(name = phys(f.name))))

  /** Rename a pushed filter's column references to physical names.
    * Unknown filter shapes degrade to no pushdown (None) — pushed
    * parquet filters are an optimization; the plan's own Filter
    * operator re-evaluates the predicate on every surviving row.
    */
  private def physFilter(f: Filter): Option[Filter] = f match {
    case sources.EqualTo(a, v) => Some(sources.EqualTo(phys(a), v))
    case sources.EqualNullSafe(a, v) =>
      Some(sources.EqualNullSafe(phys(a), v))
    case sources.GreaterThan(a, v) =>
      Some(sources.GreaterThan(phys(a), v))
    case sources.GreaterThanOrEqual(a, v) =>
      Some(sources.GreaterThanOrEqual(phys(a), v))
    case sources.LessThan(a, v) => Some(sources.LessThan(phys(a), v))
    case sources.LessThanOrEqual(a, v) =>
      Some(sources.LessThanOrEqual(phys(a), v))
    case sources.In(a, vs) => Some(sources.In(phys(a), vs))
    case sources.IsNull(a) => Some(sources.IsNull(phys(a)))
    case sources.IsNotNull(a) => Some(sources.IsNotNull(phys(a)))
    case sources.StringStartsWith(a, v) =>
      Some(sources.StringStartsWith(phys(a), v))
    case sources.StringEndsWith(a, v) =>
      Some(sources.StringEndsWith(phys(a), v))
    case sources.StringContains(a, v) =>
      Some(sources.StringContains(phys(a), v))
    case sources.Not(c) =>
      // under NOT a partially-translated child would push a STRONGER
      // filter than the predicate (Not(a) is not implied by
      // Not(a AND b)) — full translation or nothing
      physFilterStrict(c).map(sources.Not)
    case sources.And(l, r) =>
      // one translatable side still prunes (top-level conjunct
      // semantics: a weaker pushed filter is always sound)
      (physFilter(l), physFilter(r)) match {
        case (Some(a), Some(b)) => Some(sources.And(a, b))
        case (Some(a), None) => Some(a)
        case (None, Some(b)) => Some(b)
        case _ => None
      }
    case sources.Or(l, r) => for {
      a <- physFilter(l); b <- physFilter(r)
    } yield sources.Or(a, b)
    case sources.AlwaysTrue() => Some(f)
    case sources.AlwaysFalse() => Some(f)
    case _ => None
  }

  /** [[physFilter]] that refuses PARTIAL translations anywhere in the
    * subtree — required under NOT, where dropping a conjunct flips
    * from weakening to strengthening.
    */
  private def physFilterStrict(f: Filter): Option[Filter] = f match {
    case sources.And(l, r) => for {
      a <- physFilterStrict(l); b <- physFilterStrict(r)
    } yield sources.And(a, b)
    case sources.Or(l, r) => for {
      a <- physFilterStrict(l); b <- physFilterStrict(r)
    } yield sources.Or(a, b)
    case sources.Not(c) => physFilterStrict(c).map(sources.Not)
    case other => physFilter(other)
  }

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration)
      : PartitionedFile => Iterator[InternalRow] =
    super.buildReaderWithPartitionValues(
      sparkSession,
      physStruct(dataSchema),
      // partition VALUES come from the FileIndex (logical world) and
      // append positionally — no file read involved, no renaming
      partitionSchema,
      physStruct(requiredSchema),
      filters.flatMap(physFilter),
      options,
      hadoopConf)

  override def equals(other: Any): Boolean = other match {
    case m: CowMappedParquetFileFormat => m.mapKey == mapKey
    case _ => false
  }

  override def hashCode(): Int = mapKey.hashCode

  // identity entries canonicalize away, so two identity-mapped
  // snapshots (or pre- and post-no-op-mapping ones) compare equal
  private lazy val mapKey: Seq[(String, String)] =
    colMap.toSeq.filter { case (l, p) => l != p }.sorted

  override def toString: String = s"CowMappedParquet(${mapKey.map {
    case (l, p) => s"$l->$p" }.mkString(",")})"
}

object CowMappedParquetFileFormat {
  /** The format for a snapshot. ALWAYS this subclass — identity maps
    * behave bit-identically to stock parquet, and keeping one runtime
    * class makes format equality SYMMETRIC: stock
    * `ParquetFileFormat.equals` answers true for any instance of the
    * class (including this subclass), so mixing stock and mapped
    * formats across two snapshots of one table would make plan
    * canonicalization's answer depend on which relation is the
    * receiver — and a collapsed scan would read a renamed column's
    * files under the wrong names.
    */
  def forManifest(m: CowManifest): ParquetFileFormat =
    new CowMappedParquetFileFormat(m.colMap, m.schema.fieldNames.toSet)
}
