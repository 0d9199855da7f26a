package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

import graft.sinks.CowPrunableIndex

/** STATIC scan-estimate pruning for cow relations (round-15, the
  * round-14 verdict's #7): Spark's own `PruneFileSourcePartitions`
  * narrows logical size estimates only for `CatalogFileIndex`-backed
  * relations, so a partition- or stats-filtered cow scan would carry
  * the WHOLE table's `sizeInBytes` into join strategy selection — a
  * one-partition slice of a 100 TB table would never plan as the
  * broadcast side without AQE rescuing it at runtime (and nothing
  * rescues join REORDER or non-adaptive contexts). This rule swaps the
  * [[CowFileIndex]] under a Filter for one narrowed to exactly the
  * files the manifest keeps for the filter's conjuncts — partition
  * values AND min/max/Bloom/null-count skipping, the same pruning the
  * scan itself will do — so the estimate the planner consumes is the
  * surviving bytes. Data is unchanged: pruning keeps a superset of
  * matching rows and the Filter stays in place; the `pruned` tag makes
  * the rule a fixpoint.
  */
final case class CowScanPruneRule(spark: SparkSession)
  extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        lr @ LogicalRelation(hfs: HadoopFsRelation, _, _, _, _))
        if hfs.location.isInstanceOf[CowPrunableIndex] &&
          !hfs.location.asInstanceOf[CowPrunableIndex].pruned =>
      val idx = hfs.location.asInstanceOf[CowPrunableIndex]
      // the SESSION resolver decides partition membership — under
      // spark.sql.caseSensitive=true a data column differing only in
      // case from a partition column must not be misrouted (the
      // index's partition binding uses the same resolver and would
      // throw inside the optimizer)
      val resolver = spark.sessionState.analyzer.resolver
      val partNames = hfs.partitionSchema.fieldNames.toSeq
      val usable = CowBoundDml.conjuncts(cond).filter(c =>
        c.deterministic && !SubqueryExpression.hasSubquery(c))
      val (partF, dataF) = usable.partition(c =>
        c.references.nonEmpty && c.references.forall(a =>
          partNames.exists(f => resolver(f, a.name))))
      val newIdx = idx.prunedTo(partF, dataF)
      // keep any attached CatalogStatistics in step with the narrowed
      // index — stale full-table stats would OVERRIDE the narrowed
      // sizeInBytes in computeStats and undo exactly what this rule
      // establishes; the fileCompressionFactor multiply mirrors the
      // stats-less HadoopFsRelation path (conf parity)
      val newCt = lr.catalogTable.map(ct => ct.copy(stats = Some(
        org.apache.spark.sql.catalyst.catalog.CatalogStatistics(
          sizeInBytes = BigInt((newIdx.sizeInBytes *
            spark.sessionState.conf.fileCompressionFactor).toLong),
          rowCount = Some(BigInt(newIdx.fileRowCount))))))
      Filter(cond, lr.copy(
        relation = hfs.copy(location = newIdx)(spark),
        catalogTable = newCt))
  }
}
