package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId,
  Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Expand, Generate,
  LocalRelation, LogicalPlan, Union}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

/** COLUMN-LEVEL LINEAGE extracted from the analyzed logical plan — the
  * governance artifact an ETL system owes its operators: for every
  * output column of a query, which (source, column) leaves feed it.
  * The reference records table-level audit rows (`JobRun`); this walks
  * Catalyst's resolved attribute graph, so expression-derived columns
  * (CASE, arithmetic, aggregates, window functions, generators) trace
  * through every Alias to ALL their inputs, joins/unions merge their
  * branches, and renames cost nothing (lineage rides `ExprId`, not
  * names).
  *
  * Driver-side plan analysis only — nothing executes. Sources are
  * named by their file-scan root paths (`HadoopFsRelation`), or
  * `local:<nodeName>` for in-memory relations.
  */
object Lineage {

  /** output column name → the set of (source, column) leaves it
    * derives from (empty set = pure literal/derived-from-nothing).
    */
  def columnLineage(df: DataFrame): Map[String, Set[(String, String)]] = {
    val plan = df.queryExecution.analyzed
    val m = attrLineage(plan)
    plan.output.map(a =>
      a.name -> m.getOrElse(a.exprId, Set.empty)).toMap
  }

  /** Flat report rows (out_col, source, source_col), sorted. */
  def report(df: DataFrame): Seq[(String, String, String)] =
    columnLineage(df).toSeq.flatMap { case (out, srcs) =>
      srcs.toSeq.map { case (s, c) => (out, s, c) }
    }.sorted

  private def sourceName(plan: LogicalPlan): String = plan match {
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation =>
        h.location.rootPaths.map(_.toString).sorted.mkString(",")
      case other => other.toString.takeWhile(_ != '(')
    }
    case l: LocalRelation => s"local:${l.nodeName}"
    case other => s"relation:${other.nodeName}"
  }

  private def attrLineage(
      plan: LogicalPlan): Map[ExprId, Set[(String, String)]] = plan match {
    case lr: LogicalRelation =>
      val src = sourceName(lr)
      lr.output.map(a => a.exprId -> Set(src -> a.name)).toMap
    case l: LocalRelation =>
      val src = sourceName(l)
      l.output.map(a => a.exprId -> Set(src -> a.name)).toMap
    case u: Union =>
      // union resolves POSITIONALLY: output attr i derives from every
      // child's attr i
      val childMaps = u.children.map(attrLineage)
      val base = childMaps.fold(Map.empty[ExprId, Set[(String, String)]]) {
        (a, b) => merge(a, b)
      }
      val positional = u.output.zipWithIndex.map { case (a, i) =>
        a.exprId -> u.children.zip(childMaps).flatMap { case (ch, mp) =>
          mp.getOrElse(ch.output(i).exprId, Set.empty)
        }.toSet
      }.toMap
      merge(base, positional)
    case g: Generate =>
      val below = g.children.map(attrLineage)
        .fold(Map.empty[ExprId, Set[(String, String)]])(merge)
      val genSources = refsOf(g.generator.references.toSeq, below)
      merge(below,
        g.generatorOutput.map(a => a.exprId -> genSources).toMap)
    case e: Expand =>
      // Expand (unpivot, cube/rollup grouping sets) mints its output
      // attrs DIRECTLY (no Alias): output attr i derives from every
      // projection row's expression i
      val below = attrLineage(e.child)
      val positional = e.output.zipWithIndex.map { case (a, i) =>
        a.exprId -> e.projections
          .flatMap(row => exprSources(row(i), below)).toSet
      }.toMap
      merge(below, positional)
    case p =>
      val below = p.children.map(attrLineage)
        .fold(Map.empty[ExprId, Set[(String, String)]])(merge)
      // every Alias anywhere in this node's expressions names a new
      // ExprId whose lineage is the union of its expression's sources
      val aliased = p.expressions.flatMap(_.collect {
        case al: Alias => al.exprId -> exprSources(al.child, below)
      }).toMap
      merge(below, aliased)
  }

  /** Sources of one expression: its attribute references, plus — for
    * subquery expressions (scalar/IN/EXISTS) — the lineage of the
    * subquery plan's own output.
    */
  private def exprSources(
      e: Expression,
      below: Map[ExprId, Set[(String, String)]]): Set[(String, String)] = {
    val direct = refsOf(e.references.toSeq, below)
    val sub = e.collect { case sq: SubqueryExpression =>
      val inner = attrLineage(sq.plan)
      sq.plan.output.flatMap(o =>
        inner.getOrElse(o.exprId, Set.empty)).toSet
    }.fold(Set.empty[(String, String)])(_ ++ _)
    direct ++ sub
  }

  private def refsOf(
      refs: Seq[Attribute],
      below: Map[ExprId, Set[(String, String)]]): Set[(String, String)] =
    refs.flatMap(r => below.getOrElse(r.exprId, Set.empty)).toSet

  private def merge(
      a: Map[ExprId, Set[(String, String)]],
      b: Map[ExprId, Set[(String, String)]]): Map[ExprId, Set[(String, String)]] =
    (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, Set.empty) ++ b.getOrElse(k, Set.empty))).toMap
}
