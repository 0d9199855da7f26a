package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Materialized-view query rewrite ("aggregate navigation") — the
  * classic warehouse accelerator: a wide-granularity aggregate is
  * persisted once, and any query aggregating the SAME fact table at
  * the same or coarser granularity is transparently re-pointed at the
  * view, turning a 100 TB fact scan into a scan of |group| rows. Stock
  * Catalyst has no such rule (Databricks/BigQuery ship it as a paid
  * feature); this is the engine-side half, built on the public
  * `Rule[LogicalPlan]` + `ExperimentalMethods.extraOptimizations` API.
  *
  * Correctness model — rewrites preserve BIT-EXACT results, not just
  * approximate ones, because only mergeable-exact measures are
  * eligible:
  *   - `sum(cast(x as decimal(25,6)))` → `sum(mv.sum_x)`: decimal sums
  *     are associative, so re-aggregating partial sums equals the
  *     direct sum (the same invariant MaterializedAgg relies on).
  *     Plain DOUBLE sums are deliberately NOT matched — float
  *     re-association could drift.
  *   - `count(1)` → `sum(mv.cnt)`; `min/max(x)` → `min/max(mv.min_x /
  *     mv.max_x)`.
  * A query with filters, joins, distinct aggregates, non-attribute
  * grouping keys, or any measure outside the registered set is left
  * untouched (conservative bail-out, never a wrong rewrite).
  * Freshness is the registrar's contract, exactly as in Delta/BQ:
  * [[MvRewrite.createView]] (re)builds the view from the fact and
  * registers it atomically; registering a stale path is the caller's
  * bug. `MvCatalog.clear()` de-registers everything.
  */
object MvRewrite {

  /** Registered view: fact root path (canonical FileIndex form) →
    * (view parquet path, grouping columns, summed columns, min/max
    * columns, and the view's analyzed relation — resolved ONCE at
    * registration so the rule's bail-out path never pays file listing
    * or schema inference inside the optimizer; each rewrite embeds a
    * fresh `newInstance()` so two rewrites in one plan cannot collide
    * on attribute ids). */
  final case class MvDef(
      name: String,
      mvPath: String,
      groupCols: Seq[String],
      sumCols: Seq[String],
      minMaxCols: Seq[String],
      relation: LogicalRelation)

  object MvCatalog {
    private val views = new ConcurrentHashMap[String, MvDef]()
    def register(factKey: String, mv: MvDef): Unit = views.put(factKey, mv)
    def lookup(factKey: String): Option[MvDef] = Option(views.get(factKey))
    def isEmpty: Boolean = views.isEmpty
    def clear(): Unit = views.clear()
  }

  /** Build + persist the view (one shuffle at view granularity) and
    * register it for rewriting. Sum columns are stored as
    * DECIMAL(25,6) partial sums; count as `cnt`; min/max raw. */
  def createView(
      spark: SparkSession,
      name: String,
      factPath: String,
      mvPath: String,
      groupCols: Seq[String],
      sumCols: Seq[String],
      minMaxCols: Seq[String]): Unit = {
    val fact = spark.read.parquet(factPath)
    val aggs =
      (count(lit(1)).as("cnt") +:
        sumCols.map(c =>
          // partial sums re-cast to the (25,6) layout contract so the
          // rewritten Sum's result type equals the original query's
          // (sum over (25,6) → (35,6) both ways); an overflowing
          // partial errors loudly under ANSI, never silently
          sum(col(c).cast(DecimalType(25, 6))).cast(DecimalType(25, 6))
            .as(s"sum_$c"))) ++
        minMaxCols.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    fact.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(mvPath)
    registerView(spark, name, factPath, mvPath, groupCols, sumCols,
      minMaxCols)
  }

  /** Register an EXTERNALLY-maintained view for rewriting, without
    * rebuilding it from the fact — the seam for incremental upkeep:
    * maintain the view's mergeable state with
    * [[graft.operators.MaterializedAgg]] (delta-sized work per batch),
    * publish it in this layout (`cnt`, `sum_<c>` DECIMAL(25,6),
    * `min_<c>`/`max_<c>`), then re-register after each refresh.
    * Registration asserts freshness exactly as [[createView]] does. */
  def registerView(
      spark: SparkSession,
      name: String,
      factPath: String,
      mvPath: String,
      groupCols: Seq[String],
      sumCols: Seq[String],
      minMaxCols: Seq[String]): Unit = {
    val key = factKeyOf(spark.read.parquet(factPath).queryExecution.analyzed)
      .getOrElse(throw new IllegalArgumentException(
        s"$factPath did not plan as a single file-source relation"))
    val rel = spark.read.parquet(mvPath).queryExecution.analyzed match {
      case lr: LogicalRelation => lr
      case other => throw new IllegalArgumentException(
        s"$mvPath did not plan as a LogicalRelation: ${other.getClass}")
    }
    // validate the FULL layout contract at registration (fail loud
    // here, not with a NoSuchElementException inside the optimizer
    // that would poison every query over the fact): cnt, every
    // sum_/min_/max_ measure, and every grouping column must exist
    val have = rel.schema.fieldNames.toSet
    def need(c: String, why: String): Unit = require(have.contains(c),
      s"view $name: missing column $c ($why) — refusing to register")
    need("cnt", "count measure")
    groupCols.foreach(c => need(c, "grouping column"))
    minMaxCols.foreach { c =>
      need(s"min_$c", "min measure"); need(s"max_$c", "max measure")
    }
    for (c <- sumCols) {
      need(s"sum_$c", "sum measure")
      val f = rel.schema(s"sum_$c")
      require(f.dataType == DecimalType(25, 6),
        s"view $name: sum_$c must be DECIMAL(25,6) (the layout contract" +
          s" — rewritten Sum result types must match the original), " +
          s"got ${f.dataType}")
    }
    MvCatalog.register(key,
      MvDef(name, mvPath, groupCols, sumCols, minMaxCols, rel))
  }

  /** Install the rewrite rule on the session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_ eq MvRewriteRule))
      spark.experimental.extraOptimizations = cur :+ MvRewriteRule
  }

  /** Canonical identity of a file-source scan: the FileIndex's first
    * root path, read through Projects of plain attributes (the shape
    * column pruning leaves behind). Derived the same way at
    * registration and at match time, so path normalization (file: URI,
    * trailing slashes) can never disagree. */
  private[plans] def factKeyOf(plan: LogicalPlan): Option[String] =
    plan match {
      case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        factKeyOf(child)
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.headOption.map(_.toString)
        case _ => None
      }
      case _ => None
    }

  object MvRewriteRule extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan =
      if (MvCatalog.isEmpty) plan
      else plan.transformUp {
        case agg @ Aggregate(_, _, child, _) =>
          factKeyOf(child).flatMap(MvCatalog.lookup)
            .flatMap(rewrite(agg, _)).getOrElse(agg)
      }

    private def rewrite(agg: Aggregate, mv: MvDef): Option[LogicalPlan] = {
      // fresh attribute ids per rewrite: two rewritten aggregates in
      // one plan must not share output ids
      val mvPlan = mv.relation.newInstance()
      val mvAttr: Map[String, Attribute] =
        mvPlan.output.map(a => a.name -> a).toMap

      // mvAttr.get throughout (never apply): registration validates the
      // layout, but a view whose files changed underneath an old MvDef
      // must degrade to no-rewrite, not throw inside the optimizer
      def aggFn(fn: AggregateFunction): Option[AggregateFunction] = fn match {
        // sum(cast(x as decimal(25,6))) — the engine's exact-sum idiom;
        // withNewChildren keeps the Sum's evalMode (ANSI) intact
        case s: Sum => s.child match {
          case c: Cast if c.dataType == DecimalType(25, 6) => c.child match {
            case a: AttributeReference if mv.sumCols.contains(a.name) =>
              mvAttr.get(s"sum_${a.name}").map(m =>
                s.withNewChildren(Seq(m)).asInstanceOf[AggregateFunction])
            case _ => None
          }
          case _ => None
        }
        case c: Count => c.children match {
          // non-null literal only: count(NULL) is 0, not the row count
          case Seq(Literal(v, _)) if v != null => mvAttr.get("cnt").map(Sum(_))
          case _ => None
        }
        case m: Min => m.child match {
          case a: AttributeReference if mv.minMaxCols.contains(a.name) =>
            mvAttr.get(s"min_${a.name}").map(Min(_))
          case _ => None
        }
        case m: Max => m.child match {
          case a: AttributeReference if mv.minMaxCols.contains(a.name) =>
            mvAttr.get(s"max_${a.name}").map(Max(_))
          case _ => None
        }
        case _ => None
      }

      // Guarded rewrite: every aggregate call must map onto a stored
      // measure, every bare attribute must be a view grouping column,
      // and anything unrecognized fails the WHOLE rewrite (None), so a
      // partially-matching query is never half-rewritten.
      def rw(e: Expression): Option[Expression] = e match {
        case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
          aggFn(ae.aggregateFunction).map { f =>
            val repl = ae.copy(aggregateFunction = f)
            ae.aggregateFunction match {
              // a GLOBAL count over an empty fact (hence empty view)
              // must stay 0 — Sum over zero rows is NULL
              case _: Count => Coalesce(Seq(repl, Literal(0L)))
              case _ => repl
            }
          }
        case _: AggregateExpression => None
        case a: AttributeReference =>
          if (mv.groupCols.contains(a.name)) mvAttr.get(a.name) else None
        case other =>
          val kids = other.children.map(rw)
          if (kids.forall(_.isDefined))
            Some(other.withNewChildren(kids.map(_.get)))
          else None
      }

      val newGroups = agg.groupingExpressions.map(rw)
      // A grouping column surfacing as a bare attribute must keep its
      // ORIGINAL exprId (parents reference it) while pointing at the
      // view's column underneath — an explicit-exprId Alias does both.
      // Alias nodes already preserve name+exprId through withNewChildren.
      val newAggs = agg.aggregateExpressions.map {
        case a: AttributeReference if mvAttr.contains(a.name) &&
            mv.groupCols.contains(a.name) =>
          Some(Alias(mvAttr(a.name), a.name)(exprId = a.exprId))
        case ne => rw(ne)
      }
      if (newGroups.forall(_.isDefined) && newAggs.forall(_.isDefined))
        Some(Aggregate(
          newGroups.map(_.get),
          // rw preserves Alias nodes (withNewChildren keeps name +
          // exprId), so parent operators' references stay valid
          newAggs.map(_.get.asInstanceOf[NamedExpression]),
          mvPlan))
      else None
    }
  }
}
