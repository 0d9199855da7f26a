package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native quantile-bucket rank — `count(boundaries <= value)` against a
  * broadcast-by-reference sorted boundary array, as one codegen'd
  * Catalyst expression.
  *
  * Why native: the Column formulation
  * (`size(filter(lit(boundaries), b => v >= b))`) routes every row
  * through a higher-order ArrayFilter — interpreted lambda dispatch
  * per element, 2^bits-1 comparisons per row per clustered column, and
  * the HOF knocks the projection out of whole-stage codegen (the same
  * failure mode [[HyperplaneSigExpr]] exists to fix). Here the
  * generated code is a tight primitive binary search over a referenced
  * `double[]` — O(bits) comparisons — and the z-value stage stays
  * inside whole-stage codegen.
  *
  * Bit-compatibility contract with the HOF form (property-pinned in
  * `CowTableSpec`): the result is the count of boundaries ≤ value
  * under SPARK's double ordering — duplicates in the boundary array
  * count individually (upper-bound search), and NaN orders ABOVE
  * every double (Spark SQL semantics, NOT Java's always-false
  * comparisons), landing in the top bucket exactly as the HOF
  * predicate `v >= b` evaluates true for every element.
  *
  * NULL propagates (standard unary null semantics); callers wanting
  * the HOF's null→bucket-0 behavior coalesce outside.
  */
case class QuantileBucketExpr(child: Expression, boundaries: Seq[Double])
    extends UnaryExpression {

  require(boundaries.nonEmpty, "need at least one bucket boundary")
  require(boundaries == boundaries.sorted, "boundaries must be sorted")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_quantile_bucket requires a double input, got ${other.simpleString}")
  }

  @transient private lazy val arr: Array[Double] = boundaries.toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Double]
    if (java.lang.Double.isNaN(v)) arr.length.toLong
    else {
      // upper bound: first index whose boundary exceeds v == count of <=
      var lo = 0
      var hi = arr.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (arr(mid) <= v) lo = mid + 1 else hi = mid
      }
      lo.toLong
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bs = ctx.addReferenceObj("bounds", arr, "double[]")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |if (Double.isNaN($v)) {
         |  $lo = $bs.length;
         |} else {
         |  int $hi = $bs.length;
         |  while ($lo < $hi) {
         |    int $mid = ($lo + $hi) >>> 1;
         |    if ($bs[$mid] <= $v) $lo = $mid + 1; else $hi = $mid;
         |  }
         |}
         |${ev.value} = (long) $lo;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantileBucketExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_quantile_bucket"
}

object QuantileBucketExpr {
  def bucket(v: Column, boundaries: Seq[Double]): Column =
    Bridge.column(QuantileBucketExpr(Bridge.expression(v), boundaries))
}
