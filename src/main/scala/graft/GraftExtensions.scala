package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.FingerprintExpr

/** SparkSessionExtensions entry point — the idiomatic way a library
  * ships custom Catalyst pieces: users opt in with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`, and the engine's
  * functions resolve in plain SQL on any session, including ones the
  * library never touches directly (thriftserver, notebooks).
  *
  * Currently injects `graft_fingerprint` (the codegen'd rolling-hash
  * Expression). Custom Rules/Strategies are deliberately absent — every
  * operator here plans well with stock Catalyst (SURVEY §4 conclusion).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[FingerprintExpr].getName, "graft_fingerprint"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_fingerprint takes one argument")
        FingerprintExpr(children.head)
      }))
  }
}
