package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{DotProductExpr, FingerprintExpr, HyperplaneSigExpr,
  MinHashSigsExpr, SimHash64Expr}

/** SparkSessionExtensions entry point — the idiomatic way a library
  * ships custom Catalyst pieces: users opt in with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`, and the engine's
  * functions resolve in plain SQL on any session, including ones the
  * library never touches directly (thriftserver, notebooks).
  *
  * Injects the engine's codegen'd Expressions: `graft_fingerprint`
  * (rolling-hash doc fingerprint), `graft_dot` (vector dot product),
  * `graft_hyperplane_sig(vec, dim, bits)` (hyperplane-LSH signature;
  * dim/bits must be integer literals — they shape the generated code).
  * Custom physical Strategies are deliberately absent — every operator
  * here plans well with stock Catalyst (SURVEY §4 conclusion). The one
  * custom optimizer rule, the materialized-view rewrite
  * ([[graft.plans.MvRewrite]]), is opt-in per session via
  * `MvRewrite.install` (ExperimentalMethods) because it consults a
  * registration catalog rather than the plan alone.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(
      s"$what must be an INTEGER literal, got $e")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // named cow tables (spark.sql.catalog.cow): the analyzer's v2
    // relation swaps for the planner-integrated V1 CowV2 relation —
    // see graft.plans.CowCatalogRule
    ext.injectResolutionRule(session =>
      new graft.plans.CowCatalogRule(session))
    // UPDATE / DELETE / MERGE / OPTIMIZE / VACUUM / RESTORE over cow
    // references as first-class spark.sql statements — see
    // graft.plans.CowSqlParser (Delta's DeltaSqlParser seam)
    ext.injectParser((session, delegate) =>
      new graft.plans.CowSqlParser(session, delegate))
    // filtered cow scans narrow their LOGICAL size estimate to the
    // manifest-kept files, so broadcast decisions and join reorder see
    // the slice's real bytes — see graft.plans.CowScanPruneRule
    ext.injectOptimizerRule(session =>
      graft.plans.CowScanPruneRule(session))
    ext.injectFunction((
      new FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[FingerprintExpr].getName, "graft_fingerprint"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_fingerprint takes one argument")
        FingerprintExpr(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot takes two arguments")
        DotProductExpr(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "graft_simhash64"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          "graft_simhash64 takes one array<string> argument")
        SimHash64Expr(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigsExpr].getName,
        "graft_minhash_sigs"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_minhash_sigs takes (shingles, numHashes)")
        MinHashSigsExpr(children.head,
          intLit(children(1), "numHashes"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSigExpr].getName,
        "graft_hyperplane_sig"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "graft_hyperplane_sig takes (vec, dim, bits)")
        HyperplaneSigExpr(children.head,
          intLit(children(1), "dim"), intLit(children(2), "bits"))
      }))
  }
}
