package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** MinHash signature vector of a shingle array as ONE native Catalyst
  * Expression — the per-ROW form of the explode → shuffle →
  * numHashes-MIN-aggregate pipeline, and of its higher-order-function
  * rewrite (nested `transform`/`array_min`), which is NOT codegen-able
  * (HigherOrderFunction lambdas evaluate interpreted per element and
  * measured SLOWER than the shuffle they replaced). This expression
  * runs the same arithmetic as one generated loop:
  *
  *   h_s   = xxhash64(shingle)        (bytes, seed 42)
  *   sig_i = min over DISTINCT h_s of xxhash64(i: int, h_s: long)
  *         = min of XXH64.hashLong(h_s, XXH64.hashInt(i, 42))
  *
  * — exactly Spark's multi-argument `xxhash64(lit(i), col)` chain, so
  * signatures are bit-identical to the aggregate pipeline
  * (spec-pinned). Cost per document: O(shingles × numHashes) hash
  * steps, map-side, zero shuffle; the per-i seeds are precomputed
  * once per expression instance.
  *
  * Returns NULL for an EMPTY shingle array (the aggregate pipeline had
  * no rows to aggregate — callers drop such docs, preserving the
  * original "absent from signatures" contract).
  */
case class MinHashSigsExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1, s"numHashes must be positive, got $numHashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sigs requires array<string> input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSigsExpr.sigs(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // not defineCodeGen: sigs() returns null for an (effectively) empty
    // array even when the input array is non-null, so the generated
    // null flag must be derived from the VALUE
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashSigsExpr.sigs($c, $numHashes);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHashSigsExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sigs"
}

object MinHashSigsExpr {
  private final val Seed = 42L

  /** Shared by interpreted eval and generated code. NULL shingles are
    * skipped; an effectively-empty array yields null.
    */
  def sigs(arr: ArrayData, numHashes: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    // distinct shingle hashes (array_distinct-at-hash-level semantics)
    val seen = new java.util.HashSet[java.lang.Long](n * 2)
    val hs = new Array[Long](n)
    var m = 0
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val h = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
        if (seen.add(h)) { hs(m) = h; m += 1 }
      }
      j += 1
    }
    if (m == 0) return null
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val seedI = XXH64.hashInt(i, Seed)
      var best = Long.MaxValue
      var k = 0
      while (k < m) {
        val v = XXH64.hashLong(hs(k), seedI)
        if (v < best) best = v
        k += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graftbridge.Bridge

  def minhashSigs(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashSigsExpr(Bridge.expression(shingles), numHashes))
}
