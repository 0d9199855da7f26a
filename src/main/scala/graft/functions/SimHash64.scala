package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array as ONE native Catalyst Expression —
  * the per-ROW formulation of [[graft.operators.Dedup.simhashSignatures]]'
  * original explode → shuffle(id, hash) → 64-SUM-aggregate pipeline:
  * per token, `xxhash64(token)` (Spark's seed 42, bit-identical to the
  * SQL function) votes +1/−1 on each of the 64 bit positions; a
  * positive vote sets the bit, a tie clears it (same `> 0` rule).
  * Signature equality with the aggregate pipeline is spec-pinned.
  *
  * Scale consequence: the signature stage becomes a PROJECTION in the
  * document scan — zero explode, zero shuffle; the only exchange left
  * in simhash dedup is the (band, bucket) self-join that follows. Cost
  * per document is O(tokens × 64) bit ops in one tight generated loop.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string> input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash64Expr.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64Expr.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash64"
}

object SimHash64Expr {
  private final val Seed = 42L // Spark's xxhash64 default seed

  /** Shared by interpreted eval and generated code. NULL elements are
    * skipped (the token pipelines never produce them; skipping matches
    * "no vote" rather than crashing a malformed row).
    */
  def simhash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val h = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) != 0L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  import org.apache.spark.sql.graftbridge.Bridge

  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64Expr(Bridge.expression(tokens)))

  /** Registers `graft_simhash64(array<string>)` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64", exprs => SimHash64Expr(exprs.head), "scala_udf")
}
