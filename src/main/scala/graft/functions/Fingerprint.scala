package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint as a native Catalyst
  * Expression with whole-stage codegen (SURVEY preference order (b):
  * custom Expression beats UDF).
  *
  * hash = fold(codepoints)(acc * 31 + cp) mod 2^31-1, starting at 7.
  * The modulus keeps the accumulator < 2^36 so the same arithmetic is
  * reproducible in any engine with 64-bit integers (the DuckDB oracle
  * replays it with list_reduce over unicode codepoints).
  */
case class FingerprintExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fingerprint requires string input, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    FingerprintExpr.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FingerprintExpr.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): FingerprintExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_fingerprint"
}

object FingerprintExpr {
  final val Mod: Long = 2147483647L // 2^31 - 1

  /** Shared by interpreted eval and generated code. */
  def hash(s: String): Long = {
    var acc = 7L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  import org.apache.spark.sql.graftbridge.Bridge

  def fingerprint(c: Column): Column =
    Bridge.column(FingerprintExpr(Bridge.expression(c)))

  /** Registers `graft_fingerprint(str)` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fingerprint", exprs => FingerprintExpr(exprs.head), "scala_udf")
}
