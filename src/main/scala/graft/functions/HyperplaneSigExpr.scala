package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native hyperplane-LSH signature — `bits` sign bits of dot products
  * against pseudo-random hyperplanes, as ONE codegen'd Catalyst
  * expression.
  *
  * Why native: the Column formulation (`VectorFunctions
  * .hyperplaneSignatureHof`) unrolls bits×dim literal multiply-adds
  * into the projection, which overflows janino's 64 KB method limit —
  * whole-stage codegen DISABLES for the stage and every row pays
  * interpreted expression dispatch in the one stage that scans the full
  * corpus. Here the generated code is two tight primitive loops over a
  * referenced `double[]` plane matrix, so the signature stage stays
  * inside whole-stage codegen at any `bits`/`dim`.
  *
  * Bit-compatibility contract (oracle-replayable): plane component
  * (p, j) is `((xxhash64(p·131071 + j) % 1000 + 1000) % 1000) / 1000.0
  * - 0.5` (seed 42, the engine's xxhash64), and the dot product
  * accumulates left-to-right in double over j — identical constants and
  * identical rounding order to the HOF formulation and to the embedded
  * constants in the `sim_lsh_pairs` DuckDB oracle. Property-tested
  * bit-for-bit against the HOF version in `SimilaritySpec`.
  *
  * Input contract: array<float|double> with at least `dim` non-null
  * elements — fails loud on shorter vectors AND on null elements (a
  * truncated or hole-y embedding is corrupt data, not a case to hash
  * quietly; this is the one deliberate divergence from the HOF
  * reference, which silently nulls the dot products and emits
  * signature 0 for such rows).
  */
case class HyperplaneSigExpr(child: Expression, dim: Int, bits: Int)
    extends UnaryExpression {

  require(dim > 0 && bits > 0 && bits <= 64,
    "hyperplane signature needs 0 < bits <= 64 and dim > 0")

  override def dataType: DataType = LongType

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _                                          => None
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case Some(_) => TypeCheckResult.TypeCheckSuccess
    case None => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_sig requires an array<float|double> input, got " +
        child.dataType.simpleString)
  }

  /** Flattened plane matrix [p * dim + j], derived deterministically —
    * recomputed per JVM after deserialization (cheap: bits×dim hashes).
    */
  @transient private lazy val planes: Array[Double] = {
    val arr = new Array[Double](bits * dim)
    var p = 0
    while (p < bits) {
      var j = 0
      while (j < dim) {
        arr(p * dim + j) = HyperplaneSigExpr.planeComponent(p, j)
        j += 1
      }
      p += 1
    }
    arr
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    require(v.numElements() >= dim,
      s"graft_hyperplane_sig: vector has ${v.numElements()} elements, needs $dim")
    val isFloat = elemType.get == FloatType
    // null ELEMENTS also fail loud (same corrupt-data stance as short
    // vectors) — ArrayData getters would silently read a null slot as
    // 0.0 and hash the vector into a wrong bucket
    var p = 0
    var sig = 0L
    var j = 0
    while (j < dim) {
      require(!v.isNullAt(j),
        s"graft_hyperplane_sig: null element at index $j")
      j += 1
    }
    while (p < bits) {
      var d = 0.0
      val off = p * dim
      var i = 0
      while (i < dim) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        d += planes(off + i) * x
        i += 1
      }
      if (d >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val get = if (elemType.get == FloatType) "getFloat" else "getDouble"
      val pl = ctx.addReferenceObj("planes", planes, "double[]")
      val sig = ctx.freshName("sig")
      val d = ctx.freshName("d")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      s"""
         |if ($v.numElements() < $dim) {
         |  throw new IllegalArgumentException(
         |    "graft_hyperplane_sig: vector has " + $v.numElements() +
         |    " elements, needs $dim");
         |}
         |for (int $j = 0; $j < $dim; $j++) {
         |  if ($v.isNullAt($j)) {
         |    throw new IllegalArgumentException(
         |      "graft_hyperplane_sig: null element at index " + $j);
         |  }
         |}
         |long $sig = 0L;
         |for (int $p = 0; $p < $bits; $p++) {
         |  double $d = 0.0;
         |  int $off = $p * $dim;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    $d += $pl[$off + $j] * (double) $v.$get($j);
         |  }
         |  if ($d >= 0) $sig |= 1L << $p;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_hyperplane_sig"
}

object HyperplaneSigExpr {
  def signature(vec: Column, dim: Int, bits: Int): Column =
    Bridge.column(HyperplaneSigExpr(Bridge.expression(vec), dim, bits))

  /** The canonical plane-component derivation — the single home of the
    * constant formula, used by the expression's plane matrix and the
    * embedded constants in the `sim_lsh_pairs` DuckDB oracle; the HOF
    * reference derives the identical values independently through
    * Catalyst's constant-folded `xxhash64` (same XXH64.hashLong, seed
    * 42), which the bit-equivalence spec pins.
    */
  def planeComponent(p: Int, j: Int): Double = {
    val h = XXH64.hashLong(p.toLong * 131071L + j, 42L)
    val m = (h % 1000L + 1000L) % 1000L
    m.toDouble / 1000.0 - 0.5
  }
}
