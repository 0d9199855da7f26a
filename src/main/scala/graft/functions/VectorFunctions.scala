package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over Array[Float]/Array[Double] columns, as pure
  * Column expressions (zip_with / aggregate — codegen'd, no UDFs).
  *
  * Folds run left-to-right in DOUBLE, so results are bit-reproducible
  * across engines and partitionings (the fold order is the array order,
  * never the partition order).
  */
object VectorFunctions {

  /** Sequential-fold dot product in double precision — a native
    * codegen'd Expression (see [[DotProductExpr]]); the accumulation
    * order matches the zip_with+aggregate formulation bit-for-bit.
    */
  def dot(a: Column, b: Column): Column = DotProductExpr.dot(a, b)

  /** Interpreted higher-order-function formulation (kept as the
    * reference implementation; `dot` must agree with it exactly).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; NULL (not NaN/error) when either vector has
    * zero norm — under ANSI mode a plain divide would ERROR on the 0/0,
    * and with ANSI off it yields NaN, which Spark totally orders ABOVE
    * every real double and so silently wins any top-k/argmax. NULL
    * propagates as "no similarity" and every consumer's null handling
    * (coalesce in the IVF argmax, NULL-last sort in top-k) does the
    * right thing.
    */
  def cosine(a: Column, b: Column): Column =
    try_divide(dot(a, b), norm(a) * norm(b))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v))

  /** Random-hyperplane LSH signature: `bits` sign bits of dot products
    * against pseudo-random hyperplanes derived deterministically from
    * (planeIdx, dim) via xxhash64 — no RNG state to ship to executors,
    * any engine can re-derive the planes. Native codegen'd Expression
    * (see [[HyperplaneSigExpr]]); bit-for-bit equal to
    * [[hyperplaneSignatureHof]], the Column-expression reference
    * implementation.
    */
  def hyperplaneSignature(vec: Column, dim: Int, bits: Int): Column =
    HyperplaneSigExpr.signature(vec, dim, bits)

  /** Reference formulation of [[hyperplaneSignature]] in pure Column
    * expressions. Kept for the equivalence property test — at bits=16,
    * dim=64 its unrolled literal tree overflows janino's method limit
    * and knocks the whole stage out of codegen, which is why the native
    * expression above is the production path.
    */
  def hyperplaneSignatureHof(vec: Column, dim: Int, bits: Int): Column = {
    val bitCols = (0 until bits).map { p =>
      // plane component in [-0.5, 0.5): hash to a bucket then scale
      val comps = (0 until dim).map { j =>
        val h = (xxhash64(lit(p.toLong * 131071L + j)) % 1000L + 1000L) % 1000L
        (h.cast("double") / 1000.0 - 0.5) *
          element_at(vec, j + 1).cast("double")
      }
      val d = comps.reduce(_ + _)
      when(d >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bitCols.reduce(_ bitwiseOR _)
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
