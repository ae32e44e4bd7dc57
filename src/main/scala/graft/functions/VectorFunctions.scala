package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector (embedding) column builders.
  *
  * Embeddings arrive as `array<float>`. All math is done in double precision
  * with a left-to-right fold (`aggregate` over `zip_with`), which is the same
  * associativity the oracle uses — and it's all Catalyst higher-order
  * functions: distributed, no UDF, no driver round-trip.
  *
  * LSH hyperplanes are deterministic ±1 weight vectors derived from
  * scala.util.hashing.MurmurHash3 of (plane, dim), materialized as array
  * literals — identical on every executor with zero shuffle/broadcast cost.
  */
object VectorFunctions {

  /** Element products summed in double: dot(a, b). Backed by the codegen
    * [[graft.plans.VecDot]] expression (primitive loop in whole-stage
    * codegen, same left-to-right double fold as the HOF form).
    */
  def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.vecDot(a, b)

  /** Reference HOF formulation of dot — interpreted, kept for cross-checking
    * the codegen expression in tests.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Fused single-loop codegen cosine ([[graft.plans.VecCosine]]); result is
    * bit-identical to `dot(a,b) / (norm(a) * norm(b))`.
    */
  def cosine(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.vecCosine(a, b)

  /** Fused single-loop squared Euclidean distance
    * ([[graft.plans.VecL2Sq]]): Σ (aᵢ - bᵢ)², left-to-right.
    */
  def l2sq(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.vecL2Sq(a, b)

  /** Deterministic ±1 hyperplane weights: plane `p`, dimension `d`. */
  def planeWeights(p: Int, dims: Int): Array[Double] =
    Array.tabulate(dims) { d =>
      if (scala.util.hashing.MurmurHash3.productHash((p, d)) % 2 == 0) 1.0
      else -1.0
    }

  /** Sign bit of the projection of `v` onto plane `p` (0 or 1). */
  def planeBit(v: Column, p: Int, dims: Int): Column = {
    val w = array(planeWeights(p, dims).map(lit): _*)
    when(dot(v, w) >= lit(0.0), lit(1)).otherwise(lit(0))
  }

  /** Random-hyperplane LSH signature as an int in [0, 2^bits). */
  def lshSignature(v: Column, firstPlane: Int, bits: Int, dims: Int): Column =
    (0 until bits)
      .map(i => planeBit(v, firstPlane + i, dims) * lit(1 << i))
      .reduce(_ + _)
}
