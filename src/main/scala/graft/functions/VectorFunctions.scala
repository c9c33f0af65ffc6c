package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float/double>` embedding columns.
  *
  * The element loops run through [[VectorDot]] — a native codegen'd
  * Catalyst expression — rather than the `aggregate`/`zip_with`
  * higher-order functions, which execute interpreted with per-row lambda
  * dispatch and array allocation (~50× slower on 64-dim fixtures).
  *
  * Scale note: these are per-row scalar expressions; the data never moves.
  * At 100 TB the cost center is the *pairing* strategy (see
  * graft.operators.Similarity), not this arithmetic.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column = VectorDot(a, b)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(VectorDot(a, a))

  /** cosine(a, b) ∈ [-1, 1]; NULL when either norm is 0.
    * Prefer precomputing per-row norms before a join (see Similarity) so
    * each pair costs one dot, not three. */
  def cosine(a: Column, b: Column): Column = {
    val d = VectorDot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n === 0.0, lit(null).cast("double")).otherwise(d / n)
  }

  /** Euclidean (L2) distance: √(‖a‖² − 2a·b + ‖b‖²). */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(greatest(VectorDot(a, a) - lit(2.0) * VectorDot(a, b) + VectorDot(b, b), lit(0.0)))

  /** A constant vector as a Column (for query-vector comparisons). */
  def vecLit(v: Array[Double]): Column = typedLit(v.toSeq)

  /** Signed random-hyperplane signature of a vector: for each plane, one
    * bit = (v · plane) >= 0, packed into a Long. Planes are seed-derived,
    * so the signature is deterministic across executors/sessions — the
    * core of the LSH bucketing used for ANN and near-dup at scale. */
  def rhpSignature(v: Column, planes: Array[Array[Double]]): Column = {
    require(planes.length <= 63, "at most 63 hyperplanes per signature word")
    planes.zipWithIndex.map { case (p, i) =>
      when(VectorDot(v, vecLit(p)) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Deterministic hyperplanes: standard-normal-ish values from a seeded
    * generator (Box–Muller over a SplittableRandom). */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new java.util.SplittableRandom(seed)
    Array.fill(nPlanes, dim) {
      val u1 = math.max(rnd.nextDouble(), 1e-12)
      val u2 = rnd.nextDouble()
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    }
  }

  /** Hamming distance between two signature words. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
