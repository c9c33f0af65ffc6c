package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float/double>` embedding columns, built from
  * Catalyst higher-order functions (`zip_with`, `aggregate`) so everything
  * stays inside whole-stage codegen — no UDFs, no serialization cliffs.
  *
  * Scale note: these are per-row scalar expressions; the data never moves.
  * At 100 TB the cost center is the *pairing* strategy (see
  * graft.operators.Similarity), not this arithmetic.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ — both sides cast to double once. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + x)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a, b) ∈ [-1, 1]; NULL when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n === 0.0, lit(null).cast("double")).otherwise(d / n)
  }

  /** Euclidean (L2) distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, x) => acc + x))

  /** A constant vector as a Column (for query-vector comparisons). */
  def vecLit(v: Array[Double]): Column = typedLit(v.toSeq)

  /** Signed random-hyperplane signature of a vector: for each plane, one
    * bit = (v · plane) >= 0, packed into a Long. Planes are seed-derived,
    * so the signature is deterministic across executors/sessions — the
    * core of the LSH bucketing used for ANN and near-dup at scale. */
  def rhpSignature(v: Column, planes: Array[Array[Double]]): Column = {
    require(planes.length <= 63, "at most 63 hyperplanes per signature word")
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, vecLit(p)) >= 0.0, lit(1L << i)).otherwise(lit(0L))
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
