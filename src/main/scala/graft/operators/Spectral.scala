package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{dot, vecLit}

/** Distributed spectral primitives over the embedding table.
  *
  * [[powerIteration]] computes the corpus' dominant principal direction
  * (top eigenvector of the uncentered Gram matrix XᵀX) — the first step
  * of embedding whitening/ABTT ("all-but-the-top") and a building block
  * for PCA-based dimensionality reduction. Each iteration is ONE
  * distributed pass: score every row (s = x·v, a codegen'd VectorDot),
  * accumulate the 64 per-dimension sums of x_d·s, renormalize. The
  * iterate is MODEL-sized (64 numbers) — the only driver-side state,
  * same budget class as the ANN training samples.
  *
  * Cross-engine exact reproducibility (the repo's integer-quantization
  * discipline applied to LINEAR ALGEBRA): per-row terms round to CENTI
  * units before the per-dimension sum, so each sum is exact BIGINT
  * addition (order-free — and sized so even the squared norms stay
  * under 2^53, where integer-valued doubles are exact); the norm is the
  * square root of an exact integer; each new iterate component rounds
  * ONCE to micro units. DuckDB replays the identical unrolled algebra
  * and hash-matches the final eigenvector to the micro digit.
  */
object Spectral {

  /** (d, v_micro) rows: the dominant direction after `iters` rounds,
    * components in micro units (‖v‖ ≈ 1). Deterministic: v₀ = all-ones,
    * fixed iteration count, integer-quantized iterates. */
  def powerIteration(df: DataFrame, vecCol: String, dims: Int = 64,
                     iters: Int = 2): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters must be in [1,8], got $iters")
    val spark = df.sparkSession
    var v: Array[Double] = Array.fill(dims)(1.0)
    for (_ <- 1 to iters) {
      val sc = dot(col(vecCol), vecLit(v))
      // centi-rounding keeps Σ(term)² < 2^53 through ~100× the bench SF
      // while leaving ~6 significant digits in every sum
      val aggs = (0 until dims).map(d =>
        sum(round(element_at(col(vecCol), d + 1) * sc * 1e2).cast("long"))
          .as(s"s$d"))
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      val s = (0 until dims).map(d => row.getLong(d)).toArray
      var sq = 0L
      s.foreach(x => sq += x * x)
      val nrm = math.sqrt(sq.toDouble)
      v = s.map(x => math.round(x * 1e6 / nrm) / 1e6)
    }
    spark.createDataFrame(
      (0 until dims).map(d => (d, math.round(v(d) * 1e6)))).toDF("d", "v_micro")
  }
}
