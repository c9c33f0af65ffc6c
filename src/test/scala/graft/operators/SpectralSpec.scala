package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Power iteration: determinism, normalization, and actual convergence
  * to the dominant direction on a planted-spectrum matrix.
  */
class SpectralSpec extends SparkSpec {
  import spark.implicits._

  private def embs = spark.read.parquet(s"$sf/embeddings.parquet")

  test("iterate is unit-norm in micro units and partitioning-independent") {
    val a = Spectral.powerIteration(embs, "embedding")
      .orderBy("d").as[(Int, Long)].collect().toSeq
    val b = Spectral.powerIteration(embs.repartition(13), "embedding")
      .orderBy("d").as[(Int, Long)].collect().toSeq
    assert(a === b, "iterate must not depend on the data's partitioning")
    val norm2 = a.map(_._2.toDouble / 1e6).map(x => x * x).sum
    assert(math.abs(norm2 - 1.0) < 1e-3, s"|v|^2 = $norm2, expected ~1")
  }

  test("converges to the planted dominant direction") {
    // matrix with a planted spectrum: 300 rows along +/- e7 with scale 10
    // (sign-balanced, so the MEAN is ~0 but the VARIANCE concentrates on
    // dim 7 — exactly what the Gram-matrix eigenvector finds), plus mild
    // deterministic noise everywhere else
    val rnd = new scala.util.Random(5L)
    val rows = (1 to 300).map { i =>
      val base = Array.tabulate(64)(_ => (rnd.nextFloat() - 0.5f) * 0.1f)
      base(7) = (if (i % 2 == 0) 10.0f else -10.0f)
      (i.toLong, base)
    }
    val df = rows.toDF("vec_id", "embedding")
    val v = Spectral.powerIteration(df, "embedding", iters = 4)
      .orderBy("d").as[(Int, Long)].collect().map(_._2.toDouble / 1e6)
    assert(math.abs(math.abs(v(7)) - 1.0) < 0.01,
      s"dominant component should be ~±1 on dim 7, got ${v(7)}")
    val offMass = v.zipWithIndex.filter(_._2 != 7).map(x => x._1 * x._1).sum
    assert(offMass < 0.01, s"off-dimension mass $offMass")
  }

  test("deflated second component is near-orthogonal to the first") {
    val v1 = Spectral.powerIteration(embs, "embedding")
      .orderBy("d").as[(Int, Long)].collect().map(_._2.toDouble / 1e6)
    val projected = embs
      .select(col("vec_id"), col("embedding"),
        graft.functions.VectorFunctions.dot(col("embedding"),
          graft.functions.VectorFunctions.vecLit(v1)).as("sc"))
      .select(col("vec_id"),
        array((0 until 64).map(d =>
          element_at(col("embedding"), d + 1) - col("sc") * lit(v1(d))): _*)
          .as("ep"))
    val v2 = Spectral.powerIteration(projected, "ep")
      .orderBy("d").as[(Int, Long)].collect().map(_._2.toDouble / 1e6)
    val dot12 = v1.zip(v2).map { case (a, b) => a * b }.sum
    // micro quantization + 2 iterations leave a small residue; the
    // directions must still be essentially orthogonal
    assert(math.abs(dot12) < 0.05, s"v1·v2 = $dot12")
    val n2 = v2.map(x => x * x).sum
    assert(math.abs(n2 - 1.0) < 1e-3, s"|v2|^2 = $n2")
  }

  test("iteration-count bounds are enforced") {
    assertThrows[IllegalArgumentException] {
      Spectral.powerIteration(embs, "embedding", iters = 0)
    }
  }
}
