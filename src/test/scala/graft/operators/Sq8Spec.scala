package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization: params training, the fused encode/dot
  * kernels, exact-rerank equality with brute force, and the
  * materialized-index compressed-scan + id-pushdown contract. */
class Sq8Spec extends SparkSpec {

  private lazy val embs = Tables.load(spark, sf, "embeddings")
  private val ones = Array.fill(64)(1.0)

  test("params: deterministic, positive scales, dequant error bounded by scale/2") {
    val p1 = Sq.params(embs, "vec_id", "embedding")
    val p2 = Sq.params(embs, "vec_id", "embedding")
    assert(p1.mins.sameElements(p2.mins) && p1.scales.sameElements(p2.scales))
    assert(p1.scales.forall(_ > 0.0))
    // round-trip on real rows: |dequant(code) - v| <= scale/2 per dim
    // for every in-range value (saturated dims can exceed; the fixture
    // sample at 2048 >= row count covers the full range, so none saturate)
    val rows = Sq.encodedTable(embs, "embedding", p1)
      .select(col("embedding").cast("array<double>"), col("sq_code"))
      .limit(200).collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](0)
      val code = r.getAs[Array[Byte]](1)
      assert(code.length == 64) // 64 BYTES: the true 4x-vs-fp32 claim
      var i = 0
      while (i < 64) {
        val deq = p1.mins(i) + (code(i) & 0xff) * p1.scales(i)
        assert(math.abs(deq - v(i)) <= p1.scales(i) / 2 + 1e-12,
          s"dim $i: dequant $deq vs ${v(i)} (scale ${p1.scales(i)})")
        i += 1
      }
    }
  }

  test("encode fails loudly on ragged vectors and null elements") {
    val p = Sq.params(embs, "vec_id", "embedding")
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + msgs(t.getCause)
    val short = spark.range(1).select(
      Sq.encode(expr("array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE))"), p).as("c"))
    val e1 = intercept[Exception](short.collect())
    assert(msgs(e1).contains("elements"), msgs(e1))
    val arrSql = (0 until 64)
      .map(i => if (i == 5) "CAST(NULL AS DOUBLE)" else "1.0")
      .mkString("array(", ", ", ")")
    val e2 = intercept[Exception](
      spark.range(1).select(Sq.encode(expr(arrSql), p).as("c")).collect())
    assert(msgs(e2).contains("null element"), msgs(e2))
  }

  test("sqTopK with exact rerank EQUALS brute force (the CORRECTNESS contract)") {
    val exact = Similarity.cosineTopK(embs, "vec_id", "embedding", ones, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = Sq.sqTopK(embs, "vec_id", "embedding", ones, k = 20, shortlist = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == exact)
  }

  test("shortlist margin: exact well below the shipped shortlist") {
    // SQ8's per-dimension error is tiny (range/510), so even a bare-k
    // shortlist stays exact on the fixture — the shipped 100 is pure margin
    val exact = Similarity.cosineTopK(embs, "vec_id", "embedding", ones, 20)
      .collect().map(_.getLong(0)).toSeq
    for (sl <- Seq(25, 50)) {
      val got = Sq.sqTopK(embs, "vec_id", "embedding", ones, k = 20, shortlist = sl)
        .collect().map(_.getLong(0)).toSeq
      assert(got == exact, s"shortlist=$sl diverged")
    }
  }

  test("sq queries panel: exact-equality holds across real corpus query vectors") {
    val queries = embs.select(col("vec_id"), col("embedding").cast("array<double>"))
      .orderBy(xxhash64(col("vec_id"), lit(23L))).limit(4)
      .collect().map(r => r.getSeq[Double](1).toArray)
    val p = Sq.params(embs, "vec_id", "embedding")
    queries.foreach { q =>
      val exact = Similarity.cosineTopK(embs, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSeq
      val got = Sq.sqTopK(embs, "vec_id", "embedding", q, k = 10, p, shortlist = 50)
        .collect().map(_.getLong(0)).toSeq
      assert(got == exact)
    }
  }

  test("sqTopKFromEncoded: compressed scan reads bytes+norm only; id-pushdown rerank equals brute force") {
    val p = Sq.params(embs, "vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("sq8_encoded").toFile
    Sq.encodedTable(embs, "embedding", p).drop("embedding")
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val encoded = spark.read.parquet(dir.getAbsolutePath)
    // the fp32 column is GONE from the compressed table entirely
    assert(!encoded.columns.contains("embedding"))

    val exact = Similarity.cosineTopK(embs, "vec_id", "embedding", ones, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = Sq.sqTopKFromEncoded(encoded, embs, "vec_id", "embedding",
      p, ones, k = 20, shortlist = 100)
    val gotRows = got.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(gotRows == exact)
    // the exact rerank fetches the shortlist by PUSHED id filter — at
    // scale it reads matching row groups, not the corpus
    val rerankPlan = got.queryExecution.executedPlan.toString
    assert(rerankPlan.contains("PushedFilters: [In(vec_id"), rerankPlan)
  }
}
