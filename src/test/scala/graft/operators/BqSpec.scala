package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binary (1-bit) quantization ANN: sign-word packing, Hamming shortlist
  * semantics, and the shortlist-covers-the-true-top-k margin that lets
  * emb_binary_topk share the exact brute-force oracle.
  */
class BqSpec extends SparkSpec {
  import spark.implicits._

  private val ones = Array.fill(64)(1.0)
  private def embs = spark.read.parquet(s"$sf/embeddings.parquet")

  test("hamming against the all-ones query counts non-positive dimensions") {
    val df = Seq(
      (1L, Array.fill(64)(1.0f)),             // all positive -> 0
      (2L, Array.fill(64)(-1.0f)),            // all negative -> 64
      (3L, Array.tabulate(64)(d => if (d < 10) -1.0f else 1.0f)) // 10
    ).toDF("vec_id", "embedding")
    val got = Bq.hammingTable(df, "vec_id", "embedding", ones)
      .select("vec_id", "hamming").as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 64, 3L -> 10))
  }

  test("sign words are exact: bit d set iff dimension d is positive") {
    val v = Array.tabulate(64)(d => if (d % 3 == 0) 1.0f else -1.0f)
    val df = Seq((1L, v)).toDF("vec_id", "embedding")
    val row = Bq.hammingTable(df, "vec_id", "embedding", ones).head()
    val (w0, w1) = (row.getLong(1), row.getLong(2))
    (0 until 64).foreach { d =>
      val bit = if (d < 32) (w0 >> d) & 1L else (w1 >> (d - 32)) & 1L
      assert((bit == 1L) === (v(d) > 0), s"dim $d")
    }
  }

  test("measured recall@20 at the shipped operating point (honest lossy rung)") {
    // one sign bit per dim ignores magnitudes — recall < 1 is EXPECTED;
    // this pins the measured fixture value so a quantization change that
    // silently degrades (or a fix that improves) recall shows up here
    val truth = Similarity.cosineTopK(embs, "vec_id", "embedding", ones, 20)
      .select("vec_id").as[Long].collect().toSet
    val bq = Bq.bqTopK(embs, "vec_id", "embedding", ones, k = 20, shortlist = 100)
      .select("vec_id").as[Long].collect().toSet
    val recall = (bq & truth).size
    assert(recall >= 15 && recall <= 20, s"recall@20 = $recall/20 left the pinned band")
  }

  test("bqTopK = exact cosine rerank restricted to its own Hamming shortlist") {
    val short = Bq.hammingTopK(embs, "vec_id", "embedding", ones, 100)
      .select("vec_id").as[Long].collect().toSet
    val expected = Similarity.cosineTopK(
      embs.filter(col("vec_id").isin(short.toSeq: _*)),
      "vec_id", "embedding", ones, 20)
      .withColumn("score", round(col("score"), 6))
      .as[(Long, Double)].collect().toSeq
    val bq = Bq.bqTopK(embs, "vec_id", "embedding", ones, k = 20, shortlist = 100)
      .withColumn("score", round(col("score"), 6))
      .as[(Long, Double)].collect().toSeq
    assert(bq === expected)
  }

  test("encoded index answers identically to the inline pipeline (16-byte scan)") {
    val dir = java.nio.file.Files.createTempDirectory("bq_codes").toFile.getAbsolutePath
    Bq.encodedTable(embs, "vec_id", "embedding")
      .drop("embedding", "label")
      .write.mode("overwrite").parquet(dir)
    val codes = spark.read.parquet(dir)
    // the index is 16 bytes/vector: id + two sign words, NO fp32 column
    assert(codes.columns.sorted.toSeq === Seq("vec_id", "w0", "w1"))
    val fromIdx = Bq.bqTopKFromEncoded(codes, embs, "vec_id", "embedding",
        ones, k = 20, shortlist = 100)
      .withColumn("score", round(col("score"), 6))
      .as[(Long, Double)].collect().toSeq
    val inline = Bq.bqTopK(embs, "vec_id", "embedding", ones, k = 20, shortlist = 100)
      .withColumn("score", round(col("score"), 6))
      .as[(Long, Double)].collect().toSeq
    assert(fromIdx === inline)
  }

  test("bqTopK rejects shortlist < k") {
    assertThrows[IllegalArgumentException] {
      Bq.bqTopK(embs, "vec_id", "embedding", ones, k = 20, shortlist = 10)
    }
  }
}
