package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Pq
import graft.sources.Tables

/** Phase breakdown of emb_pq_topk's cost: codebook training (driver
  * k-means) vs plan build vs execution, cold and warm. */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val embs = Tables.load(spark, sfDir, "embeddings")
    val ones = Array.fill(64)(1.0)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pqprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 1 to 3) {
      println(s"[pqprof] --- round $round ---")
      val cbs = t("codebooks (train)")(
        Pq.codebooks(embs, "vec_id", "embedding", m = 16, codeBits = 8,
          iters = 3, maxSample = 1024))
      t("full pqTopK call")(
        Pq.pqTopK(embs, "vec_id", "embedding", ones, 20,
          m = 16, codeBits = 8, shortlist = 100, iters = 3,
          maxSample = 1024).collect())
      t("encode-only job")(
        embs.select(Pq.encode(col("embedding"), cbs).as("c")).collect())
    }
    spark.stop()
  }
}
