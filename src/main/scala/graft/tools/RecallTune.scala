package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Similarity
import graft.sources.Tables

/** Measure annTopK recall vs brute force across (nPlanes, probeRadius)
  * settings — picks the bar for SimilaritySpec. */
object RecallTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ones = Array.fill(64)(1.0)
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val embs = Tables.load(spark, sf, "embeddings")
      val exact = Similarity.cosineTopK(embs, "vec_id", "embedding", ones, 20)
        .collect().map(_.getLong(0)).toSet
      for (p <- Seq(8, 10, 12); r <- Seq(2, 3, 4, 5, 6)) {
        val approx = Similarity.annTopK(embs, "vec_id", "embedding", ones, 20,
          nPlanes = p, probeRadius = r).collect().map(_.getLong(0)).toSet
        val cand = embs.count()
        val recall = (exact & approx).size.toDouble / exact.size
        println(f"sf=$sf planes=$p radius=$r recall=$recall%.2f n=$cand")
      }
    }
    spark.stop()
  }
}
