package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Calibrate the ground-truth recall checks for the hash-based pair
  * operators (VERDICT r3 item 1 — shrink the no_oracle set):
  *
  *   - simhash: what Hamming distance do the word-3-gram jaccard >= tau
  *     truth pairs sit at? (picks maxDist/segments for a
  *     dedup_simhash_recall semi-join entry)
  *   - ANN near-dup pairs: recall vs the exact cosine >= 0.4 pair set
  *     across (nPlanes, nBands). (picks params where recall = 1 so the
  *     semi-join hash-checks against the exact-pairs oracle)
  */
object PairsTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = Tables.load(spark, sf, "documents")
      // --- simhash max hamming per jaccard tier (pick the truth threshold
      // at which simhash capture is total)
      val scored = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, maxDocFreq = 1000L)
      val sigs = Dedup.simhash(docs, "doc_id", "text")
      val withDist = scored
        .join(sigs.withColumnsRenamed(Map("id" -> "id_a", "simhash" -> "sig_a")), "id_a")
        .join(sigs.withColumnsRenamed(Map("id" -> "id_b", "simhash" -> "sig_b")), "id_b")
        .select(col("jaccard"),
          bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
        .cache()
      println(s"== $sf")
      for (tau <- Seq(0.5, 0.6, 0.7, 0.8, 0.9)) {
        val r = withDist.filter(col("jaccard") >= tau)
          .agg(count(lit(1)), max("hamming")).head()
        println(s"   jaccard>=$tau: n=${r.get(0)} maxHamming=${r.get(1)}")
      }
      withDist.unpersist()

      // precision side at the candidate operating points
      for ((d, segs) <- Seq((3, 4), (5, 8), (7, 8))) {
        val n = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = d, segments = segs).count()
        println(s"   simhashPairs(maxDist=$d, segments=$segs) = $n pairs")
      }

      // --- planted NEAR-dup simhash distance: clone docs with one extra
      // token — how many signature bits move? (calibrates a planted-pair
      // recall entry at the default maxDist)
      val planted = docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" graftmark")).as("text"))
      val both = docs.select(col("doc_id"), col("text")).unionByName(planted)
      val sigs2 = Dedup.simhash(both, "doc_id", "text")
      val plantedDist = sigs2.filter(col("id") >= 1000000L)
        .withColumnsRenamed(Map("id" -> "id_c", "simhash" -> "sig_c"))
        .join(sigs2.withColumn("id_c", col("id") + 1000000L), "id_c")
        .select(bit_count(col("sig_c").bitwiseXOR(col("simhash"))).as("hamming"))
      val pr = plantedDist.agg(count(lit(1)), max("hamming")).head()
      println(s"   planted +1-token clones: n=${pr.get(0)} maxHamming=${pr.get(1)}")

      // --- ANN pair recall vs exact cosine pairs: small bands, many of them
      val embs = Tables.load(spark, sf, "embeddings")
      for (tau <- Seq(0.4)) {
        val exact = Similarity.nearDupPairs(embs, "vec_id", "embedding", tau)
          .select("id_a", "id_b")
        val nExact = exact.count()
        for ((p, b) <- Seq((2, 12), (3, 24))) {
          val ann = Similarity.annNearDupPairs(embs, "vec_id", "embedding",
            threshold = tau, nPlanes = p, nBands = b).select("id_a", "id_b")
          val hit = exact.join(ann, Seq("id_a", "id_b"), "semi").count()
          println(f"   tau=$tau ann planes=$p bands=$b recall=${hit.toDouble / nExact}%.3f ($hit/$nExact)")
        }
      }
    }
    spark.stop()
  }
}
