package graft.tools
import org.apache.spark.sql.SparkSession

/** Measurement behind NOT shipping a high-threshold "deployment" RHP
  * near-dup entry (r13): at cosine >= 0.7 the fixtures contain ZERO
  * pairs at every SF, and at >= 0.5 only 14 pairs exist at sf0.1 with
  * no small-bucket operating point reaching recall 1 (best: 4 planes x
  * 16 bands = 13/14; 2-plane points are cap-collapsed by design). An
  * entry needs recall EXACTLY 1 on the fixture for its exact-pair
  * oracle to hash-match, so the 0.4-threshold validation twin
  * (emb_ann_neardups, uncapped, by_design) remains the fixture's only
  * honest RHP near-dup operating point; the capped deployment story at
  * scale is carried by the minhash family instead. */
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables
object RhpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val e = Tables.load(spark, s"/root/testdata/$sf", "embeddings")
      val exact = Similarity.nearDupPairs(e, "vec_id", "embedding", threshold = 0.5)
        .select("id_a", "id_b")
      val nExact = exact.count()
      for ((p, b) <- Seq((3, 16), (3, 12), (4, 16), (2, 16))) {
        val ann = Similarity.annNearDupPairs(e, "vec_id", "embedding",
          threshold = 0.5, nPlanes = p, nBands = b)
        val hit = exact.join(ann, Seq("id_a", "id_b"), "semi").count()
        println(s"$sf planes=$p bands=$b: recall $hit/$nExact")
      }
    }
    spark.stop()
  }
}
