package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Pq, Similarity}
import graft.sources.Tables

/** PQ operating-point measurement: shortlist recall of the true top-k
  * under ADC scoring, across (m, codeBits, shortlist), on a panel of
  * real corpus query vectors. Measurements cited in Pq scaladoc and
  * pinned in PqSpec.
  *
  * Usage: runMain graft.tools.PqTune [sfDir] [k]
  */
object PqTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val k = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val embs = Tables.load(spark, sfDir, "embeddings").cache()
    val n = embs.count()
    val queries = embs.select(col("vec_id"), col("embedding").cast("array<double>"))
      .orderBy(xxhash64(col("vec_id"), lit(11L))).limit(6)
      .collect().map(_.getSeq[Double](1).toArray) :+ Array.fill(64)(1.0)

    def meanRecall(m: Int, bits: Int, shortlist: Int): Double = {
      val rs = queries.map { q =>
        val exact = Similarity.cosineTopK(embs, "vec_id", "embedding", q, k)
          .collect().map(_.getLong(0)).toSet
        val got = Pq.pqTopK(embs, "vec_id", "embedding", q, k,
          m = m, codeBits = bits, shortlist = shortlist)
          .collect().map(_.getLong(0)).toSet
        (exact & got).size.toDouble / exact.size
      }
      rs.sum / rs.length
    }

    println(s"[pqtune] n=$n k=$k panel=${queries.length}")
    for ((m, bits) <- Seq((8, 4), (16, 4), (8, 8), (16, 8), (32, 4));
         s <- Seq(50, 100, 200))
      println(f"[pqtune] m=$m%2d bits=$bits shortlist=$s%3d meanRecall=${meanRecall(m, bits, s)}%.4f")
    spark.stop()
  }
}
