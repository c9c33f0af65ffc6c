package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Sweep the winnow window `w`: pair-set agreement vs the word-3-gram
  * jaccard ground truth, plus wall time — picks the dedup_winnow default.
  * `sbt "runMain graft.tools.WinnowTune <sfDir>"` */
object WinnowTune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")

    val truth = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 1000L)
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"=== $sfDir word-3-gram truth pairs: ${truth.size}")

    for (w <- Seq(4, 8, 16, 32)) {
      val t0 = System.nanoTime()
      val pairs = Dedup.winnowNearDups(docs, "doc_id", "text",
          threshold = 0.5, k = 20, w = w, maxDocFreq = 1000L)
        .select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val secs = (System.nanoTime() - t0) / 1e9
      val inter = (truth & pairs).size
      println(f"w=$w%-3d pairs=${pairs.size}%-5d recall=${inter.toDouble / truth.size}%.3f " +
        f"precision=${if (pairs.isEmpty) 1.0 else inter.toDouble / pairs.size}%.3f time=$secs%.2f s")
    }
    spark.stop()
  }
}
