package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Time the dedup_clusters stages at sf0.1: the edge pipeline vs the CC
  * iteration (rounds × per-round cost) — picks where to optimize. */
object ProfileCc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark,
      args.headOption.getOrElse("/root/testdata/sf0.1"), "documents")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (i <- 1 to 2) {
      println(s"== pass $i")
      val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3,
        maxDocFreq = 1000L).filter(col("jaccard") >= 0.5)
      val edges = timed("edge pipeline (materialize pairs)")(
        pairs.localCheckpoint(true))
      timed("clusters() on materialized pairs")(
        Dedup.clusters(edges).write.format("noop").mode("overwrite").save())
      timed("clusters() end-to-end (incl. pipeline)")(
        Dedup.clusters(Dedup.ngramJaccard(docs, "doc_id", "text", n = 3,
          maxDocFreq = 1000L).filter(col("jaccard") >= 0.5))
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
