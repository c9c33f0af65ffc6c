package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** A/B the dedup_clusters ENTRY against its parts in one JVM — wrote to
  * chase the r7 bench regression (1.94 -> 3.40 s): is the cost in the
  * edge pipeline, the CC loop, the orderBy tail, or the entry context? */
object CcEntryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.execution.topKSortFallbackThreshold", "100000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (i <- 1 to 3) {
      println(s"== pass $i")
      val docs = Tables.load(spark, sfDir, "documents")
      timed("pipeline+clusters, no orderBy (noop)")(
        Dedup.clusters(Dedup.ngramJaccard(docs, "doc_id", "text", n = 3,
          maxDocFreq = 1000L).filter(col("jaccard") >= 0.5))
          .write.format("noop").mode("overwrite").save())
      timed("ENTRY dedup_clusters (with orderBy, noop)")(
        graft.SparkEntry.queries("dedup_clusters")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
