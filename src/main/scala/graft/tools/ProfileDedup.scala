package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Stage-by-stage timing of the dedup pipelines at a given sf dir —
  * round-2 perf triage. `sbt "runMain graft.tools.ProfileDedup <sfDir> [fallbackThreshold]"` */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val thresh = if (args.length > 1) args(1) else "128"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", thresh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    def run(name: String)(df: => DataFrame): Unit =
      time(name)(df.write.format("noop").mode("overwrite").save())

    val docs = Tables.load(spark, sfDir, "documents")
    println(s"=== fallbackThreshold=$thresh sf=$sfDir docs=${docs.count()}")

    run("shingles")(Dedup.shingles(docs, "doc_id", "text"))
    run("shingles(2nd)")(Dedup.shingles(docs, "doc_id", "text"))
    run("minhashSignatures")(Dedup.minhashSignatures(docs, "doc_id", "text"))
    run("minhashSignatures(2nd)")(Dedup.minhashSignatures(docs, "doc_id", "text"))
    run("minhashCandidates")(Dedup.minhashCandidates(docs, "doc_id", "text", 64, 16))
    run("minhashNearDups")(Dedup.minhashNearDups(docs, "doc_id", "text", 0.2))
    run("ngramJaccard")(Dedup.ngramJaccard(docs, "doc_id", "text", 3)
      .filter(col("jaccard") >= 0.1))
    run("simhashPairs")(Dedup.simhashPairs(docs, "doc_id", "text", 3))
    spark.stop()
  }
}
