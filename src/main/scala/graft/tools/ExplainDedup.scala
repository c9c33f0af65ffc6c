package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup
import graft.sources.Tables

/** Print the minhash LSH physical plan — checking that the banded
  * signature subtree is exchange-reused across the self-join, not
  * computed twice. */
object ExplainDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    val cand = Dedup.minhashCandidates(docs, "doc_id", "text", 64, 16)
    println("=== before execution (static plan) ===")
    cand.explain("formatted")
    // AQE finalizes reuse at runtime — execute, then print the final plan
    cand.write.format("noop").mode("overwrite").save()
    println("=== after execution (AQE final plan) ===")
    println(cand.queryExecution.executedPlan.toString.take(8000))
  }
}
