package graft.tools

import org.apache.spark.sql.SparkSession

/** Execute one SparkEntry query and print the FINAL adaptive plan — AQE
  * materializes exchange/stage reuse only at runtime, so explain() before
  * execution understates it:
  * `sbt "runMain graft.tools.ExplainExecuted <name> <sfDir>"` */
object ExplainExecuted {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    // collect() executes THIS QueryExecution, so the AdaptiveSparkPlan
    // below is the final runtime plan (a .write would plan a fresh copy
    // and leave df's own AQE plan in its initial state)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println(plan)
    val stageIds = "ShuffleQueryStage (\\d+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    println(s"[executed] isFinalPlan=${plan.contains("isFinalPlan=true")}; " +
      s"ReusedExchange nodes: ${plan.split("ReusedExchange").length - 1}; " +
      s"shuffle stages: total=${stageIds.size} distinct=${stageIds.distinct.size}; " +
      s"file scans: ${plan.split("FileScan parquet").length - 1}")
    spark.stop()
  }
}
