package graft.tools

import org.apache.spark.sql.SparkSession

/** Replica of the driver's t1 smoke: call SparkEntry.entry with a PLAIN
  * session (no graft-specific configs — entry must self-provision, e.g.
  * the nanosAsLong conf) and check rows > 0. */
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, false)
    println(s"[smoke] entry rows=$n " + (if (n > 0) "OK" else "FAIL"))
    spark.stop()
  }
}
