package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup
import graft.sources.Tables
import scala.jdk.CollectionConverters._

/** Repeat one job N times and sample thread stacks during slow runs —
  * diagnosing the round-1 "suite-position degradation" where an identical
  * plan re-executed in the same JVM runs 10-15× slower.
  * `sbt "runMain graft.tools.ProfileRepeat <sfDir> <reps>"` */
object ProfileRepeat {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
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

    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        Thread.sleep(3000)
        if (sampling) {
          val stacks = Thread.getAllStackTraces.asScala
            .filter { case (t, st) => st.nonEmpty && t.getState == Thread.State.RUNNABLE }
            .map { case (t, st) =>
              s"--- ${t.getName}\n    " + st.take(14).mkString("\n    ")
            }
          println(s"===== SAMPLE @${System.currentTimeMillis()}")
          stacks.foreach(println)
        }
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      sampling = i >= 2 // sample from the second (degraded) rep onward
      Dedup.shingles(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
      sampling = false
      println(f"rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
