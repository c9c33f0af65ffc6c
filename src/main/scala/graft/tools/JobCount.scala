package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Count Spark jobs / stages / tasks / shuffle bytes for named SparkEntry
  * queries — the r14 optimization evidence channel for operators whose
  * cost lives in DRIVER-SIDE ITERATION (pagerank, power iteration, CC,
  * BPE): their dumped plans only show the final assembled query, so the
  * before/after comparison must count the work the whole entry schedules.
  *
  *   sbt "runMain graft.tools.JobCount <sfDir> q1 q2 ..."
  *
  * Runs each query twice (noop sink, bench session config) and reports the
  * SECOND run, so one-time artifact builds (artifactDir caches) and codegen
  * warm-up do not pollute the counts.
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shuffleWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        shuffleWrite.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })
    for (name <- names) {
      var t = 0.0
      for (rep <- 1 to 2) {
        // settle the (async) listener bus from the previous rep before
        // resetting — a short sleep is enough for these bounded suites
        Thread.sleep(500)
        jobs.set(0); stages.set(0); tasks.set(0); shuffleWrite.set(0)
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        t = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500)
      }
      println(f"[jobcount] $name%-28s jobs=${jobs.get}%4d stages=${stages.get}%4d " +
        f"tasks=${tasks.get}%6d shuffleWriteMB=${shuffleWrite.get / 1e6}%9.2f t=$t%7.2f s")
    }
    spark.stop()
  }
}
