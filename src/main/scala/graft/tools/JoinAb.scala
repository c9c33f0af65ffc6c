package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B of the remaining sort-merge-join sites under AQE's runtime
  * SMJ→SHJ rewrite (optimization guide §3.1; VERDICT r14 task 4 — the
  * config was deliberately NOT shipped unmeasured in r14).
  *
  *   sbt "runMain graft.tools.JoinAb <sfDir> <reps> <out.json> e1,e2,..."
  *
  * Two legs in one JVM, each a fresh session:
  *   smj — the exact bench session config (shipped behavior);
  *   shj — bench config + spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64m
  *         (AQE rewrites a sort-merge join to shuffled-hash at runtime
  *         when every post-shuffle partition is under the threshold —
  *         skipping both sides' sorts; 64 MB bounds the per-task build
  *         table the way the guide sizes reduce partitions).
  *
  * Per entry per leg: warm-up + `reps` timed noop runs (min reported),
  * plus the EXECUTED plan's SortMergeJoin/ShuffledHashJoin node counts so
  * the artifact proves the rewrite actually fired. Host calibration rides
  * each leg (graft.Bench.calibrationDf) for the stall record.
  */
object JoinAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val outPath = args(2)
    val entries = args(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq

    def leg(name: String, extra: Map[String, String]): String = {
      val spark = graft.Bench.sessionWith(
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), extra)
      // warm-up: every entry once + calibration
      for (e <- entries)
        graft.Bench.timeNoop(graft.SparkEntry.queries(e)(spark, sfDir))
      val cal = scala.collection.mutable.ArrayBuffer.empty[Double]
      cal += graft.Bench.timeNoop(graft.Bench.calibrationDf(spark))
      val times = scala.collection.mutable.Map.empty[String, List[Double]]
      for (_ <- 1 to reps; e <- entries) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(e)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        times(e) = t :: times.getOrElse(e, Nil)
      }
      cal += graft.Bench.timeNoop(graft.Bench.calibrationDf(spark))
      // executed-plan join strategy per entry (collect so AQE finalizes)
      val joins = entries.map { e =>
        val df = graft.SparkEntry.queries(e)(spark, sfDir)
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        val smj = "SortMergeJoin".r.findAllIn(plan).size
        val shj = "ShuffledHashJoin".r.findAllIn(plan).size
        e -> (smj, shj)
      }.toMap
      val entryJson = entries.map { e =>
        val ts = times(e).reverse
        val (smj, shj) = joins(e)
        "\"" + e + "\":" +
          f"""{"min":${ts.min}%.3f,"passes":${ts.map(t => f"$t%.3f").mkString("[", ",", "]")},"smj":$smj,"shj":$shj}"""
      }.mkString("{", ",", "}")
      val calJson = cal.map(v => f"$v%.3f").mkString("[", ",", "]")
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      s""""$name":{"cal":$calJson,"entries":$entryJson}"""
    }

    val smjLeg = leg("smj", Map.empty)
    val shjLeg = leg("shj", Map(
      "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "67108864"))
    val line = s"""{"metric":"join_ab","sf":"$sfDir","reps":$reps,$smjLeg,$shjLeg}"""
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
  }
}
