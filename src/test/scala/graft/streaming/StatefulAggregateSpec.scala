package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StatefulAggregateSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("runningSeededConcat keeps per-key state across micro-batches, seeded once") {
    val input = MemoryStream[(String, String)]
    val out = StatefulAggregate.runningSeededConcat(input.toDS, "SEED", "|")
    val name = s"mem_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      input.addData(("k1", "a"), ("k2", "x"))
      q.processAllAvailable()
      input.addData(("k1", "b")) // second micro-batch folds into existing state
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name).as[(String, String)].collect()
    // the longest emission per key is the final accumulator (row order in
    // the memory sink is not guaranteed)
    val last = rows.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_.length) }
    assert(last("k1") == "SEED|a|b")
    assert(last("k2") == "SEED|x")
  }

  test("runningSeededSum accumulates numerically from the seed") {
    val input = MemoryStream[(String, Double)]
    val out = StatefulAggregate.runningSeededSum(input.toDS, 100.0)
    val name = s"mem_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      input.addData(("k", 1.0), ("k", 2.0))
      q.processAllAvailable()
      input.addData(("k", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table(name).as[(String, Double)].collect().map(_._2).max
    assert(last == 106.0)
  }
}
