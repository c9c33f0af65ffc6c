package graft.sources.v2

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Canary for the DSv2 column-pruning route. The fluvio scan implements
  * SupportsPushDownRequiredColumns, but Spark 4.1's micro-batch planner
  * plans streaming relations before V2ScanRelationPushDown, so the hook
  * is never called and the explicit `columns` option is the operative
  * pruning route (documented at the scan builder). This spec pins WHICH
  * route is active: if a Spark upgrade starts calling pruneColumns, the
  * first assertion flips and fails loudly — the signal to re-validate
  * that the interface route and the option route agree (they must both
  * land in the same reader projection) instead of silently diverging. */
class DsvPushdownCanarySpec extends SparkSpec {

  private val fmt = classOf[FluvioTableProvider].getName

  test("Spark 4.1 route check: planner never calls pruneColumns; `columns` option is operative") {
    val dir = java.nio.file.Files.createTempDirectory("dsv2_canary_").toFile
    val topicDir = new java.io.File(dir, "events.parquet")
    topicDir.mkdirs()
    Tables.load(spark, sf, "events").filter(col("event_id") < 20)
      .write.mode("append").parquet(topicDir.getAbsolutePath)

    val before = FluvioDsv2.pruneColumnsCalls.get()

    // a stream that only needs `offset`, WITHOUT the columns option —
    // the shape a pushdown-capable planner would prune
    val n1 = s"canary_nopt_${System.nanoTime()}"
    val q1 = spark.readStream.format(fmt)
      .option("cmd", "events -B").option("baseDir", dir.getAbsolutePath)
      .load().select("offset")
      .writeStream.format("memory").queryName(n1).outputMode("append").start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.table(n1).count() == 20)

    // the same shape through the operative option route
    val n2 = s"canary_opt_${System.nanoTime()}"
    val q2 = spark.readStream.format(fmt)
      .option("cmd", "events -B").option("baseDir", dir.getAbsolutePath)
      .option("columns", "offset").load()
      .writeStream.format("memory").queryName(n2).outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()

    // both routes must agree on the delivered offsets
    val viaPlanner = spark.table(n1).collect().map(_.getLong(0)).sorted.toSeq
    val viaOption = spark.table(n2).collect().map(_.getLong(0)).sorted.toSeq
    assert(viaPlanner == viaOption, "pruning routes diverged on offsets")
    assert(spark.table(n2).schema.fieldNames.toSeq == Seq("offset"))

    val calls = FluvioDsv2.pruneColumnsCalls.get() - before
    // THE CANARY: Spark 4.1 micro-batch planning never invokes the
    // interface. If this fails after a Spark upgrade, the planner now
    // pushes columns — update the scan-builder docs, make this assert
    // `calls > 0`, and add an executed-plan check that the interface
    // route yields the same reader projection as the option route.
    assert(calls == 0,
      s"planner called pruneColumns $calls times — Spark's micro-batch " +
        "planner now applies V2 column pushdown; re-validate both routes")
  }
}
