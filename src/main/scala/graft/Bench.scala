package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric","value","unit","queries","sf","runs"}.
  *
  * Execution is forced through the noop sink (full pipeline runs, rows are
  * materialized and discarded on executors) — `count()` would let Catalyst
  * prune the work and under-report.
  *
  * Each query is timed SPARK_GRAFT_RUNS times (default 2) and the minimum
  * is reported — steady-state methodology: single-shot timings on this VM
  * showed a roaming ~25-30 s stall window (host/GC noise) landing on a
  * different query every run, inflating one or two otherwise-sub-second
  * entries 10-30×. The min of two passes measures the engine, not the
  * neighbor noise; the run count is carried in the JSON.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      // default threshold is Int.MaxValue: a huge .limit(n) then allocates
      // an n-entry top-k buffer per partition (TakeOrderedAndProject);
      // above this, plans fall back to distributed Sort + GlobalLimit
      .config("spark.sql.execution.topKSortFallbackThreshold", "100000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // TypedImperativeAggregates (MinHashAgg/SimHashAgg) plan as
      // ObjectHashAggregate; the default 128-group threshold degrades any
      // real corpus to per-partition sort-based aggregation
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      // the generated-class cache holds 100 entries by default; a
      // 114-query suite interleaved twice evicts essentially everything
      // between passes, re-paying janino compilation per query per pass
      // (measured: common-105 subtotal 52.8 -> 62.1 s when the suite grew
      // past the cache). A long-lived service JVM would size this the
      // same way.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // fixture tables are single small parquet files; without a lower
      // split size every scan is one input partition and per-row-expensive
      // operators (JSON transforms) run on one core
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // JVM/codegen warm-up outside the timed region
    SparkEntry.queries.get("q1_pricing_summary")
      .foreach(fn => fn(spark, sfDir).write.format("noop").mode("overwrite").save())

    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt.max(1)
    // Failed runs are EXCLUDED from the min (a fast throw must not shrink
    // the reported time); a query with zero successful runs reports null
    // and is listed under "failed" instead of contributing 0 to the total.
    //
    // Passes are INTERLEAVED (the whole suite once, then again), not
    // per-query back-to-back reps: this VM has a roaming ~25-30 s
    // host/GC stall window, and back-to-back reps let one window inflate
    // BOTH timings of whichever query it lands on (observed: a 0.5 s
    // query reporting 43 s min-of-2). Separated passes put the window on
    // different queries each time, so the min measures the engine.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to runs; (name, fn) <- ordered) {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        if (!best.get(name).exists(_ <= t)) best(name) = t
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
    }
    val results = ordered.map { case (name, _) => name -> best.get(name) }
    // (round-1 per-query clearCache+System.gc hygiene removed: the
    // "suite-position degradation" it papered over was interpreted
    // higher-order-function eval in the shingle path — fixed at the
    // source by the native WordShingles expression; operators no longer
    // cache, so there is nothing to clear.)
    val qs = results.map {
      case (k, Some(v)) => "\"" + k + f"""\":$v%.3f"""
      case (k, None)    => "\"" + k + "\":null"
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, None) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    val full =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir","runs":$runs}"""
    // The full JSON line is long (~86 per-query entries) and the driver's
    // tail-capture clipped it in r3 (BENCH_r03.json: parsed=null, truncated
    // total). Three redundant emissions so no capture mode can lose it:
    // the full line to stdout, the same line to bench_full.json, and a
    // SHORT total-only line LAST — short enough to survive any tail clip.
    println(full)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_full.json"),
      (full + "\n").getBytes("UTF-8"))
    catch { case e: Exception => System.err.println(s"[bench] file write failed: $e") }
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","sf":"$sfDir","runs":$runs,"n_queries":${results.size},"n_failed":${results.count(_._2.isEmpty)}}""")
    spark.stop()
  }
}
