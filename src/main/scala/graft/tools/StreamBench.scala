package graft.tools

import org.apache.spark.sql.SparkSession
import graft.sources.v2.{FluvioDsv2, FluvioTableProvider}

/** Streaming throughput of the DSv2 path: drain the events topic at
  * `SPARK_GRAFT_SF_DIR` through admission-capped micro-batches
  * (`maxRecordsPerTrigger`, `maxBytesPerTrigger` both engaged — the
  * production configuration, not the unthrottled one) into the noop
  * sink, and report steady-state records/s from the per-batch progress
  * the engine itself records. The reference's one performance claim is
  * about streaming consumption; this is our number for the same seat.
  *
  * Also reports `footer_parses`: planner-side parquet footer reads
  * performed across the WHOLE drain — the steady-state contract
  * (FluvioDsv2Spec pins it) is ≤ one parse per segment file ever,
  * regardless of trigger count, because `latestOffset` row counts come
  * from the (path, mtime, length)-keyed cache.
  *
  * Emits ONE JSON line (stdout + stream_bench.json), bench_full-style:
  * `sbt "runMain graft.tools.StreamBench"` (env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_STREAM_CAP records/trigger, default 5000).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cap = sys.env.getOrElse("SPARK_GRAFT_STREAM_CAP", "5000").toLong
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.metricsEnabled", "true")
      // recentProgress retains only the last N updates (default 100);
      // a tight trigger cap produces more data batches than that and
      // the artifact would silently describe a SUFFIX of the drain
      // while claiming the whole — retain enough for any cap
      .config("spark.sql.streaming.numRecentProgressUpdates", "100000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ckpt = java.nio.file.Files.createTempDirectory("stream_bench_ckpt_")
    val parsesBefore = FluvioDsv2.footerParses.get()
    val t0 = System.nanoTime()
    val q = spark.readStream.format(classOf[FluvioTableProvider].getName)
      .option("cmd", "events -B")
      .option("baseDir", sfDir)
      .option("maxRecordsPerTrigger", cap)
      // generous byte cap so BOTH admission paths execute; the record
      // cap is the binding one at the default sizes
      .option("maxBytesPerTrigger", 64L * 1024 * 1024)
      .load()
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt.toString)
      .start()
    q.processAllAvailable()
    val wallSecs = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress.toSeq
    q.stop()
    val footerParses = FluvioDsv2.footerParses.get() - parsesBefore

    val withRows = progress.filter(_.numInputRows > 0)
    val totalRows = withRows.map(_.numInputRows).sum
    // triggerExecution is the whole trigger; the other durationMs keys
    // (addBatch, getBatch, ...) are its sub-phases — summing all keys
    // would double-count
    val batchMs = withRows.map(p =>
      Option(p.durationMs.get("triggerExecution")).map(_.longValue())
        .getOrElse(p.durationMs.values().stream()
          .mapToLong(_.longValue()).sum()))
    val totalBatchMs = batchMs.sum
    // cross-check that retention really covered the drain: the retained
    // progress rows must account for EVERY record in the topic (a `-B`
    // full drain), or the artifact would describe a suffix of the drain
    // while claiming the whole — the failure mode the retention conf
    // guards against, verified rather than assumed
    val expected = FluvioDsv2.leo(sfDir, "events").values.sum
    require(totalRows == expected,
      s"progress rows cover $totalRows of $expected topic records — " +
        "retention clipped the drain; raise numRecentProgressUpdates")
    // steady state excludes the first data batch (stream start-up, sink
    // init, first-trigger planning all land there); a single-batch run
    // has no steady state, so fall back to the all-batches number
    // rather than reporting 0
    val steady = if (withRows.size > 1) withRows.drop(1) else withRows
    val steadyRows = steady.map(_.numInputRows).sum
    val steadyMs =
      (if (withRows.size > 1) batchMs.drop(1) else batchMs).sum
    val recsPerSec = if (totalBatchMs > 0) totalRows * 1000.0 / totalBatchMs else 0.0
    val steadyRps = if (steadyMs > 0) steadyRows * 1000.0 / steadyMs else 0.0
    val line =
      f"""{"metric":"stream_records_per_sec","value":$steadyRps%.0f,"unit":"records/sec","sf":"$sfDir","records":$totalRows,"batches":${withRows.size},"records_per_trigger_cap":$cap,"wall_secs":$wallSecs%.2f,"busy_secs":${totalBatchMs / 1000.0}%.2f,"all_batches_rps":$recsPerSec%.0f,"footer_parses":$footerParses}"""
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get("stream_bench.json"),
      (line + "\n").getBytes("UTF-8"))
    // checkpoint dir is a throwaway temp — remove it bottom-up
    java.nio.file.Files.walk(ckpt)
      .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    spark.stop()
  }
}
