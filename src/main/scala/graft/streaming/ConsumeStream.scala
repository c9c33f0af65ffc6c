package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{ColumnMapping, ConsumeOpt, TopicRegistry, Tables}
import graft.transforms.{TransformChain, TransformRegistry}

/** The `-d` (continuous) flavor of consume: the same option grammar,
  * projection compiler and transform chain as the batch path, but planned
  * as a Structured Streaming source (`readStream`) — micro-batch execution,
  * watermarks and stateful operators compose on top.
  *
  * Reference: `continuous_toggle` (`/root/reference/src/consume.rs:480-482`,
  * `:675`) — without `-d` a scan stops at the end of the log; with `-d` it
  * keeps waiting for new records. Spark's file streaming source gives the
  * same semantics over a growing topic directory: each new parquet dropped
  * into the topic path becomes a micro-batch.
  *
  * Offset-window flags that need the log end (`-T`, default end-of-log) are
  * meaningless on an unbounded stream — the reference reads them relative
  * to the log at bind time; here `-B`/`-H`/`--start` filter by offset and
  * `-T`/default-end raise, which is stricter but explicit.
  */
object ConsumeStream {

  def consume(spark: SparkSession, cmd: String, baseDir: String): DataFrame = {
    val opt = ConsumeOpt.parse(cmd) match {
      case Left(err) => throw new IllegalArgumentException(err)
      case Right(o)  => o
    }
    val view = TopicRegistry.recordViews.getOrElse(opt.topic,
      throw new IllegalArgumentException(s"Topic not found: ${opt.topic}"))
    // schema comes from the batch reader (streaming sources need one fixed)
    val schema = Tables.load(spark, baseDir, opt.topic).schema
    val raw = spark.readStream.schema(schema)
      .parquet(TopicRegistry.topicPath(baseDir, opt.topic))
    fromRecords(raw, opt, view.offsetCol, view.timestampCol, view.valueCol)
  }

  /** Shared plan builder: record shape → window → transforms → projection.
    * Used by [[consume]] and by tests feeding a MemoryStream. */
  def fromRecords(raw: DataFrame, opt: ConsumeOpt,
                  offsetCol: String, timestampCol: String, valueCol: String): DataFrame = {
    val records = raw.select(
      col(offsetCol).cast("long").as("offset"),
      col(timestampCol).cast("timestamp").as("timestamp"),
      col(valueCol).cast("string").as("value"))

    import graft.sources.OffsetSpec._
    val windowed = opt.startOffset match {
      case FromBeginning(0) => records
      case FromBeginning(n) => records.filter(col("offset") >= n)
      case Absolute(n)      => records.filter(col("offset") >= n)
      case FromEnd(_) | End =>
        throw new IllegalArgumentException(
          "tail/end-relative offsets are not defined on a continuous stream; use -B/-H/--start")
    }
    val ended = opt.end.fold(windowed)(e => windowed.filter(col("offset") <= e))

    val transformed = TransformChain.fromOpt(opt).foldLeft(ended) { (df, t) =>
      TransformRegistry(t.uses)(df, t.params)
    }

    if (opt.columns.isEmpty) transformed
    else transformed.select(opt.columns.map(_.toColumn(col("value"))): _*)
    // note: no orderBy/limit — a continuous stream has no global row cap;
    // the reference's --rows applies to its bounded pull loop only.
  }

  /** Event-time windowed aggregation over a consume stream: count/avg of a
    * mapped numeric column per tumbling window — the standard streaming
    * rollup (watermark bounds state). */
  def windowedAgg(stream: DataFrame, mapped: ColumnMapping,
                  windowDuration: String, watermarkDelay: String): DataFrame =
    stream
      .withColumn("v", mapped.toColumn(col("value")).cast("double"))
      .withWatermark("timestamp", watermarkDelay)
      .groupBy(window(col("timestamp"), windowDuration))
      .agg(count(lit(1)).as("n"), avg(col("v")).as("avg_v"))
      .select(col("window.start").as("window_start"), col("n"), col("avg_v"))

  /** Sliding-window count: overlapping windows of `windowDuration` every
    * `slideDuration` — each record lands in windowDuration/slideDuration
    * windows. */
  def slidingAgg(stream: DataFrame, windowDuration: String,
                 slideDuration: String, watermarkDelay: String): DataFrame =
    stream
      .withWatermark("timestamp", watermarkDelay)
      .groupBy(window(col("timestamp"), windowDuration, slideDuration))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))

  /** Session windows: records gapped less than `gapDuration` apart merge
    * into one session per key — `session_window` keeps per-key state until
    * the watermark passes the gap. */
  def sessionAgg(stream: DataFrame, keyMapped: ColumnMapping,
                 gapDuration: String, watermarkDelay: String): DataFrame =
    stream
      .withColumn("k", keyMapped.toColumn(col("value")))
      .withWatermark("timestamp", watermarkDelay)
      .groupBy(session_window(col("timestamp"), gapDuration), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("k"), col("n"))

  /** Stream-static enrichment: join each streamed record against a static
    * dimension table — planned as a per-micro-batch broadcast join, no
    * streaming state at all (the standard lookup-enrichment shape; at
    * scale the static side is broadcast once per batch). */
  def enrich(stream: DataFrame, dim: DataFrame, streamKey: Column,
             dimKey: Column): DataFrame =
    stream.join(broadcast(dim), streamKey === dimKey, "left")

  /** Stream-stream correlation: join records of two topic streams whose
    * payload keys match and whose event times are within `within` of each
    * other. Both sides carry watermarks so the join state is bounded —
    * Spark keeps each side only until the other's watermark passes the
    * time bound (the canonical stream-stream interval join). Inputs must
    * be record-shaped (offset, timestamp, value); keys are extracted by
    * the provided column builders. */
  def correlate(left: DataFrame, right: DataFrame,
                leftKey: Column, rightKey: Column,
                watermarkDelay: String, within: String): DataFrame = {
    val l = left.select(col("offset").as("l_offset"),
        col("timestamp").as("l_ts"), leftKey.as("l_key"))
      .withWatermark("l_ts", watermarkDelay)
    val r = right.select(col("offset").as("r_offset"),
        col("timestamp").as("r_ts"), rightKey.as("r_key"))
      .withWatermark("r_ts", watermarkDelay)
    l.join(r,
      col("l_key") === col("r_key") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $within") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"))
  }
}
