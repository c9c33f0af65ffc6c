package graft.streaming

import graft.SparkSpec
import graft.functions.SimHashText
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def runStream(df: org.apache.spark.sql.DataFrame): Seq[org.apache.spark.sql.Row] = {
    val name = s"mem_${System.nanoTime()}"
    val q = df.writeStream.format("memory").queryName(name).outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    spark.table(name).collect().toSeq
  }

  private val base = 1700000000000L
  private def ts(i: Long) = new java.sql.Timestamp(base + i * 1000)

  test("exactByFingerprint drops in-window duplicates, keeps first") {
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    input.addData(Seq(
      (1L, ts(0), "hello world"),
      (2L, ts(1), "  HELLO   world "), // same fingerprint (normalized)
      (3L, ts(2), "something else"),
      (4L, ts(3), "hello world")))     // dup again
    val out = StreamingDedup.exactByFingerprint(
      input.toDS.toDF("id", "ts", "text"), "text", "ts", "10 minutes")
    val got = runStream(out).map(_.getLong(0)).sorted
    assert(got == Seq(1L, 3L))
  }

  test("exactByFingerprint output schema drops the internal column") {
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = StreamingDedup.exactByFingerprint(
      input.toDS.toDF("id", "ts", "text"), "text", "ts", "10 minutes")
    assert(out.isStreaming)
    assert(out.columns.toSeq == Seq("id", "ts", "text"))
  }

  test("nearDupBySimhash drops signature-identical docs within the window") {
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    input.addData(Seq(
      (1L, ts(0), "the quick brown fox jumps over the lazy dog"),
      (2L, ts(1), "the quick brown fox jumps over the lazy dog"),  // identical
      (3L, ts(2), "a completely different document about spark aggregation")))
    val out = StreamingDedup.nearDupBySimhash(
      input.toDS.toDF("id", "ts", "text"), "text", "ts", "10 minutes")
    val got = runStream(out).map(_.getLong(0)).sorted
    assert(got == Seq(1L, 3L))
  }

  test("decontaminate drops contaminated fingerprints, stateless broadcast anti-join") {
    val contaminated = Seq("leaked eval prompt one", "another leaked doc")
      .toDF("text")
      .select(graft.operators.TextAnalysis.fingerprint(col("text")).as("fp"))
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    input.addData(Seq(
      (1L, ts(0), "clean document"),
      (2L, ts(1), "  LEAKED eval   prompt one "), // normalized match → drop
      (3L, ts(2), "another leaked doc"),          // drop
      (4L, ts(3), "also clean")))
    val out = StreamingDedup.decontaminate(
      input.toDS.toDF("id", "ts", "text"), "text", contaminated, "fp")
    val got = runStream(out).map(_.getLong(0)).sorted
    assert(got == Seq(1L, 4L))
    // stateless: the plan must carry no stateful operator
    assert(!out.queryExecution.analyzed.toString.contains("dropDuplicates"))
  }

  test("per-row SimHashText is bit-identical to the batch simhash aggregate") {
    val docs = graft.sources.Tables.load(spark, sf, "documents").limit(200)
    val batch = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perRow = docs.select(col("doc_id"), SimHashText(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perRow == batch)
  }
}
