package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Code-free topic registration: `spark.graft.topic.<name>.columns =
  * "offsetCol,timestampCol,valueCol"` makes a NEW parquet topic consumable
  * at runtime — the Spark analog of the reference discovering topics from
  * the live cluster (`/root/reference/src/topic.rs:109`) instead of a
  * source-edit. One registration must serve ALL consume paths: batch,
  * `-d` continuous, and the DSv2 micro-batch source. */
class TopicRegistrySpec extends SparkSpec {

  private val confKey = TopicRegistry.confKey("clicks")

  /** A topic the built-in registry knows nothing about, with its own
    * column names: (seq, at, body). */
  private def mkClicksTopic(): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("graft_conf_topic").toFile
    spark.range(0, 50)
      .select(
        col("id").as("seq"),
        to_timestamp(lit("2024-03-01 00:00:00")).plus(
          expr("make_interval(0, 0, 0, 0, 0, 0, id)")).as("at"),
        concat(lit("{\"n\": "), col("id"), lit("}")).as("body"))
      .coalesce(1)
      .write.mode("overwrite")
      .parquet(new java.io.File(dir, "clicks.parquet").getAbsolutePath)
    dir
  }

  private def withConf(value: String)(body: => Unit): Unit = {
    spark.conf.set(confKey, value)
    try body finally spark.conf.unset(confKey)
  }

  test("unregistered topic keeps the two-message contract, with a conf hint") {
    val dir = mkClicksTopic()
    val e = intercept[IllegalArgumentException](
      FluvioDuck.consume(spark, "clicks -B", dir.getAbsolutePath))
    assert(e.getMessage.contains("not a stream topic"), e.getMessage)
    assert(e.getMessage.contains(confKey), e.getMessage)
  }

  test("conf-registered topic consumes on the BATCH path — no source edit") {
    val dir = mkClicksTopic()
    withConf("seq,at,body") {
      val df = FluvioDuck.consume(spark, "clicks -B --rows 10", dir.getAbsolutePath)
      assert(df.columns.toSeq == Seq("offset", "timestamp", "value"))
      val rows = df.orderBy("offset").collect()
      assert(rows.map(_.getLong(0)).toSeq == (0L until 10L))
      assert(rows.head.getString(2) == """{"n": 0}""")
      // -c typed mappings work over the conf-registered value column too
      val typed = FluvioDuck.consume(
        spark, "clicks -B --rows 5 -c n:i=n", dir.getAbsolutePath)
      assert(typed.schema("n").dataType.typeName == "integer")
      assert(typed.collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 1, 2, 3, 4))
    }
  }

  test("conf-registered topic consumes on the -d STREAMING path") {
    val dir = mkClicksTopic()
    withConf("seq,at,body") {
      val name = s"conf_topic_${System.nanoTime()}"
      val q = FluvioDuck.consume(spark, "clicks -B -d", dir.getAbsolutePath)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(spark.table(name).count() == 50)
        assert(spark.table(name).columns.toSeq == Seq("offset", "timestamp", "value"))
      } finally q.stop()
    }
  }

  test("conf-registered topic consumes on the DSv2 micro-batch path") {
    val dir = mkClicksTopic()
    withConf("seq,at,body") {
      val name = s"conf_topic_dsv2_${System.nanoTime()}"
      val q = spark.readStream
        .format(classOf[graft.sources.v2.FluvioTableProvider].getName)
        .option("cmd", "clicks -B").option("baseDir", dir.getAbsolutePath).load()
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        q.processAllAvailable()
        val rows = spark.table(name).select("offset", "value").collect()
        assert(rows.length == 50)
        assert(rows.map(_.getLong(0)).sorted.toSeq == (0L until 50L))
        assert(rows.forall(_.getString(1).startsWith("""{"n":""")))
      } finally q.stop()
    }
  }

  test("conf wins over the built-in map; malformed conf fails loudly") {
    // re-map the built-in `events` view through conf: same columns, so the
    // consume result is unchanged — proving the conf layer is consulted
    spark.conf.set(TopicRegistry.confKey("events"), "event_id,ts,props")
    try {
      assert(FluvioDuck.consume(spark, "events -B --rows 3", sf).count() == 3)
    } finally spark.conf.unset(TopicRegistry.confKey("events"))
    val dir = mkClicksTopic()
    withConf("seq,at") { // 2 fields, not 3
      val e = intercept[IllegalArgumentException](
        FluvioDuck.consume(spark, "clicks -B", dir.getAbsolutePath))
      assert(e.getMessage.contains("offsetCol,timestampCol,valueCol"), e.getMessage)
    }
  }

  test("admin scans see conf-registered topics like any parquet table") {
    val dir = mkClicksTopic()
    withConf("seq,at,body") {
      val t = FluvioDuck.topics(spark, dir.getAbsolutePath).collect()
      assert(t.map(_.getString(0)).toSeq == Seq("clicks"))
      val p = FluvioDuck.partitions(spark, dir.getAbsolutePath).head()
      assert(p.getString(0) == "clicks" && p.getLong(2) == 50L)
    }
  }
}
