package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FluvioDuckSpec extends SparkSpec {
  // sf0.001 events: offsets 0..999, dense
  private def consume(cmd: String) = FluvioDuck.consume(spark, cmd, sf)

  test("default (no offset flag) starts at end of log → 0 rows in bounded mode") {
    assert(consume("events").count() == 0)
  }

  test("-B default columns: (offset, timestamp, value), rows capped at 1000 default") {
    val df = consume("events -B")
    assert(df.columns.toSeq == Seq("offset", "timestamp", "value"))
    assert(df.count() == 1000)
    val first = df.orderBy("offset").head()
    assert(first.getLong(0) == 0L)
    assert(first.getString(2).startsWith("{"))
  }

  test("--rows caps output") {
    assert(consume("events -B --rows 17").count() == 17)
  }

  test("-H skips n from beginning") {
    val offs = consume("events -H 990").select("offset").collect().map(_.getLong(0))
    assert(offs.sorted.toSeq == (990L to 999L))
  }

  test("-T takes last n") {
    val offs = consume("events -T 5").select("offset").collect().map(_.getLong(0))
    assert(offs.sorted.toSeq == (995L to 999L))
  }

  test("--start/--end inclusive window") {
    val offs = consume("events --start 10 --end 14")
      .select("offset").collect().map(_.getLong(0))
    assert(offs.sorted.toSeq == (10L to 14L))
  }

  test("--rows applies after window in offset order") {
    val offs = consume("events --start 100 --rows 3")
      .select("offset").collect().map(_.getLong(0))
    assert(offs.toSeq == Seq(100L, 101L, 102L))
  }

  test("-c mappings: typed extraction from JSON props") {
    val df = consume("events -B --rows 5 -c k:i=k")
    assert(df.columns.toSeq == Seq("k"))
    assert(df.schema("k").dataType.typeName == "integer")
    val ks = df.collect().map(_.getInt(0))
    assert(ks.length == 5)
  }

  test("-c missing path: typed → null, varchar → error text") {
    val typed = consume("events -B --rows 3 -c x:i=nope")
    assert(typed.collect().forall(_.isNullAt(0)))
    val s = consume("events -B --rows 3 -c x=nope")
    assert(s.collect().forall(_.getString(0) == """Node "nope" not found"""))
  }

  test("unknown topic raises (scan_error_surface)") {
    val e = intercept[IllegalArgumentException](consume("nosuch -B"))
    assert(e.getMessage.contains("Topic not found"))
  }

  test("two-message error contract holds on BOTH batch and streaming paths") {
    // a parquet table that exists but has no record view: "not a stream
    // topic"; an unknown name: "Topic not found" — same pair of messages
    // whether the consume is bounded or -d continuous.
    val b1 = intercept[IllegalArgumentException](consume("documents -B"))
    assert(b1.getMessage.contains("not a stream topic"), b1.getMessage)
    val s1 = intercept[IllegalArgumentException](
      graft.streaming.ConsumeStream.consume(spark, "documents -B", sf))
    assert(s1.getMessage.contains("not a stream topic"), s1.getMessage)
    val s2 = intercept[IllegalArgumentException](
      graft.streaming.ConsumeStream.consume(spark, "nosuch -B", sf))
    assert(s2.getMessage.contains("Topic not found"), s2.getMessage)
  }

  test("bad options raise with clap-style message") {
    val e = intercept[IllegalArgumentException](consume("events -B -T 5"))
    assert(e.getMessage.contains("cannot be used with"))
  }

  test("topics() lists all parquet tables with partition count") {
    val t = FluvioDuck.topics(spark, sf)
    assert(t.columns.toSeq == Seq("name", "partitions"))
    val names = t.collect().map(_.getString(0)).toSet
    assert(names.contains("events") && names.contains("lineitem"))
    assert(t.collect().forall(_.getInt(1) == 1))
  }

  test("partitions() exposes LEO = row count") {
    val p = FluvioDuck.partitions(spark, sf)
    assert(p.columns.toSeq == Seq("topic", "partition", "LEO"))
    val events = p.filter(col("topic") === "events").head()
    assert(events.getString(1) == "0")
    assert(events.getLong(2) == 1000L)
  }

  test("transform: filter smartmodule with -e params") {
    val df = consume(
      "events -B --rows 999999 --smartmodule graft/filter-json-eq -e key=k -e value=7")
    val vals = df.select(get_json_object(col("value"), "$.k")).distinct().collect()
    assert(vals.map(_.getString(0)).toSeq == Seq("7"))
  }
}
