package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-2 option-surface guarantees: no flag parses to a silent no-op.
  * (-h prints help; --smartmodule-path resolves or raises; -d routes to
  * the streaming flavor instead of silently running bounded batch.) */
class OptionSurfaceSpec extends SparkSpec {

  test("-h / --help return the usage text, like clap") {
    for (flag <- Seq("-h", "--help")) {
      val r = ConsumeOpt.parse(s"events $flag")
      assert(r.isLeft)
      val msg = r.swap.toOption.get
      assert(msg.contains("Usage: fluvio_consume"))
      assert(msg.contains("--smartmodule"))
      assert(msg.contains("-B, --beginning"))
    }
    // position-independent, even before the topic
    assert(ConsumeOpt.parse("-h").swap.toOption.get.contains("Usage:"))
  }

  test("--smartmodule-path resolves the module file name through the registry") {
    val byName = FluvioDuck.consume(spark,
      "events -B --rows 999999 --smartmodule graft/filter-json-eq -e key=k -e value=7", sf)
    val byPath = FluvioDuck.consume(spark,
      "events -B --rows 999999 --smartmodule-path /modules/graft/filter-json-eq.wasm -e key=k -e value=7", sf)
    assert(byPath.collect().toSeq == byName.collect().toSeq)
  }

  test("--smartmodule-path with an unknown module raises, not a silent no-op") {
    val e = intercept[IllegalArgumentException] {
      FluvioDuck.consume(spark,
        "events -B --rows 5 --smartmodule-path /modules/no-such-module.wasm", sf)
        .collect()
    }
    assert(e.getMessage.contains("SmartModule not found"))
  }

  test("-d routes to the Structured Streaming consume (isStreaming)") {
    val df = FluvioDuck.consume(spark, "events -B -d", sf)
    assert(df.isStreaming)
    assert(df.columns.toSeq == Seq("offset", "timestamp", "value"))
  }
}
