package graft.transforms

import graft.SparkSpec
import graft.sources.{ConsumeOpt, FluvioDuck}
import org.apache.spark.sql.functions._

class TransformsSuite extends SparkSpec {
  import spark.implicits._

  private def records(values: String*) =
    values.zipWithIndex.map { case (v, i) =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i), v)
    }.toDF("offset", "timestamp", "value")

  test("TransformChain.fromOpt: smartmodule beats transform beats file") {
    val sm = ConsumeOpt.parse("t --smartmodule m1 -e a=1").toOption.get
    assert(TransformChain.fromOpt(sm) == Seq(TransformSpec("m1", Map("a" -> "1"))))
    val inline = ConsumeOpt.parse(
      """t --transform {"uses":"x","with":{"p":"q"}}""").toOption.get
    assert(TransformChain.fromOpt(inline) == Seq(TransformSpec("x", Map("p" -> "q"))))
  }

  test("YAML transforms file parses the reference examples shape") {
    val yaml =
      """transforms:
        |  - uses: infinyon/jolt@0.1.0
        |    with:
        |      spec:
        |        - operation: shift
        |          spec:
        |            payload:
        |              VP:
        |                lat: "lat"
        |                route: "route"
        |""".stripMargin
    val specs = TransformChain.parseYamlString(yaml)
    assert(specs.length == 1)
    assert(specs.head.uses == "infinyon/jolt@0.1.0")
    val ops = Jolt.parseSpec(specs.head.params("spec"))
    assert(ops.head.operation == "shift")
    assert(Jolt.shiftPairs(ops.head.spec) ==
      Seq("payload.VP.lat" -> "lat", "payload.VP.route" -> "route"))
  }

  test("jolt shift on helsinki-shaped payload (README.md:121-143)") {
    val payload =
      """{"payload": {"VP": {"lat": 60.170393, "long": 24.944114, "veh": 258,
        |"route": "1065", "spd": 5.56, "tst": "2023-01-28T23:54:23.405Z",
        |"stop": null, "dl": -19, "drst": 0}}}""".stripMargin.replace("\n", " ")
    val spec =
      """[{"operation":"shift","spec":{"payload":{"VP":{
        |"lat":"lat","route":"route","spd":"speed","tst":"time","dl":"dl"}}}}]"""
        .stripMargin.replace("\n", "")
    val df = TransformRegistry.jolt(records(payload), Map("spec" -> spec))
    val out = df.select("value").head().getString(0)
    assert(out.contains(""""lat":60.170393"""))
    assert(out.contains(""""route":"1065""""))
    assert(out.contains(""""speed":5.56"""))
    assert(out.contains(""""time":"2023-01-28T23:54:23.405Z""""))
    assert(out.contains(""""dl":-19"""))
    // jolt transform resets the record timestamp (README.md:134-138)
    val ts = df.select("timestamp").head().getTimestamp(0)
    assert(ts.getTime == -1L)
  }

  test("jolt shift omits missing source paths") {
    val df = TransformRegistry.jolt(records("""{"a": 1}"""),
      Map("spec" -> """[{"operation":"shift","spec":{"a":"x","nope":"y"}}]"""))
    assert(df.select("value").head().getString(0) == """{"x":1}""")
  }

  test("jolt default adds only absent fields") {
    val df = TransformRegistry.jolt(records("""{"a": 1}""", """{"src": "keep"}"""),
      Map("spec" -> """[{"operation":"default","spec":{"src":"graft","n":7}}]"""))
    val vals = df.orderBy("offset").select("value").collect().map(_.getString(0))
    assert(vals(0) == """{"a":1,"src":"graft","n":7}""")
    assert(vals(1) == """{"src":"keep","n":7}""")
  }

  test("jolt shift: multi-level wildcards with &(n) ancestor references") {
    val df = TransformRegistry.jolt(
      records("""{"payload": {"vp": 26, "ts": 7}, "meta": {"id": 3}}"""),
      Map("spec" -> """[{"operation":"shift","spec":{"*":{"*":"&(1)_&"}}}]"""))
    assert(df.select("value").head().getString(0) ==
      """{"payload_vp":26,"payload_ts":7,"meta_id":3}""")
  }

  test("jolt shift: ancestor key containing & is not re-substituted") {
    val df = TransformRegistry.jolt(
      records("""{"a&b": {"vp": 1}}"""),
      Map("spec" -> """[{"operation":"shift","spec":{"*":{"*":"&(1)_&"}}}]"""))
    assert(df.select("value").head().getString(0) == """{"a&b_vp":1}""")
  }

  test("jolt shift: literal beats wildcard at an inner level too") {
    val df = TransformRegistry.jolt(
      records("""{"payload": {"vp": 26, "ts": 7}}"""),
      Map("spec" ->
        """[{"operation":"shift","spec":{"payload":{"vp":"speed","*":"&(1)_&"}}}]"""))
    assert(df.select("value").head().getString(0) ==
      """{"speed":26,"payload_ts":7}""")
  }

  test("jolt remove: literal leaf, nested path, and wildcard") {
    val in = """{"a": 1, "b": {"x": 2, "y": 3}, "c": 4}"""
    val lit = TransformRegistry.jolt(records(in),
      Map("spec" -> """[{"operation":"remove","spec":{"a":""}}]"""))
    assert(lit.select("value").head().getString(0) ==
      """{"b":{"x":2,"y":3},"c":4}""")
    val nested = TransformRegistry.jolt(records(in),
      Map("spec" -> """[{"operation":"remove","spec":{"b":{"x":""}}}]"""))
    assert(nested.select("value").head().getString(0) ==
      """{"a":1,"b":{"y":3},"c":4}""")
    val wild = TransformRegistry.jolt(records(in),
      Map("spec" -> """[{"operation":"remove","spec":{"*":{"y":""}}}]"""))
    assert(wild.select("value").head().getString(0) ==
      """{"a":1,"b":{"x":2},"c":4}""")
  }

  test("jolt chain: default then remove") {
    val df = TransformRegistry.jolt(records("""{"k": 42}"""),
      Map("spec" ->
        """[{"operation":"default","spec":{"src":"graft"}},{"operation":"remove","spec":{"k":""}}]"""))
    assert(df.select("value").head().getString(0) == """{"src":"graft"}""")
  }

  test("unknown smartmodule raises") {
    val e = intercept[IllegalArgumentException](TransformRegistry("no/such@1"))
    assert(e.getMessage.contains("SmartModule not found"))
  }

  test("transforms-file flows through consume end-to-end") {
    val f = java.io.File.createTempFile("transforms", ".yaml")
    java.nio.file.Files.writeString(f.toPath,
      """transforms:
        |  - uses: infinyon/jolt@0.1.0
        |    with:
        |      spec:
        |        - operation: shift
        |          spec:
        |            k: "kk"
        |""".stripMargin)
    val df = FluvioDuck.consume(spark,
      s"events -B --rows 3 --transforms-file ${f.getAbsolutePath}", sf)
    assert(df.select("value").head().getString(0).startsWith("""{"kk":"""))
    f.delete()
  }
}
