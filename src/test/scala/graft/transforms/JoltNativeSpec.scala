package graft.transforms

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-2 jolt upgrades: native Catalyst expressions (no ScalaUDF node)
  * and one-level `*` / `&` wildcard shift. */
class JoltNativeSpec extends SparkSpec {
  import spark.implicits._

  private def records(values: String*) =
    values.zipWithIndex.map { case (v, i) =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i), v)
    }.toDF("offset", "timestamp", "value")

  test("jolt plans as a native expression — no ScalaUDF / BatchEval node") {
    // parquet-backed input: a LocalRelation would be constant-folded away
    val df = graft.sources.FluvioDuck.consume(spark,
      "events -B --rows 300 " +
        """--transform {"uses":"infinyon/jolt@0.1.0","with":{"spec":"[{\"operation\":\"shift\",\"spec\":{\"k\":\"kk\"}}]"}}""",
      sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEval"),
      s"jolt fell out of native-expression planning:\n$plan")
    assert(plan.contains("joltshift") || plan.contains("JoltShift"), plan)
  }

  test("wildcard shift: * matches remaining keys, & substitutes the key") {
    val df = TransformRegistry.jolt(
      records("""{"a": 1, "b": "two", "c": null}"""),
      Map("spec" -> """[{"operation":"shift","spec":{"*":"&"}}]"""))
    // identity-ish shift: every non-null field kept under its own name
    assert(df.select("value").head().getString(0) == """{"a":1,"b":"two"}""")
  }

  test("wildcard shift with renamed target prefix") {
    val df = TransformRegistry.jolt(
      records("""{"lat": 60.1, "lon": 24.9}"""),
      Map("spec" -> """[{"operation":"shift","spec":{"*":"geo_&"}}]"""))
    assert(df.select("value").head().getString(0) ==
      """{"geo_lat":60.1,"geo_lon":24.9}""")
  }

  test("wildcard under a nested literal path (reference short.yaml shape)") {
    val payload = """{"payload": {"VP": {"lat": 60.1, "route": "1065"}}, "junk": 9}"""
    val df = TransformRegistry.jolt(records(payload),
      Map("spec" -> """[{"operation":"shift","spec":{"payload":{"VP":{"*":"&"}}}}]"""))
    assert(df.select("value").head().getString(0) ==
      """{"lat":60.1,"route":"1065"}""")
  }

  test("literal keys win over wildcard for the same field") {
    val df = TransformRegistry.jolt(
      records("""{"a": 1, "b": 2}"""),
      Map("spec" -> """[{"operation":"shift","spec":{"a":"keep_a","*":"other_&"}}]"""))
    assert(df.select("value").head().getString(0) ==
      """{"keep_a":1,"other_b":2}""")
  }

  test("cardinality ONE: array -> first element; scalar untouched; empty removed") {
    val df = TransformRegistry.jolt(
      records("""{"tags": ["a", "b"], "k": 7, "empty": []}"""),
      Map("spec" -> """[{"operation":"cardinality","spec":{"tags":"ONE","k":"ONE","empty":"ONE"}}]"""))
    assert(df.select("value").head().getString(0) == """{"tags":"a","k":7}""")
  }

  test("cardinality MANY: scalar -> one-element array; array untouched") {
    val df = TransformRegistry.jolt(
      records("""{"k": 7, "tags": ["a"]}"""),
      Map("spec" -> """[{"operation":"cardinality","spec":{"k":"MANY","tags":"MANY"}}]"""))
    assert(df.select("value").head().getString(0) == """{"k":[7],"tags":["a"]}""")
  }

  test("cardinality: * wildcard and nested recursion") {
    val df = TransformRegistry.jolt(
      records("""{"a": [1, 2], "b": [3], "nest": {"c": 4}}"""),
      Map("spec" -> """[{"operation":"cardinality","spec":{"nest":{"c":"MANY"},"*":"ONE"}}]"""))
    assert(df.select("value").head().getString(0) ==
      """{"a":1,"b":3,"nest":{"c":[4]}}""")
  }

  test("cardinality: bad leaf value raises loudly") {
    val e = intercept[Exception](
      TransformRegistry.jolt(
        records("""{"a": 1}"""),
        Map("spec" -> """[{"operation":"cardinality","spec":{"a":"SOME"}}]"""))
        .collect())
    def chain(t: Throwable): String =
      if (t == null) "" else t.toString + "\n" + chain(t.getCause)
    assert(chain(e).contains("ONE|MANY"), chain(e))
  }

  test("shift @: copies the whole value at the current level") {
    val df = TransformRegistry.jolt(
      records("""{"payload": {"vp": {"lat": 60.1}}, "k": 5}"""),
      Map("spec" -> """[{"operation":"shift","spec":{"payload":{"@":"pl"},"k":"k"}}]"""))
    assert(df.select("value").head().getString(0) ==
      """{"pl":{"vp":{"lat":60.1}},"k":5}""")
  }

  test("shift @ with &-reference target and * coexistence") {
    // @ does not consume fields from *: payload is still matched by *
    val df = TransformRegistry.jolt(
      records("""{"payload": {"a": 1}}"""),
      Map("spec" -> """[{"operation":"shift","spec":{"payload":{"@":"copy_&"}}}]"""))
    // stack at @ is List("payload"): & == &(0) == "payload"
    assert(df.select("value").head().getString(0) ==
      """{"copy_payload":{"a":1}}""")
  }

  test("sort: recursive key ordering, arrays keep element order, no spec needed") {
    val df = TransformRegistry.jolt(
      records("""{"z": 1, "a": {"d": [3, 1, 2], "b": 0}, "m": "x"}"""),
      Map("spec" -> """[{"operation":"sort"}]"""))
    assert(df.select("value").head().getString(0) ==
      """{"a":{"b":0,"d":[3,1,2]},"m":"x","z":1}""")
  }

  test("null / malformed payloads still transform like empty objects") {
    val df = TransformRegistry.jolt(
      records("""not json""", """{"a":5}"""),
      Map("spec" -> """[{"operation":"default","spec":{"src":"graft"}}]"""))
    val vals = df.orderBy("offset").select("value").collect().map(_.getString(0))
    assert(vals(0) == """{"src":"graft"}""")
    assert(vals(1) == """{"a":5,"src":"graft"}""")
  }
}
