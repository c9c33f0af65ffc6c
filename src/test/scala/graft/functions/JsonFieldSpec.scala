package graft.functions

import graft.SparkSpec
import graft.sources.{ColumnMapping, MappedType}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim

/** JsonField path grammar: dotted object keys + numeric array indexes
  * (jql semantics — /root/reference/src/consume.rs:311-443). The typed
  * coercion matrix over array leaves is oracle-checked by the
  * jql_array_path CORRECTNESS entry; this spec pins the traversal corner
  * cases the fixture payload can't express. */
class JsonFieldSpec extends SparkSpec {

  private def field(json: String, path: String): (Boolean, String) = {
    val df = spark.range(1).select(
      shim.column(JsonField(shim.expression(lit(json)), path)).as("f"))
    val r = df.select(col("f.exists"), col("f.raw")).head()
    (r.getBoolean(0), if (r.isNullAt(1)) null else r.getString(1))
  }

  test("numeric segments index arrays; chains traverse array-of-object") {
    assert(field("""{"a": [10, 20, 30]}""", "a.0") == (true, "10"))
    assert(field("""{"a": [10, 20, 30]}""", "a.2") == (true, "30"))
    assert(field("""{"a": [{"b": 1}, {"b": 2}]}""", "a.1.b") == (true, "2"))
    // a container leaf serializes as JSON text (get_json_object behavior)
    assert(field("""{"a": [[1, 2]]}""", "a.0") == (true, "[1,2]"))
    assert(field("""{"a": [[1, 2]]}""", "a.0.1") == (true, "2"))
    // top-level array payload: the whole path can start with an index
    assert(field("""[5, {"x": 6}]""", "0") == (true, "5"))
    assert(field("""[5, {"x": 6}]""", "1.x") == (true, "6"))
  }

  test("a numeric segment against an OBJECT is a key lookup, not an index") {
    assert(field("""{"a": {"0": "zero"}}""", "a.0") == (true, "zero"))
  }

  test("misses: out-of-range, non-array index, array as object key") {
    assert(field("""{"a": [10]}""", "a.1") == (false, null))
    assert(field("""{"a": 7}""", "a.0") == (false, null))
    assert(field("""{"a": [10]}""", "a.b") == (false, null))
    // JSON null element EXISTS with null raw (distinct from missing)
    assert(field("""{"a": [null]}""", "a.0") == (true, null))
    // a >=10-digit numeral would overflow toInt: it must behave like any
    // other miss (no array that large exists), never crash the task
    assert(field("""{"a": [10]}""", "a.9999999999") == (false, null))
    assert(field("""{"a": [10]}""", "a.9999999999.b") == (false, null))
    // ...but it still works as an OBJECT key, like any digit string
    assert(field("""{"a": {"9999999999": "big"}}""", "a.9999999999") == (true, "big"))
  }

  test("quoted segments: dots protected, forced key semantics, escapes") {
    // dotted keys at top level and nested
    assert(field("""{"a.b": 1}""", "\"a.b\"") == (true, "1"))
    assert(field("""{"m": {"x.y": "v"}}""", "m.\"x.y\"") == (true, "v"))
    // a QUOTED numeric is a key lookup everywhere: on an object it finds
    // the "7" key; against an array it is a miss (arrays have no keys)
    assert(field("""{"m": {"7": 3}}""", "m.\"7\"") == (true, "3"))
    assert(field("""{"a": [10]}""", "a.\"0\"") == (false, null))
    assert(field("""{"a": [10]}""", "a.0") == (true, "10")) // unquoted still indexes
    // escaped quote and backslash inside a quoted key
    assert(field("""{"q\"k": 9}""", "\"q\\\"k\"") == (true, "9"))
    assert(field("{\"b\\\\k\": 8}", "\"b\\\\k\"") == (true, "8"))
    // partial quoting composes within one segment; empty quoted key is legal
    assert(field("""{"ab.c": 5}""", "a\"b.c\"") == (true, "5"))
    assert(field("""{"": 6}""", "\"\"") == (true, "6"))
  }

  test("array slices: inclusive bounds, open ends, clamp, nesting, misses") {
    val j = """{"a": [10, 20, 30, 40], "k": 5, "[0:1]": 8}"""
    assert(field(j, "a.[0:1]") == (true, "[10,20]"))      // inclusive hi
    assert(field(j, "a.[2:]") == (true, "[30,40]"))       // open hi
    assert(field(j, "a.[:1]") == (true, "[10,20]"))       // open lo
    assert(field(j, "a.[:]") == (true, "[10,20,30,40]"))  // full copy
    assert(field(j, "a.[2:99]") == (true, "[30,40]"))     // clamped
    assert(field(j, "a.[3:2]") == (true, "[]"))           // inverted -> empty, not a miss
    assert(field(j, "a.[1:2].0") == (true, "20"))         // traverse INTO a slice
    assert(field(j, "k.[0:1]") == (false, null))          // slice of a scalar: miss
    assert(field(j, "\"[0:1]\"") == (true, "8"))          // quoted = ordinary key
    // nested containers survive the slice serialization
    assert(field("""{"a": [{"x": 1}, 2]}""", "a.[0:0]") == (true, """[{"x":1}]"""))
    // a 10-digit bound is not a slice (overflow rule) -> ordinary key miss
    assert(field(j, "a.[0:9999999999]") == (false, null))
  }

  test("malformed paths fail at bind time with the named error") {
    def bad(path: String): String =
      intercept[IllegalArgumentException](
        JsonField(shim.expression(lit("{}")), path)).getMessage
    assert(bad("a.\"b").contains("unterminated quote"))
    assert(bad("\"a\\").contains("trailing escape"))
    assert(bad("\"a\\n\"").contains("unsupported escape"))
    assert(bad("a..b").contains("empty segment"))
    assert(bad(".a").contains("empty segment"))
    // ...and the -c parse surfaces the same error as a CLI-style Left
    val e = ColumnMapping.parse("x:i", "a.\"b")
    assert(e.isLeft && e.swap.toOption.get.contains("unterminated quote"))
  }

  test("toColumnFromParsed routes quoted paths through JsonField") {
    // the map fast path would treat the raw text `"a.b"` (quotes included)
    // as the key; quoted paths must take the full-parse route
    val m = ColumnMapping("x", MappedType.I, "\"a.b\"")
    val df = spark.range(1).select(lit("""{"a.b": 7}""").as("value"))
    val got = df.select(
      m.toColumnFromParsed(ColumnMapping.parsed(col("value")), col("value")))
      .head()
    assert(got.getInt(0) == 7)
  }

  test("toColumnFromParsed routes numeric top-level paths through JsonField") {
    // the map<string,string> fast path can't represent a top-level array
    // payload; a purely numeric path must fall back to the full parse
    val m = ColumnMapping("x", MappedType.I, "0")
    val df = spark.range(1).select(lit("""[42]""").as("value"))
    val got = df.select(
      m.toColumnFromParsed(ColumnMapping.parsed(col("value")), col("value")))
      .head()
    assert(got.getInt(0) == 42)
  }

  test("multi-selection: top-level comma yields the array of all values") {
    val j = """{"a": 1, "b": {"c": "s", "x.y": 2}, "arr": [10, 20], "n": null}"""
    assert(field(j, "a,b.c") == (true, """[1,"s"]"""))      // string re-quotes
    assert(field(j, "a,arr.1") == (true, "[1,20]"))         // index composes
    assert(field(j, "b.\"x.y\",a") == (true, "[2,1]"))      // quoted seg composes
    assert(field(j, "arr.[0:1],a") == (true, "[[10,20],1]")) // slice composes
    assert(field(j, "a,b") == (true, """[1,{"c":"s","x.y":2}]""")) // container nests
    assert(field(j, "n,a") == (true, "[null,1]"))           // JSON null element
    assert(field(j, "a,a,a") == (true, "[1,1,1]"))          // repeats allowed
  }

  test("multi-selection misses and the quoted-comma key") {
    val j = """{"a": 1, "k,l": 7}"""
    // ANY failing selector fails the whole path (jql walker errors)
    assert(field(j, "a,zz") == (false, null))
    assert(field(j, "zz,a") == (false, null))
    // a QUOTED comma is an ordinary key, not a separator
    assert(field(j, "\"k,l\"") == (true, "7"))
    assert(field(j, "k,l") == (false, null)) // unquoted: two selectors, both miss
    // empty selectors are bind-time grammar errors
    def bad(path: String): String =
      intercept[IllegalArgumentException](
        JsonField(shim.expression(lit("{}")), path)).getMessage
    assert(bad("a,").contains("empty segment"))
    assert(bad(",a").contains("empty segment"))
    assert(bad("a,,b").contains("empty segment"))
    // single-selector contexts reject a multi path with a named error
    assert(intercept[IllegalArgumentException](
      JsonField.splitPath("a,b")).getMessage.contains("single selector"))
  }

  test("toColumnFromParsed routes comma paths through JsonField") {
    // the map fast path would treat `a,b` as one literal key; the
    // multi-selection grammar lives in the full JsonField parse
    val m = ColumnMapping("x", MappedType.S, "a,b")
    val df = spark.range(1).select(lit("""{"a": 1, "b": 2}""").as("value"))
    val got = df.select(
      m.toColumnFromParsed(ColumnMapping.parsed(col("value")), col("value")))
      .head()
    assert(got.getString(0) == "[1,2]")
  }
}
