package graft.transforms

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Jolt-style JSON restructuring over the record `value` column — the one
  * SmartModule the reference's docs exercise (`infinyon/jolt@0.1.0`,
  * `/root/reference/examples/short.yaml:5-29`,
  * `/root/reference/README.md:121-143`).
  *
  * Supported operations (the documented subset — SURVEY.md §7.4 risk 4):
  *   - `shift`: nested spec of literal source paths → flat target names,
  *     e.g. `{payload: {VP: {lat: "lat"}}}` moves `payload.VP.lat` to
  *     top-level `lat`. Compiled to pure Catalyst expressions
  *     (`get_json_object` per leaf + textual JSON assembly) — codegen'd,
  *     no per-record interpreter. Wildcards (`*`, `&`) are not supported;
  *     fields whose source path is missing or JSON-null are omitted from
  *     the output.
  *   - `default`: `{field: value}` adds fields that are absent. Needs
  *     knowledge of the record's existing keys, so it runs as a jackson
  *     merge UDF (per-record JSON parse — same cost class as the WASM
  *     module it replaces).
  *
  * The spec arrives as the `spec` param: a JSON array of
  * `{operation, spec}` objects (inline `--transform`) or the YAML
  * equivalent re-serialized to JSON by [[TransformChain]].
  */
object Jolt {
  private val mapper = new ObjectMapper()

  final case class Op(operation: String, spec: JsonNode)

  def parseSpec(specJson: String): Seq[Op] = {
    val root = mapper.readTree(specJson)
    require(root.isArray, s"jolt spec must be a JSON array, got: $specJson")
    root.elements().asScala.map { n =>
      Op(n.get("operation").asText(), n.get("spec"))
    }.toSeq
  }

  /** Flatten a shift spec tree into (sourcePath, targetName) pairs. */
  def shiftPairs(spec: JsonNode, prefix: String = ""): Seq[(String, String)] =
    spec.properties().asScala.toSeq.flatMap { e =>
      val path = if (prefix.isEmpty) e.getKey else s"$prefix.${e.getKey}"
      val v = e.getValue
      if (v.isTextual) Seq(path -> v.asText())
      else if (v.isObject) shiftPairs(v, path)
      else
        throw new IllegalArgumentException(
          s"unsupported jolt shift spec value at $path: $v")
    }

  /** Render the extracted text of one JSON value back as valid JSON text,
    * preserving its type. `get_json_object` strips the quotes off string
    * values, so "1065" and 1065 both extract as `1065`; we recover
    * quotedness by regex-probing the source token in the parent JSON text
    * (`wasQuoted`). Numbers/bools/objects/arrays pass through bare; quoted
    * strings are re-quoted with escaping via to_json. NULL raw (missing or
    * JSON-null source) stays NULL so the field drops out. */
  private def renderJsonValue(raw: Column, wasQuoted: Column): Column = {
    // to_json(struct(x AS v)) = {"v":"escaped text"}; peel the envelope:
    // {"v": is 5 chars, trailing } is 1 char.
    val env = to_json(struct(raw.as("v")))
    val quotedScalar = env.substr(lit(6), length(env) - 6)
    when(raw.isNull, lit(null).cast("string"))
      .when(wasQuoted, quotedScalar)
      .when(raw.rlike("^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$"), raw)
      .when(raw.isin("true", "false"), raw)
      .when(raw.startsWith("{") || raw.startsWith("["), raw)
      .otherwise(quotedScalar)
  }

  private def regexQuote(s: String): String =
    s.replaceAll("([\\\\.\\[\\]{}()*+?^$|])", "\\\\$1")

  /** `shift` as a pure Column expression over the JSON value. */
  def shiftColumn(value: Column, spec: JsonNode): Column = {
    val fields = shiftPairs(spec).map { case (src, dst) =>
      val raw = get_json_object(value, "$." + src)
      val leaf = src.substring(src.lastIndexOf('.') + 1)
      val parent =
        if (src.contains('.'))
          get_json_object(value, "$." + src.substring(0, src.lastIndexOf('.')))
        else value
      // did the source token start with a quote? ("key"  :  ")
      val wasQuoted =
        regexp_extract(parent, "\"" + regexQuote(leaf) + "\"\\s*:\\s*(.)", 1) === "\""
      // NULL (missing / json-null source) propagates through concat → field
      // dropped by concat_ws below, matching jolt's omit-on-missing.
      concat(lit("\"" + dst + "\":"), renderJsonValue(raw, wasQuoted))
    }
    concat(lit("{"), concat_ws(",", fields: _*), lit("}"))
  }

  /** `default` op: jackson merge of absent top-level fields. */
  def defaultFn(spec: JsonNode): String => String = {
    val defaults = mapper.writeValueAsString(spec)
    (value: String) => {
      val m = new ObjectMapper()
      val root =
        try m.readTree(if (value == null) "{}" else value)
        catch { case _: Exception => m.createObjectNode() }
      val obj =
        if (root.isObject) root.asInstanceOf[ObjectNode]
        else m.createObjectNode()
      val d = m.readTree(defaults)
      d.properties().asScala.foreach { e =>
        if (!obj.has(e.getKey)) obj.set[JsonNode](e.getKey, e.getValue)
      }
      m.writeValueAsString(obj)
    }
  }
}
