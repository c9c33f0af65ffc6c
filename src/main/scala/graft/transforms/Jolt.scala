package graft.transforms

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import scala.jdk.CollectionConverters._

/** Jolt-style JSON restructuring over the record `value` column — the one
  * SmartModule the reference's docs exercise (`infinyon/jolt@0.1.0`,
  * `/root/reference/examples/short.yaml:5-29`,
  * `/root/reference/README.md:121-143`).
  *
  * Supported operations (the documented subset — SURVEY.md §7.4 risk 4):
  *   - `shift`: nested spec of literal source paths → flat target names,
  *     e.g. `{payload: {VP: {lat: "lat"}}}` moves `payload.VP.lat` to
  *     top-level `lat`. Wildcards (`*`, `&`) are not supported; fields
  *     whose source path is missing or JSON-null are omitted.
  *   - `default`: `{field: value}` adds fields that are absent.
  *
  * Both ops run as one jackson parse + one serialize per record —
  * matching the reference's WASM module (also a per-record JSON
  * transform), and measured faster than composing `get_json_object`
  * expressions, which re-parse the payload once per mapped field
  * (Spark 4's evaluator builds a fresh Jackson reader per call). Type
  * fidelity (string vs number vs bool) is exact since nodes are moved,
  * never re-rendered through text.
  */
object Jolt {
  private[transforms] val mapper = new ObjectMapper()

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

  /** `shift` as a per-record function (for use as a Spark UDF). */
  def shiftFn(spec: JsonNode): String => String = {
    val pairs = shiftPairs(spec).map { case (src, dst) => (src.split('.').toSeq, dst) }
    (value: String) => {
      val m = Jolt.mapper
      val root =
        try m.readTree(if (value == null) "{}" else value)
        catch { case _: Exception => m.createObjectNode() }
      val out = m.createObjectNode()
      pairs.foreach { case (path, dst) =>
        var node: JsonNode = root
        val it = path.iterator
        while (node != null && it.hasNext) node = node.get(it.next())
        if (node != null && !node.isNull) out.set[JsonNode](dst, node)
      }
      m.writeValueAsString(out)
    }
  }

  /** `default` op: jackson merge of absent top-level fields. */
  def defaultFn(spec: JsonNode): String => String = {
    val defaults = mapper.writeValueAsString(spec)
    (value: String) => {
      val m = Jolt.mapper
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
