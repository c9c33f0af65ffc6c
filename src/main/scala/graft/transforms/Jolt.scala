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
  *   - `shift`: nested spec of source paths → flat target names,
  *     e.g. `{payload: {VP: {lat: "lat"}}}` moves `payload.VP.lat` to
  *     top-level `lat`. `*` keys match every field not claimed by a
  *     literal (literals win, jolt's precedence) at ANY spec depth;
  *     target names substitute `&` (the key matched at this level) and
  *     `&(n)` (the key matched n spec levels up), so a two-level
  *     `{*: {*: "&(1)_&"}}` flattens one nesting level. Missing/JSON-null
  *     sources are omitted.
  *   - `default`: `{field: value}` adds fields that are absent.
  *   - `remove`: spec tree whose `""` leaves delete the matched field;
  *     `*` keys match every field at that level, nested objects recurse.
  *   - `cardinality`: spec tree whose leaves are `"ONE"` (an array field is
  *     replaced by its first element; empty arrays are removed) or `"MANY"`
  *     (a non-array field is wrapped in a one-element array); `*` wildcards
  *     and nested objects recurse like `remove`.
  *   - shift `@` spec key: matches the WHOLE value at the current level
  *     (jolt's bare input-value reference) — `{payload: {"@": "pl"}}`
  *     copies the entire `payload` subtree to `pl`. The target supports the
  *     same `&(n)` references as ordinary shift targets; `@` never consumes
  *     fields from the `*` wildcard (literals and `*` see the same node).
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
  private[graft] val mapper = new ObjectMapper()

  final case class Op(operation: String, spec: JsonNode)

  def parseSpec(specJson: String): Seq[Op] = {
    val root = mapper.readTree(specJson)
    require(root.isArray, s"jolt spec must be a JSON array, got: $specJson")
    root.elements().asScala.map { n =>
      Op(n.get("operation").asText(), n.get("spec"))
    }.toSeq
  }

  /** Flatten a shift spec tree into (sourcePath, targetName) pairs
    * (literal paths only — wildcard specs walk the tree in [[applyShift]]). */
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

  /** jolt target-name substitution: `&(n)` is the key matched `n` spec
    * levels up (0 = this level); bare `&` ≡ `&(0)`. `stack` holds matched
    * keys innermost-first. ONE regex pass over both forms — substituting
    * in two passes would rescan already-substituted text, corrupting
    * targets whenever a matched key itself contains `&`. */
  private val refPattern = "&(?:\\((\\d+)\\))?".r
  private def substituteRefs(target: String, stack: List[String]): String =
    refPattern.replaceAllIn(target, m => {
      val n = Option(m.group(1)).map(_.toInt).getOrElse(0)
      scala.util.matching.Regex.quoteReplacement(
        if (n < stack.length) stack(n) else "")
    })

  /** Walk `node` under `spec`, writing matched values into `out`.
    * Literal spec keys match exactly and win over `*`, which matches every
    * remaining field (jolt's precedence) — at any depth. A textual RHS is
    * the target name after [[substituteRefs]]. Missing/JSON-null sources
    * are omitted. */
  private def applyShift(node: JsonNode, spec: JsonNode, out: ObjectNode,
                         stack: List[String] = Nil): Unit = {
    if (node == null || !node.isObject) return
    val entries = spec.properties().asScala.toSeq
    // `@` = the whole value at this level (input-value reference): write
    // the current node itself to the target. Evaluated first; does not
    // claim any field from `*`.
    entries.filter(_.getKey == "@").foreach { e =>
      val rhs = e.getValue
      require(rhs.isTextual,
        s"unsupported jolt shift spec value at @: $rhs (target name expected)")
      if (!node.isNull)
        out.set[JsonNode](substituteRefs(rhs.asText(), stack), node)
    }
    val literals = entries.filter(e => e.getKey != "*" && e.getKey != "@")
    val wildcard = entries.find(_.getKey == "*").map(_.getValue)
    def emit(key: String, v: JsonNode, rhs: JsonNode): Unit =
      if (rhs.isTextual) {
        if (v != null && !v.isNull)
          out.set[JsonNode](substituteRefs(rhs.asText(), key :: stack), v)
      } else if (rhs.isObject) applyShift(v, rhs, out, key :: stack)
      else
        throw new IllegalArgumentException(
          s"unsupported jolt shift spec value at $key: $rhs")
    literals.foreach(e => emit(e.getKey, node.get(e.getKey), e.getValue))
    wildcard.foreach { rhs =>
      val literalKeys = literals.map(_.getKey).toSet
      node.properties().asScala.foreach { f =>
        if (!literalKeys.contains(f.getKey)) emit(f.getKey, f.getValue, rhs)
      }
    }
  }

  /** Walk `node` under a remove spec, deleting matched fields in place.
    * A `""` leaf deletes the field; an object RHS recurses; `*` matches
    * every field at that level. */
  private def applyRemove(node: JsonNode, spec: JsonNode): Unit = {
    if (node == null || !node.isObject) return
    val obj = node.asInstanceOf[ObjectNode]
    spec.properties().asScala.toSeq.foreach { e =>
      val (k, rhs) = (e.getKey, e.getValue)
      val targets: Seq[String] =
        if (k == "*") obj.properties().asScala.map(_.getKey).toSeq
        else if (obj.has(k)) Seq(k)
        else Nil
      targets.foreach { t =>
        if (rhs.isTextual && rhs.asText().isEmpty) obj.remove(t)
        else if (rhs.isObject) applyRemove(obj.get(t), rhs)
        else
          throw new IllegalArgumentException(
            s"unsupported jolt remove spec value at $k: $rhs")
      }
    }
  }

  /** Walk `node` under a cardinality spec, adjusting matched fields in
    * place. Leaf `"ONE"`: an array is replaced by its first element (empty
    * array → field removed); non-arrays stay. Leaf `"MANY"`: a non-array is
    * wrapped in a one-element array; arrays stay. An object RHS recurses;
    * `*` matches every field at that level (literals win, like shift). */
  private def applyCardinality(node: JsonNode, spec: JsonNode): Unit = {
    if (node == null || !node.isObject) return
    val obj = node.asInstanceOf[ObjectNode]
    val entries = spec.properties().asScala.toSeq
    val literalKeys = entries.collect { case e if e.getKey != "*" => e.getKey }.toSet
    def adjust(k: String, rhs: JsonNode): Unit = {
      val v = obj.get(k)
      if (v == null) return
      if (rhs.isTextual) rhs.asText() match {
        case "ONE" =>
          if (v.isArray) {
            if (v.size() == 0) obj.remove(k)
            else obj.set[JsonNode](k, v.get(0))
          }
        case "MANY" =>
          if (!v.isArray) {
            val arr = mapper.createArrayNode(); arr.add(v)
            obj.set[JsonNode](k, arr)
          }
        case other =>
          throw new IllegalArgumentException(
            s"unsupported jolt cardinality value at $k: $other (ONE|MANY)")
      }
      else if (rhs.isObject) applyCardinality(v, rhs)
      else
        throw new IllegalArgumentException(
          s"unsupported jolt cardinality spec value at $k: $rhs")
    }
    entries.foreach { e =>
      if (e.getKey == "*")
        obj.properties().asScala.map(_.getKey).toSeq
          .filterNot(literalKeys.contains).foreach(adjust(_, e.getValue))
      else adjust(e.getKey, e.getValue)
    }
  }

  /** Rebuild `n` with object keys in natural String order, recursively
    * (arrays keep element order; only map key order changes) — jolt's
    * `sort` operation. Jackson ObjectNode serializes in insertion order,
    * so inserting sorted IS the sort. */
  private def sortNode(n: JsonNode): JsonNode =
    if (n.isObject) {
      val o = mapper.createObjectNode()
      n.properties().asScala.toSeq.sortBy(_.getKey)
        .foreach(e => o.set[JsonNode](e.getKey, sortNode(e.getValue)))
      o
    } else if (n.isArray) {
      val a = mapper.createArrayNode()
      n.elements().asScala.foreach(e => a.add(sortNode(e)))
      a
    } else n

  /** `sort` as a per-record function (spec is ignored — jolt's sort op
    * takes none). */
  def sortFn(spec: JsonNode): String => String = {
    (value: String) => {
      val m = Jolt.mapper
      val root =
        try m.readTree(if (value == null) "{}" else value)
        catch { case _: Exception => m.createObjectNode() }
      m.writeValueAsString(sortNode(root))
    }
  }

  /** `cardinality` as a per-record function (ONE/MANY arity coercion). */
  def cardinalityFn(spec: JsonNode): String => String = {
    (value: String) => {
      val m = Jolt.mapper
      val root =
        try m.readTree(if (value == null) "{}" else value)
        catch { case _: Exception => m.createObjectNode() }
      applyCardinality(root, spec)
      m.writeValueAsString(root)
    }
  }

  /** `remove` as a per-record function. Non-object payloads pass through
    * the usual parse contract (garbage → `{}`). */
  def removeFn(spec: JsonNode): String => String = {
    (value: String) => {
      val m = Jolt.mapper
      val root =
        try m.readTree(if (value == null) "{}" else value)
        catch { case _: Exception => m.createObjectNode() }
      applyRemove(root, spec)
      m.writeValueAsString(root)
    }
  }

  /** `shift` as a per-record function (for use as a Spark UDF). */
  def shiftFn(spec: JsonNode): String => String = {
    (value: String) => {
      val m = Jolt.mapper
      val root =
        try m.readTree(if (value == null) "{}" else value)
        catch { case _: Exception => m.createObjectNode() }
      val out = m.createObjectNode()
      applyShift(root, spec, out)
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
