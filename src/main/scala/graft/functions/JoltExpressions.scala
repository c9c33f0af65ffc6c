package graft.functions

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.transforms.Jolt

/** Jolt ops as native Catalyst expressions: one jackson parse + one
  * serialize per record, inlined into whole-stage codegen via a reference
  * object — no ScalaUDF node, no encoder round-trip, no codegen break.
  *
  * The reference runs jolt as a server-side WASM record transform
  * (`/root/reference/examples/short.yaml:5-29`,
  * `/root/reference/README.md:121-143`); this is its Spark-native seat: a
  * scalar expression over the record `value` column.
  *
  * The spec travels as its JSON text (JsonNode isn't serializable); the
  * per-record closure is rebuilt lazily on each executor.
  */
abstract class JoltExpressionBase extends UnaryExpression {
  /** JSON text of this op's spec (serializable plan state). */
  def specJson: String
  /** Build the per-record transform from the parsed spec. */
  protected def makeFn(spec: JsonNode): String => String

  @transient private lazy val fn: String => String =
    makeFn(Jolt.mapper.readTree(specJson))

  /** Null records transform like empty objects (matching the round-1
    * ScalaUDF behavior, where the Scala function received null). */
  final def transformValue(v: UTF8String): UTF8String =
    UTF8String.fromString(fn(if (v == null) null else v.toString))

  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    transformValue(child.eval(input).asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("joltOp", this, classOf[JoltExpressionBase].getName)
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        UTF8String ${ev.value} =
          $ref.transformValue(${childGen.isNull} ? null : ${childGen.value});""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
}

/** jolt `shift`: restructure the JSON per the spec (literal paths plus
  * `*` wildcards at any depth with `&`/`&(n)` target references — see
  * [[graft.transforms.Jolt]]). */
case class JoltShift(child: Expression, specJson: String) extends JoltExpressionBase {
  override protected def makeFn(spec: JsonNode): String => String = Jolt.shiftFn(spec)
  override protected def withNewChildInternal(newChild: Expression): JoltShift =
    copy(child = newChild)
}

/** jolt `default`: add absent top-level fields. */
case class JoltDefault(child: Expression, specJson: String) extends JoltExpressionBase {
  override protected def makeFn(spec: JsonNode): String => String = Jolt.defaultFn(spec)
  override protected def withNewChildInternal(newChild: Expression): JoltDefault =
    copy(child = newChild)
}

/** jolt `remove`: delete fields matched by the spec tree (`""` leaves;
  * `*` wildcards at any level). */
case class JoltRemove(child: Expression, specJson: String) extends JoltExpressionBase {
  override protected def makeFn(spec: JsonNode): String => String = Jolt.removeFn(spec)
  override protected def withNewChildInternal(newChild: Expression): JoltRemove =
    copy(child = newChild)
}

/** jolt `cardinality`: coerce matched fields to `ONE` (array → first
  * element) or `MANY` (scalar → one-element array). */
case class JoltCardinality(child: Expression, specJson: String) extends JoltExpressionBase {
  override protected def makeFn(spec: JsonNode): String => String = Jolt.cardinalityFn(spec)
  override protected def withNewChildInternal(newChild: Expression): JoltCardinality =
    copy(child = newChild)
}

/** jolt `sort`: object keys in natural order, recursively (arrays keep
  * element order); the op takes no spec. */
case class JoltSort(child: Expression, specJson: String) extends JoltExpressionBase {
  override protected def makeFn(spec: JsonNode): String => String = Jolt.sortFn(spec)
  override protected def withNewChildInternal(newChild: Expression): JoltSort =
    copy(child = newChild)
}
