package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** A serialized `spark-sketch` Bloom filter as Catalyst-safe expression
  * reference data. A filter over millions of set members is megabytes of
  * bitset; carried as a plain case-class field it would be deep-compared
  * on every optimizer pass (the [[PqEncodeExpr]] plan-work rule, two
  * orders of magnitude worse here). This wrapper makes equality cheap: a
  * precomputed content hash plus length short-circuits, with the full
  * `Arrays.equals` (a memcmp) only on a hash collision — so
  * canonicalization and subexpression elimination still see structural
  * equality, at O(1) typical cost.
  *
  * The filter deserializes lazily ONCE per JVM (driver for interpreted
  * eval, each executor after the expression ships inside the codegen
  * references array) — broadcast-like distribution without a manual
  * `SparkContext.broadcast` handle to leak. */
final class BloomRef(val bytes: Array[Byte]) extends Serializable {
  require(bytes.nonEmpty, "empty bloom filter payload")
  @transient lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  private val contentHash = java.util.Arrays.hashCode(bytes)
  override def hashCode(): Int = contentHash
  override def equals(o: Any): Boolean = o match {
    case b: BloomRef =>
      (b eq this) || (contentHash == b.contentHash &&
        bytes.length == b.bytes.length &&
        java.util.Arrays.equals(bytes, b.bytes))
    case _ => false
  }
}

object BloomRef {
  def apply(f: BloomFilter): BloomRef = {
    val out = new java.io.ByteArrayOutputStream()
    f.writeTo(out)
    new BloomRef(out.toByteArray)
  }
}

/** Native Bloom-membership probe: `bloom.mightContain(str)` as ONE
  * codegen'd expression — the broadcast-bitmap half of the
  * bloom-prefilter + exact-confirm pattern ([[graft.operators.Dedup
  * .ngramContaminatedBloom]]). Probes the UTF-8 bytes directly
  * (`mightContainBinary` — the identical hash path `putString` used on
  * the build side), so the hot loop allocates no `String`.
  *
  * Semantics are the Bloom guarantee: `false` is definitive ("not in the
  * set"), `true` means "in the set, or a false positive at the built
  * fpp" — callers that need the exact set confirm the survivors with an
  * equi-join, which this filter has already shrunk from corpus-sized to
  * hits-sized. */
case class BloomMightContainExpr(child: Expression, bloom: BloomRef)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires a string input, got ${other.simpleString}")
    }

  /** Called from interpreted AND generated code. */
  def contains(s: UTF8String): Boolean =
    bloom.filter.mightContainBinary(s.getBytes)

  override def nullSafeEval(input: Any): Any =
    contains(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomContains", this,
      classOf[BloomMightContainExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.contains($c);")
  }

  override def prettyName: String = "bloom_might_contain"

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}

object BloomMightContainExpr {
  def apply(str: Column, f: BloomFilter): Column =
    shim.column(BloomMightContainExpr(shim.expression(str), BloomRef(f)))
}
