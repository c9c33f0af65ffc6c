package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass sketch aggregates for dedup, as native Catalyst
  * `TypedImperativeAggregate`s.
  *
  * The alternative formulations — 64 parallel `min(xxhash64(i, s))`
  * aggregates, or exploding each input row ×64 into long format — either
  * compile pathologically wide generated code or multiply the shuffle
  * input. These aggregates keep a primitive array buffer per group, get
  * map-side partial aggregation for free, and hash each input exactly
  * once per permutation with seeded XXH64 — the same scheme at any scale.
  */

/** MinHash: buffer[i] = min over group of xxh64(input, seed=i).
  * Output: array<long> of length `numHashes`. */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), i)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashAgg =
    copy(child = c.head)
}

/** SimHash: buffer[i] = Σ over group of (bit i of xxh64(input) ? +1 : −1);
  * output = 64-bit signature with bit i set where the sum is positive. */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) buf(i) += 1 else buf(i) -= 1
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var i = 0
    while (i < 64) { if (buf(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 4)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SimHashAgg =
    copy(child = c.head)
}

/** Count-Min Sketch (Cormode & Muthukrishnan 2005): `depth` hash rows ×
  * `width` counters; row r counts each input at bucket
  * `floorMod(xxh64(input, seed=r), width)`. Point estimate = min over
  * rows of the probed counter — an upper bound on the true count that is
  * exact when no collision lands in ALL rows.
  *
  * Pure counting, so the aggregate is ORDER- and PARTITIONING-INDEPENDENT
  * (unlike Misra-Gries/SpaceSaving, whose state depends on arrival
  * order) — the right heavy-hitter sketch for a shuffled distributed
  * scan. Buffer is one primitive long array of depth×width counters;
  * map-side partial aggregation merges by elementwise add, so the
  * shuffle carries ≤ one sketch per partition regardless of corpus size.
  * Output: array<long> of length depth×width, row-major. */
case class CmsAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"CMS depth must be in [1,16], got $depth")
  require(width >= 2, s"CMS width must be >= 2, got $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var r = 0
      while (r < depth) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), r)
        buf(r * width + java.lang.Math.floorMod(h, width.toLong).toInt) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): CmsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsAgg =
    copy(child = c.head)
}

object SketchAggregates {
  /** minhash(col, n): array<long> signature aggregate. */
  def minhash(c: Column, numHashes: Int): Column =
    shim.column(MinHashAgg(shim.expression(c), numHashes).toAggregateExpression())

  /** simhash(col): 64-bit signature aggregate. */
  def simhash(c: Column): Column =
    shim.column(SimHashAgg(shim.expression(c)).toAggregateExpression())

  /** cms(col, depth, width): count-min sketch aggregate — array<long>
    * of depth×width counters, row-major. */
  def cms(c: Column, depth: Int, width: Int): Column =
    shim.column(CmsAgg(shim.expression(c), depth, width).toAggregateExpression())

  /** Point estimate from a collected [[CmsAgg]] sketch: min over rows of
    * the probed counter — same seeded XXH64 the executors used. The
    * sketch IS the bounded summary (depth×width longs); probing it is a
    * driver-side accessor, not a data-sized action. */
  def cmsEstimate(sketch: Array[Long], depth: Int, width: Int,
                  item: String): Long = {
    require(sketch.length == depth * width,
      s"sketch length ${sketch.length} != depth*width ${depth * width}")
    val s = UTF8String.fromString(item)
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), r)
      val c = sketch(r * width + java.lang.Math.floorMod(h, width.toLong).toInt)
      if (c < best) best = c
      r += 1
    }
    best
  }
}
