package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Count-Min sketch (Cormode & Muthukrishnan 2005): depth×width long
  * counters; each key increments one counter per row (row d's index
  * is the Kirsch-Mitzenmacher double hash h1 + d·h2 mod width), and a
  * point estimate reads the MINIMUM across rows — always ≥ the true
  * count, over by at most εN (ε ≈ e/width) with high probability.
  *
  * The companion to the HLL family: HLL answers "how many DISTINCT
  * keys", CMS answers "how often THIS key", and both cascade — CMS
  * counters are plain sums, so sketches stored per fine bucket roll
  * up to coarser granularities by element-wise addition, bit-identical
  * to sketching the raw feed directly (spec-pinned). That gives
  * per-key frequency queries over any time range at 100 TB from
  * depth×width×8 bytes per bucket, never re-scanning raw data —
  * where Misra-Gries ([[FreqAggregate]]) keeps only the head, CMS
  * answers ANY key, including the long tail.
  *
  * Deterministic by construction (fixed seeds, sum-merge): merge
  * order, partitioning, and replays never change a byte.
  */
final class CmsBuffer(val depth: Int, val width: Int) {
  val counts = new Array[Long](depth * width)

  def add(h1: Long, by: Long = 1L): Unit = {
    val h2 = XXH64.hashLong(h1, CmsSketch.Seed2)
    var d = 0
    while (d < depth) {
      counts(d * width + java.lang.Math.floorMod(h1 + d.toLong * h2, width.toLong).toInt) += by
      d += 1
    }
  }

  def merge(o: CmsBuffer): Unit = {
    var i = 0
    while (i < counts.length) { counts(i) += o.counts(i); i += 1 }
  }

  /** Header (depth, width as 4-byte ints) + counters as 8-byte longs. */
  def serialize: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + counts.length * 8)
    bb.putInt(depth).putInt(width)
    var i = 0
    while (i < counts.length) { bb.putLong(counts(i)); i += 1 }
    bb.array()
  }
}

object CmsBuffer {
  def deserialize(bytes: Array[Byte]): CmsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new CmsBuffer(bb.getInt, bb.getInt)
    var i = 0
    while (i < b.counts.length) { b.counts(i) = bb.getLong; i += 1 }
    b
  }
}

/** `cms_sketch(value, depth, width)`: per-group CMS counters as a
  * binary. O(depth×width) state per group regardless of key
  * cardinality; partials combine map-side; only the counters cross
  * the shuffle.
  */
case class CmsSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] {

  require(depth >= 1 && depth <= 16, "cms_sketch depth must be in [1, 16]")
  require(width >= 8 && width <= (1 << 22), "cms_sketch width must be in [8, 2^22]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(depth, width)

  override def update(buffer: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(HllSketch.hashValue(v, child.dataType))
    buffer
  }

  override def merge(buffer: CmsBuffer, other: CmsBuffer): CmsBuffer = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: CmsBuffer): Any = buffer.serialize

  override def serialize(buffer: CmsBuffer): Array[Byte] = buffer.serialize
  override def deserialize(bytes: Array[Byte]): CmsBuffer =
    CmsBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object CmsSketch {
  /** Second hash seed for the Kirsch-Mitzenmacher row hashes. */
  val Seed2 = 1337L
}

/** `cms_merge(sketch)`: element-wise SUM of already-built sketches —
  * the cascade step. Inputs must share (depth, width); the header is
  * checked, not trusted.
  */
case class CmsMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_merge"

  // empty array = "no sketch seen yet" (shape unknown until then)
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def addInto(acc: Array[Byte], in: Array[Byte]): Array[Byte] =
    if (acc.isEmpty) in.clone()
    else {
      require(acc.length == in.length &&
        java.util.Arrays.equals(acc, 0, 8, in, 0, 8),
        "cms_merge: mixed sketch shapes")
      val a = java.nio.ByteBuffer.wrap(acc)
      val b = java.nio.ByteBuffer.wrap(in)
      var off = 8
      while (off < acc.length) {
        a.putLong(off, a.getLong(off) + b.getLong(off))
        off += 8
      }
      acc
    }

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buffer else addInto(buffer, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    if (other.isEmpty) buffer else addInto(buffer, other)

  override def eval(buffer: Array[Byte]): Any = buffer.clone()

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `cms_estimate(sketch, key)`: the CMS point estimate (minimum over
  * rows) for a key. Scalar over dimension-sized post-aggregation
  * rows, so eval-mode execution is off the hot path.
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override protected def nullSafeEval(sk: Any, key: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val depth = bb.getInt(0)
    val width = bb.getInt(4)
    val h1 = HllSketch.hashValue(key, right.dataType)
    val h2 = XXH64.hashLong(h1, CmsSketch.Seed2)
    var min = Long.MaxValue
    var d = 0
    while (d < depth) {
      val idx = java.lang.Math.floorMod(h1 + d.toLong * h2, width.toLong).toInt
      val c = bb.getLong(8 + (d * width + idx) * 8)
      if (c < min) min = c
      d += 1
    }
    min
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CmsFunctions {
  import org.apache.spark.sql.graftglue.ColumnGlue

  def cmsSketch(value: Column, depth: Int, width: Int): Column =
    ColumnGlue.column(
      CmsSketch(ColumnGlue.expr(value), depth, width).toAggregateExpression())

  def cmsMerge(sketch: Column): Column =
    ColumnGlue.column(
      CmsMerge(ColumnGlue.expr(sketch)).toAggregateExpression())

  def cmsEstimate(sketch: Column, key: Column): Column =
    ColumnGlue.column(
      CmsEstimate(ColumnGlue.expr(sketch), ColumnGlue.expr(key)))
}
