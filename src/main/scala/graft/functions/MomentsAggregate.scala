package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact first+second moments of an integer-vector column — the one
  * aggregation a PCA / covariance / whitening pass over embeddings
  * needs, computed the 100 TB way: each task accumulates `n`, the
  * per-dimension sums `s[d]`, and the upper-triangle pair-product
  * sums `sxy[d(d+1)/2]` as BIGINTs (order-independent — the result
  * is bit-identical under any partitioning), partials combine
  * map-side, and ONE buffer of ~d²/2 longs per task crosses the
  * shuffle — never a d²× row explosion of the corpus (the
  * explode-then-groupBy formulation shuffles 2080 rows per input row
  * at d=64). Covariance then reads off as
  * `(n·sxy − s_i·s_j)/n²` — exact integers until one final division.
  *
  * Works on int8-quantized embeddings ([[graft.ann.Ann.quantizeInt8]]):
  * at |corpus| ≤ 2^38 rows the pair products fit comfortably in the
  * BIGINT headroom (127² per row).
  */
final class VecMomentsBuffer(var d: Int) {
  var n: Long = 0L
  var s: Array[Long] = if (d > 0) new Array[Long](d) else null
  var sxy: Array[Long] = if (d > 0) new Array[Long](d * (d + 1) / 2) else null

  def init(dims: Int): Unit = {
    d = dims
    s = new Array[Long](d)
    sxy = new Array[Long](d * (d + 1) / 2)
  }

  def add(v: Array[Int]): Unit = {
    if (d == 0) init(v.length)
    require(v.length == d, s"vec_moments: dimension drift ${v.length} vs $d")
    n += 1
    var i = 0
    var k = 0
    while (i < d) {
      val vi = v(i).toLong
      s(i) += vi
      var j = i
      while (j < d) { sxy(k) += vi * v(j); k += 1; j += 1 }
      i += 1
    }
  }

  def merge(o: VecMomentsBuffer): Unit = {
    if (o.d == 0) return
    if (d == 0) init(o.d)
    require(o.d == d, s"vec_moments: dimension drift ${o.d} vs $d")
    n += o.n
    var i = 0
    while (i < s.length) { s(i) += o.s(i); i += 1 }
    i = 0
    while (i < sxy.length) { sxy(i) += o.sxy(i); i += 1 }
  }

  def serialize: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + (if (d == 0) 0
      else (s.length + sxy.length) * 8))
    bb.putInt(d).putLong(n)
    if (d > 0) {
      s.foreach(bb.putLong)
      sxy.foreach(bb.putLong)
    }
    bb.array()
  }
}

object VecMomentsBuffer {
  def deserialize(bytes: Array[Byte]): VecMomentsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new VecMomentsBuffer(bb.getInt)
    b.n = bb.getLong
    if (b.d > 0) {
      var i = 0
      while (i < b.s.length) { b.s(i) = bb.getLong; i += 1 }
      i = 0
      while (i < b.sxy.length) { b.sxy(i) = bb.getLong; i += 1 }
    }
    b
  }
}

/** `vec_moments(qvec)` → struct(n, s: array<bigint>,
  * pairs: array<struct(i, j, sxy)>) with 1-based upper-triangle
  * (i ≤ j) indices — explode `pairs` and `element_at(s, i)` to lay
  * the covariance matrix out as rows.
  */
case class VecMoments(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecMomentsBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "vec_moments"

  private val pairType = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("sxy", LongType, nullable = false)))

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("pairs", ArrayType(pairType, containsNull = false), nullable = false)))

  override def createAggregationBuffer(): VecMomentsBuffer = new VecMomentsBuffer(0)

  override def update(buffer: VecMomentsBuffer, input: InternalRow): VecMomentsBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[ArrayData].toIntArray())
    buffer
  }

  override def merge(buffer: VecMomentsBuffer, other: VecMomentsBuffer): VecMomentsBuffer = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: VecMomentsBuffer): Any = {
    val d = buffer.d
    val pairs = new Array[Any](if (d == 0) 0 else d * (d + 1) / 2)
    var i = 0
    var k = 0
    while (i < d) {
      var j = i
      while (j < d) {
        pairs(k) = InternalRow(i + 1, j + 1, buffer.sxy(k))
        k += 1; j += 1
      }
      i += 1
    }
    InternalRow(buffer.n,
      new GenericArrayData(if (d == 0) Array.emptyLongArray else buffer.s),
      new GenericArrayData(pairs))
  }

  override def serialize(buffer: VecMomentsBuffer): Array[Byte] = buffer.serialize
  override def deserialize(bytes: Array[Byte]): VecMomentsBuffer =
    VecMomentsBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object MomentsFunctions {
  import org.apache.spark.sql.graftglue.ColumnGlue

  def vecMoments(qvec: Column): Column =
    ColumnGlue.column(
      VecMoments(ColumnGlue.expr(qvec)).toAggregateExpression())
}
