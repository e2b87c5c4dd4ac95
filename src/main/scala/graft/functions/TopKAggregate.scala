package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score desc, tie asc)
  * pairs in a small array — the min element is evicted on overflow.
  * Score comparison uses java.lang.Double.compare semantics (NaN
  * sorts largest), matching Spark's window `ORDER BY score DESC` on
  * degenerate inputs (e.g. NaN cosine from zero-norm vectors).
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ties = new Array[Long](k)
  var size = 0

  private def worse(i: Int, s: Double, t: Long): Boolean = {
    val c = java.lang.Double.compare(scores(i), s)
    c < 0 || (c == 0 && ties(i) > t)
  }

  def add(s: Double, t: Long): Unit = {
    if (size < k) { scores(size) = s; ties(size) = t; size += 1 }
    else {
      var worst = 0
      var i = 1
      while (i < size) { if (worse(i, scores(worst), ties(worst))) worst = i; i += 1 }
      if (worse(worst, s, t)) { scores(worst) = s; ties(worst) = t }
    }
  }

  /** indices sorted best-first (score desc, tie asc) */
  def sorted: Array[Int] =
    (0 until size).sortWith { (a, b) =>
      val c = java.lang.Double.compare(scores(a), scores(b))
      c > 0 || (c == 0 && ties(a) < ties(b))
    }.toArray
}

/** `top_k(score, tie, k)`: per-group top-k rows by (score desc, tie
  * asc) as an array of structs — a TypedImperativeAggregate with an
  * O(k) buffer, so the top-k computation partial-aggregates map-side
  * and shuffles k rows per group instead of every row. The
  * window-function formulation (`row_number() <= k`) must shuffle
  * and sort the full input; this is the plan you want at 100 TB.
  *
  * Deployment note: TypedImperativeAggregate plans as
  * ObjectHashAggregate, whose in-memory map falls back to SORT-based
  * aggregation after `spark.sql.objectHashAggregate.sortBased.
  * fallbackThreshold` keys — a default of 128 (!). For a small-state
  * aggregate like this heap that fallback is a cliff: the 100× soak
  * measured the kNN-graph top-k stage sorting ~300M scored rows
  * instead of heap-folding them. Size the threshold to the expected
  * distinct groups per task TIMES the per-key state: this repo's
  * mains set 16384, which covers the suite's key densities while
  * bounding even 4KB-state aggregates (HyperBall registers) to
  * ~64MB of map per task — a 256k threshold OOM'd exactly there.
  */
case class TopKByScore(
    score: Expression,
    tie: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, tie)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("tie", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val t = tie.eval(input)
    if (s != null && t != null)
      buffer.add(s.asInstanceOf[Double], t.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buffer.add(other.scores(i), other.ties(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val order = buffer.sorted
    val rows = new Array[Any](order.length)
    var i = 0
    while (i < order.length) {
      rows(i) = InternalRow(buffer.scores(order(i)), buffer.ties(order(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putDouble(buffer.scores(i)); bb.putLong(buffer.ties(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), tie = newChildren(1))
}

object TopKFunctions {
  import org.apache.spark.sql.graftglue.ColumnGlue

  def topK(score: Column, tie: Column, k: Int): Column =
    ColumnGlue.column(
      TopKByScore(ColumnGlue.expr(score), ColumnGlue.expr(tie), k)
        .toAggregateExpression())
}
