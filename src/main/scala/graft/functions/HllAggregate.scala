package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog registers: 2^p byte registers over the xxhash64 of
  * each value (Flajolet et al. 2007; the 64-bit-hash variant of
  * Heule et al. 2013, which needs no large-range correction).
  *
  * The point of carrying the REGISTERS (not just an estimate, which
  * `approx_count_distinct` already gives) is mergeability: a sketch
  * column stored per (bucket, key) rolls up to coarser granularities
  * — 5-minute → hourly → daily — by register-max alone, never
  * re-scanning the raw feed. That is the sketch-cascade pattern every
  * warehouse rollup chain wants at 100 TB: distinct counts are the
  * one aggregate a plain cascade cannot sum, and the sketch makes
  * them cascade like sums do. Deterministic by construction (fixed
  * hash, max-merge), so merge order, partitioning, and replays never
  * change a byte.
  */
final class HllBuffer(val p: Int) {
  val regs = new Array[Byte](1 << p)

  def addHash(h: Long): Unit = {
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    // rank = leading zeros of the remaining 64-p bits, plus one;
    // all-zero tail saturates at 64-p+1
    val rank = if (w == 0L) 64 - p + 1 else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  def merge(o: HllBuffer): Unit = {
    var i = 0
    while (i < regs.length) {
      if (o.regs(i) > regs(i)) regs(i) = o.regs(i)
      i += 1
    }
  }

  def estimate: Double = HllBuffer.estimate(regs)
}

object HllBuffer {
  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  def estimate(regs: Array[Byte]): Double = {
    val m = regs.length
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Math.scalb(1.0, -regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha(m) * m.toDouble * m.toDouble / invSum
    // small-range (linear counting) correction; 64-bit hashes make
    // the classic large-range correction unnecessary
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }
}

/** `hll_sketch(value, p)`: per-group HLL registers as a 2^p-byte
  * binary. O(2^p) state per group regardless of cardinality; partials
  * combine map-side; only the registers cross the shuffle.
  */
case class HllSketch(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuffer] {

  require(p >= 4 && p <= 16, "hll_sketch precision must be in [4, 16]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_sketch"

  override def createAggregationBuffer(): HllBuffer = new HllBuffer(p)

  override def update(buffer: HllBuffer, input: InternalRow): HllBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.addHash(HllSketch.hashValue(v, child.dataType))
    buffer
  }

  override def merge(buffer: HllBuffer, other: HllBuffer): HllBuffer = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: HllBuffer): Any = buffer.regs.clone()

  override def serialize(buffer: HllBuffer): Array[Byte] = buffer.regs.clone()

  override def deserialize(bytes: Array[Byte]): HllBuffer = {
    val b = new HllBuffer(p)
    System.arraycopy(bytes, 0, b.regs, 0, bytes.length)
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object HllSketch {
  val Seed = 42L

  /** xxhash64 of the value under its Spark type — the same hash for
    * the same logical value wherever the sketch is built, which is
    * what makes independently-built sketches mergeable.
    */
  def hashValue(v: Any, dt: DataType): Long = dt match {
    case LongType    => XXH64.hashLong(v.asInstanceOf[Long], Seed)
    case IntegerType => XXH64.hashLong(v.asInstanceOf[Int].toLong, Seed)
    case StringType =>
      val s = v.asInstanceOf[UTF8String]
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
    case other =>
      throw new IllegalArgumentException(
        s"hll_sketch supports long/int/string inputs, got $other")
  }
}

/** `hll_merge(sketch)`: register-max of already-built sketches — the
  * cascade step. Input rows are the binary output of [[HllSketch]]
  * at the same precision; precision is inferred from the first
  * sketch's length.
  */
case class HllMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_merge"

  // empty array = "no sketch seen yet" sentinel (precision unknown
  // until the first input row arrives)
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def maxInto(acc: Array[Byte], in: Array[Byte]): Array[Byte] =
    if (acc.isEmpty) in.clone()
    else {
      require(acc.length == in.length,
        s"hll_merge: mixed precisions (${acc.length} vs ${in.length} registers)")
      var i = 0
      while (i < acc.length) {
        if (in(i) > acc(i)) acc(i) = in(i)
        i += 1
      }
      acc
    }

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buffer else maxInto(buffer, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    if (other.isEmpty) buffer else maxInto(buffer, other)

  override def eval(buffer: Array[Byte]): Any = buffer.clone()

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `hll_singleton(value, p)`: the sketch of a ONE-element set as a
  * scalar — bit-identical to `hll_sketch` aggregated over a single
  * row. What it buys at scale: iterative sketch operators (HyperBall)
  * can detect "this node's registers never grew past itself" with a
  * narrow byte-compare instead of carrying a second initial-state
  * sketch column through every round.
  */
case class HllSingleton(child: Expression, p: Int)
  extends UnaryExpression with CodegenFallback {

  require(p >= 4 && p <= 16, "hll_singleton precision must be in [4, 16]")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_singleton"

  override protected def nullSafeEval(v: Any): Any = {
    val b = new HllBuffer(p)
    b.addHash(HllSketch.hashValue(v, child.dataType))
    b.regs
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `hll_union(a, b)`: elementwise register max of two sketch binaries
  * as a SCALAR expression — the narrow merge step when two already-
  * aggregated sketch columns meet in a co-partitioned join (HyperBall's
  * self ∪ neighbor-contrib). A null on either side passes the other
  * through, so a left join's misses cost nothing. Same max-merge
  * semantics as [[HllMerge]], without forcing the self side back
  * through an exchange+aggregate.
  */
case class HllUnion(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable && right.nullable
  override def prettyName: String = "hll_union"

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null) b
    else if (b == null) a
    else {
      val x = a.asInstanceOf[Array[Byte]]
      val y = b.asInstanceOf[Array[Byte]]
      require(x.length == y.length,
        s"hll_union: mixed precisions (${x.length} vs ${y.length} registers)")
      val out = new Array[Byte](x.length)
      var i = 0
      while (i < x.length) {
        out(i) = if (x(i) >= y(i)) x(i) else y(i)
        i += 1
      }
      out
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `hll_estimate(sketch)`: the HLL cardinality estimate of a sketch
  * binary. Scalar over dimension-sized post-aggregation rows (one per
  * group/bucket), so eval-mode execution is off the hot path.
  */
case class HllEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "hll_estimate"

  override protected def nullSafeEval(input: Any): Any =
    HllBuffer.estimate(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HllFunctions {
  import org.apache.spark.sql.graftglue.ColumnGlue

  def hllSketch(value: Column, p: Int): Column =
    ColumnGlue.column(
      HllSketch(ColumnGlue.expr(value), p).toAggregateExpression())

  def hllMerge(sketch: Column): Column =
    ColumnGlue.column(
      HllMerge(ColumnGlue.expr(sketch)).toAggregateExpression())

  def hllEstimate(sketch: Column): Column =
    ColumnGlue.column(HllEstimate(ColumnGlue.expr(sketch)))

  def hllSingleton(value: Column, p: Int): Column =
    ColumnGlue.column(HllSingleton(ColumnGlue.expr(value), p))

  def hllUnion(a: Column, b: Column): Column =
    ColumnGlue.column(HllUnion(ColumnGlue.expr(a), ColumnGlue.expr(b)))
}
