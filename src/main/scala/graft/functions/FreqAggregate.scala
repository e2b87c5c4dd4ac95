package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequency summary: at most `capacity` (item → count)
  * counters. Estimates are LOWER bounds (true - n/capacity ≤ est ≤
  * true), every item with true frequency > n/capacity is guaranteed
  * present, and when no decrement ever fires (capacity ≥ distinct
  * items seen by every partial) the counts are exact.
  */
final class FreqBuffer(val capacity: Int) {
  val counts = new mutable.HashMap[String, Long]

  /** Misra-Gries step: bump a present item, insert under capacity,
    * otherwise decrement every counter (dropping zeros) — the classic
    * O(capacity) amortized eviction.
    */
  def add(item: String): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1L)
      case None if counts.size < capacity => counts.update(item, 1L)
      // full and absent: the new occurrence cancels against one
      // occurrence of every tracked item
      case None => shrinkBy(1L)
    }
  }

  private def shrinkBy(v: Long): Unit = {
    val dead = counts.iterator.collect { case (k, c) if c <= v => k }.toList
    dead.foreach(counts.remove)
    counts.mapValuesInPlace((_, c) => c - v)
  }

  /** Mergeable-summaries combine (Agarwal et al., PODS'12): sum
    * counters pointwise, then reduce back to `capacity` entries by
    * subtracting the (capacity+1)-largest count from every counter —
    * the same decrement step as [[add]], so all guarantees survive
    * merging in any order.
    */
  def merge(other: FreqBuffer): Unit = {
    other.counts.foreach { case (k, c) =>
      counts.update(k, counts.getOrElse(k, 0L) + c)
    }
    if (counts.size > capacity) {
      val sorted = counts.values.toArray
      java.util.Arrays.sort(sorted)
      shrinkBy(sorted(sorted.length - capacity - 1))
    }
  }
}

/** `heavy_hitters(item, capacity)`: per-group Misra-Gries summary as
  * an array of (item, count) structs sorted (count desc, item asc).
  *
  * The buffer is O(capacity) no matter how many rows stream through,
  * partials combine map-side, and only `capacity` counters per group
  * cross the shuffle — the 100 TB shape for "top sources / tokens /
  * user agents" questions where exact per-item counting
  * (`groupBy(item).count`) would shuffle the full item universe.
  */
case class HeavyHitters(
    item: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqBuffer] {

  require(capacity > 0, "heavy_hitters capacity must be positive")

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): FreqBuffer = new FreqBuffer(capacity)

  override def update(buffer: FreqBuffer, input: InternalRow): FreqBuffer = {
    val v = item.eval(input)
    // toString copies out of Spark's reused row buffer
    if (v != null) buffer.add(v.toString)
    buffer
  }

  override def merge(buffer: FreqBuffer, other: FreqBuffer): FreqBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: FreqBuffer): Any = {
    val entries = buffer.counts.toArray.sortWith { (a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
    }
    new GenericArrayData(entries.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c): Any
    })
  }

  override def serialize(buffer: FreqBuffer): Array[Byte] = {
    val items = buffer.counts.toArray
    val bytes = items.map { case (k, _) => k.getBytes(StandardCharsets.UTF_8) }
    val bb = ByteBuffer.allocate(4 + bytes.map(_.length + 12).sum)
    bb.putInt(items.length)
    items.indices.foreach { i =>
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
      bb.putLong(items(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new FreqBuffer(capacity)
    val n = bb.getInt
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.counts.update(new String(b, StandardCharsets.UTF_8), bb.getLong)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0))
}

object FreqFunctions {
  import org.apache.spark.sql.graftglue.ColumnGlue

  def heavyHitters(item: Column, capacity: Int): Column =
    ColumnGlue.column(
      HeavyHitters(ColumnGlue.expr(item), capacity).toAggregateExpression())
}
