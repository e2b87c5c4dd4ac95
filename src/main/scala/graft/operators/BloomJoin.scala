package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.BinaryType

/** Bloom-pre-filtered semi-join: the runtime-filter pattern as an
  * explicit operator.
  *
  * A semi-join whose "small" side is too wide to broadcast as a hash
  * relation still fits as a Bloom filter (8-16 bits per distinct key).
  * Building the filter is one aggregation job whose result is a few
  * MB on the driver; applying it is a scan-local predicate on the
  * large side, so only rows that MIGHT match ever reach the join
  * shuffle. The exact semi-join afterwards removes the false
  * positives, so the result is exactly `large ⋉ small` — the bloom
  * only changes how many rows pay the shuffle (at fpp=0.01, ~1% of
  * the non-matching feed instead of all of it).
  *
  * Spark's AQE injects this automatically in some shapes
  * (InjectRuntimeFilter); the explicit form covers the shapes it
  * does not (pre-computed filter reuse, filter-then-aggregate without
  * a join, cross-job pruning).
  */
object BloomJoin {

  /** Exact semi-join of `large` against `small`'s key set with a
    * bloom pre-filter on the large side. Keys must be integral
    * (hashed as longs on both build and probe sides). The small
    * side's key is renamed before the join so the condition stays
    * unambiguous when both sides use the same key name (the common
    * semi-join case).
    */
  def bloomSemiJoin(large: DataFrame, largeKey: String,
                    small: DataFrame, smallKey: String,
                    expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    large
      .filter(mightContain(buildBloom(small, smallKey, expectedItems, fpp),
        col(largeKey)))
      .join(small.select(col(smallKey).as("__bloom_probe_key")).distinct(),
        col(largeKey) === col("__bloom_probe_key"), "left_semi")
  }

  /** One aggregation job → serialized bloom over `key`'s longs. */
  def buildBloom(df: DataFrame, key: String, expectedItems: Long,
                 fpp: Double): Array[Byte] = {
    val bf = df.stat.bloomFilter(col(key).cast("long"), expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Scan-local bloom probe predicate (Spark's own runtime-filter
    * expression, codegen'd; the serialized filter ships once per task
    * like any literal).
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnGlue.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      ColumnGlue.expr(key.cast("long"))))
}
