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

  /** One aggregation job → serialized bloom over `key`'s longs.
    *
    * Not `df.stat.bloomFilter`, for two scale reasons found at the
    * 1000× probe: (1) on an EMPTY build side `bloom_filter_agg`
    * returns NULL (its zero-cardinality contract) and stat.bloomFilter
    * NPEs deserializing it — here an empty build side yields an empty
    * bloom, the correct filter (every probe misses, the exact join
    * confirms); (2) the runtime-filter numBits cap (64 Mbit default)
    * silently degrades fpp past ~5M keys — the caps are raised for
    * the build job so the requested fpp holds to ~10⁸ keys, bounded
    * at 2^30 bits (128 MB) so a billion-key build degrades gracefully
    * instead of OOMing the driver.
    */
  def buildBloom(df: DataFrame, key: String, expectedItems: Long,
                 fpp: Double): Array[Byte] = {
    val spark = df.sparkSession
    val items = math.max(1L, expectedItems)
    val bits = math.min(
      org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(items, fpp),
      1L << 30)
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    // The cap confs are session-global, so the raise/run/restore
    // window is serialized: two concurrent builds interleaving their
    // set/restore could strand the session on the wrong caps and
    // silently degrade a bloom's fpp. The lock covers the build job
    // itself — blooms are dimension-sized aggregations, so the
    // serialization cost is small next to the fact-side work they
    // prune. (Queries OUTSIDE buildBloom that race Spark's own
    // runtime-filter injection only ever see RAISED caps — never a
    // degraded-fpp direction.)
    confWindowLock.synchronized {
      val (oldItems, oldBits) = (spark.conf.get(itemsKey, "4000000"),
        spark.conf.get(bitsKey, "67108864"))
      spark.conf.set(itemsKey, math.max(items, oldItems.toLong).toString)
      spark.conf.set(bitsKey, math.max(bits, oldBits.toLong).toString)
      try {
        val agg = new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(ColumnGlue.expr(col(key).cast("long")),
            Literal(items), Literal(bits)).toAggregateExpression()
        val bytes = df.select(ColumnGlue.column(agg)).head().getAs[Array[Byte]](0)
        if (bytes != null) bytes
        else {
          val bf = org.apache.spark.util.sketch.BloomFilter.create(1L, fpp)
          val bos = new java.io.ByteArrayOutputStream()
          bf.writeTo(bos)
          bos.toByteArray
        }
      } finally {
        spark.conf.set(itemsKey, oldItems)
        spark.conf.set(bitsKey, oldBits)
      }
    }
  }

  private val confWindowLock = new Object

  /** Scan-local bloom probe predicate (Spark's own runtime-filter
    * expression, codegen'd; the serialized filter ships once per task
    * like any literal).
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnGlue.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      ColumnGlue.expr(key.cast("long"))))
}
