package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resilient aggregation: salt the hot key space into
  * `saltBuckets` sub-keys, partially aggregate per (key, salt), then
  * finish per key. At 100 TB a single hot key (one pathological
  * user_id / event_type) otherwise pins its entire partition on one
  * task; salting spreads the partial work across `saltBuckets` tasks
  * while keeping the final shuffle tiny (one row per key per salt).
  *
  * AQE's skew-join splitting covers joins; this covers aggregations,
  * where AQE cannot split a single hash partition mid-group.
  */
object Skew {

  /** Salt assignment: round-robin within each input partition
    * (monotonically_increasing_id = partition id ⧺ row index, so
    * consecutive rows rotate through every bucket). Per-ROW-varying,
    * not per-VALUE: a hot key of billions of identical rows (constant
    * value, nulls) still spreads across all buckets, where a value
    * hash would collapse them into one. Deterministic for a fixed
    * input partitioning, and the final aggregate is salt-invariant
    * anyway (count + decimal sum are order-independent).
    */
  private[graft] def saltExpr(saltBuckets: Int) =
    pmod(monotonically_increasing_id(), lit(saltBuckets.toLong))

  /** Salted equi-join: the hot-key cure for a shuffle join AQE
    * cannot fix. AQE splits a skewed SORT-MERGE partition only when
    * the build side can be replayed; with one pathological key
    * (a null-ish default id, a bot user) the probe rows still meet
    * on one task. Salting rotates the large side's rows across
    * `saltBuckets` sub-keys (per-row, so even a single constant key
    * spreads) and replicates the small side once per salt — the join
    * becomes `saltBuckets` independent partitions per key at the
    * cost of a `saltBuckets`× small-side duplication, which is the
    * right trade exactly when `small` is dimension-sized but too
    * hot-keyed or too large to broadcast outright.
    *
    * The salt never reaches the output, so results equal the plain
    * equi-join row-for-row.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    large
      .withColumn("_salt", saltExpr(saltBuckets))
      .join(replicated, Seq(key, "_salt"))
      .drop("_salt")
  }

  /** count + decimal-exact sum of `valueCol` per `key`, salted. */
  def saltedAggregate(df: DataFrame, key: String, valueCol: String,
                      saltBuckets: Int): DataFrame =
    df
      .withColumn("_salt", saltExpr(saltBuckets))
      .groupBy(col(key), col("_salt"))
      .agg(
        count(lit(1)).as("_n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("_s"))
      .groupBy(col(key))
      .agg(
        sum(col("_n")).as("n_rows"),
        sum(col("_s")).cast("decimal(18,2)").cast("double").as("sum_value"))
}
