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

  /** count + decimal-exact sum of `valueCol` per `key`, salted.
    * Equivalent to `df.groupBy(key).agg(count, sum)` for any data;
    * the salt column derives from a stable row hash, not rand(), so
    * results are deterministic and re-runnable.
    */
  def saltedAggregate(df: DataFrame, key: String, valueCol: String,
                      saltBuckets: Int): DataFrame =
    df
      .withColumn("_salt", pmod(xxhash64(col(valueCol)), lit(saltBuckets)))
      .groupBy(col(key), col("_salt"))
      .agg(
        count(lit(1)).as("_n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("_s"))
      .groupBy(col(key))
      .agg(
        sum(col("_n")).as("n_rows"),
        sum(col("_s")).cast("decimal(18,2)").cast("double").as("sum_value"))
}
