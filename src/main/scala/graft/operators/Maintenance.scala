package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Warehouse-maintenance operators: cfg-table (dimension) extraction,
  * thinout (retention), idempotent delete+reload, error summarization.
  *
  * Reference semantics: HlxTools.py:534-573 (CfgTable scheduling),
  * HlxTools.py:610-655 (thinout rules per granularity suffix),
  * HlxTools.py:372-394 (delete by datetime before reload),
  * HlxTools.py:315-350 (DBL error-file parsing → per-table error list).
  */
object Maintenance {

  /** Cfg-table extraction: the distinct entity keys observed in the
    * feed. Partial-agg distinct → one small shuffle; at scale this is
    * the map-side-combined dimension harvest the reference schedules
    * as "CfgTable" tasks.
    */
  def cfgExtract(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("event_type")).distinct()

  /** Thinout: drop rows older than the retention cutoff. The filter is
    * a pure predicate on a stored column, so it reaches the parquet
    * scan (PushedFilters) and on a date-partitioned table becomes
    * partition pruning — no data read for expired partitions.
    */
  def thinout(df: DataFrame, tsCol: String, cutoff: org.apache.spark.sql.Column): DataFrame =
    df.filter(col(tsCol) >= cutoff)

  /** Idempotent delete+reload (the reference deletes target-table rows
    * for every DATETIME present in the incoming feed, then reloads).
    * Spark-first this is dynamic partition overwrite; expressed as a
    * plan: keep existing rows whose bucket is NOT in the incoming
    * bucket set (left_anti on the bucket key — broadcastable since the
    * distinct-bucket side is tiny), then union the incoming rows.
    */
  def deleteReload(existing: DataFrame, incoming: DataFrame, bucketCol: String): DataFrame = {
    val buckets = incoming.select(bucketCol).distinct()
    existing
      .join(broadcast(buckets), Seq(bucketCol), "left_anti")
      .unionByName(incoming)
  }

  /** Physical idempotent reload: write `incoming` into a
    * `partitionCol`-partitioned parquet table with dynamic partition
    * overwrite — only the partitions present in `incoming` are
    * replaced, the exact semantics of the reference's
    * delete-by-datetime-then-load (HlxTools.py:372-394) without a
    * delete pass. At 100 TB this touches only the reloaded
    * datetime partitions.
    */
  def overwritePartitions(incoming: DataFrame, path: String, partitionCol: String): Unit = {
    val spark = incoming.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try incoming.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
    finally prev.foreach(spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
  }

  /** Error summarization: group raw error events into (day, code)
    * buckets with counts — the Spark analogue of parsing DBL error
    * logs into a per-table error report.
    */
  def errorSummary(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") === "error")
      .select(
        to_date(col("ts")).as("day"),
        // from_json reuses one Jackson parser per partition;
        // get_json_object re-parses per row (~100µs/row at scale)
        (from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k") % 10).as("error_code"))
      .groupBy(col("day"), col("error_code"))
      .agg(count(lit(1)).as("n_errors"))
}
