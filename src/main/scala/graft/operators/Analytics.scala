package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-based analytics: top-N per group and gap-based
  * sessionization over the event feed.
  */
object Analytics {

  /** Top-N rows per group ordered by `orderCol` descending, with a
    * deterministic tiebreak column. One shuffle on the group key; at
    * scale this benefits from pre-partitioned input on `groupCol`.
    */
  def topNPerGroup(df: DataFrame, groupCol: String, orderCol: String,
                   tieBreak: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(orderCol).desc, col(tieBreak).asc)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= n)
  }

  /** Bucketed range join: each point row joins every range row whose
    * `[lo, hi]` interval contains its `pointCol` value. Spark plans a
    * raw inequality join as BroadcastNestedLoopJoin — quadratic and
    * broadcast-bound; here each range explodes into the fixed-width
    * buckets it covers, points compute their single bucket, and the
    * join is an EQUI-join on the bucket id (shuffle-partitionable at
    * any scale) with exact containment as a post-filter.
    *
    * `bucketWidth` trades range fan-out (a range spanning s buckets
    * costs s index rows — keep width ≳ the typical range span)
    * against bucket selectivity (width ≫ spans puts many ranges in
    * one bucket and the post-filter does the pruning). Both sides
    * keep all their columns; name collisions must be resolved by the
    * caller beforehand.
    */
  def rangeJoin(points: DataFrame, pointCol: String,
                ranges: DataFrame, loCol: String, hiCol: String,
                bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(!points.columns.contains("_bucket") && !ranges.columns.contains("_bucket"),
      "rangeJoin uses _bucket internally; rename that column on the inputs")
    val expanded = ranges
      // an inverted range matches nothing — dropping it up front also
      // keeps sequence() from stepping DOWNWARD through ~lo/width
      // rows (its default when start > stop) for one malformed row
      .filter(col(loCol) <= col(hiCol))
      .withColumn("_bucket",
        explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
          floor(col(hiCol) / bucketWidth).cast("long"))))
    points
      .withColumn("_bucket", floor(col(pointCol) / bucketWidth).cast("long"))
      .join(expanded, "_bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bucket")
  }

  /** Semi-structured profiling: pull one integer field out of the
    * JSON `props` payload and aggregate it per event type — the
    * schema-on-read path for a feed whose properties column is opaque
    * JSON (the reference's raw feeds carry free-form per-row tags the
    * same way). `get_json_object` evaluates inside the scan stage, so
    * this is one scan + one partial-agg shuffle of tiny grouped rows;
    * fields absent from a payload aggregate as NULL (counted
    * separately), never as errors.
    */
  def jsonProfile(events: DataFrame, field: String): DataFrame = {
    val v = get_json_object(col("props"), "$." + field).cast("int")
    events
      .select(col("event_type"), v.as("v"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("v")).as("n_with_field"),
        sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
      .withColumn("avg_v",
        col("sum_v").cast("double") / col("n_with_field"))
  }

  /** Gap-based sessionization: a new session starts when the gap to
    * the previous event of the same user exceeds `gapSeconds`.
    * Two window passes over the same (user, time) ordering — Catalyst
    * plans them in a single sort+shuffle stage.
    */
  def sessionize(events: DataFrame, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapSeconds * 1000000L
    val flagged = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    flagged
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
  }
}
