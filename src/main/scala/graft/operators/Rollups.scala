package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-granularity rollup cascade.
  *
  * Mirrors the reference's scheduled aggregation chain
  * (HlxTools.py:658-725 schedules TRAggr tasks per table suffix
  * 5M/15M/HH/HR/DY/WK/MO/YR). Re-expressed Spark-first:
  *
  *  - the finest rollup aggregates the raw feed once (map-side
  *    partial aggregation keeps the shuffle small);
  *  - every coarser granularity re-aggregates the next finer rollup,
  *    never the raw feed — at 100 TB the 5M output is ~raw/row-rate
  *    smaller and each cascade step shrinks input a further ~12x, so
  *    the daily rollup shuffles megabytes, not terabytes.
  *
  * Measures are carried as DECIMAL so re-aggregation is exact and
  * order-independent (sum of decimals is associative, unlike double).
  */
object Rollups {

  /** Epoch-second bucket floor, e.g. 300s for 5-minute buckets. */
  private def bucket(col: String, seconds: Int) =
    (floor(unix_timestamp(org.apache.spark.sql.functions.col(col)) / seconds) * seconds)
      .cast("long")

  /** events → `seconds`-wide buckets per event_type — the parametric
    * fine-grain rollup behind the reference's 5M/15M suffixes.
    */
  def perType(events: DataFrame, seconds: Int): DataFrame =
    events
      .groupBy(
        bucket("ts", seconds).as("bucket_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        // exact decimal sum; surfaced as double (identical nearest-double
        // conversion in every engine, no trailing-zero repr drift)
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
          .cast("double").as("sum_value"))

  /** events → 5-minute buckets per event_type. */
  def fiveMinute(events: DataFrame): DataFrame = perType(events, 300)

  /** events → 15-minute buckets per event_type (reference suffix 15M). */
  def fifteenMinute(events: DataFrame): DataFrame = perType(events, 900)

  /** Re-aggregate 5-minute partials (per-micro-batch deltas, partial
    * loads) into the final rollup. Decimal re-aggregation keeps the
    * merge exact and order-independent, so any partition of the raw
    * feed into deltas merges to the identical rollup.
    */
  def mergeFiveMinute(parts: DataFrame): DataFrame =
    parts
      .groupBy(col("bucket_start"), col("event_type"))
      .agg(
        sum(col("n_events")).as("n_events"),
        sum(col("sum_value").cast("decimal(18,2)")).cast("decimal(18,2)")
          .cast("double").as("sum_value"))

  /** Re-aggregate a finer epoch-bucket rollup into `seconds`-wide
    * buckets (cascade step; never re-scans raw — re-aggregates
    * through decimal so the step is exact).
    */
  def coarsen(finer: DataFrame, seconds: Int): DataFrame =
    finer
      .groupBy(
        (floor(col("bucket_start") / seconds) * seconds).cast("long").as("bucket_start"),
        col("event_type"))
      .agg(
        sum(col("n_events")).as("n_events"),
        sum(col("sum_value").cast("decimal(18,2)")).cast("decimal(18,2)")
          .cast("double").as("sum_value"))

  /** 5-minute rollup → hourly rollup (cascade; never re-scans raw). */
  def hourlyFromFiveMinute(fiveMin: DataFrame): DataFrame =
    coarsen(fiveMin, 3600)

  /** The reference's scheduled TRAggr suffix chain (HlxTools.py:
    * 658-725) as one cascade: every epoch granularity derives from
    * the 5-minute base by re-aggregation — the raw feed is scanned
    * exactly once no matter how many granularities are maintained.
    */
  def cascade(events: DataFrame): Map[String, DataFrame] = {
    val base = fiveMinute(events)
    Map(
      "5M" -> base,
      "15M" -> coarsen(base, 900),
      "HH" -> coarsen(base, 3600),
      "DY" -> coarsen(base, 86400))
  }

  /** Fine-grained rollup carrying a mergeable distinct-user SKETCH
    * next to the summable counters. Distinct counts are the one
    * aggregate a plain cascade cannot re-sum (daily distinct ≠ sum of
    * hourly distincts); the HLL registers make them cascade like sums
    * do — [[coarsenSketch]] rolls any stored granularity up by
    * register-max without ever re-scanning the raw feed. O(2^p)
    * state per bucket, partials combine map-side, deterministic
    * bytes (fixed hash + max-merge), so replays and merge order
    * never change the stored sketch.
    */
  def sketchPerType(events: DataFrame, seconds: Int, p: Int): DataFrame =
    events
      .groupBy(bucket("ts", seconds).as("bucket_start"), col("event_type"))
      .agg(
        graft.functions.HllFunctions.hllSketch(col("user_id"), p).as("users_hll"),
        count(lit(1)).as("n_events"))

  /** Cascade step for [[sketchPerType]] output: coarsen buckets,
    * register-max the sketches, re-sum the counters.
    */
  def coarsenSketch(finer: DataFrame, seconds: Int): DataFrame =
    finer
      .groupBy(
        (floor(col("bucket_start") / seconds) * seconds).cast("long").as("bucket_start"),
        col("event_type"))
      .agg(
        graft.functions.HllFunctions.hllMerge(col("users_hll")).as("users_hll"),
        sum(col("n_events")).as("n_events"))

  /** Fixed-width value-histogram sketch per (time bucket, type): the
    * quantile analog of [[sketchPerType]]'s HLL cascade. A histogram
    * is the simplest MERGEABLE quantile summary — counts roll up to
    * coarser granularities by plain addition (exactly, in any order),
    * so percentile estimates read off ANY granularity without
    * re-scanning the raw feed, the one thing a stored exact
    * percentile cannot do (quantiles don't re-aggregate). Estimate
    * error is bounded by the bucket width; state per (bucket, type)
    * is at most `nBuckets` rows. Values outside [lo, lo+width*n) are
    * edge-clamped (the monitor regime: a known value envelope).
    */
  def histSketchPerType(events: DataFrame, seconds: Int,
                        lo: Double, width: Double, nBuckets: Int): DataFrame =
    events
      .groupBy(bucket("ts", seconds).as("bucket_start"), col("event_type"),
        greatest(lit(0), least(lit(nBuckets - 1),
          floor((col("value") - lo) / width).cast("int"))).as("vbucket"))
      .agg(count(lit(1)).as("n"))

  /** Cascade step for [[histSketchPerType]] output: coarsen the time
    * bucket, add the per-value-bucket counts. Integer addition is
    * associative, so the cascaded histogram is bit-identical to one
    * built directly from raw at the coarse granularity.
    */
  def coarsenHist(finer: DataFrame, seconds: Int): DataFrame =
    finer
      .groupBy(
        (floor(col("bucket_start") / seconds) * seconds).cast("long").as("bucket_start"),
        col("event_type"), col("vbucket"))
      .agg(sum(col("n")).cast("long").as("n"))

  /** Interpolated quantile estimates from a histogram sketch: for
    * each group and probability p, the continuous rank r = (total-1)p
    * lands in exactly one value bucket (buckets partition [0, total)
    * by cumulative count), and the estimate spreads that bucket's
    * mass uniformly — `lo + width*(b + (r - cum_before)/n_b)`.
    * Integer counts + a fixed-order IEEE expression make the estimate
    * bit-reproducible across engines (no library quantile call). The
    * window input is the dimension-sized histogram (groups x
    * nBuckets), never the feed.
    */
  def histQuantiles(hist: DataFrame, groupCols: Seq[String],
                    lo: Double, width: Double, probs: Seq[Double]): DataFrame = {
    val keys = groupCols.map(col)
    val ordered = Window.partitionBy(keys: _*).orderBy(col("vbucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(keys: _*)
    val r = (col("total").cast("double") - 1.0) * col("p")
    hist
      .withColumn("cum", sum(col("n")).over(ordered))
      .withColumn("total", sum(col("n")).over(whole))
      .withColumn("p", explode(array(probs.map(lit): _*)))
      .filter((col("cum") - col("n")).cast("double") <= r &&
        r < col("cum").cast("double"))
      .select(keys ++ Seq(col("p"), col("total"),
        (lit(lo) + lit(width) * (col("vbucket").cast("double") +
          (r - (col("cum") - col("n")).cast("double")) / col("n").cast("double")))
          .as("est")): _*)
  }

  /** Calendar-aligned rollup at `unit` granularity ("week" = ISO
    * Monday start, "month") per event_type — the coarse end of the
    * reference's 5M..MO/YR suffix chain.
    */
  def calendarPerType(events: DataFrame, unit: String): DataFrame =
    events
      .groupBy(date_trunc(unit, col("ts")).cast("date").as("bucket"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
          .cast("double").as("sum_value"))

  /** Daily rollup per user (coarse granularity, calendar-aligned). */
  /** Cumulative-counter delta extraction with reset detection — the
    * PM-counter semantics underneath the reference's feeds: network
    * elements export ever-growing counters that drop to ~0 on
    * restart, and the usable measure is the per-interval DELTA, with
    * negative jumps classified as resets (the post-reset reading is
    * the delta — the counter restarted from zero). One lag window
    * per (type, user) entity ordered by (ts, event_id), readings in
    * round-half-up cents so every delta is BIGINT-exact; the daily
    * rollup partial-aggregates map-side. First reading per entity
    * has no delta and is excluded (n_samples still counts it).
    */
  def counterDeltas(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type"), col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("event_type"), col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .withColumn("prev_cents", lag(col("cents"), 1).over(w))
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_samples"),
        sum(when(col("prev_cents").isNull, 0L)
          .when(col("cents") >= col("prev_cents"),
            col("cents") - col("prev_cents"))
          .otherwise(col("cents"))).as("delta_cents"),
        sum(when(col("prev_cents").isNotNull &&
            col("cents") < col("prev_cents"), 1L)
          .otherwise(0L)).as("n_resets"))
  }

  /** Counter-type classifier: is a metric a CUMULATIVE counter
    * (monotone per entity, drops only on reset — roll it up with
    * [[counterDeltas]]) or a GAUGE (oscillates — average it)? The
    * HLD declares this by hand per counter; this infers it from the
    * feed: per (type, entity) lag deltas, and a type whose negative-
    * delta rate stays under `negNum/negDen` classifies cumulative.
    * The verdict is an integer cross-multiplication (no division
    * near the decision); the rate column is display-only. One
    * window + one map-side rollup to |types| rows.
    */
  def counterTypeReport(events: DataFrame, negNum: Long = 1L,
                        negDen: Long = 20L): DataFrame = {
    val w = Window.partitionBy(col("event_type"), col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("event_type"), col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .withColumn("prev", lag(col("cents"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_deltas"),
        sum(when(col("cents") < col("prev"), 1L).otherwise(0L)).as("n_neg"))
      .select(col("event_type"), col("n_deltas"), col("n_neg"),
        (col("n_neg").cast("double") / col("n_deltas")).as("neg_rate"),
        when(col("n_neg") * negDen <= col("n_deltas") * negNum,
          "cumulative").otherwise("gauge").as("kind"))
  }

  def dailyPerUser(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("day"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
          .cast("double").as("sum_value"),
        countDistinct(col("event_type")).as("n_types"))
}
