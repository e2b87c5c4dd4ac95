package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KPI computation over rolled-up counters.
  *
  * The reference's HLD distinguishes raw counters from KPIs —
  * formula columns computed from counters, excluded from load and
  * compare (Partrans.py:269-271 skips TYPE == 'KPI';
  * Key_Counters_Kpis sheet carries the formulas). Here KPIs are
  * declarative post-aggregation expressions: they compose onto any
  * rollup output inside the same projection (no extra pass), and at
  * 100 TB they cost nothing beyond the rollup itself.
  */
object Kpi {

  /** Per-(type, day) percentile bands — the p10/p50/p90 SLA band
    * chart a monitoring dashboard draws (B9's order statistics with
    * a day axis). Exact interpolated percentiles per group (B9
    * parity); one map-side-feeding sort per (type, day) group, and
    * at 100 TB the same `approx_percentile` swap as every exact
    * percentile row. Min/max ride along free.
    */
  def dailyBands(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("value")).as("min_value"),
        percentile(col("value"), lit(0.1)).as("p10"),
        percentile(col("value"), lit(0.5)).as("p50"),
        percentile(col("value"), lit(0.9)).as("p90"),
        max(col("value")).as("max_value"))

  /** Winsorized daily mean per (type, day): clip each value to the
    * type's global [pLo, pHi] percentile band, then average — the
    * robust daily KPI that a handful of fat-finger readings cannot
    * drag (plain mean moves arbitrarily; the winsorized one is
    * bounded by the band). Two passes by construction (the band is a
    * GLOBAL order statistic): pass 1 reduces to |types| rows of
    * exact percentiles (B9 parity — `approx_percentile` at 100 TB),
    * broadcast back onto pass 2, whose aggregate is map-side
    * combined. Sums travel as round-half-up cents (BIGINT, order-
    * independent); each mean is one double division at the end.
    */
  def winsorizedDailyMean(events: DataFrame, pLo: Double = 0.05,
                          pHi: Double = 0.95): DataFrame = {
    val bounds = events
      .groupBy(col("event_type"))
      .agg(percentile(col("value"), lit(pLo)).as("lo_bound"),
        percentile(col("value"), lit(pHi)).as("hi_bound"))
    events
      .join(broadcast(bounds), "event_type")
      .withColumn("clip",
        least(greatest(col("value"), col("lo_bound")), col("hi_bound")))
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100.0 + 0.5).cast("long")).as("raw_cents"),
        sum(floor(col("clip") * 100.0 + 0.5).cast("long")).as("win_cents"),
        min(col("lo_bound")).as("lo_bound"),
        max(col("hi_bound")).as("hi_bound"))
      .select(col("event_type"), col("day"), col("n_events"),
        (col("raw_cents").cast("double") / (col("n_events") * 100.0))
          .as("raw_avg"),
        (col("win_cents").cast("double") / (col("n_events") * 100.0))
          .as("winsorized_avg"),
        col("lo_bound"), col("hi_bound"))
  }

  /** Attach KPI columns to an aggregated frame. */
  def withKpis(agg: DataFrame, kpis: Seq[(String, Column)]): DataFrame =
    kpis.foldLeft(agg) { case (df, (name, expr)) => df.withColumn(name, expr) }

  /** Order-statistic KPIs: exact value percentiles per event type
    * (p50/p95/p99 — Spark's `percentile` and DuckDB's `quantile_cont`
    * interpolate bit-identically). Exact percentile sorts inside each
    * group; at 100 TB swap in `approx_percentile` (a mergeable sketch
    * that partial-aggregates map-side) and accept its documented
    * error bound — same output shape.
    */
  def valuePercentiles(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        percentile(col("value"), lit(0.5)).as("p50"),
        percentile(col("value"), lit(0.95)).as("p95"),
        percentile(col("value"), lit(0.99)).as("p99"),
        count(lit(1)).as("n_events"))

  /** The 100 TB percentile path: a mergeable quantile sketch that
    * partial-aggregates map-side (no per-group sort). `accuracy` is
    * the inverse rank-error bound (10000 ≈ 0.01% rank error).
    */
  def valuePercentilesApprox(events: DataFrame, accuracy: Int = 10000): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        approx_percentile(col("value"), lit(0.5), lit(accuracy)).as("p50"),
        approx_percentile(col("value"), lit(0.95), lit(accuracy)).as("p95"),
        approx_percentile(col("value"), lit(0.99), lit(accuracy)).as("p99"),
        count(lit(1)).as("n_events"))

  /** Daily ops KPIs over the event feed: per-day totals plus derived
    * rate/average KPIs (single-division doubles).
    */
  def dailyKpis(events: DataFrame): DataFrame = {
    val base = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
          .cast("double").as("sum_value"))
    withKpis(base, Seq(
      "avg_value" -> col("sum_value") / col("n_events"),
      "error_rate" -> col("n_errors").cast("double") / col("n_events")))
  }

  /** Busy hour per counter family — THE telecom PM dimensioning KPI:
    * the hour-of-day carrying the most traffic, with its share of the
    * family's total. One map-side-combined pass collapses the feed to
    * |types|×24 rows; the argmax is a deterministic (n desc, hr)
    * `row_number` over that dimension-sized table and the share is
    * the single division. Totals ride the same 24-row aggregate —
    * no second feed scan.
    */
  def busyHour(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perHr = events
      .groupBy(col("event_type"), hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("n").desc, col("hr").asc)
    val tot = Window.partitionBy(col("event_type"))
    perHr
      .withColumn("n_total", sum(col("n")).over(tot))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("hr").as("busy_hr"),
        col("n").as("n_busy"), col("n_total"),
        (col("n").cast("double") / col("n_total")).as("share"))
  }

  /** Day-of-week traffic profile per counter family (0 = Sunday, the
    * DuckDB/ISO dow convention): exact counts and each day's share of
    * the family total — the seasonality baseline every volume monitor
    * should subtract before alarming. One partial-agg pass to
    * |types|×7 rows; the share join is against a broadcast
    * types-sized total.
    */
  def dowProfile(events: DataFrame): DataFrame = {
    val perDow = events
      .groupBy(col("event_type"), (dayofweek(col("ts")) - 1).as("dow"))
      .agg(count(lit(1)).as("n"))
    val tot = perDow.groupBy(col("event_type")).agg(sum(col("n")).as("n_total"))
    perDow
      .join(broadcast(tot), "event_type")
      .withColumn("share", col("n").cast("double") / col("n_total"))
  }

  /** Two-threshold alarm state machine over daily per-type volumes —
    * the hysteresis monitor a PM counter stack raises tickets from
    * (alarm turns ON above `hiNum/den` × the type's average daily
    * volume, OFF below `loNum/den` ×, and HOLDS its last state in
    * the dead band, so a feed hovering at the threshold doesn't
    * flap). Threshold tests are integer cross-multiplications
    * (`count·n_days·den  vs  total·hiNum`) — no division anywhere —
    * and the state carry is ONE `last(ignoreNulls)` window per type
    * over the dimension-sized daily table (the feed collapses in the
    * first partial-agg pass), the same engine-replayable shape as the
    * DBL log parser's header carry. Days before any edge default to
    * 'off'.
    */
  def alarmHysteresis(events: DataFrame, hiNum: Long = 6, loNum: Long = 4,
                      den: Long = 5): DataFrame = {
    require(hiNum > loNum, "hysteresis needs hiNum > loNum")
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val tot = daily.groupBy(col("event_type"))
      .agg(sum(col("n_events")).as("total"), count(lit(1)).as("n_days"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .join(broadcast(tot), "event_type")
      .withColumn("edge",
        when(col("n_events") * col("n_days") * den > col("total") * hiNum, "on")
          .when(col("n_events") * col("n_days") * den < col("total") * loNum, "off"))
      .withColumn("alarm",
        coalesce(last(col("edge"), ignoreNulls = true).over(w), lit("off")))
      .select(col("event_type"), col("day"), col("n_events"), col("edge"),
        col("alarm"))
  }
}
