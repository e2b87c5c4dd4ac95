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

  /** Corpus profile over all grouping combinations at once: CUBE
    * (lang, source) yields per-lang, per-source, per-(lang, source),
    * and grand-total rows in ONE aggregation pass — the overview
    * table a dataset card or ingestion dashboard wants. Spark expands
    * the cube inside the aggregate (partial agg per grouping set);
    * no repeated scans, no union of four queries.
    */
  def corpusProfile(docs: DataFrame): DataFrame =
    docs
      .cube(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))

  /** Volume-anomaly detection on the event feed: flag (event_type,
    * day) cells whose event count deviates from that type's daily
    * median by more than `num`/`den` (e.g. 5/4 = ±25%) — the
    * monitoring pass a PM warehouse runs to catch feed outages and
    * error storms. The (event_type, day) grid is DENSIFIED to the
    * feed's full day span before the comparison, so a complete
    * outage day (zero events → no row in the raw daily aggregate)
    * surfaces as an n_events=0 anomaly instead of being invisible —
    * the most severe failure is exactly the one a sparse grid hides.
    * The median is robust to the outliers it hunts (a mean-based
    * z-score moves with them), and the comparison is written
    * cross-multiplied (`n*den > med*num`) so it stays in exact
    * integer×(integer-or-half) arithmetic — no division, no float
    * drift, engine-replayable.
    *
    * Scale: daily counts partial-aggregate map-side to types×days
    * rows; that tiny table is persisted (bounded by types×days, a
    * few KB even at 100 TB of feed) so the span/type-list/median
    * passes never rescan the feed. The grid cross-join is
    * types × span-days — trivially broadcastable.
    */
  def anomalousDays(events: DataFrame, num: Int = 5, den: Int = 4): DataFrame = {
    require(num > den && den > 0, "num/den must exceed 1")
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .persist()
    val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val dense = grid.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
    val med = dense.groupBy(col("event_type"))
      .agg(percentile(col("n_events"), lit(0.5)).as("median_n"))
    dense.join(broadcast(med), "event_type")
      .filter(col("n_events") * den > col("median_n") * num ||
        col("n_events") * num < col("median_n") * den)
      .select(col("event_type"), col("day"), col("n_events"), col("median_n"))
  }

  /** Funnel analysis: how many users progressed through `steps` IN
    * ORDER — step k counts only when it happens at or after the
    * user's earliest completion of step k-1 (the classic ordered
    * conversion funnel). Returns one row per funnel depth: `stage` =
    * number of ordered steps completed (0..|steps|), `n_users`.
    *
    * Each stage's earliest-qualifying time is a whole-partition
    * window min over (user); the k chained window projections all
    * share the user_id partitioning, so Catalyst plans ONE exchange
    * for the entire chain, and the final stage count is a tiny agg.
    * Never a per-step self-join (k joins, k shuffles) and never a
    * sequence-scan UDF.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col("user_id"))
    val staged = steps.zipWithIndex.foldLeft(events) { case (df, (step, i)) =>
      val qualifies = col("event_type") === step &&
        (if (i == 0) lit(true) else col(s"_t${i - 1}").isNotNull &&
          col("ts") >= col(s"_t${i - 1}"))
      df.withColumn(s"_t$i", min(when(qualifies, col("ts"))).over(w))
    }
    // fold ascending so the DEEPEST completed stage ends up as the
    // outermost when() branch
    val stage = steps.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"_t$i").isNotNull, i + 1).otherwise(acc)
    }
    staged
      .groupBy(col("user_id"))
      .agg(max(stage).as("stage"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Cohort retention: users grouped by their first-activity day
    * (the cohort), counted distinct per (cohort_day, day_offset) —
    * the standard retention triangle. The first-day window and the
    * cohort aggregation are exact integer/date arithmetic, and the
    * user-level window shares one exchange with nothing else; the
    * (cohort, offset) aggregation is dimension-sized output no matter
    * the feed size.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .withColumn("cohort_day", min(col("day")).over(w))
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
  }

  /** Daily traffic trend per event type: event counts with a
    * trailing `windowDays`-row moving sum/average and the
    * day-over-day delta — the smoothing a PM dashboard lays over the
    * daily rollup to separate drift from noise. The moving average is
    * an exact integer sum divided once (IEEE-identical across
    * engines); the delta stays in integers.
    *
    * Scale: the feed partial-aggregates map-side down to types×days
    * rows before any window runs, so the ordered windows (moving
    * frame + lag share one (event_type, day) sort) operate on a
    * dimension-sized table no matter the feed size — the window never
    * touches raw rows.
    */
  def dailyTrend(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "window must cover at least the current day")
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val ordered = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val frame = ordered.rowsBetween(-(windowDays - 1), 0)
    daily
      .withColumn("sum_w", sum(col("n_events")).over(frame))
      .withColumn("n_w", count(lit(1)).over(frame))
      .withColumn("avg_w", col("sum_w").cast("double") / col("n_w"))
      .withColumn("delta", col("n_events") - lag(col("n_events"), 1).over(ordered))
  }

  /** Share-of-total contribution: each event type's share of its
    * day's total value — the ratio-to-report view behind "what drove
    * today's traffic". Money math stays decimal through both
    * aggregations (exact, order-independent); the only float ops are
    * the final casts and one division. The totals side is
    * days-sized, so it broadcasts and the daily table never
    * re-shuffles.
    */
  def contribution(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(sum(col("value").cast("decimal(18,2)"))
        .cast("decimal(18,2)").as("v"))
    val totals = daily.groupBy(col("day"))
      .agg(sum(col("v")).cast("decimal(18,2)").as("day_total"))
    daily.join(broadcast(totals), "day")
      .select(col("day"), col("event_type"),
        col("v").cast("double").as("sum_value"),
        (col("v").cast("double") / col("day_total").cast("double")).as("share"))
  }

  /** Pareto / ABC classification of event types by total value:
    * cumulative share in descending-value order, classed A (head,
    * ≤ `aThr`), B (≤ `bThr`), C (tail) — the 80/20 triage a capacity
    * planner runs. The unpartitioned ordered window is safe HERE
    * because it runs on the post-aggregation table (one row per
    * type, dimension-sized at any feed scale); the cumulative sum
    * stays decimal-exact with a deterministic (value desc, type)
    * order.
    */
  def paretoClasses(events: DataFrame,
                    aThr: Double = 0.8, bThr: Double = 0.95): DataFrame = {
    require(aThr < bThr, "class A must end before class B")
    val typed = events.groupBy(col("event_type"))
      .agg(sum(col("value").cast("decimal(18,2)"))
        .cast("decimal(18,2)").as("v"))
    val total = typed.agg(sum(col("v")).cast("decimal(18,2)").as("total"))
    val w = Window.orderBy(col("v").desc, col("event_type"))
      .rowsBetween(Window.unboundedPreceding, 0)
    typed.crossJoin(broadcast(total))
      .withColumn("cum_v", sum(col("v")).over(w).cast("decimal(18,2)"))
      .select(col("event_type"), col("v").cast("double").as("sum_value"),
        (col("cum_v").cast("double") / col("total").cast("double")).as("cum_share"))
      .withColumn("abc_class",
        when(col("cum_share") <= aThr, "A")
          .when(col("cum_share") <= bThr, "B")
          .otherwise("C"))
  }

  /** Rolling active users: per day, the distinct users active that
    * day (DAU) and in the trailing `windowDays` window (WAU), plus
    * their ratio (stickiness) — the engagement triple every product
    * dashboard carries. Sliding DISTINCT counts don't compose from
    * daily partials, so each (user, day) activity row fans out to the
    * `windowDays` window-END days it keeps the user active for — a
    * bounded ×W in-map explode on the DEDUPED user-day table (tiny
    * next to the feed), then a plain distinct count per end day.
    *
    * Days with zero same-day activity but a live trailing window
    * (users active earlier in the window) still emit a row with
    * dau=0 / stickiness=0.0 — an engagement dashboard must show the
    * day activity collapsed, not skip it. The fan-out also extends
    * `windowDays-1` days past the last observed activity day; those
    * phantom end-days are clipped to the observed span.
    *
    * Scale: the feed collapses to distinct (user, day) in one
    * partial-agg pass; everything after runs on users×days rows.
    * The day-level dau table is persisted (bounded by #days) so the
    * span lookup never recomputes it. Never a per-day self-join of
    * the feed, never a window DISTINCT (which Spark would reject
    * anyway).
    */
  def rollingActiveUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "window must cover at least the day itself")
    val userDays = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val dau = userDays.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      .persist()
    val wau = userDays
      .select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), windowDays - 1)))
          .as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    val span = dau.agg(max(col("day")).as("d_max"))
    wau.join(dau, Seq("day"), "left")
      .crossJoin(broadcast(span))
      .filter(col("day") <= col("d_max"))
      .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"), col("wau"),
        (coalesce(col("dau"), lit(0L)).cast("double") / col("wau"))
          .as("stickiness"))
  }

  /** Event-type transition matrix: counts of consecutive
    * (previous → current) event-type pairs within each user's
    * timeline — the Markov view of user behaviour (what follows
    * what). Ordering ties on `ts` break by the unique `event_id`, so
    * the lag sequence is deterministic and engine-replayable.
    *
    * Scale: one exchange on user_id for the lag window (linear per
    * partition), then the pair counts partial-aggregate map-side to
    * a |types|² output. Never a self-join of the feed on adjacency.
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n_transitions"))
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

  /** Fixed-width value histogram per group: bucket index =
    * clamp(⌊(value − lo) / width⌋, 0, nBuckets−1), so out-of-range
    * values land in the edge buckets instead of disappearing. Pure
    * integer bucketing over one map-side-combined aggregation —
    * groups × nBuckets output rows from any feed size; the IEEE
    * subtract/divide/floor chain is identical across engines, so the
    * histogram grades exactly.
    */
  def histogram(df: DataFrame, valueCol: String, groupCol: String,
                lo: Double, width: Double, nBuckets: Int): DataFrame =
    df.select(col(groupCol),
        greatest(lit(0), least(lit(nBuckets - 1),
          floor((col(valueCol) - lo) / width).cast("int"))).as("bucket"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Distribution drift per event type between two calendar periods
    * (days 1..`splitDay` vs the rest of the month): total-variation
    * distance between the periods' fixed-width value histograms,
    * TV = Σ|c_a/n_a − c_b/n_b| / 2 — the fraction of probability
    * mass that moved, 0 = identical, 1 = disjoint. Monitoring
    * feeds for schema-invisible content drift is the standard use.
    *
    * Arithmetic design: each |·| term is the exact integer
    * |c_a·n_b − c_b·n_a| over the common denominator, so the whole
    * statistic is ONE integer sum and ONE double division — grades
    * bit-exact with no transcendentals (KL/PSI need ln, and ln
    * rounds differently across math libraries). Headroom contract
    * like pageRank's: n_a·n_b·2 must fit a long — at larger-than-
    * 3e9-row periods, pre-divide counts or widen to decimal.
    * Plan: histogram bucketing in the scan projection, one map-side-
    * combined (type, bucket) aggregation; everything after is
    * dimension-sized (types × buckets), joined back broadcast.
    */
  def histogramDrift(events: DataFrame, splitDay: Int,
                     lo: Double, width: Double, nBuckets: Int): DataFrame = {
    val buckets = events.select(col("event_type"),
        (dayofmonth(col("ts")) <= splitDay).as("in_a"),
        greatest(lit(0), least(lit(nBuckets - 1),
          floor((col("value") - lo) / width).cast("int"))).as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("c_a"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("c_b"))
    val totals = buckets.groupBy(col("event_type"))
      .agg(sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"))
    buckets.join(broadcast(totals), "event_type")
      .groupBy(col("event_type"))
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        sum(abs(col("c_a") * col("n_b") - col("c_b") * col("n_a"))).as("num"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        (col("num").cast("double") / (col("n_a") * col("n_b") * 2L)).as("tv_distance"))
  }

  /** Percentile stratification: each document's word count maps to
    * its corpus decile (0–9) against the nine exact interpolated
    * decile thresholds, then the report collapses to ten rows. The
    * thresholds are ONE aggregated row broadcast back over a second
    * scan ([[graft.text.TextOps.qualityFilter]]'s shape, an array of
    * nine instead of one); the in-row decile is `size(filter(thr, t
    * => v >= t))` — no per-row join, no global sort (`ntile` would
    * shuffle the corpus into one ordered window). At 100 TB swap the
    * exact percentile for approx_percentile, same shape.
    */
  def decileReport(docs: DataFrame): DataFrame = {
    val counted = docs.select(col("doc_id"),
      size(split(col("text"), " ")).as("n_words"))
    val thresholds = counted.agg(percentile(col("n_words"),
      array((1 to 9).map(i => lit(i / 10.0)): _*)).as("thr"))
    counted.crossJoin(broadcast(thresholds))
      .select(col("n_words"),
        size(filter(col("thr"), t => col("n_words") >= t)).as("decile"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_words")).as("min_words"),
        max(col("n_words")).as("max_words"))
  }

  /** Inter-arrival cadence stats per (event_type, day): the gaps
    * between consecutive events of a type within a day — min / max /
    * median / p95 in microseconds — the feed-cadence monitor behind
    * "is this source stalling or bursting" (the continuous-time
    * sibling of [[anomalousDays]]' volume check).
    *
    * The lag window partitions by (type, day), so no window ever
    * spans more than one day of one type — bounded, parallel, no
    * whole-feed sort (day-boundary gaps are deliberately not
    * measured). Exact interpolated percentiles match DuckDB's
    * quantile_cont bit-for-bit (the B9 parity); at 100 TB swap
    * `percentile` for `approx_percentile` and the plan shape is
    * unchanged.
    */
  def interArrivalStats(events: DataFrame): DataFrame = {
    val keyed = events.select(col("event_type"), to_date(col("ts")).as("day"),
      unix_micros(col("ts")).as("us"), col("event_id"))
    val w = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("us"), col("event_id"))
    keyed
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("event_type"), col("day"))
      .agg(
        count(lit(1)).as("n_gaps"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        percentile(col("gap_us"), lit(0.5)).as("median_gap_us"),
        percentile(col("gap_us"), lit(0.95)).as("p95_gap_us"))
  }

  /** Per-type volume trend slope: ordinary least squares of the daily
    * value total against the day index — "is this feed growing or
    * decaying, and how fast". Engine-exact regression: `regr_slope`
    * is float math and drifts across engines, so the moments are
    * BIGINT sums of integer points — value in round-half-up cents, x
    * centered on the global first day (centering keeps n*Sxy inside
    * 64 bits at any feed scale; uncentered epoch-days overflow) — and
    * the classic closed form (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) does
    * its two double casts and divisions LAST. Groups with one day
    * are dropped (undefined slope, zero denominator).
    */
  def trendSlope(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100.0 + 0.5).cast("long")).as("y"))
      .localCheckpoint() // span + moments both consume it: one feed scan
    val firstDay = daily.agg(min(col("day")).as("d0"))
    daily.crossJoin(broadcast(firstDay))
      .withColumn("x", datediff(col("day"), col("d0")).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"))
      .filter(col("n_days") >= 2)
      .select(col("event_type"), col("n_days"),
        ((col("n_days") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n_days") * col("sxx") - col("sx") * col("sx")).cast("double") /
          100.0).as("slope"))
  }

  /** K-anonymity risk report over a quasi-identifier combination:
    * group sizes of the quasi-id tuple, and what fraction of rows
    * sit in groups smaller than `k` (re-identifiable under the
    * standard model). One map-side-combined pass to the
    * combination-bounded group table, then a second tiny rollup to
    * ONE report row — the governance gate a dataset release runs.
    * All counts BIGINT; the two rates are single divisions.
    */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String],
                       k: Long): DataFrame = {
    val groups = df
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("gn"))
    groups
      .agg(
        sum(col("gn")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        sum(when(col("gn") === 1L, 1L).otherwise(0L)).as("n_singletons"),
        sum(when(col("gn") < k, col("gn")).otherwise(0L)).as("n_rows_below_k"),
        min(col("gn")).as("min_group"))
      .select(lit(k).as("k"), col("n_rows"), col("n_groups"),
        col("n_singletons"), col("n_rows_below_k"), col("min_group"),
        (col("n_rows_below_k").cast("double") / col("n_rows"))
          .as("at_risk_rate"))
  }

  /** Classical additive seasonal decomposition per type:
    * y = trend + seasonal + residual, with trend a centered 7-day
    * moving average (gap-safe RANGE frame on the integer day index;
    * only FULL windows emit, so the trend is always sum7/7 — one
    * division) and the day-of-week seasonal component kept rational
    * until the end: Σ(7·y − sum7) over the dow group is BIGINT, the
    * component is that single division by 7·|group| — so a
    * partition-order double sum never exists and the decomposition
    * replays bit-exactly. Windows and rollups consume the
    * dimension-sized daily table.
    */
  def seasonalDecompose(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // span + windows: one feed scan
    val firstDay = daily.agg(min(col("day")).as("d0"))
    val idx = daily.crossJoin(broadcast(firstDay))
      .withColumn("x", datediff(col("day"), col("d0")).cast("long"))
      .withColumn("dow", dayofweek(col("day")) - 1)
    val w = Window.partitionBy(col("event_type")).orderBy(col("x"))
      .rangeBetween(-3, 3)
    val full = idx
      .withColumn("sum7", sum(col("n")).over(w))
      .withColumn("cnt7", count(lit(1)).over(w))
      .filter(col("cnt7") === 7)
    val seasonal = full
      .groupBy(col("event_type"), col("dow"))
      .agg(sum(lit(7L) * col("n") - col("sum7")).as("num"),
        count(lit(1)).as("cnt"))
      .select(col("event_type"), col("dow"),
        (col("num").cast("double") / (lit(7.0) * col("cnt")))
          .as("seasonal"))
    full.join(broadcast(seasonal), Seq("event_type", "dow"))
      .select(col("event_type"), col("day"), col("n"),
        (col("sum7").cast("double") / 7.0).as("trend"),
        col("seasonal"),
        (col("n").cast("double") - col("sum7").cast("double") / 7.0
          - col("seasonal")).as("residual"))
  }

  /** Two-proportion A/B evaluation: conversion rate per variant, the
    * pooled two-proportion z statistic, and the |z| > 1.96 verdict.
    * All counts reduce map-side to ONE output row; the z
    * expression is a FIXED sequence of IEEE operations (each
    * division and the sqrt are correctly rounded), so the statistic
    * — and therefore the verdict — is bit-deterministic and
    * oracle-replayable. Variant assignment and the success predicate
    * are the caller's columns, so any experiment maps on.
    */
  def abTest(users: DataFrame): DataFrame = {
    // users: (variant: int 0/1, success: 1L/0L per user). ONE
    // conditional aggregation row, not a per-variant crossJoin — so
    // an experiment with an absent variant still surfaces as a row
    // with n=0 and NULL rate/z (visible degeneracy) instead of
    // silently vanishing, and the plan is a single map-side-combined
    // pass with no join at all.
    users
      .agg(
        coalesce(sum(when(col("variant") === 0, 1L).otherwise(0L)), lit(0L)).as("n_a"),
        coalesce(sum(when(col("variant") === 0, col("success")).otherwise(0L)), lit(0L)).as("conv_a"),
        coalesce(sum(when(col("variant") === 1, 1L).otherwise(0L)), lit(0L)).as("n_b"),
        coalesce(sum(when(col("variant") === 1, col("success")).otherwise(0L)), lit(0L)).as("conv_b"))
      .withColumn("p_a", col("conv_a").cast("double") / col("n_a"))
      .withColumn("p_b", col("conv_b").cast("double") / col("n_b"))
      .withColumn("p_pool",
        (col("conv_a") + col("conv_b")).cast("double") /
          (col("n_a") + col("n_b")).cast("double"))
      .withColumn("z",
        (col("p_a") - col("p_b")) /
          sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
            (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
      .withColumn("significant_95", abs(col("z")) > 1.96)
  }

  /** Herfindahl–Hirschman market concentration per group: Σ share²
    * of each member's activity — the antitrust-style concentration
    * index (1/n for perfectly even, 1.0 for a monopoly). Shares stay
    * rational until the end: Σ n_i² and N are BIGINT sums (one
    * map-side pass to the member dimension), hhi is the single
    * division Σn²/N² — so the index is bit-deterministic.
    */
  def hhiConcentration(df: DataFrame, groupCol: String,
                       memberCol: String): DataFrame =
    df.groupBy(col(groupCol), col(memberCol))
      .agg(count(lit(1)).as("n"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_members"),
        sum(col("n")).as("n_total"),
        sum(col("n") * col("n")).as("sum_sq"))
      .select(col(groupCol), col("n_members"), col("n_total"),
        (col("sum_sq").cast("double") /
          (col("n_total").cast("double") * col("n_total").cast("double")))
          .as("hhi"))

  /** Cohort retention half-life: the first day offset at which a
    * cohort's active-user count drops to half its day-0 size (or -1
    * if it never does inside the observed window) — the single
    * number a retention curve is usually summarized to. Integer
    * cross-multiplied compare (2·n ≤ base), earliest offset wins;
    * consumes the dimension-sized cohortRetention table.
    */
  def retentionHalfLife(events: DataFrame): DataFrame = {
    val ret = cohortRetention(events)
    val base = ret.filter(col("day_offset") === 0)
      .select(col("cohort_day"), col("n_users").as("cohort_size"))
    ret.join(broadcast(base), "cohort_day")
      .groupBy(col("cohort_day"))
      .agg(min(col("cohort_size")).as("cohort_size"),
        coalesce(
          min(when(col("day_offset") > 0 &&
            col("n_users") * 2 <= col("cohort_size"), col("day_offset"))),
          lit(-1L)).as("halflife_days"))
  }

  /** Interval-overlap pair mining between intervals sharing a key —
    * the large×large interval JOIN (E15's range join binds a point
    * to an interval; this binds intervals to intervals), planned the
    * scalable way: each interval explodes to its covered
    * `bucketDays`-wide grid cells (fan-out = span/bucketDays, the
    * knob), candidates equi-join on (key, cell) — never an
    * inequality nested loop — then exact overlap filters and a
    * distinct collapses multi-cell duplicates BEFORE measuring.
    * Integer day arithmetic throughout. Input `iv`: (key, id, s, e)
    * with s <= e and each (key, id) appearing ONCE (the `a_id <
    * b_id` self-pair filter and [[intervalOverlapStats]]'s identity
    * form agree only under unique ids — dedupe upstream otherwise);
    * output per key: overlapping pair count and total overlap days.
    */
  def intervalOverlapPairs(iv: DataFrame, bucketDays: Int): DataFrame = {
    val epoch = lit("1970-01-01").cast("date")
    val cells = iv.select(col("key"), col("id"), col("s"), col("e"),
      explode(sequence(
        floor(datediff(col("s"), epoch) / bucketDays).cast("long"),
        floor(datediff(col("e"), epoch) / bucketDays).cast("long"))).as("cell"))
    val l = cells.select(col("key"), col("cell"), col("id").as("a_id"),
      col("s").as("a_s"), col("e").as("a_e"))
    val r = cells.select(col("key"), col("cell"), col("id").as("b_id"),
      col("s").as("b_s"), col("e").as("b_e"))
    l.join(r, Seq("key", "cell"))
      .filter(col("a_id") < col("b_id"))
      .select(col("key"), col("a_id"), col("b_id"),
        col("a_s"), col("a_e"), col("b_s"), col("b_e"))
      .distinct()
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .withColumn("overlap_days",
        datediff(least(col("a_e"), col("b_e")),
          greatest(col("a_s"), col("b_s"))) + 1)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("overlap_days").cast("long")).as("total_overlap_days"))
  }

  /** The per-key overlap AGGREGATES of [[intervalOverlapPairs]]
    * WITHOUT materializing the quadratic pair set — the form to run
    * when only the report is wanted (at sf0.1 the same-nation pair
    * stream is tens of millions of rows; this is 20× faster there
    * and near-linear at any scale). Two classic identities:
    * n_pairs = C(n,2) − #{(i,j): e_i < s_j} — the non-overlapping
    * count falls out of ONE per-key sort of start/end events (ends
    * after starts at equal value keeps the strict inequality); and
    * Σ_pairs overlap_days = Σ_days C(active_d, 2), evaluated by a
    * BOUNDARY sweep: the active count only changes at a start or an
    * end+1 day, so between consecutive boundary days it is constant
    * and the run contributes `gap · C(active, 2)` in one row. Work
    * is O(intervals log intervals) per key — a multi-year interval
    * costs exactly two boundary events, never a per-day fan-out.
    * All BIGINT.
    *
    * Precondition (shared with [[intervalOverlapPairs]], which
    * excludes self-pairs via `a_id < b_id`): each (key, id) appears
    * ONCE. A duplicated id would count here as two distinct
    * intervals but self-pair-filter out of the pairs form — dedupe
    * ids upstream if the feed can repeat them.
    */
  def intervalOverlapStats(iv0: DataFrame): DataFrame = {
    // Pin the interval feed behind ONE keyed exchange: both union
    // branches then read the same shuffle output instead of
    // re-running the (often join-heavy) upstream per branch — the
    // former starts/ends + (+δ)/(−δ) shape evaluated it FOUR times
    // (guide §2.4: operations keyed the same way share one exchange).
    val width = iv0.sparkSession.sessionState.conf.numShufflePartitions
    val iv = iv0.repartition(width, col("key"))
    val epoch = lit("1970-01-01").cast("date")
    // ONE boundary sweep carries BOTH aggregates. ±1 deltas at s and
    // e+1, collapsed per (key, day); `active` after day-d deltas is
    // #{s ≤ d ≤ e}. Overlap-days: between consecutive boundary days
    // the count is constant, so a run contributes gap · C(active, 2);
    // every gap·a(a−1) term is even, so the summed total halves
    // exactly with an integral div — no double arithmetic anywhere.
    // Pair count, attributed to each pair's LATER start day d:
    // the n_start same-day starters pair with each other
    // (C(n_start, 2) — equal starts always overlap) and with every
    // earlier-started interval still active at d (active − n_start;
    // e' ≥ d ⟺ not disjoint, matching the former strict e < s'
    // event-order identity). The running sum and the next-boundary
    // lead share ONE sort; the final per-key rollup rides the
    // window's key partitioning (no further exchange).
    val wOrd = Window.partitionBy(col("key")).orderBy(col("d"))
    iv
      .select(col("key"), datediff(col("s"), epoch).cast("long").as("d"),
        lit(1L).as("delta"), lit(1L).as("n_start"))
      .unionByName(iv.select(col("key"),
        (datediff(col("e"), epoch) + 1).cast("long").as("d"),
        lit(-1L).as("delta"), lit(0L).as("n_start")))
      .groupBy(col("key"), col("d"))
      .agg(sum(col("delta")).as("delta"), sum(col("n_start")).as("n_start"))
      .withColumn("active",
        sum(col("delta")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("next_d", lead(col("d"), 1).over(wOrd))
      .groupBy(col("key"))
      .agg(
        sum(col("n_start") * (col("active") - col("n_start"))
          + expr("(n_start * (n_start - 1L)) div 2")).as("n_pairs"),
        sum(when(col("next_d").isNotNull,
          (col("next_d") - col("d")) * col("active") * (col("active") - 1L))
          .otherwise(0L)).as("_twice"))
      .filter(col("n_pairs") > 0)
      .select(col("key"), col("n_pairs"),
        expr("_twice div 2").as("total_overlap_days"))
  }

  /** Peak concurrency per key over an interval set: the maximum
    * number of simultaneously-active intervals and the FIRST day it
    * is reached — the capacity-planning twin of the overlap report.
    * ±1 deltas collapse per (key, day) BEFORE the running sum (so
    * same-day starts/ends cannot fabricate a transient peak), the
    * prefix sum runs over the dimension-sized event-day table, and
    * the argmax breaks ties to the earliest day. All integers.
    */
  def peakConcurrency(iv0: DataFrame): DataFrame = {
    // same feed pin as [[intervalOverlapStats]]: one keyed exchange,
    // read by both union branches, instead of re-running the upstream
    // join tree once per branch (guide §2.4)
    val iv = iv0.repartition(
      iv0.sparkSession.sessionState.conf.numShufflePartitions, col("key"))
    val deltas = iv.select(col("key"), col("s").as("d"), lit(1L).as("delta"))
      .unionByName(iv.select(col("key"),
        date_add(col("e"), 1).as("d"), lit(-1L).as("delta")))
      .groupBy(col("key"), col("d"))
      .agg(sum(col("delta")).as("delta"))
    val w = Window.partitionBy(col("key")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // peak as a whole-partition window max over the SAME key
    // partitioning (one exchange total) — the former broadcast
    // self-join re-evaluated the whole delta pipeline a second time
    // for the probe side (guide §2.4: two operations keyed the same
    // way share one exchange)
    val wAll = Window.partitionBy(col("key"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    deltas
      .withColumn("active", sum(col("delta")).over(w))
      .withColumn("peak_active", max(col("active")).over(wAll))
      .filter(col("active") === col("peak_active"))
      .groupBy(col("key"))
      .agg(min(col("peak_active")).as("peak_active"),
        min(col("d")).as("first_peak_day"))
  }

  /** Interval-union coverage per customer (gaps-and-islands with a
    * carry-max): each order spans [orderdate, last shipdate]; the
    * report is the union length of those possibly-overlapping spans —
    * how many distinct days the customer had something in flight,
    * which double-counts nothing no matter how orders nest. The
    * classic covered-time operator: intervals sort once per
    * customer, a running max-end (excluding the current row) flags
    * island starts, a running sum numbers the islands, and two
    * map-side-combined rollups finish. All date arithmetic is
    * integer days; every window consumes the order-dimension table,
    * never lineitem (which reduces to per-order ship ends first).
    */
  def intervalCoverage(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val iv = lineitem
      .groupBy(col("l_orderkey"))
      .agg(max(to_date(col("l_shipdate"))).as("e"))
      .join(orders.select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).as("s")),
        col("l_orderkey") === col("o_orderkey"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("s"), col("e"), col("o_orderkey"))
    iv
      .withColumn("pme",
        max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ni",
        when(col("pme").isNull || col("s") > col("pme"), 1L).otherwise(0L))
      .withColumn("island", sum(col("ni")).over(w))
      .groupBy(col("o_custkey"), col("island"))
      .agg(min(col("s")).as("is"), max(col("e")).as("ie"),
        count(lit(1)).as("n"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("n")).as("n_orders"),
        sum(datediff(col("ie"), col("is")) + 1).as("covered_days"))
  }

  /** Daily trending top-k actors with day-over-day rank movement —
    * the "trending" leaderboard (who is climbing?). The feed reduces
    * once to (day, user) counts (map-side combined); each day's
    * top-k rides the bounded-heap aggregate (count desc, user asc —
    * k rows per day per partition cross the shuffle, never the user
    * dimension), and yesterday's board joins back by a one-day date
    * shift on the days×k result (broadcast). `rank_change` is
    * positive for climbers, 0 for holds and new entrants (`is_new`
    * disambiguates) so every column stays non-null.
    */
  def trendingTopK(events: DataFrame, k: Int): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("day"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val top = daily
      .groupBy(col("day"))
      .agg(graft.functions.TopKFunctions.topK(
        col("n_events").cast("double"), col("user_id"), k).as("top"))
      .select(col("day"), posexplode(col("top")))
      .select(col("day"), col("col.tie").as("user_id"),
        (col("pos") + 1).cast("long").as("rnk"),
        col("col.score").cast("long").as("n_events"))
    val prev = top.select(date_add(col("day"), 1).as("day"),
      col("user_id"), col("rnk").as("prev_rnk"))
    top.join(broadcast(prev), Seq("day", "user_id"), "left")
      .select(col("day"), col("user_id"), col("rnk"), col("n_events"),
        coalesce(col("prev_rnk") - col("rnk"), lit(0L)).as("rank_change"),
        col("prev_rnk").isNull.as("is_new"))
  }

  /** Day-of-week-adjusted volume anomalies: B11 flags days against a
    * flat per-type median, which mis-fires on any feed with a weekly
    * rhythm (every Sunday looks like an outage). Here the baseline is
    * the per-(type, day-of-week) MEDIAN daily count and the threshold
    * is `kNum/kDen ×` the per-type MAD of residuals — the robust
    * seasonal screen. Integer-exact throughout: medians of integers
    * land on .0/.5, so doubling them (med2, and mad4 at residual
    * scale) restores BIGINT, and the flag test cross-multiplies
    * `2·|r2|·kDen > kNum·mad4` — no division anywhere near the
    * verdict. A degenerate MAD of 0 (constant weekly pattern) flags
    * every nonzero deviation, the standard MAD convention. All
    * windows/medians consume the dimension-sized daily table; the
    * two report divisions are display-only.
    */
  def dowAdjustedAnomalies(events: DataFrame, kNum: Long = 3L,
                           kDen: Long = 1L): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", dayofweek(col("day")) - 1)
      .localCheckpoint() // baseline + residuals: one feed scan
    val med = daily
      .groupBy(col("event_type"), col("dow"))
      .agg((percentile(col("n"), lit(0.5)) * 2.0).cast("long").as("med2"))
    val resid = daily
      .join(broadcast(med), Seq("event_type", "dow"))
      .withColumn("r2", lit(2L) * col("n") - col("med2"))
    val mad = resid
      .groupBy(col("event_type"))
      .agg((percentile(abs(col("r2")), lit(0.5)) * 2.0).cast("long").as("mad4"))
    resid
      .join(broadcast(mad), "event_type")
      .select(col("event_type"), col("day"), col("n").as("n_events"),
        (col("med2").cast("double") / 2.0).as("dow_median"),
        (abs(col("r2")).cast("double") / 2.0).as("deviation"),
        (lit(2L) * abs(col("r2")) * lit(kDen) > lit(kNum) * col("mad4"))
          .as("is_anomaly"))
  }

  /** Capacity forecast per type: in how many days does the fitted
    * OLS daily-volume line cross `factorNum/factorDen ×` today's peak
    * day? The planning question behind every trend chart, answered
    * without ever leaving integers: B15's BIGINT moments give the
    * line, the threshold test `fitted(x) ≥ T` is cross-multiplied
    * through the (positive) denominators to
    * `x ≥ (T·n·b_den − sy·b_den + b_num·sx) / (n·b_num)`, and the
    * ceiling division `(p + q − 1) div q` runs on positives only —
    * so the reported day count is bit-deterministic (floor-vs-
    * truncate division never sees a negative). Flat or falling
    * trends report −1 ("never" on this fit — a sentinel, not NULL,
    * so the column stays a non-null BIGINT). One feed scan to the
    * dimension-sized daily table. The crossing's cross-multiplied
    * terms (T·n·b_den, with b_den ≈ n⁴/12) leave BIGINT range long
    * before the inputs do — peak 1e6/day over ~3 years already
    * reaches ~2.6e20 — so the crossing arithmetic runs in
    * DECIMAL(38,0): exact integer math to 38 digits, same rounding
    * discipline, headroom to ~1e9-event days over a century.
    */
  def capacityForecast(events: DataFrame, factorNum: Long = 2L,
                       factorDen: Long = 1L): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .localCheckpoint() // span + moments both consume it: one feed scan
    val firstDay = daily.agg(min(col("day")).as("d0"))
    daily.crossJoin(broadcast(firstDay))
      .withColumn("x", datediff(col("day"), col("d0")).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        max(col("x")).as("last_x"),
        max(col("y")).as("peak_y"),
        sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"))
      .filter(col("n_days") >= 2)
      .withColumn("b_num", col("n_days") * col("sxy") - col("sx") * col("sy"))
      .withColumn("b_den", col("n_days") * col("sxx") - col("sx") * col("sx"))
      .withColumn("threshold", expr(s"(peak_y * $factorNum) div $factorDen"))
      // DECIMAL(38,0) for the cross-multiplication: T·n·b_den is
      // ~n⁴·T/12 and silently wraps BIGINT on realistic inputs;
      // decimal keeps it exact (scale-0 products/sums are integer
      // arithmetic) and `div` on decimals is the same floor-on-
      // positives integral divide
      .withColumn("p",
        col("threshold").cast("decimal(20,0)")
          * col("n_days").cast("decimal(20,0)")
          * col("b_den").cast("decimal(20,0)")
          - col("sy").cast("decimal(20,0)") * col("b_den").cast("decimal(20,0)")
          + col("b_num").cast("decimal(20,0)") * col("sx").cast("decimal(20,0)"))
      .withColumn("q",
        (col("n_days") * col("b_num")).cast("decimal(20,0)"))
      .withColumn("days_to_threshold",
        when(col("b_num") <= 0, lit(-1L))
          .when(col("p") <= 0, lit(0L))
          .otherwise(greatest(lit(0L),
            expr("CAST((p + q - 1) div q AS BIGINT)") - col("last_x"))))
      .select(col("event_type"), col("n_days"), col("peak_y"),
        col("threshold"),
        (col("b_num").cast("double") / col("b_den").cast("double"))
          .as("slope_per_day"),
        col("days_to_threshold"))
  }

  /** CUSUM-style change-point locator per type: the day where the
    * cumulative daily count deviates most from the uniform ramp —
    * where a level shift happened. The statistic is kept integer by
    * scaling through n (n*cum_k - k*total instead of cum_k - k*mean),
    * so the argmax is bit-deterministic; ties break to the earliest
    * day. Windows consume the dimension-sized daily table only.
    */
  def changePoint(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val ordered = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val whole = Window.partitionBy(col("event_type"))
    val scored = daily
      .withColumn("k", row_number().over(ordered).cast("long"))
      .withColumn("cum", sum(col("c")).over(ordered))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("total", sum(col("c")).over(whole))
      .withColumn("stat", col("n") * col("cum") - col("k") * col("total"))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(abs(col("stat")).desc, col("day"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day").as("cp_day"),
        col("stat").as("cusum_stat"), col("n").as("n_days"))
  }

  /** Time-weighted average value per (type, day): each observation
    * weighted by how long it was the latest one (lead-gap in µs, last
    * observation of the day excluded — its holding period is open).
    * The fair daily average for irregularly-sampled feeds, where the
    * arithmetic mean over-weights bursts. Integer-exact: cents x µs
    * products are bounded by max_value * day_length regardless of row
    * count, the sums are BIGINT, and the two divisions happen once at
    * the end. The lead window is bounded by one day of one type.
    */
  def twap(events: DataFrame): DataFrame = {
    val keyed = events.select(col("event_type"), to_date(col("ts")).as("day"),
      unix_micros(col("ts")).as("us"), col("event_id"),
      floor(col("value") * 100.0 + 0.5).cast("long").as("v_c"))
    val w = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("us"), col("event_id"))
    keyed
      .withColumn("dur_us", lead(col("us"), 1).over(w) - col("us"))
      .filter(col("dur_us").isNotNull)
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_holds"),
        sum(col("v_c") * col("dur_us")).as("vw"),
        sum(col("dur_us")).as("w"))
      .select(col("event_type"), col("day"), col("n_holds"),
        (col("vw").cast("double") / col("w").cast("double") / 100.0).as("twap"))
  }

  /** Concurrent-session sweep: how many sessions were active at once,
    * maxed per day — the capacity-planning number behind "size for
    * peak, bill for average". Classic +1/-1 boundary sweep with an
    * end-exclusive -1 at end+1µs, made scalable by TWO cumulative
    * levels: the intra-day running sum partitions by day (bounded
    * windows), and the cross-day carry is a cumulative total over the
    * dimension-sized per-day table (the Pareto precedent: an
    * unpartitioned window is safe on dimension-sized input). Peer
    * rows (same µs, same sign) share one cumulative value under the
    * default RANGE frame in Spark AND DuckDB, so the per-day max is
    * engine-deterministic without a full tiebreak.
    */
  def sessionConcurrency(sessions: DataFrame): DataFrame = {
    val pts = sessions
      .select(unix_micros(col("session_start")).as("us"), lit(1L).as("delta"))
      .unionByName(sessions
        .select((unix_micros(col("session_end")) + 1L).as("us"), lit(-1L).as("delta")))
      .withColumn("day", to_date(timestamp_micros(col("us"))))
      // the sweep and the carry both consume the boundary points;
      // materialize so the (windowed) session build runs once
      .localCheckpoint()
    val intra = Window.partitionBy(col("day")).orderBy(col("us"), col("delta"))
    val swept = pts.withColumn("run", sum(col("delta")).over(intra))
    val carry = pts.groupBy(col("day")).agg(sum(col("delta")).as("day_total"))
      .withColumn("carry",
        coalesce(sum(col("day_total")).over(
          Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("day"), col("carry"))
    swept.join(broadcast(carry), "day")
      .groupBy(col("day"))
      .agg(max(col("carry") + col("run")).as("max_active"),
        count(lit(1)).as("n_points"))
  }

  /** Calendar densification: the per-(type, day) daily counts with
    * every missing cell filled in as an explicit zero row, across the
    * feed's global [min day, max day] span. A silent day is the most
    * severe anomaly a feed can have, and it is exactly the day a
    * plain groupBy never emits — downstream monitors (medians,
    * deltas, ROWS-frame windows) only see outages if the grid is
    * dense.
    *
    * One partial-agg pass collapses the feed to the dimension-sized
    * daily table, which is then MATERIALIZED (localCheckpoint): the
    * span, the type list, and the fill join are three consumers, and
    * without materialization each one re-scans the raw feed (Catalyst
    * prunes each branch to different columns, so no exchange is
    * reusable — plan-audited). The grid is distinct types x a
    * broadcast one-row span; the fill join is dimension-sized on both
    * sides and never shuffles facts.
    */
  def densifyDaily(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .localCheckpoint()
    val span = daily.agg(min(col("day")).as("d_min"), max(col("day")).as("d_max"))
    val grid = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(sequence(col("d_min"), col("d_max"), expr("interval 1 day")))
          .as("day"))
    grid.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  /** Trailing calendar-window rolling sum over the SPARSE daily
    * table: a RANGE frame ordered by the integer day number covers
    * the last `windowDays` calendar days regardless of which of them
    * have rows — the correct trailing-week number when days can be
    * missing, where [[dailyTrend]]'s ROWS frame would silently reach
    * further back in time. The complement of [[densifyDaily]]: same
    * semantics, no grid materialized.
    *
    * The window input is the dimension-sized (type, day) aggregate,
    * never the feed; `days_present` exposes how much of the calendar
    * window had data, and the per-calendar-day average divides by the
    * fixed window length (one double division, engine-exact).
    */
  def rollingRangeSum(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "window must cover at least the current day")
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("day_num", datediff(col("day"), lit("1970-01-01").cast("date")))
    val frame = Window.partitionBy(col("event_type"))
      .orderBy(col("day_num"))
      .rangeBetween(-(windowDays - 1), 0)
    daily
      .withColumn("sum_w", sum(col("n_events")).over(frame))
      .withColumn("days_present", count(lit(1)).over(frame))
      .withColumn("avg_per_day",
        col("sum_w").cast("double") / lit(windowDays.toDouble))
      .drop("day_num")
  }

  /** Per-user feature extraction: one groupBy over the event feed
    * yields the behavioral feature vector a downstream model trains
    * on — activity volume, span, distinct active days, per-type
    * counts (conditional aggregation, not a pivot — the type set is
    * part of the feature contract and must not drift with the data),
    * and exact monetary totals (DECIMAL(18,2) sums: the raw values
    * carry two decimals, so decimal accumulation is exact and
    * order-independent, where a double sum would drift with partition
    * order). Purely partial-aggregatable: one shuffle of
    * |users| × a-few-counters, no window, no join — at 100 TB this is
    * the canonical map-side-combine aggregation.
    */
  def userFeatures(events: DataFrame): DataFrame = {
    def typeCount(t: String) =
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t")
    events
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(to_date(col("ts"))).as("n_active_days"),
        min(to_date(col("ts"))).as("first_day"),
        max(to_date(col("ts"))).as("last_day"),
        typeCount("click"), typeCount("view"), typeCount("purchase"),
        typeCount("signup"), typeCount("error"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
          .cast("double").as("total_value"),
        sum(when(col("event_type") === "purchase",
            col("value").cast("decimal(18,2)"))).cast("decimal(18,2)")
          .cast("double").as("purchase_value"))
      .withColumn("days_span",
        datediff(col("last_day"), col("first_day")) + 1)
  }

  /** Recency-weighted engagement score with BIT-EXACT dyadic decay:
    * an event `d` days before the corpus's last day weighs
    * 2^(H - d/halfLifeDays grows) — concretely, weight =
    * 2^(H - floor(d / halfLifeDays)) as a BIGINT (H = 40 covers any
    * horizon the retention window keeps). Summing integer
    * count × weight is exact and order-independent — the usual
    * exp(-λ·d) double sum is neither (transcendental + partition
    * order), which is why engines disagree on it. The single
    * division by 2^H at the end converts to the conventional
    * [0, score] double scale losslessly (dyadic rationals are exact
    * in binary floating point). Two partial-agg passes: per
    * (user, day) counts, then the weighted rollup; the anchor day is
    * a one-row broadcast.
    */
  def decayScore(events: DataFrame, halfLifeDays: Int): DataFrame = {
    val H = 40
    val daily = events.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val anchor = daily.agg(max(col("day")).as("anchor_day"))
    daily.crossJoin(broadcast(anchor))
      .withColumn("halvings",
        least(floor(datediff(col("anchor_day"), col("day")) / lit(halfLifeDays))
          .cast("long"), lit(H.toLong)))
      // shiftleft's Scala binding takes a literal shift only; the SQL
      // form accepts a column (same ShiftLeft expression underneath)
      .withColumn("weight", expr(s"shiftleft(1L, cast($H - halvings as int))"))
      .groupBy(col("user_id"))
      .agg(sum(col("n_events") * col("weight")).as("score_scaled"))
      .withColumn("decay_score",
        col("score_scaled").cast("double") / lit(math.pow(2.0, H)))
  }

  /** Robust outlier days via median absolute deviation: a volume
    * monitor that, unlike the mean/stddev z-score (B11), does not let
    * the outliers it hunts inflate their own threshold — median and
    * MAD have a 50% breakdown point, so one broken week can't mask
    * itself. Exact interpolated percentiles stay engine-identical
    * here because the inputs are integer counts (midpoints are .5 —
    * dyadic, exact in doubles); flagging uses strict `>` so the
    * boundary is unambiguous. Shape: the feed collapses to the
    * dimension-sized (type, day) table in ONE partial-agg pass, and
    * everything after — two percentile aggs, two broadcast
    * join-backs — runs on that table; at 100 TB swap in
    * approx_percentile, same shape (B9 parity).
    */
  def madOutliers(events: DataFrame, k: Int = 3): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val med = daily.groupBy(col("event_type"))
      .agg(percentile(col("n_events"), lit(0.5)).as("med"))
    val dev = daily.join(broadcast(med), "event_type")
      .withColumn("abs_dev", abs(col("n_events") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(percentile(col("abs_dev"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), "event_type")
      .withColumn("is_outlier", col("abs_dev") > lit(k) * col("mad"))
      .select(col("event_type"), col("day"), col("n_events"),
        col("med"), col("abs_dev"), col("mad"), col("is_outlier"))
  }

  /** Period-over-period change report: weekly totals per type with
    * the previous period's total, absolute delta, and relative change
    * (one double division; null on the first period). The lag window
    * runs over the already-aggregated weekly table — dimension-sized
    * (types × weeks) from any feed size, so the unbounded ORDER BY
    * inside each type partition is safe at 100 TB.
    */
  def periodChange(events: DataFrame): DataFrame = {
    val weekly = events
      .groupBy(col("event_type"),
        date_trunc("week", col("ts")).cast("date").as("week_start"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("week_start"))
    weekly
      .withColumn("prev_n", lag(col("n_events"), 1).over(w))
      .withColumn("delta", col("n_events") - col("prev_n"))
      .withColumn("pct_change", col("delta").cast("double") / col("prev_n"))
  }

  /** Top event-type paths (behavioral trigrams): each user's event
    * sequence in (ts, event_id) order — the unique id makes the
    * order total, so both engines see the same sequence — yields one
    * path per sliding 3-window via two `lead`s over ONE user_id
    * exchange (never k self-joins), then a map-side-combined count
    * per path (|types|³-bounded key space) and a deterministic
    * (n desc, path) top-N cut through TakeOrderedAndProject. The
    * Sankey/user-journey feed at any scale.
    */
  def eventPaths(events: DataFrame, topN: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(topN)
  }

  /** Data-gap report (gaps-and-islands): for each event type, every
    * maximal run of days with NO data — start, end, and length —
    * from one `lag` over the dimension-sized distinct (type, day)
    * table (the feed collapses in the first partial-agg pass; the
    * per-type window sorts days, not events). The complement of
    * densifyDaily: instead of zero-filling silent days it names the
    * outage intervals, which is what a feed-monitoring ticket wants.
    */
  def dataGaps(events: DataFrame): DataFrame = {
    val days = events
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .distinct()
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    days
      .withColumn("prev_day", lag(col("day"), 1).over(w))
      .filter(datediff(col("day"), col("prev_day")) > 1)
      .select(col("event_type"),
        date_add(col("prev_day"), 1).as("gap_start"),
        date_sub(col("day"), 1).as("gap_end"),
        (datediff(col("day"), col("prev_day")) - 1).as("gap_days"))
  }

  /** Time-to-convert: for every user whose first `from` event is
    * followed (at or after it) by a `to` event, the µs delay between
    * the first `from` and the first such `to` — then one summary row
    * with exact count/min/max and interpolated p50/p90 (B9 parity:
    * Spark `percentile` and DuckDB `quantile_cont` interpolate
    * bit-identically over BIGINT µs). The first-`from` anchor is a
    * conditional `min` window over the SAME user_id partitioning the
    * follow-up aggregation groups on — one exchange end-to-end, never
    * an events×events self-join; the final summary collapses the
    * per-user table (one row per converted user) in a second
    * partial-agg pass. At 100 TB swap the exact percentiles for
    * `approx_percentile`, same shape.
    */
  def timeToConvert(events: DataFrame, from: String, to: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val conv = events
      .withColumn("t_from",
        min(when(col("event_type") === from, col("ts"))).over(w))
      .filter(col("event_type") === to && col("ts") >= col("t_from"))
      .groupBy(col("user_id"), col("t_from"))
      .agg(min(col("ts")).as("t_to"))
      .select((unix_micros(col("t_to")) - unix_micros(col("t_from")))
        .as("delta_us"))
    conv.agg(
      count(lit(1)).as("n_users"),
      min(col("delta_us")).as("min_us"),
      max(col("delta_us")).as("max_us"),
      percentile(col("delta_us"), lit(0.5)).as("p50_us"),
      percentile(col("delta_us"), lit(0.9)).as("p90_us"))
  }

  /** Adoption curve: per-day NEW users (first-seen day) and the
    * running total — the growth report. The feed collapses twice
    * (user → first day, day → new-user count) before the one
    * unpartitioned cumulative window, which consumes the days-sized
    * table (the pareto discipline: a global window is safe only
    * because its input is dimension-sized).
    */
  def adoptionCurve(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("cum_users", sum(col("new_users")).over(w))
  }

  /** RFM customer segmentation: recency (latest order date),
    * frequency (order count), monetary (DECIMAL(18,2)-exact spend —
    * order-independent where a double sum drifts), each cut into
    * `nTiles` equal-count tiers by an `ntile` window under a TOTAL
    * (metric, custkey) order, so tier edges are engine-deterministic
    * (tier 1 = best: most recent / most orders / highest spend). The
    * fact feed collapses to one row per customer in the first
    * partial-aggregated pass, so the three windows consume the
    * customer-dimension table, not the feed. They are unpartitioned —
    * exact ntile IS a global sort — which holds to ~10⁸ customers; at
    * open scale swap the cut points to `approx_percentile` thresholds
    * broadcast back over the same aggregate (bucket-by-comparison,
    * no global window), keeping this exact form as the oracle shape.
    */
  def rfmSegments(orders: DataFrame, nTiles: Int = 5): DataFrame = {
    val per = orders
      .groupBy(col("o_custkey").as("custkey"))
      .agg(
        max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("monetary_d"))
    def tier(order: Seq[org.apache.spark.sql.Column]) =
      ntile(nTiles).over(Window.orderBy(order: _*))
    per
      .withColumn("r_tier", tier(Seq(col("last_order").desc, col("custkey").asc)))
      .withColumn("f_tier", tier(Seq(col("frequency").desc, col("custkey").asc)))
      .withColumn("m_tier", tier(Seq(col("monetary_d").desc, col("custkey").asc)))
      .withColumn("segment",
        concat(col("r_tier"), col("f_tier"), col("m_tier")))
      .select(col("custkey"), col("last_order"), col("frequency"),
        col("monetary_d").cast("double").as("monetary"),
        col("r_tier"), col("f_tier"), col("m_tier"), col("segment"))
  }

  /** Market-basket association rules: for every item pair co-occurring
    * in at least `minSupport` baskets, the support counts plus
    * `confidence = c_ab/c_a` and `lift = n·c_ab/(c_a·c_b)` (exact
    * BIGINT terms, one IEEE division each). The pair table comes from
    * ONE fact scan — per-basket sorted distinct item set (bounded by
    * basket width) expanded in-map by the native PairCombos kernel —
    * never the items×items self-join on the basket key, which
    * shuffles the feed twice and explodes before aggregating (the
    * coSupplierEdges discipline). Item totals are dimension-sized and
    * broadcast back onto the surviving pairs; the basket count rides
    * a one-row broadcast anchor. At 100 TB the only guard needed is a
    * basket-width cap before expansion (quadratic in the single
    * widest basket, like every pair miner).
    */
  def basketLift(lineitem: DataFrame, minSupport: Long): DataFrame = {
    // ONE fact exchange: collect_set dedups (basket, item) in-map, so
    // the per-basket item sets need no upstream distinct — and the
    // basket count and item supports both derive from the SAME
    // aggregated sets (ReuseExchange: three consumers of one shuffle)
    // instead of each paying its own pass over the distinct pairs
    // (guide §2.3/§2.4; before: a distinct exchange + count_distinct
    // + groupBy(item) + groupBy(basket), four fact-sized exchanges)
    val sets = lineitem
      .select(col("l_orderkey").as("basket"),
        col("l_partkey").cast("long").as("item"))
      .groupBy(col("basket"))
      .agg(sort_array(collect_set(col("item"))).as("its"))
    val nBaskets = sets.agg(count(lit(1)).as("n_baskets"))
    val itemCnt = sets.select(explode(col("its")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("c"))
    sets
      .select(explode(
        graft.functions.TextHashFunctions.pairCombos(col("its"))).as("p"))
      .groupBy(col("p.a").as("item_a"), col("p.b").as("item_b"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minSupport)
      .join(broadcast(itemCnt.withColumnRenamed("c", "c_a")),
        col("item_a") === col("item"))
      .drop("item")
      .join(broadcast(itemCnt.withColumnRenamed("c", "c_b")),
        col("item_b") === col("item"))
      .drop("item")
      .crossJoin(broadcast(nBaskets))
      .withColumn("confidence", col("c_ab").cast("double") / col("c_a"))
      .withColumn("lift",
        (col("n_baskets") * col("c_ab")).cast("double")
          / (col("c_a") * col("c_b")))
      .select(col("item_a"), col("item_b"), col("c_ab"), col("c_a"),
        col("c_b"), col("n_baskets"), col("confidence"), col("lift"))
  }

  /** New-vs-returning activity split per day: each day's event and
    * user counts divided by whether the actor is on their first-seen
    * day — the acquisition-vs-retention lens on raw volume
    * ([[adoptionCurve]] counts only the new; this shows both sides).
    * One conditional-`min` window over user_id tags every event
    * in-row; the day rollup is map-side combined with conditional
    * distinct-user counts. Two exchanges total (user tag, day
    * rollup) — the minimum, since the two keys differ.
    */
  def newVsReturning(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    // collapse to (user, day) FIRST: the user-day aggregate rides the
    // window's user_id partitioning (a hash layout on a key subset
    // satisfies the grouping), and the day rollup then needs no
    // distinct — two conditional count_distincts here would instead
    // Expand the feed 3× and add a dedup exchange (audit-caught)
    val perUserDay = events
      .withColumn("first_day", min(to_date(col("ts"))).over(w))
      .groupBy(col("user_id"), to_date(col("ts")).as("day"),
        (to_date(col("ts")) === col("first_day")).as("is_new"))
      .agg(count(lit(1)).as("n"))
    perUserDay
      .groupBy(col("day"))
      .agg(
        sum(when(col("is_new"), col("n")).otherwise(0L)).as("new_events"),
        sum(when(!col("is_new"), col("n")).otherwise(0L))
          .as("returning_events"),
        sum(when(col("is_new"), 1L).otherwise(0L)).as("new_users"),
        sum(when(!col("is_new"), 1L).otherwise(0L)).as("returning_users"))
  }

  /** Time-bounded conversion funnel: [[funnel]] with a per-step
    * horizon — step k only counts within `horizonSeconds` of step
    * k−1's completion, the product-analytics form ("purchased within
    * 24 h of clicking"), which unbounded funnels overstate. Same
    * one-exchange plan: every stage's conditional-min window shares
    * the user_id partitioning, the horizon is one extra in-row
    * predicate on each qualifier, and the per-user fold plus both
    * rollups ride the same exchange.
    */
  def funnelWindowed(events: DataFrame, steps: Seq[String],
                     horizonSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col("user_id"))
    val staged = steps.zipWithIndex.foldLeft(events) { case (df, (step, i)) =>
      val qualifies = col("event_type") === step &&
        (if (i == 0) lit(true) else col(s"_t${i - 1}").isNotNull &&
          col("ts") >= col(s"_t${i - 1}") &&
          unix_micros(col("ts")) <=
            unix_micros(col(s"_t${i - 1}")) + horizonSeconds * 1000000L)
      df.withColumn(s"_t$i", min(when(qualifies, col("ts"))).over(w))
    }
    val stage = steps.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"_t$i").isNotNull, i + 1).otherwise(acc)
    }
    staged
      .groupBy(col("user_id"))
      .agg(max(stage).as("stage"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Theil–Sen robust trend slope per event type: the MEDIAN of all
    * pairwise (Δcount/Δday) slopes over the daily-volume series —
    * up to ~29% contaminated days (outages, error storms) cannot
    * move it, where B15's OLS slope chases every outlier. The feed
    * collapses to the \|types\|×\|days\| daily table first
    * (map-side-combined), so the pairwise self-join is
    * dimension-sized and broadcast — O(\|days\|²) pairs per type is
    * ~400 rows on a month, invariant in the feed size. Slopes are
    * one division each and the median interpolates B9-parity, so
    * the statistic grades bit-exact.
    */
  def theilSenSlope(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val a = daily.select(col("event_type"), col("day").as("d1"), col("n").as("n1"))
    val b = daily.select(col("event_type"), col("day").as("d2"), col("n").as("n2"))
    a.join(broadcast(b), Seq("event_type"))
      .filter(col("d1") < col("d2"))
      .select(col("event_type"),
        ((col("n2") - col("n1")).cast("double") /
          datediff(col("d2"), col("d1"))).as("slope"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_pairs"),
        percentile(col("slope"), lit(0.5)).as("sen_slope"))
  }

  /** Activity-concentration report: the exact Gini coefficient of
    * per-user event counts per type — "is the feed a broad base or
    * five whales?", the fairness/abuse screen next to [[burstDetect]].
    * Gini = (2·Σᵢ i·xᵢ)/(n·Σx) − (n+1)/n over counts sorted
    * ascending: every term is an exact BIGINT sum (the rank-weighted
    * sum rides ONE window over the per-user aggregate, partitioned
    * by type so no global sort), and the final expression is two
    * divisions — bit-exact across engines. The feed collapses to
    * users-per-type first; only that dimension-sized table sorts.
    */
  def giniConcentration(events: DataFrame): DataFrame = {
    val per = events
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("x"), col("user_id"))
    per
      .withColumn("i", row_number().over(w))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("x")).as("n_events"),
        sum(col("i") * col("x")).as("iwx"))
      .select(col("event_type"), col("n_users"), col("n_events"),
        ((lit(2.0) * col("iwx")) / (col("n_users") * col("n_events")) -
          (col("n_users") + 1L).cast("double") / col("n_users")).as("gini"))
  }

  /** Spend-tier mobility matrix: each purchasing user's value
    * quintile in period A vs period B, as transition counts — the
    * customer-value migration report ("are my top-tier users
    * staying top-tier?"). The feed collapses to one row per user
    * in a partial-agg pass with BOTH period sums as conditional
    * aggregates (one scan, never two); sums go through
    * DECIMAL(18,6) so tier edges are order-independent where a
    * double sum drifts; the two `ntile` windows consume the
    * user-dimension table under TOTAL (value desc, user) orders
    * (RFM's discipline — exact ntile IS a global sort, swap to
    * broadcast `approx_percentile` cut points at open user counts);
    * the matrix rollup is map-side combined over an nTiles² key
    * space. Tier 1 = highest value.
    */
  def decileTransition(events: DataFrame, splitTs: String,
                       nTiles: Int = 5): DataFrame = {
    val split = to_timestamp(lit(splitTs))
    val per = events
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("ts") < split, col("value").cast("decimal(18,6)")))
          .as("va"),
        sum(when(col("ts") >= split, col("value").cast("decimal(18,6)")))
          .as("vb"))
      .filter(col("va").isNotNull && col("vb").isNotNull)
    per
      .withColumn("tier_a", ntile(nTiles).over(
        Window.orderBy(col("va").desc, col("user_id"))))
      .withColumn("tier_b", ntile(nTiles).over(
        Window.orderBy(col("vb").desc, col("user_id"))))
      .groupBy(col("tier_a"), col("tier_b"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** 2-D skyline (Pareto frontier): the parts no other part beats on
    * BOTH price (lower better) and size (bigger better) — classic
    * multi-criteria shortlisting. The naive dominance test is a
    * non-equi self-join (nested-loop at scale); the 2-D structure
    * collapses it to sorting: keep a (price, size) point iff its
    * size equals its price-group's max AND strictly exceeds every
    * cheaper price-group's max. The per-price max is one map-side-
    * combined agg; the running max is a window over the DISTINCT
    * price table (dimension-sized — the pareto discipline); winners
    * broadcast back onto the scan, so duplicates of a frontier
    * point all survive (equal points don't dominate each other).
    */
  def skyline(part: DataFrame): DataFrame = {
    val perPrice = part
      .groupBy(col("p_retailprice").as("price"))
      .agg(max(col("p_size")).as("msize"))
    val w = Window.orderBy(col("price"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perPrice
      .withColumn("best", max(col("msize")).over(w))
      .filter(col("best").isNull || col("msize") > col("best"))
      .select(col("price"), col("msize"))
    part.join(broadcast(frontier),
        col("p_retailprice") === col("price") && col("p_size") === col("msize"))
      .select(col("p_partkey"), col("p_name"),
        col("p_retailprice"), col("p_size"))
  }

  /** Open-order backlog curve: for every day on which anything
    * happened, the number of orders placed but not yet fully shipped
    * — the operational WIP series. Sweep-line shape ([[
    * sessionConcurrency]]'s discipline on warehouse data): each order
    * contributes +1 at its order date and −1 at its LAST ship date
    * (the fact×fact orderkey join is co-keyed and collapses lineitem
    * in a partial-agg pass), deltas net per day map-side, and ONE
    * running sum over the days-sized net table builds the curve.
    */
  def orderBacklog(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val fulfilled = lineitem
      .groupBy(col("l_orderkey"))
      .agg(max(to_date(col("l_shipdate"))).as("done_day"))
    val deltas = orders
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("day"))
      .join(fulfilled, col("o_orderkey") === col("l_orderkey"), "left")
      .select(explode(array(
        struct(col("day"), lit(1L).as("delta")),
        struct(col("done_day").as("day"), lit(-1L).as("delta")))).as("d"))
      .select(col("d.day"), col("d.delta"))
      .filter(col("day").isNotNull)
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .groupBy(col("day"))
      .agg(sum(col("delta")).as("net"))
      .withColumn("backlog", sum(col("net")).over(w))
  }

  /** Per-day session quality report over [[sessionize]]'s output:
    * session count, bounce rate (single-event sessions), exact total
    * and average duration, and the longest session — the engagement
    * summary a product dashboard reads. Consumes the already
    * dimension-reduced session table (one row per session), so this
    * is a map-side-combined day rollup plus two divisions; the heavy
    * lifting (the user-partitioned gap scan) happened once in
    * sessionize and is shared by every downstream session consumer.
    */
  def sessionStats(sessions: DataFrame): DataFrame =
    sessions
      .select(to_date(col("session_start")).as("day"), col("n_events"),
        (unix_micros(col("session_end")) - unix_micros(col("session_start")))
          .as("dur_us"))
      .groupBy(col("day"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"),
        sum(col("dur_us")).as("total_dur_us"),
        max(col("dur_us")).as("max_dur_us"))
      .withColumn("bounce_rate",
        col("n_bounce").cast("double") / col("n_sessions"))
      .withColumn("avg_dur_us",
        col("total_dur_us").cast("double") / col("n_sessions"))

  /** Per-user burst detection: each user's PEAK event count within
    * any sliding `windowMicros` time window — the rate-limit /
    * abuse-screen audit ("did anyone exceed N actions per day?").
    * Exact sliding-window maximum from ONE user-partitioned RANGE
    * frame over event µs (every event anchors a window ending at
    * itself — for a maximum of counts that anchoring is lossless,
    * since any window's count is ≤ the count of the window ending at
    * its last event) followed by a map-side-combined max per user.
    * One exchange on user_id total; no self-join, no bucketing
    * approximation. The RANGE frame sorts within each user only.
    */
  def burstDetect(events: DataFrame, windowMicros: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-(windowMicros - 1), 0)
    events
      .withColumn("c", count(lit(1)).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("c")).as("max_burst"), count(lit(1)).as("n_events"))
  }

  /** Order-to-ship lag distribution per order priority: exact
    * day-lag percentiles (B9 parity: `percentile` ==
    * `quantile_cont`) over the orders⋈lineitem join — the
    * fulfillment-SLA report. The join is fact×fact on the order key:
    * both sides arrive hash-partitioned on it (at rest, bucket both
    * tables by orderkey and the exchange disappears entirely); the
    * lag is computed in-row and the wide columns prune before the
    * join. At 100 TB swap the exact percentiles for
    * `approx_percentile`, same shape.
    */
  def shipLag(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship"))
      .join(orders.select(col("o_orderkey"), col("o_orderpriority"),
        to_date(col("o_orderdate")).as("ordered")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("ship"), col("ordered")).cast("long").as("lag_days"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        min(col("lag_days")).as("min_days"),
        max(col("lag_days")).as("max_days"),
        percentile(col("lag_days"), lit(0.5)).as("p50_days"),
        percentile(col("lag_days"), lit(0.95)).as("p95_days"))

  /** Seasonal-naive forecast backtest: predict each (type, day)'s
    * volume with the count from the same weekday one week earlier and
    * report the absolute/relative error — the capacity-planning
    * baseline every fancier forecaster must beat, and the cheapest
    * possible one: the feed collapses to the |types|×|days| daily
    * table in one map-side-combined pass, and the "model" is a
    * self-equi-join of that dimension-sized table on (type, day−7)
    * (broadcast at any feed scale — its size is days, not events).
    * Only days where both actual and forecast exist are scored, so
    * feed gaps don't fabricate zero-error or infinite-APE rows.
    */
  def seasonalNaive(events: DataFrame, lagDays: Int = 7): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val fc = daily.select(col("event_type"),
      date_add(col("day"), lagDays).as("day"), col("n").as("n_forecast"))
    daily.withColumnRenamed("n", "n_actual")
      .join(broadcast(fc), Seq("event_type", "day"))
      .withColumn("abs_err",
        abs(col("n_actual") - col("n_forecast")))
      .withColumn("ape",
        col("abs_err").cast("double") / col("n_actual"))
  }

  /** Growth accounting (the classic DAU/MAU decomposition, weekly):
    * per (type, week) — active users, split into retained (also
    * active the immediately previous week), new (first week ever),
    * and resurrected (seen before, but not last week); plus churned =
    * last week's actives who did not return, and the retention rate.
    * ONE exchange does all the user-level work: the feed collapses to
    * distinct (type, user, week) in the first partial-agg pass, one
    * `lag` over (type, user) classifies every user-week, and the
    * per-week rollup is map-side combined. Churn needs last week's
    * active count — a `lag` over the |types|×|weeks| aggregate, not a
    * second feed scan.
    */
  def growthAccounting(events: DataFrame): DataFrame = {
    val uw = events
      .select(col("event_type"), col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct()
    val w = Window.partitionBy(col("event_type"), col("user_id"))
      .orderBy(col("wk"))
    val classified = uw
      .withColumn("prev_wk", lag(col("wk"), 1).over(w))
      .groupBy(col("event_type"), col("wk"))
      .agg(
        count(lit(1)).as("active"),
        sum(when(datediff(col("wk"), col("prev_wk")) === 7, 1L)
          .otherwise(0L)).as("retained"),
        sum(when(col("prev_wk").isNull, 1L).otherwise(0L)).as("new_users"),
        sum(when(col("prev_wk").isNotNull &&
          datediff(col("wk"), col("prev_wk")) > 7, 1L)
          .otherwise(0L)).as("resurrected"))
    val wt = Window.partitionBy(col("event_type")).orderBy(col("wk"))
    classified
      .withColumn("prev_active", lag(col("active"), 1).over(wt))
      .withColumn("churned", col("prev_active") - col("retained"))
      .withColumn("retention_rate",
        col("retained").cast("double") / col("prev_active"))
      .drop("prev_active")
  }

  /** Event pattern with NEGATION — "a `startType`, then the next
    * `targetType` by the same user, with no `blockerType` strictly
    * between" (the MATCH_RECOGNIZE shape a funnel can't express:
    * funnels count reached stages; this asks whether an interfering
    * event broke the path — cart → purchase with no error between,
    * page-view → signup with no rage-click between). One row per
    * start event with its outcome: `converted` (target came first),
    * `blocked` (a blocker intervened), `none` (neither followed).
    *
    * Semantics: events are ordered per user by (ts, event_id); "next"
    * means the minimum following ts of that type. A blocker blocks
    * only if STRICTLY earlier than the target (equal timestamps
    * resolve in the target's favor — documented, engine-stable, and
    * independent of id assignment).
    *
    * Scale: NO per-step self-join and no sequence UDF — both
    * lookahead columns ride ONE descending window per user (the same
    * single exchange+sort), so cost is the sessionize shape
    * regardless of how many pattern terms ride it. The window
    * partitions by user: bounded per-partition state, skew-safe under
    * AQE.
    */
  def patternWithNegation(events: DataFrame, startType: String,
                          targetType: String, blockerType: String): DataFrame = {
    // descending (ts, event_id) order makes "rows before current" =
    // "events strictly after, in event order"; min over that frame is
    // the earliest following occurrence
    val wDesc = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      // one select so both lookaheads land in ONE Window operator
      // (chained withColumn leaves two Window nodes around the
      // extracted aggregate input — same single sort, noisier plan)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        min(when(col("event_type") === targetType, col("ts")))
          .over(wDesc).as("next_target"),
        min(when(col("event_type") === blockerType, col("ts")))
          .over(wDesc).as("next_blocker"))
      .filter(col("event_type") === startType)
      .select(
        col("user_id"), col("event_id").as("start_event_id"),
        col("ts").as("start_ts"),
        when(col("next_target").isNull, "none")
          .when(col("next_blocker").isNotNull &&
            col("next_blocker") < col("next_target"), "blocked")
          .otherwise("converted").as("outcome"),
        when(col("next_target").isNotNull &&
          (col("next_blocker").isNull ||
            col("next_blocker") >= col("next_target")), col("next_target"))
          .as("target_ts"))
  }

  /** Audience-overlap matrix: for every pair of event types, how many
    * users do both — the segmentation view behind "do purchasers also
    * hit errors?". ONE corpus scan, no self-join: each user collapses
    * to their sorted distinct-type set (bounded by the type-space
    * size), pairs expand in-map from that set, and the pair counts
    * plus per-type distinct-user counts meet in a types²-sized join.
    * Jaccard = both / (a + b − both) — one double division.
    *
    * Scale: the per-user set aggregation is map-side combined and its
    * state is ≤ |types| per user; the expansion output is ≤
    * |types|²/2 per user; everything after is dimension-sized. The
    * self-join alternative shuffles the (user, type) table twice and
    * hot users fan out quadratically IN THE SHUFFLE — here the
    * fan-out happens after the per-user collapse, which a hot user
    * cannot grow beyond the type space.
    */
  def audienceOverlap(events: DataFrame): DataFrame = {
    val perUser = events
      .groupBy(col("user_id"))
      .agg(sort_array(collect_set(col("event_type"))).as("types"))
    val pairs = perUser.select(
      explode(flatten(transform(col("types"), (x, i) =>
        transform(
          slice(col("types"), i + 2, greatest(size(col("types")) - i - 1, lit(0))),
          y => struct(x.as("type_a"), y.as("type_b")))))).as("p"))
      .groupBy(col("p.type_a").as("type_a"), col("p.type_b").as("type_b"))
      .agg(count(lit(1)).as("users_both"))
    val counts = events
      .groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n"))
    pairs
      .join(broadcast(counts.select(col("event_type").as("type_a"),
        col("n").as("users_a"))), "type_a")
      .join(broadcast(counts.select(col("event_type").as("type_b"),
        col("n").as("users_b"))), "type_b")
      .select(col("type_a"), col("type_b"), col("users_a"), col("users_b"),
        col("users_both"),
        (col("users_both").cast("double") /
          (col("users_a") + col("users_b") - col("users_both"))).as("jaccard"))
  }

  /** First-significant-digit distribution per group (Benford-style
    * audit) — the fraud/data-entry screen: organically-grown money
    * amounts lead with 1 far more than 9; fabricated or truncated
    * feeds don't. The digit comes from integer cents rendered as a
    * string (both engines print a BIGINT identically), never from
    * floating log10. Cents are floor(value*100.0 + 0.5) — double
    * arithmetic, but the SQL twin evaluates the IDENTICAL expression,
    * so the distribution is engine-deterministic rather than
    * decimal-exact; values in (0, 0.005) land in a digit-'0' bucket
    * by this rounding. Output is the per-digit observed share;
    * comparing against log10(1+1/d) is the analyst's last step (kept
    * out of the engine: libm log10 is not bit-portable).
    *
    * Scale: one map-side-combined aggregation to groups×9 rows; the
    * share division rides a groups-sized window.
    */
  def firstDigitProfile(df: DataFrame, groupCol: String,
                        valueCol: String): DataFrame = {
    val cents = floor(col(valueCol) * 100.0 + 0.5).cast("long")
    val counted = df
      .filter(col(valueCol) > 0)
      .select(col(groupCol).as("grp"),
        substring(cents.cast("string"), 1, 1).as("digit"))
      .groupBy(col("grp"), col("digit"))
      .agg(count(lit(1)).as("n"))
    val wg = Window.partitionBy(col("grp"))
    counted
      .withColumn("share", col("n").cast("double") / sum(col("n")).over(wg))
  }

  /** Autocorrelation profile of each event type's daily-count series
    * at lags 1..`maxLag` — the seasonality detector behind "is this
    * feed weekly-periodic?" (a spike at lag 7 says yes). Pearson r of
    * (x_t, x_{t−lag}) computed from exact BIGINT moment sums over the
    * paired days, with ONE double division and sqrt at the end — the
    * statistic is bit-deterministic and oracle-replayable (the same
    * discipline as trendSlope/abTest).
    *
    * Scale: the feed partial-aggregates map-side to types×days rows
    * first; the lag windows and the moment aggregation run on that
    * dimension-sized table, so cost is the daily-rollup scan no
    * matter the feed size or the lag count.
    */
  def autocorrelation(events: DataFrame, maxLag: Int): DataFrame = {
    require(maxLag >= 1, "need at least lag 1")
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    // pair (x_t, x_{t−lag}) by an explicit day join — robust to silent
    // days (a row-offset window would misalign the series) and still
    // dimension-sized on both sides
    val lagged = daily
      .withColumn("lag", explode(sequence(lit(1), lit(maxLag))))
      .withColumn("pair_day", date_sub(col("day"), col("lag")))
    val prev = daily.select(col("event_type"),
      col("day").as("pair_day"), col("x").as("y"))
    lagged
      .join(prev, Seq("event_type", "pair_day"))
      .groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("r",
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
      .select("event_type", "lag", "n", "r")
  }
}
