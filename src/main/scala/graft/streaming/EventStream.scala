package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the event feed: watermarked windowed
  * aggregation and in-watermark dedup. The same transforms run in
  * batch mode (unified API) — specs drive them with a file source and
  * the memory sink.
  */
object EventStream {

  /** Normalize the on-disk `ts` (raw nanos long, TIMESTAMP, or
    * TIMESTAMP_NTZ) to a session-UTC microsecond timestamp — the same
    * branch as the batch loader, so batch and stream agree.
    */
  def normalize(raw: DataFrame): DataFrame = graft.Tables.normalizeEventTs(raw)

  /** Watermarked 5-minute tumbling-window aggregation per event type.
    * At scale: state is bounded by the watermark; partial aggregation
    * happens before the stateful shuffle.
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** Dedup on event_id within the watermark horizon — bounded state,
    * exactly-once per id inside the horizon. Unified: Spark rejects
    * `dropDuplicatesWithinWatermark` on batch inputs, where the
    * equivalent of a within-watermark dedup over a finite (fully
    * in-horizon) dataset is exact dedup — so batch callers get that,
    * letting the same pipeline run against a replayed feed.
    */
  def dedupStream(events: DataFrame): DataFrame =
    if (events.isStreaming)
      events
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** Gap-based session windows (Spark-native `session_window`): the
    * streaming form of Analytics.sessionize — state merges windows
    * within the gap, watermark bounds state size. Works identically
    * in batch.
    */
  def sessionWindowAgg(events: DataFrame, gap: String): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** Watermarked stream-stream interval join: each trigger event
    * (e.g. a click) pairs with the same user's follow-up events
    * (e.g. purchases) that land within `within` after it — streaming
    * attribution. Both sides carry watermarks and the join condition
    * bounds the time range, so Spark buffers only `within`-deep state
    * per side and evicts as the watermark advances — without the
    * range bound the join state would grow forever. The same code
    * runs in batch (watermarks no-op), which is how the spec pins it.
    */
  def streamIntervalJoin(triggers: DataFrame, followups: DataFrame,
                         within: String = "10 minutes"): DataFrame = {
    val l = triggers
      .withWatermark("ts", within)
      .select(col("event_id").as("trigger_id"), col("user_id"),
        col("ts").as("trigger_ts"))
    val r = followups
      .withWatermark("ts", within)
      .select(col("event_id").as("follow_id"), col("user_id").as("f_user"),
        col("ts").as("follow_ts"))
    l.join(r,
        col("user_id") === col("f_user") &&
          col("follow_ts") >= col("trigger_ts") &&
          col("follow_ts") <= col("trigger_ts") + expr(s"INTERVAL $within"))
      .select(col("user_id"), col("trigger_id"), col("follow_id"),
        col("trigger_ts"), col("follow_ts"))
  }

  /** Custom keyed state via mapGroupsWithState: per-user running
    * totals maintained across micro-batches (the building block for
    * fraud counters, rate limits, per-entity accumulators). State is
    * one small case class per key; timeouts would bound it in a
    * production feed.
    */
  def runningUserTotals(events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.{Encoders, Row}
    val spark = events.sparkSession
    import spark.implicits._
    val tupleEnc = Encoders.product[(Long, Long, Double)]
    events
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          rows.foreach { r => n += 1; s += r._2 }
          state.update((n, s))
          (user, n, s)
      }(Encoders.product[(Long, Double)], tupleEnc)
      .toDF("user_id", "n_events", "sum_value")
  }

  /** Streaming heavy hitters: the Misra-Gries summary
    * ([[graft.functions.FreqBuffer]]) as keyed streaming state — the
    * continuous "top tokens / sources / user agents" monitor. Each
    * micro-batch folds its items into the group's O(capacity) buffer
    * and emits the refreshed summary, so state NEVER grows with the
    * stream, only with capacity × groups; the batch aggregate's
    * guarantees (exact under capacity, >n/capacity items always
    * present) carry over because the state IS the same summary.
    */
  def streamingHeavyHitters(events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                            groupCol: String, itemCol: String,
                            capacity: Int): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr(groupCol, itemCol)
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, String)],
         state: GroupState[Map[String, Long]]) =>
          val buf = new graft.functions.FreqBuffer(capacity)
          state.getOption.foreach(_.foreach { case (k, c) =>
            buf.counts.update(k, c)
          })
          rows.foreach(r => buf.add(r._2))
          state.update(buf.counts.toMap)
          buf.counts.toSeq.sortBy { case (k, c) => (-c, k) }
            .map { case (k, c) => (g, k, c) }.iterator
      }
      .toDF(groupCol, "item", "n_occurrences")
  }

  /** Streaming alarm state machine: B18's two-threshold hysteresis
    * as keyed streaming state — per family, the alarm latches ON
    * when a day's volume exceeds `hi` and releases only below `lo`
    * (absolute thresholds: a streaming monitor cannot see the
    * full-period mean the batch form normalizes by). State is ONE
    * boolean per family — the smallest possible streaming state —
    * and each micro-batch folds its days in event-time order (the
    * in-batch sort is bounded by days-per-family-per-batch; across
    * batches the latched boolean carries the machine forward), so
    * the emitted (day, alarm) sequence equals the batch replay of
    * the same edge/hold ladder (oracle- and spec-pinned).
    */
  def alarmStream(daily: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                  hi: Long, lo: Long): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    require(hi > lo, "hysteresis needs hi > lo")
    val spark = daily.sparkSession
    import spark.implicits._
    daily
      .selectExpr("event_type", "CAST(day AS STRING) AS day", "n_events")
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (family: String, rows: Iterator[(String, String, Long)],
         state: GroupState[Boolean]) =>
          var on = state.getOption.getOrElse(false)
          val out = rows.toSeq.sortBy(_._2).map { case (_, day, n) =>
            if (n > hi) on = true else if (n < lo) on = false
            (family, day, n, if (on) "on" else "off")
          }
          state.update(on)
          out.iterator
      }
      .toDF("event_type", "day", "n_events", "alarm")
      .withColumn("day", col("day").cast("date"))
  }

  /** Streaming cumulative-counter deltas (B32's semantics as keyed
    * state): one last-reading Long per (type, entity) carries across
    * micro-batches, each batch folds its readings in (ts, event_id)
    * order, negative jumps classify as resets with the post-reset
    * reading as the delta. In batch mode the same code sees each
    * group once and reproduces the window form exactly (one oracle
    * covers both); in streaming mode the carried reading is what the
    * window cannot do — deltas stay correct across batch boundaries.
    */
  def counterDeltaStream(readings: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val spark = readings.sparkSession
    import spark.implicits._
    readings
      .selectExpr("event_type", "user_id", "unix_micros(ts) AS us",
        "event_id", "cents")
      .as[(String, Long, Long, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (key: (String, Long), rows: Iterator[(String, Long, Long, Long, Long)],
         state: GroupState[Long]) =>
          var prev: Option[Long] = state.getOption
          val out = rows.toSeq.sortBy(r => (r._3, r._4)).map {
            case (_, _, us, _, c) =>
              val (delta, reset) = prev match {
                case None => (0L, 0L)
                case Some(p) if c >= p => (c - p, 0L)
                case Some(_) => (c, 1L)
              }
              prev = Some(c)
              (key._1, key._2, us, c, delta, reset)
          }
          prev.foreach(state.update)
          out.iterator
      }
      .toDF("event_type", "user_id", "us", "cents", "delta_cents", "is_reset")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
  }

  /** Streaming pattern-with-negation (E72's monitor form): per-user
    * keyed state carries the PENDING starts — each with the earliest
    * blocker timestamp seen since it opened — across micro-batches;
    * a target event resolves every pending start at once (blocked iff
    * its earliest blocker is STRICTLY earlier than the target, the
    * batch form's tie rule). A streaming monitor emits DECISIONS:
    * `converted` / `blocked` rows appear when the target arrives;
    * a start whose target never comes stays pending (batch's `none`
    * is an end-of-data artifact, which a stream never reaches) — in
    * batch mode the group closes after one pass, so unresolved
    * pendings simply don't emit and the output equals the batch
    * operator filtered to resolved outcomes (oracle-pinned).
    *
    * State is the open-start list per user — bounded by how many
    * starts a user can have between targets; attach a state timeout
    * in deployments where users abandon forever.
    */
  def patternNegationStream(events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                            startType: String, targetType: String,
                            blockerType: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val spark = events.sparkSession
    import spark.implicits._
    val NoBlocker = Long.MaxValue
    events
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type")
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long, String)],
         state: GroupState[List[(Long, Long, Long)]]) =>
          var pending = state.getOption.getOrElse(Nil)
          val out = Seq.newBuilder[(Long, Long, Long, String, Option[Long])]
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, us, id, tpe) =>
            if (tpe == startType) {
              pending ::= ((id, us, NoBlocker))
            } else if (tpe == blockerType) {
              pending = pending.map { case (sid, sus, b) =>
                (sid, sus, math.min(b, us))
              }
            } else if (tpe == targetType) {
              pending.foreach { case (sid, sus, b) =>
                if (b < us) out += ((user, sid, sus, "blocked", None))
                else out += ((user, sid, sus, "converted", Some(us)))
              }
              pending = Nil
            }
          }
          state.update(pending)
          out.result().iterator
      }
      .toDF("user_id", "start_event_id", "start_us", "outcome", "target_us")
      .withColumn("start_ts", timestamp_micros(col("start_us")))
      .withColumn("target_ts", timestamp_micros(col("target_us")))
      .select("user_id", "start_event_id", "start_ts", "outcome", "target_ts")
  }

  /** Streaming Count-Min sketch: the CMS counters
    * ([[graft.functions.CmsBuffer]]) as keyed streaming state — the
    * continuous any-key frequency monitor next to
    * [[streamingHeavyHitters]]'s head-only summary. Each micro-batch
    * folds its keys into the group's depth×width buffer and emits the
    * refreshed sketch (plus the running item total, so consumers — and
    * the parity spec — can identify the latest snapshot without batch
    * ordering); state NEVER grows with the stream or the key space.
    * Because the fold is the SAME deterministic counter addition the
    * batch aggregate performs, the final streaming sketch is
    * bit-identical to `cms_sketch` over the whole feed (spec-pinned).
    */
  def streamingCms(events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                   groupCol: String, keyCol: String,
                   depth: Int, width: Int): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import org.apache.spark.sql.Encoders
    import graft.functions.{CmsBuffer, HllSketch}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr(groupCol, keyCol)
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Long)],
         state: GroupState[(Long, Array[Byte])]) =>
          val (n0, prev) = state.getOption.getOrElse((0L, Array.emptyByteArray))
          val buf = if (prev.isEmpty) new CmsBuffer(depth, width)
            else CmsBuffer.deserialize(prev)
          var n = n0
          rows.foreach { r =>
            buf.add(HllSketch.hashValue(r._2, LongType)); n += 1
          }
          val ser = buf.serialize
          state.update((n, ser))
          (g, n, ser)
      }(Encoders.product[(Long, Array[Byte])],
        Encoders.product[(String, Long, Array[Byte])])
      .toDF(groupCol, "n_items", "sketch")
  }

  /** Continuous rollup maintenance — the streaming form of the
    * reference's connect-daemon + DBLoader + aggregation-scheduler
    * loop (chill.py:159-192). Each micro-batch writes its 5-minute
    * rollup as a DELTA partitioned by (_day, _batch_id) — DAY dirs
    * with the 5-minute buckets as rows, never a dir per bucket (288
    * tiny dirs/day is the over-partitioning q_compaction_plan exists
    * to flag, and the per-dir commit protocol dominated the rig's
    * wall time when we tried it):
    *  - lossless across batches: a bucket spanning two micro-batches
    *    keeps both deltas (a whole-bucket overwrite would keep only
    *    the last batch's counts);
    *  - idempotent replay: a reprocessed batch dynamic-overwrites
    *    exactly its own (day, batch) delta partitions, so
    *    foreachBatch's at-least-once never double-counts;
    *  - write path never reads the warehouse (no read-modify-write
    *    race, no scaling cliff); [[readRollup]] merges deltas at read
    *    time, and a periodic compaction can fold them down.
    */
  def rollupMaintenance(events: DataFrame, warehousePath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      rollupBatch(batch, batchId, warehousePath)
    }

  /** One micro-batch's delta write — the foreachBatch body of
    * [[rollupMaintenance]], factored out so soak harnesses can compose
    * it with periodic [[compactRollup]] calls inside the same
    * foreachBatch (safe against the RACE: a single streaming query
    * serializes its batches, so compaction never runs beside a delta
    * write; safe against REPLAY: a batch at or below the warehouse's
    * fold frontier — its deltas already merged into the compacted
    * partition and deleted — is skipped, so foreachBatch's
    * at-least-once redelivery after a crash cannot re-create counts
    * compaction already owns. An unfolded batch's replay remains the
    * original dynamic-overwrite idempotency.)
    */
  def rollupBatch(batch: DataFrame, batchId: Long,
                  warehousePath: String): Unit = {
    if (compactedThrough(batch.sparkSession, warehousePath)
          .exists(batchId <= _)) return
    val delta = graft.operators.Rollups.fiveMinute(batch)
      .withColumn("_batch_id", lit(batchId))
      .withColumn("_day", floor(col("bucket_start") / 86400L))
      // one file per (day, batch) dir: without the cluster-by,
      // every day dir collects a fragment from every write task
      .repartition(col("_day"))
    graft.operators.Maintenance.overwritePartitions(
      delta, warehousePath, Seq("_day", "_batch_id"))
  }

  /** Reader view of the delta-maintained rollup warehouse: merge the
    * compacted partition with every delta ABOVE the fold frontier
    * into final (bucket, type) rows. Decimal re-aggregation makes the
    * merge exact, so this equals the batch rollup of everything
    * ingested so far. The frontier filter (a partition-pruned scan
    * predicate) is what makes a crash-leftover folded delta dir —
    * possible only in the window a committed stage has not finished
    * its cleanup — invisible rather than double-counted.
    */
  def readRollup(spark: SparkSession, warehousePath: String): DataFrame = {
    val staged = stageThrough(spark, warehousePath)
    val through = staged.orElse(manifestThrough(spark, warehousePath))
      .getOrElse(Long.MinValue)
    val warehouse = spark.read.parquet(warehousePath)
      .withColumn("bucket_start", col("bucket_start").cast("long"))
    val deltas = warehouse
      .filter(col("_batch_id").cast("long") =!= CompactedBatchId &&
        col("_batch_id").cast("long") > through)
      .drop("_batch_id", "_day")
    // While a committed stage awaits apply (crash window, or mid-
    // apply), the stage — durable before its marker, immutable after
    // — IS the authoritative compacted state; the _batch_id=-1
    // partition may be stale, partially overwritten, or already
    // merged, so reading it in this window would under- or double-
    // count. Outside the window the compacted partition is exact.
    val compacted = staged match {
      case Some(_) =>
        spark.read.parquet(s"$warehousePath/$StageName/data")
          .withColumn("bucket_start", col("bucket_start").cast("long"))
          .drop("_day")
      case None =>
        warehouse
          .filter(col("_batch_id").cast("long") === CompactedBatchId)
          .drop("_batch_id", "_day")
    }
    graft.operators.Rollups.mergeFiveMinute(compacted.unionByName(deltas))
  }

  /** Reserved `_batch_id` of the compacted partition. */
  val CompactedBatchId: Long = -1L

  /** Warehouse-internal names — underscore-prefixed without '=', so
    * Spark's hidden-path filter keeps them out of every parquet scan
    * of the warehouse root.
    */
  private val ManifestName = "_compacted_through"
  private val StageName = "_staged_compaction"

  /** The warehouse's fold frontier: the highest delta batch id whose
    * counts live in the compacted partition (None before the first
    * compaction). Deltas at or below it are consumed — deleted, or
    * crash leftovers awaiting cleanup that every reader must ignore.
    */
  def compactedThrough(spark: SparkSession,
                       warehousePath: String): Option[Long] = {
    // The committed stage marker outlives the manifest's one unreadable
    // instant (writeTextAtomic replaces the manifest by delete+rename;
    // the stage dir is dropped only after the new manifest is durable),
    // and its value is always >= the manifest's — so max(manifest,
    // marker) is a frontier readable in EVERY crash state. Without the
    // fallback, a crash inside that instant left no manifest, the
    // frontier fell to Long.MinValue, and readers double-counted every
    // consumed delta until the next compactRollup.
    (manifestThrough(spark, warehousePath).toSeq ++
      stageThrough(spark, warehousePath)).reduceOption(_ max _)
  }

  /** The manifest's frontier alone (None if absent/unreadable). */
  private def manifestThrough(spark: SparkSession,
                              warehousePath: String): Option[Long] =
    readLongFile(spark, s"$warehousePath/$ManifestName")

  /** The committed stage marker's frontier (None when no stage is
    * awaiting apply).
    */
  private def stageThrough(spark: SparkSession,
                           warehousePath: String): Option[Long] =
    readLongFile(spark, s"$warehousePath/$StageName/_COMMITTED")

  private def readLongFile(spark: SparkSession, path: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLongOption
      finally in.close()
    }
  }

  private def writeTextAtomic(fs: org.apache.hadoop.fs.FileSystem,
                              p: org.apache.hadoop.fs.Path, s: String): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(p.getParent, p.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"rename $tmp -> $p failed")
  }

  /** Fold the accumulated per-batch deltas in `(throughOld, maxBatchId]`
    * down to one row per (bucket, type) merged into the compacted
    * partition (decimal re-agg, exact). Crash-safe by write-ahead
    * staging, NOT by hoping the apply is atomic:
    *
    *  1. the merge (old compacted partition + the consumed delta
    *     window) is written to a hidden stage dir, then committed
    *     with a marker carrying the new frontier — the warehouse is
    *     untouched until the fold result is durable;
    *  2. apply: dynamic-overwrite the compacted partition FROM the
    *     stage, advance the [[compactedThrough]] manifest, delete the
    *     consumed delta dirs, drop the stage.
    *
    * A crash anywhere replays cleanly: before the marker, the
    * warehouse is unmodified and the stage is recomputed from it;
    * after the marker, the next [[compactRollup]] (or this one's
    * retry) re-applies the immutable stage — every apply step is
    * idempotent, and [[readRollup]]'s frontier filter hides
    * not-yet-deleted consumed dirs in the meantime. The round-10
    * single-phase design recomputed the merge from a possibly
    * half-applied warehouse on retry, which double-counted.
    *
    * `maxBatchId` bounds the fold: a caller compacting INSIDE
    * foreachBatch of batch B must pass B−1 (the committed frontier —
    * structured streaming starts batch B only after B−1's commit log
    * entry), so a replay of B finds its own deltas unfolded and
    * overwrites them idempotently. Deltas beyond `maxBatchId` are
    * never read, merged, or deleted. Standalone periodic callers
    * (no in-flight batch) use the fold-everything default.
    *
    * Run it on whatever cadence bounds delta-count ×
    * read-amplification (e.g. hourly for a 5-minute rollup).
    * Single-writer discipline: serialize compactions with delta
    * writes (foreachBatch composition does this by construction).
    * Readers overlapping an APPLY window may see a transient merge
    * state — same caveat as any parquet dynamic overwrite; readers
    * between maintenance operations are always exact.
    */
  def compactRollup(spark: SparkSession, warehousePath: String,
                    maxBatchId: Long = Long.MaxValue): Unit = {
    val root = new org.apache.hadoop.fs.Path(warehousePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return
    // crash recovery first: a committed stage is someone's completed
    // fold that never finished applying — finish it before reading
    // the warehouse state it half-updated
    applyStage(spark, warehousePath)
    val throughOld = compactedThrough(spark, warehousePath)
      .getOrElse(Long.MinValue)
    // sweep crash leftovers at or below the frontier (possible only
    // if a prior apply was interrupted between its manifest advance
    // and its deletes) — readers already ignore them, this reclaims
    // the dirs even when there is no new delta to fold
    sweepFolded(fs, warehousePath, throughOld)
    val consumable = deltaBatchIds(fs, warehousePath)
      .filter(b => b > throughOld && b <= maxBatchId)
    if (consumable.isEmpty) return
    val throughNew = consumable.max
    val deltas = spark.read.parquet(warehousePath)
      .withColumn("bucket_start", col("bucket_start").cast("long"))
      // partition-dir values are type-inferred on read (ints for
      // small batch ids) — pin to long
      .withColumn("_b", col("_batch_id").cast("long"))
    val folded = graft.operators.Rollups.mergeFiveMinute(
        deltas.filter(col("_b") === CompactedBatchId ||
            (col("_b") > throughOld && col("_b") <= throughNew))
          .drop("_b", "_batch_id", "_day"))
      .withColumn("_day", floor(col("bucket_start") / 86400L))
      // one compacted file per day dir (see rollupMaintenance)
      .repartition(col("_day"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$warehousePath/$StageName"), true)
    folded.write.mode("overwrite").partitionBy("_day")
      .parquet(s"$warehousePath/$StageName/data")
    writeTextAtomic(fs,
      new org.apache.hadoop.fs.Path(s"$warehousePath/$StageName/_COMMITTED"),
      throughNew.toString)
    applyStage(spark, warehousePath)
  }

  /** The delta batch ids present as warehouse partition dirs —
    * filesystem-metadata-sized, no Spark job.
    */
  private def deltaBatchIds(fs: org.apache.hadoop.fs.FileSystem,
                            warehousePath: String): Seq[Long] = {
    val glob = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$warehousePath/_day=*/_batch_id=*"))
    Option(glob).toSeq.flatten
      .map(_.getPath.getName.stripPrefix("_batch_id=").toLong)
      .filter(_ != CompactedBatchId)
      .distinct
  }

  /** Apply a committed compaction stage (no-op without its marker):
    * overwrite the compacted partition from the stage, advance the
    * manifest, delete the consumed delta dirs, drop the stage. Every
    * step idempotent — callable any number of times after any crash.
    */
  private def applyStage(spark: SparkSession, warehousePath: String): Unit = {
    val marker = new org.apache.hadoop.fs.Path(
      s"$warehousePath/$StageName/_COMMITTED")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(marker)) return
    val in = fs.open(marker)
    val through =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    val staged = spark.read.parquet(s"$warehousePath/$StageName/data")
      .withColumn("bucket_start", col("bucket_start").cast("long"))
      .drop("_day")
      .withColumn("_batch_id", lit(CompactedBatchId))
      .withColumn("_day", floor(col("bucket_start") / 86400L))
    graft.operators.Maintenance.overwritePartitions(
      staged, warehousePath, Seq("_day", "_batch_id"))
    writeTextAtomic(fs,
      new org.apache.hadoop.fs.Path(s"$warehousePath/$ManifestName"),
      through.toString)
    sweepFolded(fs, warehousePath, through)
    fs.delete(new org.apache.hadoop.fs.Path(s"$warehousePath/$StageName"), true)
  }

  /** Delete every delta dir at or below the fold frontier. */
  private def sweepFolded(fs: org.apache.hadoop.fs.FileSystem,
                          warehousePath: String, through: Long): Unit =
    deltaBatchIds(fs, warehousePath).filter(_ <= through).foreach { b =>
      Option(fs.globStatus(new org.apache.hadoop.fs.Path(
          s"$warehousePath/_day=*/_batch_id=$b"))).toSeq.flatten
        .foreach(st => fs.delete(st.getPath, true))
    }

  /** Open the events parquet directory as a stream (for specs/demo).
    * `maxFilesPerTrigger` caps the files consumed per micro-batch —
    * the soak harness uses 1 so a staged N-file feed replays as N
    * micro-batches (AvailableNow respects source rate limits).
    */
  def readEventStream(spark: SparkSession, dir: String,
                      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    // a streaming source needs an explicit schema — take the raw one
    // from a batch read of the same files so either ts encoding works
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(dir).schema
    val reader = spark.readStream.schema(rawSchema)
    val limited = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
    normalize(limited.parquet(dir))
  }
}
