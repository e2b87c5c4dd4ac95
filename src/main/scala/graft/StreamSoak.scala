package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sustained micro-batch soak for the streaming family.
  *
  * Every streaming operator is graded at fixture scale with
  * spec-pinned batch≡stream parity; what fixture specs cannot show is
  * sustained operation — does state stay bounded over ~1,000 real
  * micro-batches, does the delta-maintained warehouse stay readable
  * under live writes + periodic compaction, and does the terminal
  * table still match the one-shot batch answer bit-for-bit? This
  * harness stages the 10× event feed as N parquet files, replays it
  * as N micro-batches (maxFilesPerTrigger=1 under AvailableNow), and
  * drives three graded operators end-to-end:
  *
  *  1. rollup maintenance ([[graft.streaming.EventStream.rollupBatch]])
  *     with a compaction every `compactEvery` batches — terminal
  *     [[graft.streaming.EventStream.readRollup]] must equal the
  *     one-shot batch rollup EXACTLY (decimal re-aggregation is
  *     order-independent, so arrival order cannot excuse a diff);
  *  2. per-user running totals (mapGroupsWithState) — the state-store
  *     row count must plateau at the distinct-user count (state grows
  *     with KEYS, never with batches); terminal n_events per user must
  *     equal the batch groupBy exactly (sum_value compared at 1e-9
  *     relative: double accumulation order differs by construction);
  *  3. streaming Count-Min sketch (flatMapGroupsWithState) — fixed
  *     depth×width counters per group; the terminal sketch must be
  *     BIT-IDENTICAL to the batch cms_sketch aggregate over the whole
  *     feed (counter addition commutes, so this is exact by design).
  *
  * Emits one JSON artifact with the per-batch state-size series
  * (sampled), batch-duration percentiles, and the terminal oracle
  * verdicts — the STREAM_SOAK evidence the round brief asks for.
  *
  * args: srcDir outPath nFiles [compactEvery]
  */
object StreamSoak {
  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outPath = args(1)
    val nFiles = if (args.length > 2) args(2).toInt else 1000
    val compactEvery = if (args.length > 3) args(3).toInt else 200
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // keep every progress event: the state-size series IS the artifact
      .config("spark.sql.streaming.numRecentProgressUpdates", nFiles + 64)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.EventStream

    val work = java.nio.file.Files.createTempDirectory("graft_stream_soak")
      .toString
    val feedDir = s"$work/feed"

    // ---- stage the feed: N ts-contiguous parquet slices -------------
    // Range-partition by (ts, event_id) so each file is one time slice
    // of the feed — the shape a connect daemon actually lands. File
    // arrival ORDER at the source is by modification time (written
    // concurrently → effectively arbitrary), which is deliberate: all
    // three soaked operators are order-insensitive by design, and a
    // real feed is never perfectly ordered either.
    val events = Tables.events(spark, srcDir)
    events.repartitionByRange(nFiles, col("ts"), col("event_id"))
      .write.mode("overwrite").parquet(feedDir)
    val feedRows = spark.read.parquet(feedDir).count()
    val stagedFiles = new java.io.File(feedDir)
      .listFiles().count(f => f.getName.endsWith(".parquet"))
    println(s"staged $stagedFiles files / $feedRows rows at $feedDir")
    // the "N files -> N micro-batches" claim is an invariant, not an
    // assumption: range-sampling can collapse sparse ranges into
    // fewer files, which would silently shrink the soak
    require(stagedFiles == nFiles,
      s"staged $stagedFiles files, wanted $nFiles - feed too small for this slicing")

    def pct(xs: Seq[Double], p: Double): Double =
      if (xs.isEmpty) 0.0
      else xs.sorted.apply(math.min(xs.size - 1, (p * xs.size).toInt))

    // progress → (batchId, inputRows, triggerMs, stateRows, stateMem)
    def progressRows(q: org.apache.spark.sql.streaming.StreamingQuery)
        : Seq[(Long, Long, Long, Long, Long)] =
      q.recentProgress.toSeq.map { p =>
        val (rows, mem) = p.stateOperators.headOption
          .map(s => (s.numRowsTotal, s.memoryUsedBytes)).getOrElse((0L, 0L))
        (p.batchId, p.numInputRows,
          Option(p.durationMs.get("triggerExecution")).map(_.longValue)
            .getOrElse(0L), rows, mem)
      }.sortBy(_._1)

    def series(rows: Seq[(Long, Long, Long, Long, Long)]): String = {
      // sample every 25th batch plus the last — enough to see the
      // plateau without a 1000-element artifact
      val picked = rows.zipWithIndex
        .filter { case (_, i) => i % 25 == 0 || i == rows.size - 1 }
        .map(_._1)
      picked.map { case (b, _, _, st, _) => s"[$b,$st]" }
        .mkString("[", ",", "]")
    }

    // minimal JSON string escape (the Bench.jstr convention): paths
    // with quotes/backslashes must not produce an invalid artifact
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""

    val sb = new StringBuilder
    sb.append("{")
    sb.append(s""""src_dir":${jstr(srcDir)},"n_feed_files":$stagedFiles,""")
    sb.append(s""""feed_rows":$feedRows,""")

    // ---- 1. rollup maintenance + periodic compaction ----------------
    locally {
      val wh = s"$work/wh"
      var compactions = 0
      val t0 = System.nanoTime()
      val q = EventStream.readEventStream(spark, feedDir, Some(1))
        .writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          EventStream.rollupBatch(batch, batchId, wh)
          if (batchId > 0 && batchId % compactEvery == 0) {
            // fold only up to the committed frontier (batchId - 1):
            // folding the CURRENT batch would let a crash-replay of it
            // re-create deltas compaction already owns (see
            // compactRollup's maxBatchId contract)
            EventStream.compactRollup(spark, wh, maxBatchId = batchId - 1)
            compactions += 1
          }
        }
        .option("checkpointLocation", s"$work/ck_rollup")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wallS = (System.nanoTime() - t0) / 1e9
      val prog = progressRows(q)
      val durs = prog.map(_._3.toDouble)
      // terminal oracle: reader view ≡ one-shot batch rollup, exactly
      val stream = EventStream.readRollup(spark, wh)
      val oracle = graft.operators.Rollups.fiveMinute(
        Tables.events(spark, srcDir))
      val mismatches = stream.as("s").join(oracle.as("o"),
          Seq("bucket_start", "event_type"), "full_outer")
        .filter(col("s.n_events").isNull || col("o.n_events").isNull ||
          col("s.n_events") =!= col("o.n_events") ||
          col("s.sum_value") =!= col("o.sum_value"))
        .count()
      val whParts = spark.read.parquet(wh)
        .select("_day", "_batch_id").distinct().count()
      sb.append(s""""rollup":{"batches":${prog.size},""")
      sb.append(f""""wall_s":$wallS%.1f,"compactions":$compactions,""")
      sb.append(s""""warehouse_partitions_final":$whParts,""")
      sb.append(s""""stream_rows":${stream.count()},"oracle_rows":${oracle.count()},""")
      sb.append(s""""mismatch_rows":$mismatches,"bit_exact":${mismatches == 0},""")
      sb.append(f""""batch_ms_p50":${pct(durs, 0.5)}%.0f,"batch_ms_p95":${pct(durs, 0.95)}%.0f,"batch_ms_max":${pct(durs, 1.0)}%.0f},""")
      println(s"rollup: ${prog.size} batches, $compactions compactions, mismatches=$mismatches")
      require(mismatches == 0, "rollup terminal oracle mismatch")
    }

    // ---- 2. per-user running totals (mapGroupsWithState) ------------
    locally {
      val outParq = s"$work/user_totals"
      val t0 = System.nanoTime()
      val q = EventStream.runningUserTotals(
          EventStream.readEventStream(spark, feedDir, Some(1)))
        .writeStream
        .outputMode("update")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batch.withColumn("_batch_id", lit(batchId))
            .write.mode("append").parquet(outParq)
        }
        .option("checkpointLocation", s"$work/ck_totals")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wallS = (System.nanoTime() - t0) / 1e9
      val prog = progressRows(q)
      val durs = prog.map(_._3.toDouble)
      val stateRows = prog.map(_._4)
      // terminal snapshot: each user's row from their LAST batch
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("_batch_id").desc)
      val terminal = spark.read.parquet(outParq)
        .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
        .select("user_id", "n_events", "sum_value")
      val batchOracle = Tables.events(spark, srcDir)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      val distinctUsers = batchOracle.count()
      val joined = terminal.as("s").join(batchOracle.as("o"), Seq("user_id"),
        "full_outer")
      val countMismatch = joined.filter(col("s.n_events").isNull ||
        col("o.n_events").isNull ||
        col("s.n_events") =!= col("o.n_events")).count()
      // double accumulation order differs stream-vs-batch by
      // construction; 1e-9 relative is the honest bound, not a fudge
      val maxRelErr = joined
        .select(max(abs(col("s.sum_value") - col("o.sum_value")) /
          greatest(abs(col("o.sum_value")), lit(1.0))).as("m"))
        .head.getDouble(0)
      sb.append(s""""user_totals":{"batches":${prog.size},""")
      sb.append(f""""wall_s":$wallS%.1f,""")
      sb.append(s""""distinct_users":$distinctUsers,""")
      sb.append(s""""state_rows_max":${stateRows.max},"state_rows_final":${stateRows.last},""")
      sb.append(s""""state_bounded_by_keys":${stateRows.max == distinctUsers},""")
      sb.append(s""""state_rows_series":${series(prog)},""")
      sb.append(s""""n_events_mismatch":$countMismatch,""")
      sb.append(f""""sum_rel_err_max":$maxRelErr%.3e,""")
      sb.append(f""""batch_ms_p50":${pct(durs, 0.5)}%.0f,"batch_ms_p95":${pct(durs, 0.95)}%.0f,"batch_ms_max":${pct(durs, 1.0)}%.0f},""")
      println(s"user_totals: ${prog.size} batches, state max=${stateRows.max} " +
        s"users=$distinctUsers countMismatch=$countMismatch relErr=$maxRelErr")
      require(countMismatch == 0, "user totals terminal count mismatch")
      require(stateRows.max == distinctUsers, "state not bounded by key count")
      require(maxRelErr < 1e-9, s"sum drift $maxRelErr exceeds 1e-9")
    }

    // ---- 3. streaming CMS (flat state, bit-exact terminal) -----------
    locally {
      val outParq = s"$work/cms"
      val depth = 4; val width = 512
      val t0 = System.nanoTime()
      val q = EventStream.streamingCms(
          EventStream.readEventStream(spark, feedDir, Some(1)),
          "event_type", "user_id", depth, width)
        .writeStream
        .outputMode("update")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batch.withColumn("_batch_id", lit(batchId))
            .write.mode("append").parquet(outParq)
        }
        .option("checkpointLocation", s"$work/ck_cms")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wallS = (System.nanoTime() - t0) / 1e9
      val prog = progressRows(q)
      val stateRows = prog.map(_._4)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(col("_batch_id").desc)
      val terminal = spark.read.parquet(outParq)
        .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
        .select(col("event_type"), col("sketch"))
      import graft.functions.CmsFunctions._
      val batchSketch = Tables.events(spark, srcDir)
        .groupBy("event_type")
        .agg(cmsSketch(col("user_id"), depth, width).as("sketch"))
      val groups = batchSketch.count()
      val diff = terminal.as("s").join(batchSketch.as("o"), Seq("event_type"),
          "full_outer")
        .filter(col("s.sketch").isNull || col("o.sketch").isNull ||
          col("s.sketch") =!= col("o.sketch"))
        .count()
      sb.append(s""""cms":{"batches":${prog.size},""")
      sb.append(f""""wall_s":$wallS%.1f,""")
      sb.append(s""""groups":$groups,"state_rows_final":${stateRows.last},""")
      sb.append(s""""sketch_bit_identical":${diff == 0}}""")
      println(s"cms: ${prog.size} batches, groups=$groups bitDiff=$diff")
      require(diff == 0, "streaming CMS terminal sketch not bit-identical")
    }

    sb.append("}")
    val out = sb.toString
    val target = java.nio.file.Paths.get(outPath)
    Option(target.getParent)
      .foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(target, out.getBytes("UTF-8"))
    println(out)
    // best-effort scratch cleanup (the staged feed is multi-GB at 10×)
    scala.reflect.io.Directory(new java.io.File(work)).deleteRecursively()
    spark.stop()
  }
}
