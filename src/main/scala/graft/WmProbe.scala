package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical watermark-semantics probe (r12): stages a small shuffled
  * (late-data) feed, runs one watermark operator (`agg` | `dedup` |
  * `join`), and dumps per-batch progress (displayed watermark, input
  * rows, numRowsDroppedByWatermark), the arrival permutation, and the
  * per-row feed — everything needed to pin, against observed engine
  * behavior, WHICH watermark a batch filters with and at WHAT
  * granularity rows are dropped. Findings (encoded in StreamSoak's
  * late-data gates and BENCH_NOTES_r12.md): the late-events filter
  * uses the PREVIOUS batch's displayed watermark; row-level operators
  * drop ts <= that lagged watermark; windowed aggregation drops whole
  * fully-late (window, key) PARTIAL groups after partial aggregation
  * (a late row whose window is still open is aggregated, and the drop
  * counter counts groups, not rows); append emits a window once the
  * un-lagged watermark reaches its end.
  *
  * args: [mode] [srcDir] [nSlices]
  */
object WmProbe {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "agg"
    val srcDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.numRecentProgressUpdates", 200)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.EventStream
    val work = java.nio.file.Files.createTempDirectory("wmprobe").toString
    val feedDir = s"$work/feed"
    val ev0 = Tables.events(spark, srcDir)
    val ev = if (mode == "dedup")
      ev0.unionByName(ev0.filter(col("event_id") % 3 === 0)) else ev0
    ev.repartitionByRange(if (args.length > 2) args(2).toInt else 10, col("ts"), col("event_id"))
      .write.mode("overwrite").parquet(feedDir)
    val parts = new java.io.File(feedDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val perm = new scala.util.Random(7L).shuffle(parts.indices.toList)
    val base = System.currentTimeMillis() - (parts.length + 60).toLong * 1000L
    perm.zipWithIndex.foreach { case (fi, ai) =>
      require(parts(fi).setLastModified(base + ai * 1000L)) }
    val arrival = perm.map(i => parts(i).getName)
    val outParq = s"$work/out"
    val src = EventStream.readEventStream(spark, feedDir, Some(1))
    val streamed = mode match {
      case "dedup" => EventStream.dedupStream(src)
      case "join" => EventStream.streamIntervalJoin(
        src.filter(col("event_type") === "click"),
        EventStream.readEventStream(spark, feedDir, Some(1))
          .filter(col("event_type") === "purchase"))
      case _ => EventStream.windowedAgg(src)
    }
    val q = streamed.writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("append").parquet(outParq) }
      .option("checkpointLocation", s"$work/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val prog = q.recentProgress.toSeq.sortBy(_.batchId)
    println(s"nbatches=${prog.size}")
    prog.foreach { p =>
      val wm = Option(p.eventTime.get("watermark")).getOrElse("-")
      val dr = p.stateOperators.toSeq.map(_.numRowsDroppedByWatermark).sum
      println(s"batch=${p.batchId} rows=${p.numInputRows} wm=$wm dropped=$dr")
    }
    val df = EventStream.normalize(spark.read.parquet(feedDir))
      .withColumn("_file", element_at(split(input_file_name(), "/"), -1))
    df.select(col("_file"), unix_millis(col("ts")).as("ms"),
        col("event_id"), col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(s"$work/rows")
    println("ARRIVAL " + arrival.mkString(","))
    println(s"ROWS $work/rows")
    println(s"OUT $outParq")
    spark.stop()
  }
}
