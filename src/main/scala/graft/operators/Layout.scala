package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization for scan-heavy tables: z-order keys and
  * range-clustered writes.
  *
  * At 100 TB the dominant cost is which parquet files a query must
  * open. Clustering the write so that each file covers a narrow range
  * of the filter columns turns min/max footer stats (and partition
  * values) into file-level pruning — the same scan that reads
  * everything on a random layout reads a handful of files on a
  * clustered one.
  */
object Layout {

  private val Masks = Seq(
    (16, 0x0000FFFF0000FFFFL),
    (8, 0x00FF00FF00FF00FFL),
    (4, 0x0F0F0F0F0F0F0F0FL),
    (2, 0x3333333333333333L),
    (1, 0x5555555555555555L))

  /** Spread the low 32 bits of `x` so each lands on an even bit
    * position — the textbook mask-and-shift interleave ladder, all
    * builtin bitwise ops (codegen'd; and replayable in any SQL engine
    * with shifts).
    */
  private def spreadBits(x: Column): Column =
    Masks.foldLeft(x.bitwiseAND(lit(0xFFFFFFFFL))) { case (acc, (s, m)) =>
      acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
    }

  /** Z-order (Morton) key of two 32-bit dimensions: bits of `a` on
    * even positions, bits of `b` on odd. Sorting by the z-key keeps
    * rows close in BOTH dimensions close in the order, so one
    * clustered layout serves range filters on either column —
    * a plain sort on (a, b) only ever prunes on `a`.
    */
  def zorderKey(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** Cluster `df` into `numFiles` range buckets of `keyCol` and sort
    * inside each — written as-is, every output file covers a disjoint
    * key range, so footer min/max stats prune at file granularity.
    * Range partitioning samples the key distribution, so skewed keys
    * still give evenly sized files (a hash layout cannot prune; a
    * global orderBy adds a driver-side total order no writer needs).
    */
  def layoutForScan(df: DataFrame, keyCol: Column, numFiles: Int): DataFrame =
    df.repartitionByRange(numFiles, keyCol).sortWithinPartitions(keyCol)

  /** Compaction / file-layout plan for a date-partitioned feed: per
    * day, estimated uncompressed bytes (fixed per-row overhead + the
    * variable-width columns' lengths, all integer arithmetic) and the
    * file count that hits `targetBytes` per file — the advisor a
    * small-file compaction job (OPTIMIZE) runs BEFORE rewriting, so
    * it only touches partitions whose layout is actually wrong.
    * One map-side-combined pass over the feed; output is
    * days-sized. The 1-row-group pathology this round's bench
    * reconciliation documented (BENCH_NOTES_r6.md: a single-RG file
    * caps scan parallelism at ONE task) is exactly what the
    * `n_files` column exists to prevent — at 100 TB both too-many
    * tiny files (footer/open overhead) and too-few huge ones
    * (parallelism cap) are layout bugs.
    */
  /** Hash-partition skew report: row counts per `numBuckets` key
    * buckets (portable `key mod buckets`, not an engine-private
    * hash) with each bucket's ratio to the even-split ideal — the
    * measurement that decides whether a key needs E5's salting
    * BEFORE a 100 TB shuffle discovers it the hard way. One
    * map-side-combined pass; output is buckets-sized.
    */
  def partitionSkew(df: DataFrame, key: Column, numBuckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the total rides an unpartitioned window over the BUCKETS-sized
    // aggregate (pareto discipline) — one feed scan, no count() action
    df.groupBy(pmod(key.cast("long"), lit(numBuckets.toLong)).as("bucket"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("total", sum(col("n_rows")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("share", col("n_rows").cast("double") / col("total"))
      .withColumn("ratio_to_even",
        (col("n_rows") * numBuckets.toLong).cast("double") / col("total"))
      .drop("total")
  }

  /** Delta-encoding advisor for a per-key ordered timestamp column:
    * total bytes under raw fixed-8 encoding vs varint-encoded
    * per-user deltas (7-bit groups — the parquet DELTA_BINARY_PACKED
    * / Gorilla-style win, sized exactly without writing a byte).
    * The delta scan is ONE user-partitioned window (lag) and the
    * byte cost is an in-row CASE ladder on delta magnitude — all
    * BIGINT, one final division for the ratio. Answers "is it worth
    * re-sorting this feed by (user, ts) before writing?" from a
    * single aggregate.
    */
  def deltaEncodingAdvisor(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sized = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("delta", unix_micros(col("ts")) - col("prev_us"))
      .withColumn("vbytes",
        when(col("delta").isNull, 8L) // first event per user: full width
          .when(col("delta") < (1L << 7), 1L)
          .when(col("delta") < (1L << 14), 2L)
          .when(col("delta") < (1L << 21), 3L)
          .when(col("delta") < (1L << 28), 4L)
          .when(col("delta") < (1L << 35), 5L)
          .when(col("delta") < (1L << 42), 6L)
          .when(col("delta") < (1L << 49), 7L)
          .when(col("delta") < (1L << 56), 8L)
          .otherwise(9L))
    sized.agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) * 8L).as("raw_bytes"),
      sum(col("vbytes")).as("varint_bytes"))
      .withColumn("compression_ratio",
        col("raw_bytes").cast("double") / col("varint_bytes"))
  }

  /** Zone-map (min/max footer stats) effectiveness advisor: under a
    * candidate physical sort order, how many `blockRows`-row blocks
    * could a point predicate on `probeCol` actually skip? Blocks are
    * row_number ranges of the sorted table (a parquet row group / a
    * file, to first order); each block reduces to its (min, max) of
    * the probe column and every probe tests containment against the
    * blocks-sized stats table — so the answer to "is re-sorting this
    * 100 TB table worth it?" costs one sort of the advised SAMPLE,
    * never a rewrite. `sortCols` must totally order the rows (append
    * a unique id) or block boundaries are nondeterministic. Global
    * row_number is the advisor's sequential frame: run it on a
    * sample or per range-partition at open scale.
    */
  def zoneMapAdvisor(df: DataFrame, sortCols: Seq[String], probeCol: String,
                     blockRows: Int, probes: Seq[Long],
                     label: String): DataFrame = {
    // range-partitioned global row_number (GlobalRank): the advisor's
    // sequential frame no longer funnels the sampled table onto one
    // task (sortCols must still totally order the rows — same
    // contract as before)
    val blocks = GlobalRank.rowNumber(
      df.select((probeCol +: sortCols).distinct.map(col): _*),
      sortCols.map(col), "rn")
      .withColumn("blk", expr(s"(rn - 1) div $blockRows"))
      .groupBy(col("blk"))
      .agg(min(col(probeCol)).as("mn"), max(col(probeCol)).as("mx"))
    val spark = df.sparkSession
    import spark.implicits._
    val probeDf = probes.toDF("probe")
    blocks.crossJoin(broadcast(probeDf))
      .groupBy(col("probe"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("mn") <= col("probe") && col("probe") <= col("mx"), 1L)
          .otherwise(0L)).as("n_scanned"))
      .select(lit(label).as("layout"), col("probe"), col("n_blocks"),
        col("n_scanned"),
        (lit(1.0) - col("n_scanned").cast("double") / col("n_blocks"))
          .as("skip_rate"))
  }

  def compactionPlan(events: DataFrame, targetBytes: Long): DataFrame =
    events
      .select(to_date(col("ts")).as("day"),
        (lit(28L) + length(col("event_type"))
          + coalesce(length(col("props")), lit(0))).cast("long").as("w"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_rows"), sum(col("w")).as("est_bytes"))
      .withColumn("n_files",
        expr(s"(est_bytes + ${targetBytes - 1}L) div ${targetBytes}L"))
      .withColumn("rows_per_file",
        expr("(n_rows + n_files - 1) div n_files"))
}
