package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Maintenance, Reconcile, Report}

/** The reference's whole library test cycle (chill.py:45-227) as one
  * Spark flow: parse raw data → field rules → route to tables →
  * idempotent partition-overwrite load → read back → reconcile
  * against the in-memory transform → junit report.
  *
  * What the reference does with an Oracle DB, daemon processes, and
  * sleep/poll loops is here a deterministic DAG: the "DB" is a
  * partitioned parquet warehouse, the "DBLoader" is dynamic partition
  * overwrite, and the comparison is a set of co-partitioned joins.
  */
final case class LibraryConfig(
    rawPath: String,
    delimiter: String,
    rawColumns: Seq[String],
    skipHeader: Int,
    skipFooter: Int,
    ignoreLines: Set[String],
    rules: Seq[FieldRule],
    tagRules: Seq[FromTag],
    routes: Seq[TableRoute],
    /** partition (datetime) column, present in every route's columns */
    partitionCol: String,
    warehouseDir: String)

final case class LibraryResult(
    tables: Map[String, DataFrame],
    report: DataFrame,
    junitXml: String)

object LibraryRun {

  /** Execute the full cycle. `keyCols` are the reconciliation keys
    * (the reference's CONF_KEY_FIELDS + DATETIME).
    */
  def run(spark: SparkSession, cfg: LibraryConfig, keyCols: Seq[String]): LibraryResult = {
    // 1. parse + transform (Partrans.parse_data), ONCE: the reference
    // parses each file once and accumulates per-table frames
    // (Partrans.py:356-364). Spark-first that is a persisted
    // transformed feed — every route's write (its own action) and
    // every reconcile suite fans out from the cache instead of
    // re-parsing the raw text. MEMORY_AND_DISK: a huge batch spills
    // to local disk rather than evicting (a re-parse costs far more
    // than a disk read of the parsed columns).
    val raw = ChillPipeline.rawCsv(spark, cfg.rawPath, cfg.delimiter, cfg.rawColumns,
      cfg.skipHeader, cfg.skipFooter, cfg.ignoreLines)
    val tagged = ChillPipeline.withTagColumns(spark, cfg.rawPath, raw, cfg.tagRules)
    val transformed = FieldRule.applyAll(tagged, cfg.rules)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val routed = ChillPipeline.route(transformed, cfg.routes)

      // 2. load: per-table dynamic partition overwrite (delete+reload)
      routed.foreach { case (table, df) =>
        Maintenance.overwritePartitions(df, s"${cfg.warehouseDir}/$table", cfg.partitionCol)
      }

      // 3. read back what the warehouse now holds
      val loaded = routed.keys.map { table =>
        table -> spark.read.parquet(s"${cfg.warehouseDir}/$table")
      }.toMap

      // 4. reconcile per table — the reference's FULL compare_data
      // check set (HlxTools.py:785-936): record counts, missing keys
      // both directions, per-counter value diffs (numeric-else-string,
      // rounded to 3), fact→dimension referential integrity vs the
      // config's lookup views, and the missing-column schema compare.
      // Counter columns come from the route spec (the HLD column list
      // minus keys — TYPE=KPI post-rule columns are excluded the way
      // the reference filters TYPE!='KPI').
      val lookups = cfg.rules.collect { case l: Lookup => l }
      val suites = routed.keys.toSeq.sorted.flatMap { table =>
        val spec = cfg.routes.find(_.table == table).get
        val counters = spec.columns
          .filterNot(c => keyCols.contains(c) || c == cfg.partitionCol)
        val expected = routed(table).withColumn("_key", concat_ws("", keyCols.map(col): _*))
        val actual = loaded(table).withColumn("_key", concat_ws("", keyCols.map(col): _*))
        val missing = Reconcile.missingKeys(expected, actual, "_key")
        val diffs =
          if (counters.isEmpty) None
          else Some(Reconcile.counterDiffs(expected, actual, "_key", counters))
        val (missingInData, extraInData) = Reconcile.missingColumns(
          spec.columns ++ spec.postRules.map(_.name), loaded(table))
        // referential: every lookup rule whose fact keys survived into
        // this table checks its keys against the dimension view
        val refSuites = lookups
          .filter(_.keys.forall { case (f, _) => loaded(table).columns.contains(f) })
          .map { l =>
            val factKey = l.keys.map(_._1)
            val dimKey = l.keys.map(_._2)
            val (fact, fk) =
              if (factKey.sizeIs == 1) (loaded(table), factKey.head)
              else (loaded(table).withColumn("_fk",
                concat_ws("", factKey.map(col): _*)), "_fk")
            val (dim, dk) =
              if (dimKey.sizeIs == 1) (l.view, dimKey.head)
              else (l.view.select(
                concat_ws("", dimKey.map(col): _*).as("_dk")), "_dk")
            Report.referentialSuite(
              Reconcile.referentialSummary(fact, dim, fk, dk), table, l.name)
          }
        Seq(
          Report.countSuite(Reconcile.countCompare(expected, actual, "_key"), "_key"),
          Report.missingSuite(missing, "_key"),
          Report.summaryRow("missing_records", table, missing),
          Report.missingColumnsSuite(spark, table, missingInData, extraInData)) ++
          diffs.toSeq.flatMap(d => Seq(
            Report.counterDiffSuite(d, "_key"),
            Report.summaryRow("value_diffs", table, d))) ++
          refSuites
      }
      val report = Report.merge(suites: _*)
      // toJunitXml collects, so the report materializes from the cache
      // before the unpersist below; the returned DataFrames (parquet-
      // backed or recomputable) stay valid after it
      LibraryResult(loaded, report, Report.toJunitXml(report))
    } finally transformed.unpersist()
  }

  /** Cycle from a compiled config, finishing the way the reference's
    * harness does (chill.py:70-71): the junit report lands next to
    * the warehouse as `{LIBRARY_NAME}_test_report.xml`, with the
    * library name taken from the workbook/JSON metadata.
    */
  def runCompiled(spark: SparkSession, compiled: ConfigFile.Compiled,
                  keyCols: Seq[String]): LibraryResult = {
    val result = run(spark, compiled.lib, keyCols)
    // Hadoop FS, not java.nio: the warehouse may be hdfs://or s3a://
    // like every other write in the cycle, and create() makes parents
    val path = new org.apache.hadoop.fs.Path(compiled.lib.warehouseDir, compiled.reportFileName)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(result.junitXml.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    result
  }

  /** Continuous form of the cycle — the reference's connect-daemon
    * polling loop (chill.py wait_rd/copy_rd + DBLoader) as a file
    * stream: each micro-batch of newly-arrived raw files parses with
    * the SAME config rules and partition-overwrites the routed
    * tables. Matches the reference's delete-by-datetime-then-reload
    * unit of work: a batch replaces exactly the datetime partitions
    * it carries, so replaying a file set is idempotent as long as
    * files carry whole partitions (the Chill model: one file = one
    * datetime slice).
    */
  def stream(spark: SparkSession, cfg: LibraryConfig)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val lines = spark.readStream.text(cfg.rawPath)
      .select(input_file_name().as("_file"), col("value"))
    lines.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val raw = ChillPipeline.sliceLines(batch, cfg.delimiter, cfg.rawColumns,
        cfg.skipHeader, cfg.skipFooter, cfg.ignoreLines)
      val tagged = ChillPipeline.withTagColumnsFrom(batch, raw, cfg.tagRules)
      // parse the batch once; each route's partition-overwrite action
      // reads the cached parse, not the batch's source files again
      val transformed = FieldRule.applyAll(tagged, cfg.rules)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try ChillPipeline.route(transformed, cfg.routes).foreach { case (table, df) =>
        Maintenance.overwritePartitions(df, s"${cfg.warehouseDir}/$table", cfg.partitionCol)
      } finally transformed.unpersist()
    }
  }
}
