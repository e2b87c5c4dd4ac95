package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-report rendering — the Spark analogue of the reference's
  * junit XML generation (TestReport.py): reconciliation outputs fold
  * into a (suite, test_name, status, message) report table, and a
  * capped slice renders as junit XML.
  *
  * The report *table* is distributed (suites over billions of keys
  * stay DataFrames); only the XML rendering collects, and it caps
  * failures per suite the way a human-readable report must.
  */
object Report {

  /** Record-count comparison suite (TestReport.py:create_data_summary):
    * one test case per key, failed when counts differ.
    */
  def countSuite(countCompare: DataFrame, key: String): DataFrame =
    countCompare.select(
      lit("record_counts").as("suite"),
      concat(lit("count for "), col(key).cast("string")).as("test_name"),
      when(col("is_match"), "passed").otherwise("failed").as("status"),
      concat(lit("left="), col("cnt_left"), lit(" right="), col("cnt_right")).as("message"))

  /** Missing-record suite (TestReport.py:create_data_missing). */
  def missingSuite(missingKeys: DataFrame, key: String): DataFrame =
    missingKeys.select(
      lit("missing_records").as("suite"),
      concat(lit("key "), col(key).cast("string")).as("test_name"),
      lit("failed").as("status"),
      col("direction").as("message"))

  /** Value-diff suite (TestReport.py:create_data_diffs). */
  def diffSuite(valueDiffs: DataFrame, key: String): DataFrame =
    valueDiffs.select(
      lit("value_diffs").as("suite"),
      concat(lit("diff for "), col(key).cast("string")).as("test_name"),
      lit("failed").as("status"),
      concat(lit("left="), col("val_left"), lit(" right="), col("val_right")).as("message"))

  /** Per-counter value-diff suite over [[Reconcile.counterDiffs]]
    * output — the counter name lands in the test name so a failing
    * case reads `diff for <key> <counter>` like the reference's
    * per-counter diff dict (HlxTools.py:918-929).
    */
  def counterDiffSuite(counterDiffs: DataFrame, key: String): DataFrame =
    counterDiffs.select(
      lit("value_diffs").as("suite"),
      concat(lit("diff for "), col(key).cast("string"), lit(" "),
        col("counter")).as("test_name"),
      lit("failed").as("status"),
      concat(lit("left="), coalesce(col("val_left"), lit("NULL")),
        lit(" right="), coalesce(col("val_right"), lit("NULL"))).as("message"))

  /** Referential-integrity suite from a
    * [[Reconcile.referentialSummary]] one-row summary: passed iff no
    * fact key is absent from the dimension (the reference's
    * missing_in_conf check, HlxTools.py:821-856).
    */
  def referentialSuite(summary: DataFrame, table: String, ruleName: String): DataFrame =
    summary.select(
      lit("referential").as("suite"),
      lit(s"$table fk $ruleName").as("test_name"),
      when(col("n_orphans") === 0L, "passed").otherwise("failed").as("status"),
      concat(lit("facts="), col("n_facts"), lit(" orphans="), col("n_orphans"),
        lit(" matched="), col("n_matched")).as("message"))

  /** One aggregate pass/fail row over a failures-only suite body, so
    * a clean table still surfaces the suite in the report (a suite
    * that only emits failures would vanish when green).
    */
  def summaryRow(suiteName: String, table: String, failures: DataFrame): DataFrame =
    failures.agg(count(lit(1)).as("_n")).select(
      lit(suiteName).as("suite"),
      lit(table).as("test_name"),
      when(col("_n") === 0L, "passed").otherwise("failed").as("status"),
      concat(lit("failing_cases="), col("_n")).as("message"))

  /** DBL loader-error suite (TestReport.py:create_db_errors): the
    * parsed loader logs ([[Maintenance.parseDblErrors]]) as one case
    * per (table, line) — ORA-/record errors fail, load statistics
    * pass, so a clean load renders as a green suite with its row
    * counts in the messages.
    */
  def dblErrorsSuite(parsedLogs: DataFrame): DataFrame =
    parsedLogs.select(
      lit("dbl_errors").as("suite"),
      concat_ws(": ", col("table_name"), col("kind")).as("test_name"),
      when(col("kind") === "stats", "passed").otherwise("failed").as("status"),
      col("detail").as("message"))

  /** Missing-column suite (TestReport.py:create_missing_cols) — from
    * the metadata-level schema compare.
    */
  def missingColumnsSuite(spark: SparkSession, table: String,
                          missingInData: Seq[String], extraInData: Seq[String]): DataFrame = {
    import spark.implicits._
    val rows =
      missingInData.map(c => ("missing_columns", s"$table.$c", "failed", "expected column absent from data")) ++
        extraInData.map(c => ("missing_columns", s"$table.$c", "failed", "data column absent from spec")) match {
        case Nil => Seq(("missing_columns", table, "passed", "all expected columns present"))
        case r   => r
      }
    rows.toDF("suite", "test_name", "status", "message")
  }

  /** Merge suites into one report table. */
  def merge(suites: DataFrame*): DataFrame = suites.reduce(_ unionByName _)

  /** Render a junit-style XML string from the report table, keeping at
    * most `maxFailures` failed cases per suite (plus pass/fail
    * totals). The only collect in the reporting path, explicitly
    * bounded.
    */
  def toJunitXml(report: DataFrame, maxFailures: Int = 100): String = {
    // suite order pinned (collect order off a groupBy is not), so the
    // rendered XML is byte-identical run to run
    val totals = report.groupBy("suite").agg(
      count(lit(1)).as("tests"),
      sum(when(col("status") === "failed", 1L).otherwise(0L)).as("failures"))
      .collect()
      .sortBy(_.getString(0))
    val failures = report.filter(col("status") === "failed")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("suite")
          .orderBy(col("test_name"))))
      .filter(col("rn") <= maxFailures)
      .select("suite", "test_name", "message")
      .collect()
      .groupBy(_.getString(0))
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
    val sb = new StringBuilder("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<testsuites>\n")
    totals.foreach { t =>
      val suite = t.getString(0)
      sb.append(s"""  <testsuite name="${esc(suite)}" tests="${t.getLong(1)}" failures="${t.getLong(2)}">\n""")
      failures.getOrElse(suite, Array.empty).foreach { f =>
        sb.append(s"""    <testcase name="${esc(f.getString(1))}"><failure message="${esc(f.getString(2))}"/></testcase>\n""")
      }
      sb.append("  </testsuite>\n")
    }
    sb.append("</testsuites>\n").toString
  }
}
