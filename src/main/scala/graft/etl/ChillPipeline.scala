package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The config-driven ETL executor: raw feed → field rules → routing
  * into per-table outputs, mirroring Partrans.parse_data
  * (Partrans.py:210-364) Spark-first.
  *
  * The reference loops files, evals field functions row-by-row, and
  * appends pandas frames per table. Here the whole feed is one scan;
  * routing is a filter per target table over the shared, cached plan
  * (a single pass at scale — Spark re-uses the scan via the same
  * underlying RDD when the outputs are written in one job, and the
  * per-table predicate is pushed to parquet when routing keys are
  * partition columns).
  */
final case class TableRoute(
    table: String,
    /** Predicate selecting this table's rows (the reference maps the
      * OM_GROUP value to a table via the HLD Tables sheet). */
    predicate: org.apache.spark.sql.Column,
    /** Columns to keep, in order. */
    columns: Seq[String],
    /** Per-table rules applied AFTER routing/projection — the HLD's
      * TYPE=KPI formula columns, computed over this table's counters
      * (the reference loads counters and leaves KPIs to DB-side
      * formulas; here they stay in the same projection).
      */
    postRules: Seq[FieldRule] = Nil)

object ChillPipeline {

  /** Apply field rules then split the feed into the configured target
    * tables. Returns table name → DataFrame.
    */
  def run(raw: DataFrame, rules: Seq[FieldRule], routes: Seq[TableRoute]): Map[String, DataFrame] = {
    val transformed = FieldRule.applyAll(raw, rules)
    routes.map { r =>
      r.table -> FieldRule.applyAll(
        transformed.filter(r.predicate).select(r.columns.map(col): _*), r.postRules)
    }.toMap
  }

  /** Raw CSV source with the reference's line-level controls
    * (Partrans.py:98-122, 222-236): `valid_lines` slice — drop the
    * first `skipHeader` and last `skipFooter` lines of each file —
    * and `ignore_lines` exact-match drops, then delimiter-split into
    * named columns.
    *
    * Line numbers are derived per file partition-locally (files are
    * read whole per task at this layer); at 100 TB raw text feeds are
    * many small-to-medium files — the per-file window never shuffles
    * because the partitioning key is the file itself.
    */
  def rawCsv(spark: SparkSession, path: String, delimiter: String,
             columns: Seq[String], skipHeader: Int, skipFooter: Int,
             ignoreLines: Set[String]): DataFrame =
    sliceLines(
      spark.read.text(path).select(input_file_name().as("_file"), col("value")),
      delimiter, columns, skipHeader, skipFooter, ignoreLines)

  /** The line-slicing + delimiter-split core of [[rawCsv]], over any
    * `(_file, value)` line set — also the per-batch parser of the
    * streaming library run, where the lines arrive from a file stream
    * instead of a batch scan.
    */
  def sliceLines(lines: DataFrame, delimiter: String, columns: Seq[String],
                 skipHeader: Int, skipFooter: Int, ignoreLines: Set[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("_file")).orderBy(monotonically_increasing_id())
    val numbered = lines
      .withColumn("_ln", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("_file"))))
    val body = numbered
      .filter(col("_ln") > skipHeader && col("_ln") <= col("_n") - skipFooter)
      .filter(!col("value").isin(ignoreLines.toSeq: _*))
    val parts = split(col("value"), java.util.regex.Pattern.quote(delimiter))
    columns.zipWithIndex.foldLeft(body) { case (acc, (c, i)) =>
      acc.withColumn(c, parts.getItem(i))
    }.drop("value", "_ln", "_n")
  }

  /** Capture per-file header ("tag") lines for [[FromTag]] rules: for
    * each rule, the first raw line containing its tag is extracted per
    * file (the reference scans the whole file for the tag line,
    * Partrans.py:113-122) and joined back on the file name. Per-file
    * tag tables are tiny → broadcast join; the feed never shuffles.
    */
  def withTagColumns(spark: SparkSession, path: String, df: DataFrame,
                     tagRules: Seq[FromTag]): DataFrame =
    withTagColumnsFrom(
      spark.read.text(path).select(input_file_name().as("_file"), col("value")),
      df, tagRules)

  /** [[withTagColumns]] over an existing `(_file, value)` line set. */
  def withTagColumnsFrom(lines: DataFrame, df: DataFrame,
                         tagRules: Seq[FromTag]): DataFrame = {
    if (tagRules.isEmpty) return df
    val ordered = lines.withColumn("_ord", monotonically_increasing_id())
    tagRules.foldLeft(df) { (acc, rule) =>
      val tagLines = ordered
        .filter(col("value").contains(rule.tag))
        .groupBy(col("_file"))
        .agg(min_by(col("value"), col("_ord")).as(s"_tag_${rule.name}"))
      acc.join(broadcast(tagLines), Seq("_file"), "left")
    }
  }
}
