package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Config-file ingestion: the reference is driven by two workbooks —
  * the Chill sheet (scalar settings + field specs + views,
  * Partrans.parse_conf_file, Partrans.py:38-96) and the HLD sheets
  * (Tables: counter-group → table name + base granularity; ParseHLD.
  * parse_hld_file, ParseHLD.py:9-63). This module reads the same
  * information from a JSON rendition of those sheets and compiles it
  * into [[LibraryConfig]] rules, so a user with a Chill workbook
  * export can run the whole library cycle without writing Scala.
  *
  * Spark-first re-expressions:
  *  - field `function` strings are ANSI SQL compiled by Catalyst
  *    (`expr`), with `argN` placeholders bound to the declared input
  *    COLUMNS — the reference instead substitutes per-row VALUES into
  *    a Python string and `eval`s it row-at-a-time (Partrans.py:
  *    162-208); the compiled form stays inside whole-stage codegen;
  *  - `views` are SQL run via `spark.sql` over registered temp views
  *    (the reference fetches them from Oracle into pandas frames,
  *    Partrans.py:119-140); lookups against them become broadcast
  *    joins with a default on miss, not per-row eval + exception;
  *  - the OM_GROUP field + HLD Tables sheet become one derived
  *    routing column + a predicate per target table
  *    (Partrans.py:239-262).
  */
object ConfigFile {

  /** One field spec — the columns of the Chill sheet's field section
    * (source/tag/inputs/value/function/view/default, Partrans.py:
    * 77-90), plus the regex `pattern`/`group` that the workbook's
    * filename/tag functions encode inside their eval strings.
    */
  final case class FieldSpec(
      name: String,
      source: String,
      value: Option[String],
      tag: Option[String],
      inputs: Option[String],
      function: Option[String],
      pattern: Option[String],
      group: Option[Int],
      view: Option[String],
      view_keys: Option[String],
      value_col: Option[String],
      default_value: Option[String])

  /** One row of the HLD Tables sheet: counter group in raw data →
    * target table + base granularity (+ the table's column list from
    * the Key_Counters_Kpis sheet).
    */
  final case class TableSpec(
      om_group: String,
      table: String,
      granularity: String,
      columns: Seq[String],
      /** TYPE=KPI rows of the Key_Counters_Kpis sheet: formula
        * columns over this table's counters, applied after routing.
        */
      kpis: Option[Seq[FieldSpec]])

  final case class ViewSpec(name: String, sql: String)

  /** The whole config file. */
  final case class ChillConfig(
      input_path: String,
      format: String,
      delimiter: String,
      raw_columns: Seq[String],
      skip_header: Int,
      skip_footer: Int,
      ignore_lines: Option[Seq[String]],
      schema_name: String,
      om_group: FieldSpec,
      views: Option[Seq[ViewSpec]],
      fields: Seq[FieldSpec],
      tables: Seq[TableSpec],
      partition_col: String,
      retention_days: Option[Map[String, Int]],
      /** HLD front-matter (ParseHLD.py:8-38): carried into physical
        * table and report naming the way chill.py composes
        * LIBRARY_NAME (chill.py:63-91). Absent in older JSON
        * renditions → None.
        */
      library_name: Option[String] = None,
      library_version: Option[String] = None)

  final case class Compiled(
      lib: LibraryConfig,
      schemaName: String,
      retentionDays: Map[String, Int],
      libraryName: Option[String] = None,
      libraryVersion: Option[String] = None) {
    /** The reference's physical name: `{schema}.{table}_{resolution}`
      * (Partrans.py:252-257). Route targets already carry the
      * `_granularity` suffix.
      */
    def physicalName(route: String): String = s"$schemaName.$route"
    /** junit report file name, `{LIBRARY_NAME}_test_report.xml`
      * (chill.py:70-71).
      */
    def reportFileName: String =
      s"${libraryName.getOrElse(schemaName)}_test_report.xml"
  }

  private val enc: Encoder[ChillConfig] = Encoders.product[ChillConfig]

  /** Read a config file (single JSON document). The declared schema
    * makes absent optional sections null rather than failing
    * inference on an empty file.
    */
  def load(spark: SparkSession, path: String): ChillConfig =
    spark.read.schema(enc.schema).option("multiLine", "true")
      .json(path).as[ChillConfig](enc).head()

  /** Bind `argN` placeholders to the declared input columns and
    * compile the SQL fragment. Word-boundary matching so `arg1`
    * neither clobbers the prefix of `arg10` nor rewrites an `argM`
    * substring inside an already-substituted column name. Input
    * names that are not bare SQL identifiers (raw counter names may
    * be dotted OIDs, carry dashes, spaces…) are backtick-quoted, so
    * `pmCtr.5` substitutes as a column reference rather than parsing
    * as struct-field access.
    */
  private def sqlIdent(name: String): String =
    if (name.matches("[A-Za-z_][A-Za-z0-9_]*")) name
    else "`" + name.replace("`", "``") + "`"

  private def compileFunction(function: String, inputs: Seq[String]): Column =
    expr((inputs.length to 1 by -1).foldLeft(function) { (f, n) =>
      f.replaceAll(s"\\barg$n\\b",
        java.util.regex.Matcher.quoteReplacement(sqlIdent(inputs(n - 1))))
    })

  private def inputCols(spec: FieldSpec): Seq[String] =
    spec.inputs.toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  /** One field spec → one declarative rule (Partrans.py:142-208's
    * five source kinds).
    */
  def compileField(spec: FieldSpec, views: Map[String, DataFrame]): FieldRule =
    spec.source.toLowerCase match {
      case "constant" =>
        Constant(spec.name, lit(spec.value.getOrElse("")))
      case "filename" =>
        FromFilename(spec.name,
          spec.pattern.getOrElse(throw err(spec, "pattern")), spec.group.getOrElse(1))
      case "tag" =>
        FromTag(spec.name, spec.tag.getOrElse(throw err(spec, "tag")),
          line => regexp_extract(line, spec.pattern.getOrElse("(.*)"), spec.group.getOrElse(1)))
      case "column" =>
        Derived(spec.name,
          compileFunction(spec.function.getOrElse(throw err(spec, "function")), inputCols(spec)))
      case "lookup" =>
        val viewName = spec.view.getOrElse(throw err(spec, "view"))
        val view = views.getOrElse(viewName,
          throw new IllegalArgumentException(s"field ${spec.name}: view '$viewName' not defined"))
        val keys = inputCols(spec).zip(
          spec.view_keys.getOrElse(throw err(spec, "view_keys")).split(",").map(_.trim))
        Lookup(spec.name, view, keys,
          spec.value_col.getOrElse(throw err(spec, "value_col")), lit(spec.default_value.orNull))
      case other =>
        throw new IllegalArgumentException(s"field ${spec.name}: unknown source '$other'")
    }

  private def err(spec: FieldSpec, missing: String) =
    new IllegalArgumentException(s"field ${spec.name} (${spec.source}): missing '$missing'")

  /** Compile the whole config: views → DataFrames, fields → rules,
    * OM_GROUP + Tables sheet → routes. Targets are named
    * `<table>_<granularity>` like the reference's physical tables
    * (Partrans.py:252-257), so [[graft.operators.Maintenance
    * .retentionSweep]] can drive per-granularity retention off the
    * same suffix.
    */
  def compile(spark: SparkSession, cfg: ChillConfig, warehouseDir: String): Compiled = {
    require(cfg.format.equalsIgnoreCase("csv"), s"unsupported format '${cfg.format}'")
    val views = cfg.views.getOrElse(Nil).map(v => v.name -> spark.sql(v.sql)).toMap
    val rules = cfg.fields.map(compileField(_, views))
    // om_group participates in tag capture like any field (a tag-
    // sourced group is legal: the group is file-level metadata)
    val omRule = compileField(cfg.om_group.copy(name = "_om_group"), views)
    val routes = cfg.tables.map { t =>
      val kpiRules = t.kpis.getOrElse(Nil).map { k =>
        // KPIs run AFTER routing/projection: raw-line context (tags,
        // filenames) is gone by then, so only counter-level sources
        // can appear — fail at compile time, not with a missing
        // column at run time
        require(Set("column", "constant", "lookup").contains(k.source.toLowerCase),
          s"table ${t.table}: kpi ${k.name} has source '${k.source}'; " +
            "KPIs are formulas over this table's columns (column/constant/lookup)")
        compileField(k, views)
      }
      TableRoute(s"${t.table}_${t.granularity}",
        col("_om_group") === t.om_group, t.columns, kpiRules)
    }
    Compiled(
      LibraryConfig(
        rawPath = cfg.input_path,
        delimiter = cfg.delimiter,
        // a JSON rendition omitting raw_columns decodes as null;
        // empty means "derive from the feed header" (rawCsv), same
        // as the workbook path
        rawColumns = Option(cfg.raw_columns).getOrElse(Seq.empty),
        skipHeader = cfg.skip_header,
        skipFooter = cfg.skip_footer,
        ignoreLines = cfg.ignore_lines.getOrElse(Nil).toSet,
        rules = rules :+ omRule,
        tagRules = (rules :+ omRule).collect { case t: FromTag => t },
        routes = routes,
        partitionCol = cfg.partition_col,
        warehouseDir = warehouseDir),
      cfg.schema_name,
      cfg.retention_days.getOrElse(graft.operators.Maintenance.defaultRetentionDays),
      cfg.library_name,
      cfg.library_version)
  }

  /** Compile straight from the reference's native entry point — the
    * Chill conf workbook + HLD workbook ([[WorkbookConfig.load]]).
    */
  def compileWorkbooks(spark: SparkSession, chillXlsx: String, hldXlsx: String,
                       warehouseDir: String): Compiled =
    compile(spark, WorkbookConfig.load(chillXlsx, hldXlsx).cfg, warehouseDir)

  /** load + compile in one step. */
  def loadAndCompile(spark: SparkSession, path: String, warehouseDir: String): Compiled =
    compile(spark, load(spark, path), warehouseDir)
}
