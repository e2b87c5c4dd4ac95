package graft.etl

import graft.etl.ConfigFile._

/** Native workbook ingestion — the reference's actual entry point is
  * two Excel workbooks: the Chill conf sheet (scalar settings, field
  * specs keyed by counter-set, views; Partrans.parse_conf_file,
  * Partrans.py:38-96) and the HLD functional spec (Front Page,
  * Library Info, Tables, Key_Counters_Kpis; ParseHLD.py:8-63). This
  * module parses both through [[Xlsx]] and compiles them into the
  * same [[ConfigFile.ChillConfig]] the JSON rendition feeds, so
  * `ConfigFile.compile` (and the whole library cycle) is shared
  * between the two entry points.
  *
  * Faithfulness notes:
  *  - Chill scalars (`library`, `schema`, `format`, `delimiter`,
  *    `input_rd`, `input_rd_mask`, `valid_lines`, `ignore_lines`)
  *    are rows of (key, value) until the `field` / `view` markers
  *    flip the section, exactly like the reference's row scan.
  *  - `valid_lines` uses Python slice syntax (`[2:-1]` — drop 2
  *    header lines, 1 trailer) and maps to skip_header/skip_footer.
  *  - filename/tag field functions in a real workbook are Python
  *    eval strings of the shape `re.search('pat', arg1).group(n)`
  *    (calc_field, Partrans.py:145-157); the pattern and group are
  *    extracted STRUCTURALLY — never eval'd — and become the same
  *    regexp_extract rules the JSON path compiles.
  *  - lookup functions of the shape
  *    `view[(view['K1']==arg1) & (view['K2']==arg2)]['V'].values[0]`
  *    (Partrans.py:174-200) are likewise parsed into view_keys +
  *    value_col and become a broadcast left join with default.
  *  - `column`-source functions must be SQL fragments (the Spark-
  *    first contract shared with the JSON path): Catalyst compiles
  *    them once per plan instead of eval'ing per row.
  *  - HLD `Tables` / `Key_Counters_Kpis` are parsed in the
  *    reference's table shape (`df.iloc[2:,1:]`: header labels in
  *    row 0 from column B, data from row 3). Non-KPI counter rows
  *    whose raw name differs from the DB name become rename rules;
  *    TYPE=KPI rows become post-route formula columns. `Library
  *    Info` rows after the `Table Retention:` marker (which the
  *    reference's scan stops at) are parsed as suffix→days retention.
  */
object WorkbookConfig {

  /** HLD front-matter the reference reads from Front Page + Library
    * Info (library name, version, vendor) — carried into report and
    * physical table naming like chill.py's LIBRARY_NAME (chill.py:
    * 63-91).
    */
  final case class LibraryMeta(name: Option[String], version: Option[String],
                               vendor: Option[String])

  final case class Parsed(cfg: ChillConfig, meta: LibraryMeta,
                          frontPage: Map[String, String],
                          libraryInfo: Map[String, String])

  /** Parse the Chill conf workbook + HLD workbook into a ChillConfig. */
  def load(chillPath: String, hldPath: String): Parsed = {
    val chill = Workbooks.read(chillPath).getOrElse("Chill",
      throw new IllegalArgumentException(s"$chillPath: no 'Chill' sheet")).dropBlankRows
    // HLD sheets keep their raw row positions: parse_table slices
    // `df.iloc[2:,1:]` without dropna (ParseHLD.py:40-49), so a blank
    // spacer row is load-bearing for the data offset
    val hldSheets = Workbooks.read(hldPath)
    def hld(name: String) = hldSheets.getOrElse(name,
      throw new IllegalArgumentException(s"$hldPath: no '$name' sheet"))

    val (scalars, fields, views, omGroup) = parseChill(chill)
    val frontPage = parseFrontPage(hld("Front Page"))
    val (libraryInfo, retention) = parseLibraryInfo(hld("Library Info"))
    val tables = parseTables(hld("Tables"), hld("Key_Counters_Kpis"))

    val (initial, fin) = parseValidLines(scalars.getOrElse("valid_lines", "[:]"))
    // direct counters: HLD rows whose raw name differs from the DB
    // name are renames the reference performs per file (Partrans.py:
    // 281-292); one derived rule each, collision-checked across tables
    val renames = tables.flatMap(_.renames).distinct
    renames.groupBy(_._2).foreach { case (db, pairs) =>
      require(pairs.map(_._1).distinct.size == 1,
        s"column '$db' maps from multiple raw counters ${pairs.map(_._1).distinct.mkString(", ")}; " +
          "per-table raw names for one DB name are not supported")
    }
    // a Chill field row that names the same DB column is the explicit
    // transform — it wins over the implicit HLD rename (appending
    // both would let the later rename silently clobber the transform)
    val chillNames = fields.map(_.name).toSet
    val renameFields = renames.collect {
      case (raw, db) if raw != db && !chillNames.contains(db) =>
        FieldSpec(db, "column", None, None, Some(raw), Some("arg1"),
          None, None, None, None, None, None)
    }

    val meta = LibraryMeta(
      name = scalars.get("library")
        .orElse(frontPage.get("Library Name")).orElse(libraryInfo.get("Library Name")),
      version = frontPage.get("Version").orElse(libraryInfo.get("Version")),
      vendor = frontPage.get("Vendor").orElse(libraryInfo.get("Vendor")))

    // absent raw_columns (the reference's normal case — its read_csv
    // takes column names from the feed's own header line) = empty,
    // which ChillPipeline.rawCsv resolves by peeking that header;
    // guessing names from HLD rename rows would invent an ordering
    // the physical feed never promised
    val rawColumns = scalars.get("raw_columns")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)

    val cfg = ChillConfig(
      input_path = joinPath(
        scalars.getOrElse("input_rd", "."), scalars.getOrElse("input_rd_mask", "*")),
      format = scalars.getOrElse("format", "csv"),
      delimiter = scalars.getOrElse("delimiter", ","),
      raw_columns = rawColumns,
      skip_header = initial,
      skip_footer = fin,
      ignore_lines = scalars.get("ignore_lines")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq),
      schema_name = scalars.getOrElse("schema", "DEFAULT"),
      om_group = omGroup.getOrElse(
        throw new IllegalArgumentException(s"$chillPath: no OM_GROUP field row")),
      views = if (views.isEmpty) None else Some(views),
      fields = fields ++ renameFields,
      tables = tables.map(_.spec),
      partition_col = scalars.getOrElse("partition_col", "DATETIME"),
      retention_days = if (retention.isEmpty) None else Some(retention),
      library_name = meta.name,
      library_version = meta.version)
    Parsed(cfg, meta, frontPage, libraryInfo)
  }

  private def joinPath(dir: String, mask: String): String =
    if (dir.endsWith("/")) dir + mask else s"$dir/$mask"

  // ---------------------------------------------------------------
  // Chill sheet
  // ---------------------------------------------------------------

  /** The reference's section scan (Partrans.py:49-96): rows are
    * scalars until a `field` or `view` marker row flips the mode.
    */
  private def parseChill(sheet: Xlsx.Sheet)
      : (Map[String, String], Seq[FieldSpec], Seq[ViewSpec], Option[FieldSpec]) = {
    val scalars = scala.collection.mutable.LinkedHashMap[String, String]()
    val fields = scala.collection.mutable.ArrayBuffer[FieldSpec]()
    val views = scala.collection.mutable.ArrayBuffer[ViewSpec]()
    var omGroup: Option[FieldSpec] = None
    var mode = "" // "", "field", "view"
    for (r <- sheet.rows.indices) {
      def c(i: Int): Option[String] = sheet.cell(r, i).map(_.trim).filter(_.nonEmpty)
      c(0) match {
        case None => // blank first cell: ignored, like the reference
        case Some("field") => mode = "field"
        case Some("view")  => mode = "view"
        case Some(key) if mode == "view" =>
          views += ViewSpec(key, c(1).getOrElse(
            throw new IllegalArgumentException(s"view $key: missing sql")))
        case Some("OM_GROUP") if mode == "field" =>
          // OM_GROUP row: source, tag, column(inputs), value, function
          // (Partrans.py:70-77)
          omGroup = Some(fieldSpec("OM_GROUP", source = c(1), tag = c(2),
            inputs = c(3), value = c(4), function = c(5), view = None, default = None))
        case Some(name) if mode == "field" =>
          // field row: source, tag, inputs, value, function, view,
          // default, cs (Partrans.py:78-90). cs (counter-set) scopes
          // a field to one table; the repo computes all fields pre-
          // route and lets each route's column list project, which is
          // result-identical while names are unique (checked below).
          fields += fieldSpec(name, source = c(1), tag = c(2), inputs = c(3),
            value = c(4), function = c(5), view = c(6), default = c(7))
        case Some(key) =>
          // a blank value cell means "not configured": omitting lets
          // every downstream default apply, where storing "" would
          // defeat it (e.g. delimiter "" splits between every char)
          c(1).foreach(v => scalars += key -> v)
      }
    }
    val dup = fields.groupBy(_.name).collect { case (n, fs) if fs.size > 1 => n }
    require(dup.isEmpty,
      s"fields ${dup.mkString(", ")} are defined in multiple counter-sets with the same name")
    (scalars.toMap, fields.toSeq, views.toSeq, omGroup)
  }

  /** `re.search('pat', X).group(n)` / `re.match(...)` →
    * (pattern, group). The eval string is parsed, never executed.
    */
  private val ReSearch =
    """re\.(?:search|match)\(\s*r?['"](.+?)['"]\s*,[^)]*\)\s*\.group\((\d+)\)""".r
  /** `view['K']==argN` condition inside a lookup eval string. */
  private val ViewKey = """view\[['"]([A-Za-z0-9_]+)['"]\]\s*==\s*arg(\d+)""".r
  /** trailing `['V'].values[0]` of a lookup eval string. */
  private val ViewValue = """\[['"]([A-Za-z0-9_]+)['"]\]\s*\.values\[0\]""".r

  private def fieldSpec(name: String, source: Option[String], tag: Option[String],
                        inputs: Option[String], value: Option[String],
                        function: Option[String], view: Option[String],
                        default: Option[String]): FieldSpec = {
    val src = source.getOrElse(
      throw new IllegalArgumentException(s"field $name: missing source")).toLowerCase
    src match {
      case "filename" | "tag" =>
        val f = function.getOrElse(
          throw new IllegalArgumentException(s"field $name ($src): missing function"))
        val (pattern, group) = ReSearch.findFirstMatchIn(f)
          .map(m => (m.group(1), m.group(2).toInt))
          // plain-regex form: the function cell holds the pattern
          // itself — but an re.* eval string the regex above could
          // not parse must fail loudly, not degrade into a pattern
          // that never matches anything
          .getOrElse {
            require(!f.trim.startsWith("re."),
              s"field $name ($src): cannot parse regex eval '$f' structurally")
            (f, 1)
          }
        FieldSpec(name, src, value, tag, inputs, None,
          Some(pattern), Some(group), None, None, None, None)
      case "lookup" =>
        val f = function.getOrElse(
          throw new IllegalArgumentException(s"field $name (lookup): missing function"))
        val keyByArg = ViewKey.findAllMatchIn(f).map(m => m.group(2).toInt -> m.group(1)).toSeq
        require(keyByArg.nonEmpty, s"field $name: cannot parse lookup keys from '$f'")
        val valueCol = ViewValue.findFirstMatchIn(f).map(_.group(1)).getOrElse(
          throw new IllegalArgumentException(s"field $name: cannot parse value column from '$f'"))
        // view_keys ordered by argN to line up with the inputs list
        val viewKeys = keyByArg.sortBy(_._1).map(_._2)
        FieldSpec(name, src, value, tag, inputs, None, None, None,
          view, Some(viewKeys.mkString(",")), Some(valueCol), default)
      case _ =>
        FieldSpec(name, src, value, tag, inputs, function,
          None, None, view, None, None, default)
    }
  }

  /** Python slice `[a:b]` → (skip_header, skip_footer). `b` may be
    * negative (drop from the end) or absent.
    */
  private[graft] def parseValidLines(s: String): (Int, Int) = {
    val body = s.trim.stripPrefix("[").stripSuffix("]")
    val parts = body.split(":", -1)
    require(parts.length == 2, s"valid_lines '$s' is not a [start:end] slice")
    val start = if (parts(0).trim.isEmpty) 0 else parts(0).trim.toInt
    val end = if (parts(1).trim.isEmpty) 0 else {
      val v = parts(1).trim.toInt
      require(v < 0, s"valid_lines '$s': absolute end offsets are not supported, use negative")
      -v
    }
    (start, end)
  }

  // ---------------------------------------------------------------
  // HLD sheets
  // ---------------------------------------------------------------

  /** Front Page: (key, value) down columns A,B until the Revision
    * History marker (ParseHLD.py:8-21).
    */
  private def parseFrontPage(sheet: Xlsx.Sheet): Map[String, String] =
    kvScan(sheet, keyCol = 0, valueCol = 1, stopAt = "Revision History")._1

  /** Library Info: (key, value) down columns B,C; rows before the
    * `Table Retention:` marker are metadata (ParseHLD.py:23-38), rows
    * after it are suffix→days retention the reference leaves to the
    * warehouse (the repo's retention sweep consumes them directly).
    */
  private def parseLibraryInfo(sheet: Xlsx.Sheet): (Map[String, String], Map[String, Int]) = {
    val (meta, rest) = kvScan(sheet, keyCol = 1, valueCol = 2, stopAt = "Table Retention:")
    val retention = rest.flatMap { case (k, v) =>
      // numeric days only; tolerate "3650.0" from Excel numeric cells
      scala.util.Try(v.trim.toDouble.toInt).toOption.map(k.stripSuffix(":").trim -> _)
    }
    (meta, retention.toMap)
  }

  private def kvScan(sheet: Xlsx.Sheet, keyCol: Int, valueCol: Int, stopAt: String)
      : (Map[String, String], Seq[(String, String)]) = {
    val before = scala.collection.mutable.LinkedHashMap[String, String]()
    val after = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var stopped = false
    for (r <- sheet.rows.indices) {
      (sheet.cell(r, keyCol).map(_.trim).filter(_.nonEmpty),
        sheet.cell(r, valueCol).map(_.trim)) match {
        case (Some(k), _) if k == stopAt => stopped = true
        case (Some(k), Some(v)) => if (stopped) after += k -> v else before += k -> v
        case _ =>
      }
    }
    (before.toMap, after.toSeq)
  }

  private final case class ParsedTable(spec: TableSpec, renames: Seq[(String, String)])

  /** Tables + Key_Counters_Kpis in the reference's table shape
    * (parse_table, ParseHLD.py:40-49: labels in row 0 from column B,
    * data from row 3). Tables columns: Counter Group in RD, Table
    * Name, Base Granularity. Counter columns: Table Name, Counter/KPI
    * DB Name, Raw Data Counter Name/OID, TYPE (+ optional Inputs /
    * KPI Formula for TYPE=KPI rows, which Partrans skips and defers
    * to warehouse aggregation — the repo computes them post-route).
    */
  private def parseTables(tables: Xlsx.Sheet, counters: Xlsx.Sheet): Seq[ParsedTable] = {
    val tRows = tableRows(tables)
    val cRows = tableRows(counters)
    def col(rows: (Map[String, Int], Seq[Vector[Option[String]]]), row: Vector[Option[String]],
            name: String): Option[String] =
      rows._1.get(name).flatMap(i => if (i < row.length) row(i) else None)
        .map(_.trim).filter(_.nonEmpty)

    tRows._2.flatMap { tr =>
      for {
        omGroup <- col(tRows, tr, "Counter Group in RD")
        table <- col(tRows, tr, "Table Name")
        gran <- col(tRows, tr, "Base Granularity")
      } yield {
        val mine = cRows._2.filter(cr => col(cRows, cr, "Table Name").contains(table))
        val direct = mine.filter(cr => !col(cRows, cr, "TYPE").contains("KPI"))
        val columns = direct.flatMap(cr => col(cRows, cr, "Counter/KPI DB Name"))
        val renames = direct.flatMap { cr =>
          for {
            db <- col(cRows, cr, "Counter/KPI DB Name")
            raw <- col(cRows, cr, "Raw Data Counter Name/OID")
          } yield raw -> db
        }
        val kpis = mine.filter(cr => col(cRows, cr, "TYPE").contains("KPI")).flatMap { cr =>
          for {
            name <- col(cRows, cr, "Counter/KPI DB Name")
            formula <- col(cRows, cr, "KPI Formula")
          } yield FieldSpec(name, "column", None, None,
            col(cRows, cr, "Raw Data Counter Name/OID").orElse(col(cRows, cr, "Inputs")),
            Some(formula), None, None, None, None, None, None)
        }
        ParsedTable(
          TableSpec(omGroup, table, gran, columns,
            if (kpis.isEmpty) None else Some(kpis)),
          renames)
      }
    }
  }

  /** (label → column index, data rows) in the reference's
    * `df.iloc[2:,1:]` shape.
    */
  private def tableRows(sheet: Xlsx.Sheet): (Map[String, Int], Seq[Vector[Option[String]]]) = {
    require(sheet.rows.nonEmpty, s"sheet ${sheet.name} is empty")
    val header = sheet.rows.head.zipWithIndex.collect {
      case (Some(label), i) if i >= 1 && label.trim.nonEmpty => label.trim -> i
    }.toMap
    (header, sheet.rows.drop(3))
  }
}
