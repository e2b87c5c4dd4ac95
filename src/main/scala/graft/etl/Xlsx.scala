package graft.etl

import java.io.InputStream
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable

/** Minimal XLSX (ECMA-376 / OOXML SpreadsheetML) reader built on the
  * JDK only — `java.util.zip` for the package and StAX for the XML
  * parts. The reference's entry point is the Chill/HLD workbook
  * itself (`pd.ExcelFile`, Partrans.py:40, ParseHLD.py:57); this
  * gives the repo the same native entry point without an external
  * dependency.
  *
  * Scope (deliberately small, driver-side config parsing only — a
  * workbook is a few KB of settings, never data): cell values as
  * strings, shared strings, inline strings, booleans and numbers;
  * sheets resolved by name through the workbook relationships. No
  * styles, no formula re-evaluation (a formula cell yields its cached
  * `<v>` value, which is what pandas/xlrd expose too).
  */
object Xlsx {

  /** One parsed sheet: dense row-major cells, `None` for blanks.
    * Rows are padded to each row's last occupied column only; callers
    * index with [[Sheet.cell]] which bounds-checks.
    */
  final case class Sheet(name: String, rows: Vector[Vector[Option[String]]]) {
    def cell(r: Int, c: Int): Option[String] =
      if (r < rows.length && c < rows(r).length) rows(r)(c) else None
    /** Drop rows whose every cell is blank (pandas `dropna(how='all')`). */
    def dropBlankRows: Sheet = copy(rows = rows.filter(_.exists(_.isDefined)))
  }

  /** Read every sheet of the workbook at `path`, by sheet name. */
  def read(path: String): Map[String, Sheet] = {
    val zip = new ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip.getInputStream(e)))
        .getOrElse(Vector.empty)
      val rels = Option(zip.getEntry("xl/_rels/workbook.xml.rels"))
        .map(e => parseRels(zip.getInputStream(e)))
        .getOrElse(Map.empty)
      val sheets = parseWorkbook(zip.getInputStream(zip.getEntry("xl/workbook.xml")))
      sheets.map { case (name, rid) =>
        val target = rels.getOrElse(rid,
          throw new IllegalArgumentException(s"$path: sheet '$name' has no relationship $rid"))
        val entryName = if (target.startsWith("/")) target.drop(1) else s"xl/$target"
        val entry = Option(zip.getEntry(entryName)).getOrElse(
          throw new IllegalArgumentException(s"$path: missing worksheet part $entryName"))
        name -> Sheet(name, parseSheet(zip.getInputStream(entry), shared))
      }.toMap
    } finally zip.close()
  }

  private def reader(in: InputStream): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    // config files are trusted local fixtures, but there is no reason
    // to resolve external entities from a spreadsheet either
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(in)
  }

  /** workbook.xml: `<sheet name=".." r:id="rIdN"/>` in order. */
  private def parseWorkbook(in: InputStream): Seq[(String, String)] = {
    val r = reader(in)
    val out = mutable.ArrayBuffer[(String, String)]()
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          var name: String = null; var rid: String = null
          for (i <- 0 until r.getAttributeCount) r.getAttributeLocalName(i) match {
            case "name" => name = r.getAttributeValue(i)
            case "id"   => rid = r.getAttributeValue(i) // r:id — local name is "id"
            case _      =>
          }
          if (name != null && rid != null) out += name -> rid
        }
      }
    } finally r.close()
    out.toSeq
  }

  /** workbook.xml.rels: `<Relationship Id=".." Target="worksheets/sheetN.xml"/>` */
  private def parseRels(in: InputStream): Map[String, String] = {
    val r = reader(in)
    val out = mutable.Map[String, String]()
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship") {
          var id: String = null; var target: String = null
          for (i <- 0 until r.getAttributeCount) r.getAttributeLocalName(i) match {
            case "Id"     => id = r.getAttributeValue(i)
            case "Target" => target = r.getAttributeValue(i)
            case _        =>
          }
          if (id != null && target != null) out += id -> target
        }
      }
    } finally r.close()
    out.toMap
  }

  /** sharedStrings.xml: each `<si>` concatenates its `<t>` runs
    * (plain and rich-text strings both land here).
    */
  private def parseSharedStrings(in: InputStream): Vector[String] = {
    val r = reader(in)
    val out = mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    var inRph = false // phonetic runs (<rPh>) are guides, not content
    try {
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; cur.clear()
            case "rPh" => inRph = true
            case "t" if inSi && !inRph => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inT =>
          cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "rPh" => inRph = false
            case "t" => inT = false
            case "si" => inSi = false; out += cur.toString
            case _ =>
          }
        case _ =>
      }
    } finally r.close()
    out.toVector
  }

  /** Worksheet cells. Handles cell types `s` (shared string index),
    * `inlineStr` (`<is><t>`), `str` (formula cached string), `b`
    * (boolean) and the default numeric type. A1-style refs place the
    * value; missing refs fall back to "next column" like writers that
    * omit them.
    */
  private def parseSheet(in: InputStream, shared: Vector[String]): Vector[Vector[Option[String]]] = {
    val r = reader(in)
    val rows = mutable.ArrayBuffer[Vector[Option[String]]]()
    var row: mutable.ArrayBuffer[Option[String]] = null
    var rowIndex = -1 // 0-based index of the row being built
    var nextCol = 0
    var cellCol = -1
    var cellType = ""
    var inV = false
    var inIsT = false
    val text = new StringBuilder
    def pad(to: Int): Unit = while (row.length < to) row += None

    def setCell(): Unit = {
      val raw = text.toString
      val value = cellType match {
        case "s"   => shared(raw.trim.toInt)
        case "b"   => if (raw.trim == "1") "true" else "false"
        case _     => raw
      }
      pad(cellCol)
      if (row.length == cellCol) row += Some(value) else row(cellCol) = Some(value)
    }

    try {
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              // honor the sparse `r` attribute: absent rows are blank
              val declared = Option(r.getAttributeValue(null, "r")).map(_.toInt - 1)
              val target = declared.getOrElse(rowIndex + 1)
              while (rows.length < target) rows += Vector.empty
              rowIndex = target
              row = mutable.ArrayBuffer[Option[String]]()
              nextCol = 0
            case "c" =>
              cellCol = Option(r.getAttributeValue(null, "r"))
                .map(ref => colIndex(ref)).getOrElse(nextCol)
              nextCol = cellCol + 1
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              text.clear()
            case "v" => inV = true
            case "t" if cellType == "inlineStr" => inIsT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inV || inIsT =>
          text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "t" if inIsT => inIsT = false
            case "c" =>
              if (text.nonEmpty || cellType == "inlineStr") setCell()
              cellCol = -1; cellType = ""
            case "row" =>
              rows += row.toVector
              row = null
            case _ =>
          }
        case _ =>
      }
    } finally r.close()
    rows.toVector
  }

  /** "BC7" → 0-based column 54. */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }
}
