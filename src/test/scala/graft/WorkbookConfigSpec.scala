package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl._

/** Native workbook ingestion: the checked-in .xlsx fixtures (written
  * by tools/make_xlsx_fixture.py with the Python stdlib only — an
  * independent OOXML producer) must compile to the SAME ChillConfig
  * as the JSON rendition, and drive the full library cycle. The
  * legacy .xls pair (written by tools/make_xls_fixture.py, an
  * independent BIFF8/CFB producer sharing only the logical content)
  * must parse cell-identically through [[Xls]].
  */
class WorkbookConfigSpec extends AnyFunSuite {
  import SparkTestSession._

  private val chillXlsx = "src/main/resources/graft/fixtures/chill_conf.xlsx"
  private val hldXlsx = "src/main/resources/graft/fixtures/hld.xlsx"
  private val chillXls = "src/main/resources/graft/fixtures/chill_conf.xls"
  private val hldXls = "src/main/resources/graft/fixtures/hld.xls"

  private def writeRaw(dir: java.nio.file.Path, name: String, region: String,
                       rows: Seq[(Int, String, Int)]): Unit =
    java.nio.file.Files.writeString(dir.resolve(name),
      s"#REGION=$region\nid|grp|cnt\n" +
        rows.map { case (i, g, c) => s"$i|$g|$c" }.mkString("\n") +
        "\nJUNK\nTRAILER")

  test("xlsx cells: shared strings, inline strings, numbers, sparse refs") {
    val sheets = Xlsx.read(chillXlsx)
    val chill = sheets("Chill")
    assert(chill.cell(0, 0).contains("library") && chill.cell(0, 1).contains("PM_LIB_WB"))
    // the delimiter value is written as an inlineStr cell
    assert(chill.cell(3, 1).contains("|"))
    val li = Xlsx.read(hldXlsx)("Library Info")
    // numeric retention cell, column C of a row that skips column A
    assert(li.cell(4, 1).contains("5M") && li.cell(4, 2).contains("30"))
    assert(Xlsx.colIndex("A1") == 0 && Xlsx.colIndex("BC7") == 54)
  }

  test("shared strings skip phonetic rPh runs (Excel furigana guides)") {
    // minimal hand-built package: a shared string with an <rPh> run
    // must yield the base text only, the way pandas/xlrd read it
    val f = java.nio.file.Files.createTempFile("rph", ".xlsx")
    val zip = new java.util.zip.ZipOutputStream(java.nio.file.Files.newOutputStream(f))
    def entry(name: String, body: String): Unit = {
      zip.putNextEntry(new java.util.zip.ZipEntry(name))
      zip.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    entry("xl/workbook.xml",
      """<workbook xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<Relationships><Relationship Id="rId1" Target="worksheets/sheet1.xml"/></Relationships>""")
    entry("xl/sharedStrings.xml",
      """<sst><si><t>東京</t><rPh sb="0" eb="2"><t>トウキョウ</t></rPh></si></sst>""")
    entry("xl/worksheets/sheet1.xml",
      """<worksheet><sheetData><row r="2"><c r="B2" t="s"><v>0</v></c></row></sheetData></worksheet>""")
    zip.close()
    try assert(Xlsx.read(f.toString)("S").cell(1, 1).contains("東京"))
    finally java.nio.file.Files.delete(f)
  }

  test("legacy .xls BIFF8 fixtures parse cell-identically to the .xlsx pair") {
    assert(Xls.read(chillXls) == Xlsx.read(chillXlsx))
    assert(Xls.read(hldXls) == Xlsx.read(hldXlsx))
    // the hld fixture's SST is split mid-UTF-16-string by a CONTINUE
    // record; prove the wide string crossed the boundary intact
    val ent = Xls.read(hldXls)("Entities")
    assert(ent.cell(3, 2).contains("counter group 東京"))
    // MULRK run, NUMBER (non-integer) and BOOLERR cells
    assert(ent.cell(4, 1).contains("10") && ent.cell(4, 3).contains("300"))
    assert(ent.cell(5, 1).contains("2.5") && ent.cell(5, 2).contains("true"))
  }

  test(".xls workbook pair drives the identical parse via magic-byte dispatch") {
    assert(WorkbookConfig.load(chillXls, hldXls) == WorkbookConfig.load(chillXlsx, hldXlsx))
    val junk = java.nio.file.Files.createTempFile("junk", ".xls")
    java.nio.file.Files.write(junk, "not a workbook at all".getBytes)
    try intercept[IllegalArgumentException](Workbooks.read(junk.toString))
    finally java.nio.file.Files.delete(junk)
  }

  test("valid_lines python slices map to skip_header/skip_footer") {
    assert(WorkbookConfig.parseValidLines("[2:-1]") == ((2, 1)))
    assert(WorkbookConfig.parseValidLines("[:]") == ((0, 0)))
    assert(WorkbookConfig.parseValidLines("[3:]") == ((3, 0)))
    assert(WorkbookConfig.parseValidLines("[:-2]") == ((0, 2)))
  }

  test("workbook pair compiles to the identical ChillConfig as the JSON rendition") {
    val parsed = WorkbookConfig.load(chillXlsx, hldXlsx)
    val fromJson = ConfigFile.load(spark, "src/test/resources/chill_config.json")
    // library metadata is the workbook path's extra signal — compare
    // the shared surface exactly, then the metadata on its own
    assert(parsed.cfg.copy(library_name = None, library_version = None) == fromJson)
    assert(parsed.meta == WorkbookConfig.LibraryMeta(
      Some("PM_LIB_WB"), Some("2.1"), Some("ACME")))
    assert(parsed.frontPage.get("Vendor").contains("ACME"))
    // the Revision History section is excluded, like ParseHLD's break
    assert(!parsed.frontPage.contains("1.0"))
    assert(parsed.libraryInfo.get("Schema").contains("PM_SCHEMA"))
  }

  test("workbook-driven library run loads and reconciles clean") {
    val rawDir = java.nio.file.Files.createTempDirectory("wb_raw")
    val wh = java.nio.file.Files.createTempDirectory("wb_wh").toString
    writeRaw(rawDir, "F_20240101.csv", "EAST", Seq((1, "A", 10), (2, "B", 20), (3, "A", 30)))
    writeRaw(rawDir, "F_20240102.csv", "WEST", Seq((4, "A", 40), (5, "B", 50)))
    import spark.implicits._
    Seq(("A", "Alpha")).toDF("g_code", "g_name").createOrReplaceTempView("grp_dim")

    val parsed = WorkbookConfig.load(chillXlsx, hldXlsx)
    val compiled = ConfigFile.compile(spark,
      parsed.cfg.copy(input_path = rawDir.toString + "/*.csv"), wh)
    // reference-style naming composed from the workbook metadata
    assert(compiled.libraryName.contains("PM_LIB_WB"))
    assert(compiled.physicalName("TBL_A_5M") == "PM_SCHEMA.TBL_A_5M")
    assert(compiled.reportFileName == "PM_LIB_WB_test_report.xml")

    val result = LibraryRun.runCompiled(spark, compiled, keyCols = Seq("day", "idn"))
    // the junit report lands under the workbook's library name
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(wh, "PM_LIB_WB_test_report.xml")).contains("<testsuite"))
    assert(result.tables.keySet == Set("TBL_A_5M", "TBL_B_5M"))
    val a = result.tables("TBL_A_5M").collect()
    assert(a.length == 3)
    assert(a.forall(_.getAs[String]("grp_name") == "Alpha"))
    val r4 = a.find(_.getAs[Long]("idn") == 4L).get
    assert(r4.getAs[String]("region") == "WEST")
    assert(r4.getAs[Long]("cnt10") == 404L)
    assert(r4.getAs[Double]("cnt_per_id") == 101.0)
    assert(result.report.filter(col("status") === "failed").count() == 0, result.junitXml)
  }
}
