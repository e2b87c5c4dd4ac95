package graft.etl

import java.io.DataInputStream
import java.nio.file.{Files, Paths}

/** Format-sniffing workbook entry point: the reference hands
  * `pd.ExcelFile` either the modern OOXML package or the legacy
  * binary workbook (Partrans.py:44, ParseHLD.py:58) and pandas picks
  * the engine from the file itself. Same here — dispatch on the magic
  * bytes, not the extension (real deployments rename files freely).
  */
object Workbooks {

  /** Read every sheet of the workbook at `path`, `.xlsx` or `.xls`. */
  def read(path: String): Map[String, Xlsx.Sheet] = {
    val magic = new Array[Byte](4)
    val in = new DataInputStream(Files.newInputStream(Paths.get(path)))
    try in.readFully(magic)
    finally in.close()
    magic match {
      case Array(0x50, 0x4B, _, _) => Xlsx.read(path) // "PK": zip/OOXML
      case Array(-0x30, -0x31, 0x11, -0x20) => Xls.read(path) // D0 CF 11 E0: OLE2
      case _ => throw new IllegalArgumentException(
        s"$path: neither an OOXML package nor an OLE2 compound file " +
          f"(magic ${magic.map(b => f"${b & 0xFF}%02X").mkString(" ")})")
    }
  }
}
