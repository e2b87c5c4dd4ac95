package graft.etl

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** Minimal legacy `.xls` (BIFF8) reader built on the JDK only — the
  * OLE2/CFB compound container ([MS-CFB]) plus the BIFF8 record
  * stream ([MS-XLS]). Real deployments of the reference feed it the
  * original binary workbooks through `pd.ExcelFile`
  * (Partrans.py:44, ParseHLD.py:58), which accepts both formats;
  * this gives [[WorkbookConfig]] the same reach without xlrd/POI.
  *
  * Scope mirrors [[Xlsx]] (driver-side config parsing, values as
  * strings): LABELSST/LABEL strings, NUMBER/RK/MULRK numerics,
  * BOOLERR booleans, FORMULA cached values (+ trailing STRING
  * record), SST with CONTINUE splits — including the mid-string
  * split where the continuation re-states the compression flag.
  * Error cells and styles are ignored. BIFF5/7 ("Book" stream,
  * pre-unicode strings) is rejected loudly rather than misread.
  */
object Xls {

  /** Read every sheet of the `.xls` workbook at `path`, by name. */
  def read(path: String): Map[String, Xlsx.Sheet] =
    readBytes(Files.readAllBytes(Paths.get(path)), path)

  def readBytes(file: Array[Byte], label: String): Map[String, Xlsx.Sheet] = {
    val wb = Cfb.stream(file, label)
    val (sheets, sst) = parseGlobals(wb, label)
    sheets.map { case (name, offset) =>
      name -> Xlsx.Sheet(name, parseSheet(wb, offset, sst, label))
    }.toMap
  }

  // ---------------------------------------------------------------
  // CFB compound container ([MS-CFB])
  // ---------------------------------------------------------------

  private object Cfb {
    private val EndOfChain = 0xFFFFFFFE
    private val FreeSect = 0xFFFFFFFF

    /** Extract the "Workbook" stream from a compound file. */
    def stream(file: Array[Byte], label: String): Array[Byte] = {
      require(file.length >= 512 &&
        (file(0) & 0xFF) == 0xD0 && (file(1) & 0xFF) == 0xCF &&
        (file(2) & 0xFF) == 0x11 && (file(3) & 0xFF) == 0xE0,
        s"$label: not an OLE2 compound file (bad signature)")
      val buf = ByteBuffer.wrap(file).order(ByteOrder.LITTLE_ENDIAN)
      val sectorShift = buf.getShort(30)
      val sectorSize = 1 << sectorShift
      val miniShift = buf.getShort(32)
      val miniSize = 1 << miniShift
      val firstDirSector = buf.getInt(48)
      val miniCutoff = buf.getInt(56)
      val firstMiniFat = buf.getInt(60)
      val firstDifat = buf.getInt(68)

      def sector(n: Int): Int = 512 + n * sectorSize // header is always 512

      // FAT = sectors named by the 109 header DIFAT entries + DIFAT chain
      val fatSectors = mutable.ArrayBuffer[Int]()
      for (i <- 0 until 109) {
        val s = buf.getInt(76 + 4 * i)
        if (s != FreeSect && s != EndOfChain) fatSectors += s
      }
      var difat = firstDifat
      val perDifat = sectorSize / 4 - 1
      while (difat != EndOfChain && difat != FreeSect) {
        val base = sector(difat)
        for (i <- 0 until perDifat) {
          val s = buf.getInt(base + 4 * i)
          if (s != FreeSect && s != EndOfChain) fatSectors += s
        }
        difat = buf.getInt(base + 4 * perDifat)
      }
      val fat = new Array[Int](fatSectors.length * (sectorSize / 4))
      for ((s, i) <- fatSectors.zipWithIndex; j <- 0 until sectorSize / 4)
        fat(i * (sectorSize / 4) + j) = buf.getInt(sector(s) + 4 * j)

      def chain(start: Int, next: Int => Int): Seq[Int] = {
        val out = mutable.ArrayBuffer[Int]()
        var s = start
        var guard = 0
        while (s != EndOfChain && s != FreeSect) {
          require(guard < (1 << 20), s"$label: cyclic sector chain")
          out += s; s = next(s); guard += 1
        }
        out.toSeq
      }

      def readChain(start: Int): Array[Byte] = {
        val secs = chain(start, fat)
        val out = new Array[Byte](secs.length * sectorSize)
        for ((s, i) <- secs.zipWithIndex)
          System.arraycopy(file, sector(s), out, i * sectorSize, sectorSize)
        out
      }

      // directory entries: 128 bytes each
      val dir = readChain(firstDirSector)
      val dbuf = ByteBuffer.wrap(dir).order(ByteOrder.LITTLE_ENDIAN)
      final case class Entry(name: String, objType: Int, start: Int, size: Long)
      val entries = (0 until dir.length / 128).map { i =>
        val off = i * 128
        val nameLen = dbuf.getShort(off + 64) & 0xFFFF
        val name =
          if (nameLen >= 2)
            new String(dir, off, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
          else ""
        Entry(name, dir(off + 66) & 0xFF, dbuf.getInt(off + 116),
          dbuf.getLong(off + 120) & 0xFFFFFFFFL)
      }

      val root = entries.find(_.objType == 5).getOrElse(
        throw new IllegalArgumentException(s"$label: compound file has no root entry"))
      val wb = entries.find(e => e.objType == 2 && e.name == "Workbook").getOrElse {
        if (entries.exists(e => e.objType == 2 && e.name == "Book"))
          throw new IllegalArgumentException(
            s"$label: BIFF5/7 'Book' stream (Excel 5.0/95) is not supported; " +
              "re-save as Excel 97-2003 (.xls BIFF8) or .xlsx")
        throw new IllegalArgumentException(s"$label: no 'Workbook' stream in compound file")
      }

      val raw =
        if (wb.size >= miniCutoff) readChain(wb.start)
        else {
          // mini stream: 64-byte sectors inside the root entry's chain
          val mini = readChain(root.start)
          val miniFat = {
            val mf = readChain(firstMiniFat)
            val b = ByteBuffer.wrap(mf).order(ByteOrder.LITTLE_ENDIAN)
            Array.tabulate(mf.length / 4)(i => b.getInt(i * 4))
          }
          val secs = chain(wb.start, miniFat)
          val out = new Array[Byte](secs.length * miniSize)
          for ((s, i) <- secs.zipWithIndex)
            System.arraycopy(mini, s * miniSize, out, i * miniSize, miniSize)
          out
        }
      raw.take(wb.size.toInt)
    }
  }

  // ---------------------------------------------------------------
  // BIFF8 records ([MS-XLS])
  // ---------------------------------------------------------------

  private val BOF = 0x0809
  private val EOF = 0x000A
  private val BOUNDSHEET = 0x0085
  private val SST = 0x00FC
  private val CONTINUE = 0x003C
  private val NUMBER = 0x0203
  private val RK = 0x027E
  private val MULRK = 0x00BD
  private val LABELSST = 0x00FD
  private val LABEL = 0x0204
  private val BOOLERR = 0x0205
  private val FORMULA = 0x0006
  private val STRING = 0x0207

  private final case class Record(typ: Int, start: Int, len: Int)

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], o: Int): Int =
    u16(b, o) | (u16(b, o + 2) << 16)
  private def f64(b: Array[Byte], o: Int): Double =
    ByteBuffer.wrap(b, o, 8).order(ByteOrder.LITTLE_ENDIAN).getDouble

  private def records(wb: Array[Byte], from: Int): Iterator[Record] =
    new Iterator[Record] {
      private var pos = from
      def hasNext: Boolean = pos + 4 <= wb.length
      def next(): Record = {
        val r = Record(u16(wb, pos), pos + 4, u16(wb, pos + 2))
        pos = r.start + r.len
        r
      }
    }

  /** Globals substream: sheet (name, stream offset) list + SST. */
  private def parseGlobals(wb: Array[Byte], label: String): (Seq[(String, Int)], Vector[String]) = {
    val it = records(wb, 0)
    require(it.hasNext, s"$label: empty workbook stream")
    val bof = it.next()
    require(bof.typ == BOF, s"$label: workbook stream does not start with BOF")
    require(u16(wb, bof.start) == 0x0600,
      s"$label: BIFF version 0x${u16(wb, bof.start).toHexString} is not BIFF8")

    val sheets = mutable.ArrayBuffer[(String, Int)]()
    var sst = Vector.empty[String]
    var done = false
    while (it.hasNext && !done) {
      val r = it.next()
      r.typ match {
        case BOUNDSHEET =>
          val offset = u32(wb, r.start)
          // ShortXLUnicodeString: cch u8, flags u8, chars
          val cch = wb(r.start + 6) & 0xFF
          val high = (wb(r.start + 7) & 1) == 1
          val name =
            if (high) new String(wb, r.start + 8, cch * 2,
              java.nio.charset.StandardCharsets.UTF_16LE)
            else new String(wb, r.start + 8, cch,
              java.nio.charset.StandardCharsets.ISO_8859_1)
          sheets += name -> offset
        case SST =>
          // gather the SST body plus any immediately-following CONTINUEs
          val segs = mutable.ArrayBuffer[(Int, Int)]((r.start, r.len))
          var it2 = records(wb, r.start + r.len)
          var more = true
          while (more && it2.hasNext) {
            val n = it2.next()
            if (n.typ == CONTINUE) { segs += ((n.start, n.len)); it2 = records(wb, n.start + n.len) }
            else more = false
          }
          sst = parseSst(wb, segs.toSeq, label)
        case EOF => done = true
        case _ =>
      }
    }
    (sheets.toSeq, sst)
  }

  /** Cursor over a record body split across CONTINUE segments. Plain
    * fields never straddle a boundary ([MS-XLS] 2.1.4); character
    * arrays may, and the continuation opens with a fresh compression
    * flag byte.
    */
  private final class SegCursor(wb: Array[Byte], segs: Seq[(Int, Int)], label: String) {
    private var seg = 0
    private var pos = segs.head._1
    private def segEnd = segs(seg)._1 + segs(seg)._2
    private def advance(): Unit = {
      require(seg + 1 < segs.length, s"$label: SST truncated (ran past last CONTINUE)")
      seg += 1; pos = segs(seg)._1
    }
    def atEnd: Boolean = seg == segs.length - 1 && pos == segEnd
    def u8(): Int = { if (pos == segEnd) advance(); val v = wb(pos) & 0xFF; pos += 1; v }
    def u16le(): Int = u8() | (u8() << 8)
    def u32le(): Int = u16le() | (u16le() << 16)
    def skip(n: Int): Unit = {
      var left = n
      while (left > 0) {
        if (pos == segEnd) advance()
        val take = math.min(left, segEnd - pos)
        pos += take; left -= take
      }
    }
    /** Read `cch` characters honoring per-segment compression flags. */
    def chars(cch: Int, highFirst: Boolean): String = {
      val sb = new java.lang.StringBuilder(cch)
      var left = cch
      var high = highFirst
      while (left > 0) {
        if (pos == segEnd) { advance(); high = (u8() & 1) == 1 }
        val width = if (high) 2 else 1
        val avail = (segEnd - pos) / width
        val take = math.min(left, avail)
        if (high)
          sb.append(new String(wb, pos, take * 2, java.nio.charset.StandardCharsets.UTF_16LE))
        else
          sb.append(new String(wb, pos, take, java.nio.charset.StandardCharsets.ISO_8859_1))
        pos += take * width; left -= take
        require(take > 0 || pos == segEnd, s"$label: SST char run stalled")
      }
      sb.toString
    }
  }

  /** SST body: cstTotal u32, cstUnique u32, then XLUnicodeRichExtendedString*. */
  private def parseSst(wb: Array[Byte], segs: Seq[(Int, Int)], label: String): Vector[String] = {
    val cur = new SegCursor(wb, segs, label)
    cur.u32le() // cstTotal
    val unique = cur.u32le()
    val out = Vector.newBuilder[String]
    for (_ <- 0 until unique) {
      val cch = cur.u16le()
      val flags = cur.u8()
      val high = (flags & 1) == 1
      val rich = (flags & 8) == 8
      val ext = (flags & 4) == 4
      val cRun = if (rich) cur.u16le() else 0
      val cbExt = if (ext) cur.u32le() else 0
      out += cur.chars(cch, high)
      cur.skip(cRun * 4 + cbExt)
    }
    out.result()
  }

  /** One worksheet substream: BOF … cell records … matching EOF. */
  private def parseSheet(wb: Array[Byte], offset: Int, sst: Vector[String],
                         label: String): Vector[Vector[Option[String]]] = {
    val cells = mutable.Map[(Int, Int), String]()
    var maxRow = -1
    def put(row: Int, col: Int, v: String): Unit = {
      cells((row, col)) = v
      if (row > maxRow) maxRow = row
    }

    val it = records(wb, offset)
    require(it.hasNext && { val b = it.next(); b.typ == BOF },
      s"$label: sheet substream at $offset does not start with BOF")
    var depth = 1
    var pendingString: Option[(Int, Int)] = None // FORMULA awaiting its STRING
    while (depth > 0 && it.hasNext) {
      val r = it.next()
      r.typ match {
        case BOF => depth += 1
        case EOF => depth -= 1
        case _ if depth > 1 => // inside an embedded chart substream
        case NUMBER =>
          put(u16(wb, r.start), u16(wb, r.start + 2), formatNum(f64(wb, r.start + 6)))
        case RK =>
          put(u16(wb, r.start), u16(wb, r.start + 2),
            formatNum(decodeRk(u32(wb, r.start + 6))))
        case MULRK =>
          val row = u16(wb, r.start)
          val colFirst = u16(wb, r.start + 2)
          val n = (r.len - 6) / 6
          for (i <- 0 until n)
            put(row, colFirst + i, formatNum(decodeRk(u32(wb, r.start + 4 + 6 * i + 2))))
        case LABELSST =>
          val isst = u32(wb, r.start + 6)
          require(isst < sst.length, s"$label: LABELSST index $isst out of range")
          put(u16(wb, r.start), u16(wb, r.start + 2), sst(isst))
        case LABEL =>
          put(u16(wb, r.start), u16(wb, r.start + 2), readUnicode(wb, r.start + 6, label))
        case BOOLERR =>
          if ((wb(r.start + 7) & 0xFF) == 0) // fError=1 cells are skipped
            put(u16(wb, r.start), u16(wb, r.start + 2),
              if ((wb(r.start + 6) & 0xFF) == 1) "true" else "false")
        case FORMULA =>
          val row = u16(wb, r.start); val col = u16(wb, r.start + 2)
          if (u16(wb, r.start + 12) == 0xFFFF) (wb(r.start + 6) & 0xFF) match {
            case 0 => pendingString = Some((row, col)) // value in next STRING
            case 1 => put(row, col, if ((wb(r.start + 8) & 0xFF) == 1) "true" else "false")
            case _ => // error / blank cached value: leave cell empty
          }
          else put(row, col, formatNum(f64(wb, r.start + 6)))
        case STRING =>
          pendingString.foreach { case (row, col) =>
            put(row, col, readUnicode(wb, r.start, label))
          }
          pendingString = None
        case _ =>
      }
    }
    require(depth == 0, s"$label: sheet substream at $offset has no terminating EOF")

    (0 to maxRow).iterator.map { r =>
      val occupied = cells.keysIterator.collect { case (`r`, c) => c }
      if (occupied.isEmpty) Vector.empty[Option[String]]
      else {
        val last = occupied.max
        Vector.tabulate(last + 1)(c => cells.get((r, c)))
      }
    }.toVector
  }

  /** XLUnicodeString at a fixed offset: cch u16, flags u8, chars. */
  private def readUnicode(wb: Array[Byte], off: Int, label: String): String = {
    val cch = u16(wb, off)
    val flags = wb(off + 2) & 0xFF
    val rich = (flags & 8) == 8
    val ext = (flags & 4) == 4
    var p = off + 3
    if (rich) p += 2
    if (ext) p += 4
    if ((flags & 1) == 1) new String(wb, p, cch * 2, java.nio.charset.StandardCharsets.UTF_16LE)
    else new String(wb, p, cch, java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** RkNumber: bit0 = ×1/100, bit1 = 30-bit signed int vs high bits
    * of an IEEE double.
    */
  private[graft] def decodeRk(rk: Int): Double = {
    val base =
      if ((rk & 2) == 2) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
    if ((rk & 1) == 1) base / 100.0 else base
  }

  /** Render a BIFF double the way the OOXML path renders the same
    * logical value: whole numbers without the trailing `.0` (Excel
    * stores every numeric cell as a double; writers emit `30`, not
    * `30.0`, into `<v>`).
    */
  private[graft] def formatNum(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString
}
