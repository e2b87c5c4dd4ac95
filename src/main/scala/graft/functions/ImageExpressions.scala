package graft.functions

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real image-header codecs for the multimodal pipeline (D12), pure
  * JDK. The reference treats media as opaque blobs with metadata;
  * here the header *decode* is genuinely functional for PNG, BMP, GIF
  * and JPEG — format, dimensions, bit depth and channel count read
  * from the container bytes — while decompressing pixel data remains
  * the declared stub (no image libraries in scope, and the engine
  * never needs pixels, only features/metadata).
  *
  * Kernels live on [[ImageCodec]] so the codegen'd expressions, the
  * Column API and the specs share one definition.
  */
object ImageCodec {

  /** bit_depth is bits per channel, channels the sample count per
    * pixel — one contract across containers that disagree on which
    * of the two they store.
    */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("bit_depth", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))

  private def be32(v: Int) =
    Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def le32(v: Int) =
    Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
  private def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
  private def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)

  private def u16be(b: Array[Byte], o: Int) = ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
  private def u16le(b: Array[Byte], o: Int) = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def i32be(b: Array[Byte], o: Int) =
    ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) | ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)
  private def i32le(b: Array[Byte], o: Int) =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  // -------------------------------------------------------------
  // Encoders — deterministic synthetic media for pipeline testing
  // -------------------------------------------------------------

  /** Complete, spec-valid grayscale PNG: signature, IHDR, one IDAT of
    * deflated filter-0 scanlines with deterministic pixels, IEND —
    * CRCs and zlib framing included (java.util.zip is the real codec
    * here, not a fake).
    */
  def encodePng(w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), 0, 8)
    def chunk(tag: String, body: Array[Byte]): Unit = {
      out.write(be32(body.length), 0, 4)
      val tb = tag.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(body, 0, body.length)
      val crc = new CRC32(); crc.update(tb); crc.update(body)
      out.write(be32(crc.getValue.toInt), 0, 4)
    }
    chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 0, 0, 0, 0)) // 8-bit gray
    val raw = new Array[Byte](h * (w + 1)) // leading filter byte 0 per scanline
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raw(y * (w + 1) + 1 + x) = ((x * 31 + y * 7) & 0xFF).toByte; x += 1 }
      y += 1
    }
    val d = new Deflater(); d.setInput(raw); d.finish()
    val zbuf = new ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!d.finished()) zbuf.write(tmp, 0, d.deflate(tmp))
    d.end()
    chunk("IDAT", zbuf.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Complete 24bpp BMP: file header, BITMAPINFOHEADER, bottom-up
    * 4-byte-aligned pixel rows with deterministic pixels.
    */
  def encodeBmp(w: Int, h: Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) & ~3
    val pixelBytes = rowBytes * h
    val out = new ByteArrayOutputStream(54 + pixelBytes)
    out.write('B'); out.write('M')
    out.write(le32(54 + pixelBytes), 0, 4)
    out.write(le32(0), 0, 4)
    out.write(le32(54), 0, 4)
    out.write(le32(40), 0, 4) // BITMAPINFOHEADER
    out.write(le32(w), 0, 4)
    out.write(le32(h), 0, 4)
    out.write(le16(1), 0, 2)  // planes
    out.write(le16(24), 0, 2) // bpp
    out.write(le32(0), 0, 4)  // BI_RGB
    out.write(le32(pixelBytes), 0, 4)
    out.write(le32(2835), 0, 4); out.write(le32(2835), 0, 4) // 72 dpi
    out.write(le32(0), 0, 4); out.write(le32(0), 0, 4)
    val row = new Array[Byte](rowBytes)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        row(x * 3) = ((x * 5 + y) & 0xFF).toByte
        row(x * 3 + 1) = ((x + y * 5) & 0xFF).toByte
        row(x * 3 + 2) = ((x ^ y) & 0xFF).toByte
        x += 1
      }
      out.write(row, 0, rowBytes)
      y += 1
    }
    out.toByteArray
  }

  /** GIF89a header + logical screen descriptor + trailer. Pixel data
    * (palette + LZW image blocks) is the declared stub — the header
    * carries everything the metadata contract needs. Color-resolution
    * bits say 8 bits/channel.
    */
  def encodeGif(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++
      Array[Byte](0x70, 0, 0) ++ Array[Byte](0x3B.toByte)

  /** JPEG SOI + baseline SOF0 (8-bit, 3 components, real dimensions)
    * + EOI. Entropy-coded scan data is the declared stub.
    */
  def encodeJpeg(w: Int, h: Int): Array[Byte] = {
    val sof = be16(0xFFC0) ++ be16(8 + 3 * 3) ++ Array[Byte](8) ++
      be16(h) ++ be16(w) ++ Array[Byte](3) ++
      Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    be16(0xFFD8) ++ sof ++ be16(0xFFD9)
  }

  /** Encode by format id: 0=png, 1=bmp, 2=gif, 3=jpeg. */
  def encode(format: UTF8String, w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"image dims must be positive: ${w}x$h")
    format.toString match {
      case "png"  => encodePng(w, h)
      case "bmp"  => encodeBmp(w, h)
      case "gif"  => encodeGif(w, h)
      case "jpeg" => encodeJpeg(w, h)
      case other  => throw new IllegalArgumentException(
        s"synthetic_image: unknown format '$other' (png|bmp|gif|jpeg)")
    }
  }

  // -------------------------------------------------------------
  // Decoder — header sniff + parse, null for non-image payloads
  // -------------------------------------------------------------

  private def meta(fmt: String, w: Int, h: Int, depth: Int, ch: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h, depth, ch))

  /** Parse the container header: (format, width, height, bits per
    * channel, channels), or null when the payload is not a
    * recognized image. Malformed-but-sniffed payloads also return
    * null rather than throwing — at 100 TB a corrupt blob is data,
    * not an error.
    */
  def decode(b: Array[Byte]): InternalRow = try {
    if (b.length >= 26 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') {
      // IHDR is mandated first: width/height at 16/20, depth/color at 24/25
      val depth = b(24) & 0xFF
      val channels = (b(25) & 0xFF) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => return null
      }
      meta("png", i32be(b, 16), i32be(b, 20), depth, channels)
    } else if (b.length >= 30 && b(0) == 'B' && b(1) == 'M' && i32le(b, 14) >= 40) {
      val bpp = u16le(b, 28)
      val (depth, ch) =
        if (bpp >= 24) (8, bpp / 8) else if (bpp == 16) (5, 3) else (bpp, 1)
      meta("bmp", i32le(b, 18), math.abs(i32le(b, 22)), depth, ch)
    } else if (b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') {
      meta("gif", u16le(b, 6), u16le(b, 8), ((b(10) >> 4) & 7) + 1, 3)
    } else if (b.length >= 4 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) {
      // walk JPEG segments to the first SOFn frame header
      var i = 2
      while (i + 4 <= b.length) {
        if ((b(i) & 0xFF) != 0xFF) return null
        val m = b(i + 1) & 0xFF
        if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) i += 2
        else if (m == 0xD9) return null // EOI before any SOF
        else {
          val len = u16be(b, i + 2)
          val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
          if (isSof) {
            if (i + 9 >= b.length) return null
            return meta("jpeg", u16be(b, i + 7), u16be(b, i + 5), b(i + 4) & 0xFF,
              b(i + 9) & 0xFF)
          }
          i += 2 + len
        }
      }
      null
    } else null
  } catch { case _: ArrayIndexOutOfBoundsException => null }
}

/** Synthesize a deterministic, header-valid image payload —
  * `synthetic_image(format, width, height)`. The scale-test stand-in
  * for a real media column: every byte is a pure function of the
  * arguments, so distributed runs are reproducible and the oracle can
  * predict the decoded metadata exactly.
  */
case class SyntheticImage(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "synthetic_image"

  override protected def nullSafeEval(fmt: Any, w: Any, h: Any): Any =
    ImageCodec.encode(fmt.asInstanceOf[UTF8String],
      w.asInstanceOf[Int], h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, w, h) => {
      s"${ev.value} = graft.functions.ImageCodec.encode($f, $w, $h);"
    })

  override protected def withNewChildrenInternal(
      f: Expression, w: Expression, h: Expression): Expression =
    copy(first = f, second = w, third = h)
}

/** `image_meta(payload)` → struct(format, width, height, bit_depth,
  * channels), null for payloads that are not recognized images. The
  * parse runs inside whole-stage codegen; with parquet column pruning
  * the scan reads only the payload column.
  */
case class ImageMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageCodec.metaSchema
  override def nullable: Boolean = true
  override def prettyName: String = "image_meta"

  override protected def nullSafeEval(input: Any): Any =
    ImageCodec.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.functions.ImageCodec.decode($b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageFunctions {
  import org.apache.spark.sql.graftglue.ColumnGlue

  def syntheticImage(format: Column, width: Column, height: Column): Column =
    ColumnGlue.column(SyntheticImage(
      ColumnGlue.expr(format), ColumnGlue.expr(width), ColumnGlue.expr(height)))

  def imageMeta(payload: Column): Column =
    ColumnGlue.column(ImageMeta(ColumnGlue.expr(payload)))
}
