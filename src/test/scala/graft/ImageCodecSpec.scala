package graft

import java.nio.file.{Files, Paths}
import java.util.zip.{CRC32, Inflater}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ImageCodec, ImageFunctions}
import graft.multimodal.BinaryPipeline

/** The D12 image-header codec. Decode is validated against fixture
  * files produced by tools/make_image_fixtures.py — an independent
  * stdlib-Python producer — so an encoder and decoder sharing one
  * mistaken offset cannot cancel out.
  */
class ImageCodecSpec extends AnyFunSuite {
  import SparkTestSession._

  private def fixture(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(s"src/test/resources/graft/images/$name"))

  private def metaTuple(b: Array[Byte]): Option[(String, Int, Int, Int, Int)] =
    Option(ImageCodec.decode(b)).map(r =>
      (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))

  test("independently-written fixtures parse to their true metadata") {
    assert(metaTuple(fixture("sample.png")).contains(("png", 300, 5, 8, 3)))
    assert(metaTuple(fixture("sample.bmp")).contains(("bmp", 300, 5, 8, 3)))
    assert(metaTuple(fixture("sample.gif")).contains(("gif", 300, 5, 8, 3)))
    assert(metaTuple(fixture("sample.jpg")).contains(("jpeg", 300, 5, 8, 3)))
  }

  test("synthetic encoders round-trip through the decoder") {
    for ((w, h) <- Seq((1, 1), (31, 17), (300, 260), (640, 3))) {
      assert(metaTuple(ImageCodec.encodePng(w, h)).contains(("png", w, h, 8, 1)))
      assert(metaTuple(ImageCodec.encodeBmp(w, h)).contains(("bmp", w, h, 8, 3)))
      assert(metaTuple(ImageCodec.encodeGif(w, h)).contains(("gif", w, h, 8, 3)))
      assert(metaTuple(ImageCodec.encodeJpeg(w, h)).contains(("jpeg", w, h, 8, 3)))
    }
  }

  test("synthetic PNG is spec-valid: chunk CRCs check, IDAT inflates to the scanlines") {
    val b = ImageCodec.encodePng(33, 7)
    // IHDR chunk: length at 8, tag+body at 12, CRC after body
    def be32(o: Int) = ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
      ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)
    var off = 8
    var idat: Array[Byte] = null
    while (off < b.length) {
      val len = be32(off)
      val tag = new String(b, off + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(b, off + 4, 4 + len)
      assert(crc.getValue.toInt == be32(off + 8 + len), s"bad CRC on $tag")
      if (tag == "IDAT") idat = b.slice(off + 8, off + 8 + len)
      off += 12 + len
    }
    val inf = new Inflater()
    inf.setInput(idat)
    val raw = new Array[Byte](7 * 34 + 1)
    val n = inf.inflate(raw)
    assert(inf.finished() && n == 7 * 34) // h * (w + 1) filter-0 scanlines
  }

  test("non-image payloads and truncated headers decode to null") {
    assert(metaTuple("plain text payload".getBytes).isEmpty)
    assert(metaTuple(Array[Byte]()).isEmpty)
    assert(metaTuple(ImageCodec.encodePng(9, 9).take(12)).isEmpty)
    // JPEG with EOI before any SOF frame header
    assert(metaTuple(Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)).isEmpty)
  }

  test("image_meta runs codegen'd over a media column; text payloads yield null") {
    import spark.implicits._
    val docs = Seq((1L, "some text", "src1"), (2L, "more", "src2"))
      .toDF("doc_id", "text", "source")
    val textMeta = BinaryPipeline.toMedia(docs)
      .select(ImageFunctions.imageMeta(col("payload")).as("m"))
      .collect()
    assert(textMeta.forall(_.isNullAt(0)))

    val imgs = spark.range(1, 50).select(
      col("id").as("doc_id"),
      element_at(lit(Array("png", "bmp", "gif", "jpeg")),
        (col("id") % 4 + 1).cast("int")).as("fmt"),
      (col("id") % 32 + 1).cast("int").as("w"),
      (col("id") % 24 + 1).cast("int").as("h"))
    val parsed = imgs
      .select(col("doc_id"), col("fmt"), col("w"), col("h"),
        ImageFunctions.imageMeta(
          ImageFunctions.syntheticImage(col("fmt"), col("w"), col("h"))).as("m"))
      .select(col("*"), col("m.format"), col("m.width"), col("m.height"))
      .collect()
    assert(parsed.length == 49)
    parsed.foreach { r =>
      assert(r.getAs[String]("format") == r.getAs[String]("fmt"))
      assert(r.getAs[Int]("width") == r.getAs[Int]("w"))
      assert(r.getAs[Int]("height") == r.getAs[Int]("h"))
    }
  }
}
