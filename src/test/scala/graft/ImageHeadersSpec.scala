package graft

import graft.functions.ImageHeaders
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Real container-header decode: hand-assembled minimal PNG/JPEG/GIF/
  * BMP byte layouts must parse to their exact dimensions through the
  * pure parser, the Catalyst expression, the SQL surface, and the
  * batched codec path; truncated/corrupt/non-image payloads must cost
  * a NULL, never a throw.
  */
class ImageHeadersSpec extends SparkTestBase {
  import spark.implicits._

  private def png(w: Int, h: Int, depth: Int, colorType: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(33)
    b.put(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte))
    b.putInt(13).put("IHDR".getBytes("US-ASCII"))
    b.putInt(w).putInt(h).put(depth.toByte).put(colorType.toByte)
    b.put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
    b.array()
  }

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0xFF, 0xD8).map(_.toByte)) // SOI
    // APP0 segment the walker must skip
    out.write(Array(0xFF, 0xE0, 0x00, 0x10).map(_.toByte))
    out.write("JFIF".getBytes("US-ASCII")); out.write(new Array[Byte](10))
    // SOF0: len 17, precision 8, height, width, 3 components
    out.write(Array(0xFF, 0xC0, 0x00, 0x11, 0x08,
      (h >> 8) & 0xFF, h & 0xFF, (w >> 8) & 0xFF, w & 0xFF, 0x03)
      .map(_.toByte))
    out.write(new Array[Byte](9))
    out.toByteArray
  }

  private def gif(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(13)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("GIF89a".getBytes("US-ASCII"))
    b.putShort(w.toShort).putShort(h.toShort)
    b.put(0xF7.toByte).put(0.toByte).put(0.toByte) // packed/bg/aspect
    b.array()
  }

  private def bmp(w: Int, h: Int, bits: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(54)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(bits.toShort)
    b.array()
  }

  test("PNG/JPEG/GIF/BMP headers parse exact dimensions; corrupt bytes parse to None") {
    assert(ImageHeaders.parse(png(640, 480, 8, 6)) ==
      Some(ImageHeaders.Meta("png", 640, 480, 8, 4)))
    assert(ImageHeaders.parse(png(1, 1, 16, 0)) ==
      Some(ImageHeaders.Meta("png", 1, 1, 16, 1)))
    assert(ImageHeaders.parse(jpeg(1920, 1080)) ==
      Some(ImageHeaders.Meta("jpeg", 1920, 1080, 8, 3)))
    assert(ImageHeaders.parse(gif(320, 200)) ==
      Some(ImageHeaders.Meta("gif", 320, 200, 8, 1)))
    assert(ImageHeaders.parse(bmp(800, -600, 24)) ==
      Some(ImageHeaders.Meta("bmp", 800, 600, 8, 3)))
    // corrupt / truncated / non-image: None, never a throw
    assert(ImageHeaders.parse(png(640, 480, 8, 6).take(20)) == None)
    assert(ImageHeaders.parse(Array(0xFF, 0xD8, 0xFF, 0xD9)
      .map(_.toByte)) == None) // SOI then EOI, no frame header
    assert(ImageHeaders.parse("plain text payload".getBytes) == None)
    assert(ImageHeaders.parse(Array.empty[Byte]) == None)
    assert(ImageHeaders.parse(null) == None)
  }

  test("imageMeta expression + SQL surface + batched codec all serve the parsed header") {
    val rows = Seq((1L, png(640, 480, 8, 2)), (2L, jpeg(100, 50)),
      (3L, "not an image".getBytes))
    val df = rows.toDF("id", "payload")
    val got = df.select($"id",
        graft.functions.ImageHeaders.imageMeta($"payload").as("m"))
      .select($"id", $"m.format", $"m.width", $"m.height", $"m.channels")
      .as[(Long, Option[String], Option[Int], Option[Int], Option[Int])]
      .collect().sortBy(_._1)
    assert(got(0) == ((1L, Some("png"), Some(640), Some(480), Some(3))))
    assert(got(1) == ((2L, Some("jpeg"), Some(100), Some(50), Some(3))))
    assert(got(2) == ((3L, None, None, None, None)))
    graft.plans.GraftExtensions.install(spark)
    df.createOrReplaceTempView("img_payloads")
    val viaSql = spark.sql(
      """SELECT id, graft_image_meta(payload).width AS w
        |FROM img_payloads WHERE graft_image_meta(payload) IS NOT NULL
        |ORDER BY id""".stripMargin)
      .as[(Long, Int)].collect().toSeq
    assert(viaSql == Seq((1L, 640), (2L, 100)))
    // the batched codec path: real containers get REAL dimensions,
    // text payloads keep the documented deterministic fake
    val decoded = Multimodal.MediaCodec.decodeBatch(rows).sortBy(_.doc_id)
    assert(decoded(0).width == 640 && decoded(0).height == 480)
    assert(decoded(1).width == 100 && decoded(1).height == 50)
    assert(decoded(0).features(1) == 3.0f) // parsed channel count rides along
    val fake = decoded(2)
    assert(fake.width >= 64 && fake.width < 576) // the stub formula's range
  }
}
