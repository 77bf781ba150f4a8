package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL image-container header parsing — the first non-stub rung of
  * the multimodal decode ladder. Full pixel decode needs a codec
  * library this container doesn't ship, but the CONTAINER HEADERS are
  * pure byte layout, so format / dimensions / bit depth / channels —
  * the fields a curation pipeline filters and buckets on (drop tiny
  * images, partition by aspect ratio, budget by megapixels) — parse
  * exactly, dependency-free, from the first bytes of the payload:
  *
  *  - PNG  (public spec, RFC 2083): 8-byte signature, IHDR fixed at
  *    offset 8 — width/height as 4-byte big-endian at 16/20, bit
  *    depth at 24, color type at 25 (channels: grey 1, rgb 3,
  *    palette 1, grey+α 2, rgba 4).
  *  - JPEG (ITU T.81): FF D8 then a marker walk — each segment is
  *    FF <marker> <2-byte BE length>; the frame header (SOF0–SOF15,
  *    minus DHT C4 / JPG C8 / DAC CC) carries precision, height,
  *    width, component count.
  *  - GIF  (87a/89a): 6-byte signature, width/height as 2-byte
  *    LITTLE-endian at 6/8, color resolution in the packed byte.
  *  - BMP  (BITMAPINFOHEADER): "BM", width/height as 4-byte LE at
  *    18/22 (height may be negative = top-down), bit count at 28.
  *
  * Anything else (including this corpus's text payloads) parses to
  * None — callers keep their documented non-image behavior, so the
  * stub-era contracts (q41/q86/q103 oracles) are unchanged while real
  * image bytes now return real metadata. Truncated or corrupt
  * containers return None rather than throwing: at 100 TB a poison
  * payload must cost one null, not a stage retry storm.
  */
object ImageHeaders {

  final case class Meta(format: String, width: Int, height: Int,
                        bitDepth: Int, channels: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = (u8(b, i + 1) << 8) | u8(b, i)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    (u8(b, i + 3) << 24) | (u8(b, i + 2) << 16) |
      (u8(b, i + 1) << 8) | u8(b, i)

  def parse(b: Array[Byte]): Option[Meta] =
    if (b == null) None
    else parsePng(b).orElse(parseJpeg(b)).orElse(parseGif(b))
      .orElse(parseBmp(b))

  private val PngSig =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def parsePng(b: Array[Byte]): Option[Meta] = {
    if (b.length < 26 || !b.take(8).sameElements(PngSig)) return None
    // first chunk must be IHDR with length 13
    if (be32(b, 8) != 13L || !(b(12) == 'I' && b(13) == 'H' &&
        b(14) == 'D' && b(15) == 'R')) return None
    val (w, h) = (be32(b, 16), be32(b, 20))
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
    val depth = u8(b, 24)
    val channels = u8(b, 25) match {
      case 0 => 1 // greyscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette
      case 4 => 2 // grey + alpha
      case 6 => 4 // rgba
      case _ => return None
    }
    Some(Meta("png", w.toInt, h.toInt, depth, channels))
  }

  private def parseJpeg(b: Array[Byte]): Option[Meta] = {
    if (b.length < 4 || u8(b, 0) != 0xFF || u8(b, 1) != 0xD8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xFF) return None
      // fill bytes: consecutive FFs pad before a marker
      while (i + 1 < b.length && u8(b, i + 1) == 0xFF) i += 1
      val m = u8(b, i + 1)
      if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7) || m == 0x01) i += 2
      else {
        if (i + 3 >= b.length) return None
        val len = be16(b, i + 2)
        if (len < 2) return None
        val isSof = m >= 0xC0 && m <= 0xCF &&
          m != 0xC4 && m != 0xC8 && m != 0xCC
        if (isSof) {
          if (i + 9 >= b.length || len < 8) return None
          val depth = u8(b, i + 4)
          val h = be16(b, i + 5)
          val w = be16(b, i + 7)
          val ncomp = u8(b, i + 9)
          if (w <= 0 || h <= 0 || ncomp <= 0) return None
          return Some(Meta("jpeg", w, h, depth, ncomp))
        }
        if (m == 0xD9 || m == 0xDA) return None // EOI/SOS before any SOF
        i += 2 + len
      }
    }
    None
  }

  private def parseGif(b: Array[Byte]): Option[Meta] = {
    if (b.length < 13) return None
    val sig = new String(b.take(6), "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val (w, h) = (le16(b, 6), le16(b, 8))
    if (w <= 0 || h <= 0) return None
    val depth = ((u8(b, 10) >> 4) & 7) + 1 // color resolution bits
    Some(Meta("gif", w, h, depth, 1))
  }

  private def parseBmp(b: Array[Byte]): Option[Meta] = {
    if (b.length < 30 || b(0) != 'B' || b(1) != 'M') return None
    val w = le32(b, 18)
    val h = math.abs(le32(b, 22)) // negative height = top-down rows
    if (w <= 0 || h == 0) return None
    val bits = le16(b, 28)
    if (bits <= 0) return None
    Some(Meta("bmp", w, h, math.min(bits, 8),
      if (bits >= 32) 4 else if (bits >= 24) 3 else 1))
  }

  /** `imageMeta(payload)` — struct<format,width,height,bit_depth,
    * channels>, NULL for non-image payloads.
    */
  def imageMeta(payload: Column): Column =
    GraftColumnBridge.column(ImageMetaExpr(
      GraftColumnBridge.expression(payload)))
}

case class ImageMetaExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("bit_depth", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    ImageHeaders.parse(v.asInstanceOf[Array[Byte]]) match {
      case Some(m) => InternalRow(UTF8String.fromString(m.format),
        m.width, m.height, m.bitDepth, m.channels)
      case None => null
    }

  override protected def withNewChildInternal(newChild: Expression): ImageMetaExpr =
    copy(child = newChild)
}
