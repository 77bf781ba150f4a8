package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL video-container header parsing — the third rung of the
  * multimodal decode ladder, completing the [[ImageHeaders]] /
  * [[AudioHeaders]] family. Frame decode needs a codec library this
  * container doesn't ship, but the CONTAINER structure is pure byte
  * layout, so format / display dimensions / duration / track count —
  * the fields a video curation pipeline filters and buckets on (drop
  * sub-second clips, partition by resolution class, budget by hours)
  * — parse exactly, dependency-free:
  *
  *  - MP4 (ISO/IEC 14496-12 ISO BMFF, public spec): big-endian
  *    size+type box tree starting with `ftyp`; `moov/mvhd` carries
  *    timescale + duration (v0: 32-bit fields, v1: 64-bit times),
  *    each `moov/trak/tkhd` carries the track's display width/height
  *    as 16.16 fixed-point (0×0 for audio tracks) — the presentation
  *    dimensions are the max over video tracks.
  *  - AVI (RIFF, public Microsoft spec): "RIFF"+"AVI " then a
  *    little-endian chunk/LIST walk; the `hdrl` LIST's mandatory
  *    first `avih` chunk carries µs-per-frame, total frames, stream
  *    count, width, height — duration = frames × µs/frame.
  *
  * Anything else (including this corpus's text payloads — prose
  * can't carry the ftyp box framing or the RIFF/AVI  double magic)
  * parses to None, so the stub-era codec contracts are unchanged.
  * Truncated or corrupt containers return None rather than throwing:
  * at 100 TB a poison payload must cost one null, not a stage retry
  * storm.
  */
object VideoHeaders {

  /** durationMs is -1 when the header alone can't derive it (mvhd
    * timescale 0, avih µs-per-frame 0); width/height are 0 when the
    * container carries no video track dimensions.
    */
  final case class Meta(format: String, width: Int, height: Int,
                        durationMs: Long, nTracks: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i + 3).toLong << 24) | (u8(b, i + 2) << 16) |
      (u8(b, i + 1) << 8) | u8(b, i)
  private def fourCc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  def parse(b: Array[Byte]): Option[Meta] =
    if (b == null) None
    else parseMp4(b).orElse(parseAvi(b))

  // ---------------------------------------------------------------- MP4

  /** Walk the top-level box sequence calling `f(boxType, payloadStart,
    * payloadEnd)`; stops at the first malformed size. Returns false on
    * a structural anomaly that should fail the whole parse.
    */
  private def walkBoxes(b: Array[Byte], from: Int, to: Int)
                       (f: (String, Int, Int) => Unit): Boolean = {
    var i = from
    while (i + 8 <= to) {
      val size = be32(b, i)
      val tpe = fourCc(b, i + 4)
      var payload = i + 8
      var end = 0L
      if (size == 1L) { // 64-bit largesize follows the type
        if (i + 16 > to) return false
        end = i + be64(b, i + 8)
        payload = i + 16
      } else if (size == 0L) end = to // box extends to end of input
      else end = i + size
      if (end < payload || end > to) return false
      f(tpe, payload, end.toInt)
      i = end.toInt
    }
    true
  }

  private def parseMp4(b: Array[Byte]): Option[Meta] = {
    // structural magic: a well-formed ftyp box at offset 0
    if (b.length < 16 || fourCc(b, 4) != "ftyp") return None
    val ftypSize = be32(b, 0)
    if (ftypSize < 16 || ftypSize > b.length) return None
    var timescale = 0L; var duration = -1L
    var width = 0; var height = 0; var nTracks = 0
    var sawMoov = false
    val ok = walkBoxes(b, 0, b.length) { (tpe, from, to) =>
      if (tpe == "moov") {
        sawMoov = true
        walkBoxes(b, from, to) { (child, cFrom, cTo) =>
          if (child == "mvhd" && cFrom + 4 <= cTo) {
            val version = u8(b, cFrom)
            if (version == 0 && cFrom + 20 <= cTo) {
              timescale = be32(b, cFrom + 12)
              duration = be32(b, cFrom + 16)
            } else if (version == 1 && cFrom + 32 <= cTo) {
              timescale = be32(b, cFrom + 20)
              duration = be64(b, cFrom + 24)
            }
          } else if (child == "trak") {
            nTracks += 1
            walkBoxes(b, cFrom, cTo) { (g, gFrom, gTo) =>
              if (g == "tkhd" && gFrom + 4 <= gTo) {
                // width/height: 16.16 fixed at the end of the box —
                // v0 box payload is 84 bytes, v1 is 96
                val version = u8(b, gFrom)
                val off = if (version == 1) gFrom + 88 else gFrom + 76
                if (off + 8 <= gTo) {
                  val w = (be32(b, off) >> 16).toInt
                  val h = (be32(b, off + 4) >> 16).toInt
                  if (w > width) { width = w; height = h }
                }
              }
            }
          }
        }
      }
    }
    if (!ok || !sawMoov) return None
    val durMs =
      if (timescale > 0 && duration >= 0) duration * 1000L / timescale
      else -1L
    Some(Meta("mp4", width, height, durMs, nTracks))
  }

  // ---------------------------------------------------------------- AVI

  private def parseAvi(b: Array[Byte]): Option[Meta] = {
    if (b.length < 24 || fourCc(b, 0) != "RIFF" || fourCc(b, 8) != "AVI ")
      return None
    // chunk walk at the top level: find LIST/hdrl, whose first child
    // must be the avih main header (40+ byte payload)
    var i = 12
    while (i + 8 <= b.length) {
      val id = fourCc(b, i)
      val size = le32(b, i + 4)
      if (size < 0 || size > Int.MaxValue - 8) return None
      if (id == "LIST" && i + 12 <= b.length && fourCc(b, i + 8) == "hdrl") {
        val c = i + 12 // first sub-chunk of the hdrl LIST
        if (c + 8 > b.length || fourCc(b, c) != "avih") return None
        val sz = le32(b, c + 4)
        if (sz < 40 || c + 8 + 40 > b.length) return None
        val p = c + 8
        val usPerFrame = le32(b, p)
        val totalFrames = le32(b, p + 16)
        val streams = le32(b, p + 24).toInt
        val w = le32(b, p + 32).toInt
        val h = le32(b, p + 36).toInt
        if (w <= 0 || h <= 0) return None
        val durMs =
          if (usPerFrame > 0 && totalFrames > 0)
            totalFrames * usPerFrame / 1000L
          else -1L
        return Some(Meta("avi", w, h, durMs, streams))
      }
      i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
      if (i < 0) return None
    }
    None
  }

  /** `videoMeta(payload)` — struct<format,width,height,duration_ms,
    * n_tracks>, NULL for non-video payloads; duration_ms -1 when the
    * header alone can't derive it.
    */
  def videoMeta(payload: Column): Column =
    GraftColumnBridge.column(VideoMetaExpr(
      GraftColumnBridge.expression(payload)))
}

case class VideoMetaExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("n_tracks", IntegerType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    VideoHeaders.parse(v.asInstanceOf[Array[Byte]]) match {
      case Some(m) => InternalRow(UTF8String.fromString(m.format),
        m.width, m.height, m.durationMs, m.nTracks)
      case None => null
    }

  override protected def withNewChildInternal(newChild: Expression): VideoMetaExpr =
    copy(child = newChild)
}
