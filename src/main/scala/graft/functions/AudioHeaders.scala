package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL audio-container header parsing — the audio rung of the
  * multimodal decode ladder, the exact sibling of
  * [[ImageHeaders]]. Full sample decode needs a codec library this
  * container doesn't ship, but the CONTAINER HEADERS are pure byte
  * layout, so format / channels / sample rate / bit depth / duration
  * — the fields an audio curation pipeline filters and buckets on
  * (drop sub-second clips, partition by sample rate, budget by
  * hours) — parse exactly, dependency-free:
  *
  *  - WAV  (RIFF, public Microsoft/IBM spec): "RIFF" + LE size +
  *    "WAVE", then a 4-byte-id + LE-size chunk walk; the "fmt "
  *    chunk carries channels / sample rate / bits per sample, the
  *    "data" chunk size with the fmt block-align gives the frame
  *    count and so the duration.
  *  - FLAC (xiph.org spec): "fLaC" + the mandatory first STREAMINFO
  *    metadata block (type 0, length 34) — sample rate (20 bits),
  *    channels−1 (3 bits), bits-per-sample−1 (5 bits), total
  *    samples (36 bits) packed big-endian at fixed offsets.
  *  - MP3  (ISO 11172-3 Layer III): optional ID3v2 prefix ("ID3" +
  *    syncsafe 28-bit size) skipped, then the first MPEG frame sync
  *    (11 set bits) — version / layer / bitrate index / sample rate
  *    index / channel mode decode from the 4-byte frame header;
  *    duration estimated CBR from payload bytes × 8 / bitrate (the
  *    standard single-frame heuristic; bits_per_sample reports 0 —
  *    perceptual codecs have no PCM word width).
  *
  * Anything else (including this corpus's text payloads — UTF-8 text
  * cannot start with an MP3 sync byte, and the RIFF/fLaC magics with
  * their structural follow-up checks don't occur in prose) parses to
  * None, so the stub-era codec contracts are unchanged. Truncated or
  * corrupt containers return None rather than throwing: at 100 TB a
  * poison payload must cost one null, not a stage retry storm.
  */
object AudioHeaders {

  /** durationMs is -1 when the container doesn't carry enough to
    * derive it (e.g. a WAV whose data chunk sits past the scanned
    * bytes, a FLAC with total-samples 0).
    */
  final case class Meta(format: String, channels: Int, sampleRate: Int,
                        bitsPerSample: Int, durationMs: Long)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = (u8(b, i + 1) << 8) | u8(b, i)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i + 3).toLong << 24) | (u8(b, i + 2) << 16) |
      (u8(b, i + 1) << 8) | u8(b, i)

  def parse(b: Array[Byte]): Option[Meta] =
    if (b == null) None
    else parseWav(b).orElse(parseFlac(b)).orElse(parseMp3(b))

  private def parseWav(b: Array[Byte]): Option[Meta] = {
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
        b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
        b(11) != 'E') return None
    // chunk walk: 4-byte id + LE32 size, chunks word-aligned
    var i = 12
    var channels = 0; var rate = 0; var bits = 0; var blockAlign = 0
    var dataSize = -1L
    while (i + 8 <= b.length && (channels == 0 || dataSize < 0)) {
      val id = new String(b, i, 4, "US-ASCII")
      val size = le32(b, i + 4)
      if (size < 0) return None
      if (id == "fmt " && size >= 16 && i + 8 + 16 <= b.length) {
        channels = le16(b, i + 10)
        rate = le32(b, i + 12).toInt
        blockAlign = le16(b, i + 20)
        bits = le16(b, i + 22)
      } else if (id == "data") {
        dataSize = size
      }
      i += 8 + size.toInt + (size.toInt & 1)
      if (i < 0) return None // overflow on a corrupt size
    }
    if (channels <= 0 || rate <= 0 || bits <= 0) return None
    val dur =
      if (dataSize >= 0 && blockAlign > 0)
        dataSize / blockAlign * 1000L / rate
      else -1L
    Some(Meta("wav", channels, rate, bits, dur))
  }

  private def parseFlac(b: Array[Byte]): Option[Meta] = {
    if (b.length < 42 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' ||
        b(3) != 'C') return None
    // first metadata block MUST be STREAMINFO: type 0 (high bit =
    // last-block flag), 3-byte BE length 34
    if ((u8(b, 4) & 0x7F) != 0) return None
    val len = (u8(b, 5) << 16) | (u8(b, 6) << 8) | u8(b, 7)
    if (len != 34) return None
    // packed fields start 10 bytes into STREAMINFO (offset 18):
    // 20-bit sample rate, 3-bit channels-1, 5-bit bps-1, 36-bit
    // total samples
    val rate = (u8(b, 18) << 12) | (u8(b, 19) << 4) | (u8(b, 20) >> 4)
    val channels = ((u8(b, 20) >> 1) & 7) + 1
    val bits = (((u8(b, 20) & 1) << 4) | (u8(b, 21) >> 4)) + 1
    val totalSamples = ((u8(b, 21) & 0x0F).toLong << 32) |
      (u8(b, 22).toLong << 24) | (u8(b, 23) << 16) |
      (u8(b, 24) << 8) | u8(b, 25)
    if (rate <= 0) return None
    val dur = if (totalSamples > 0) totalSamples * 1000L / rate else -1L
    Some(Meta("flac", channels, rate, bits, dur))
  }

  // MPEG1 Layer III bitrates (kbps) by index; index 0 = free, 15 = bad
  private val Mp3BitrateV1 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  // MPEG2/2.5 Layer III
  private val Mp3BitrateV2 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val Mp3RateV1 = Array(44100, 48000, 32000)

  private def parseMp3(b: Array[Byte]): Option[Meta] = {
    if (b.length < 4) return None
    var i = 0
    // skip an ID3v2 prefix: "ID3" ver(2) flags(1) syncsafe size(4)
    if (b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      if (b.length < 10) return None
      val size = (u8(b, 6) << 21) | (u8(b, 7) << 14) |
        (u8(b, 8) << 7) | u8(b, 9)
      i = 10 + size
      if (i < 0 || i + 4 > b.length) return None
    }
    // frame sync: 11 set bits
    if (u8(b, i) != 0xFF || (u8(b, i + 1) & 0xE0) != 0xE0) return None
    val versionBits = (u8(b, i + 1) >> 3) & 3 // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    val layerBits = (u8(b, i + 1) >> 1) & 3   // 1 = Layer III
    if (versionBits == 1 || layerBits != 1) return None
    val brIdx = (u8(b, i + 2) >> 4) & 0xF
    val srIdx = (u8(b, i + 2) >> 2) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
    val bitrateKbps =
      if (versionBits == 3) Mp3BitrateV1(brIdx) else Mp3BitrateV2(brIdx)
    val rate = versionBits match {
      case 3 => Mp3RateV1(srIdx)      // MPEG1
      case 2 => Mp3RateV1(srIdx) / 2  // MPEG2
      case _ => Mp3RateV1(srIdx) / 4  // MPEG2.5
    }
    val channels = if (((u8(b, i + 3) >> 6) & 3) == 3) 1 else 2
    // CBR estimate over the payload past any ID3 prefix
    val dur = (b.length - i).toLong * 8L / bitrateKbps
    Some(Meta("mp3", channels, rate, 0, dur))
  }

  /** `audioMeta(payload)` — struct<format,channels,sample_rate,
    * bits_per_sample,duration_ms>, NULL for non-audio payloads;
    * duration_ms is -1 when the header alone can't derive it.
    */
  def audioMeta(payload: Column): Column =
    GraftColumnBridge.column(AudioMetaExpr(
      GraftColumnBridge.expression(payload)))
}

case class AudioMetaExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    AudioHeaders.parse(v.asInstanceOf[Array[Byte]]) match {
      case Some(m) => InternalRow(UTF8String.fromString(m.format),
        m.channels, m.sampleRate, m.bitsPerSample, m.durationMs)
      case None => null
    }

  override protected def withNewChildInternal(newChild: Expression): AudioMetaExpr =
    copy(child = newChild)
}
