package graft

import graft.functions.AudioHeaders
import graft.operators.Multimodal

/** Real audio-container header decode: hand-assembled minimal WAV/
  * FLAC/MP3 byte layouts must parse to their exact channel/rate/
  * depth/duration fields through the pure parser, the Catalyst
  * expression, the SQL surface, and the batched codec path;
  * truncated/corrupt/non-audio payloads must cost a NULL, never a
  * throw.
  */
class AudioHeadersSpec extends SparkTestBase {
  import spark.implicits._

  /** 44-byte canonical PCM WAV header + data chunk declaration. */
  private def wav(channels: Int, rate: Int, bits: Int,
                  nFrames: Int): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val dataSize = nFrames * blockAlign
    val b = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(channels.toShort).putInt(rate)
    b.putInt(rate * blockAlign).putShort(blockAlign.toShort)
    b.putShort(bits.toShort)
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    b.array()
  }

  /** fLaC magic + STREAMINFO with the packed rate/channels/bps/
    * total-samples fields.
    */
  private def flac(channels: Int, rate: Int, bits: Int,
                   totalSamples: Long): Array[Byte] = {
    val b = new Array[Byte](42)
    "fLaC".getBytes("US-ASCII").copyToArray(b, 0)
    b(4) = 0x80.toByte // last-block + type 0 (STREAMINFO)
    b(7) = 34          // 3-byte BE length
    // bytes 8..17: block sizes / frame sizes (irrelevant to parse)
    b(18) = ((rate >> 12) & 0xFF).toByte
    b(19) = ((rate >> 4) & 0xFF).toByte
    b(20) = (((rate & 0xF) << 4) | (((channels - 1) & 7) << 1) |
      (((bits - 1) >> 4) & 1)).toByte
    b(21) = ((((bits - 1) & 0xF) << 4) |
      ((totalSamples >> 32) & 0xF)).toByte
    b(22) = ((totalSamples >> 24) & 0xFF).toByte
    b(23) = ((totalSamples >> 16) & 0xFF).toByte
    b(24) = ((totalSamples >> 8) & 0xFF).toByte
    b(25) = (totalSamples & 0xFF).toByte
    b
  }

  /** ID3v2 prefix + one MPEG1 Layer III frame header, padded to
    * `totalBytes` so the CBR duration estimate is deterministic.
    */
  private def mp3(brIdx: Int, srIdx: Int, mono: Boolean,
                  id3Size: Int, totalBytes: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("ID3".getBytes("US-ASCII"))
    out.write(Array(0x04, 0x00, 0x00).map(_.toByte)) // ver + flags
    out.write(Array((id3Size >> 21) & 0x7F, (id3Size >> 14) & 0x7F,
      (id3Size >> 7) & 0x7F, id3Size & 0x7F).map(_.toByte))
    out.write(new Array[Byte](id3Size))
    // FF FB = sync + MPEG1 + Layer III + no CRC
    out.write(Array(0xFF, 0xFB).map(_.toByte))
    out.write(((brIdx << 4) | (srIdx << 2)).toByte)
    out.write((if (mono) 0xC0 else 0x00).toByte)
    out.write(new Array[Byte](
      math.max(0, totalBytes - out.size())))
    out.toByteArray
  }

  test("WAV/FLAC/MP3 headers parse exact fields; corrupt bytes parse to None") {
    // 2ch 44.1k 16-bit, 44100 frames = exactly 1000 ms
    assert(AudioHeaders.parse(wav(2, 44100, 16, 44100)) ==
      Some(AudioHeaders.Meta("wav", 2, 44100, 16, 1000L)))
    assert(AudioHeaders.parse(wav(1, 8000, 8, 4000)) ==
      Some(AudioHeaders.Meta("wav", 1, 8000, 8, 500L)))
    // 96k samples at 48k = 2000 ms
    assert(AudioHeaders.parse(flac(2, 48000, 24, 96000L)) ==
      Some(AudioHeaders.Meta("flac", 2, 48000, 24, 2000L)))
    // total-samples 0: rate/channels still parse, duration unknown
    assert(AudioHeaders.parse(flac(1, 44100, 16, 0L)) ==
      Some(AudioHeaders.Meta("flac", 1, 44100, 16, -1L)))
    // 128 kbps stereo 44.1k, 16000 payload bytes past ID3 = 1000 ms
    val m = AudioHeaders.parse(mp3(brIdx = 9, srIdx = 0, mono = false,
      id3Size = 100, totalBytes = 110 + 16000)).get
    assert(m == AudioHeaders.Meta("mp3", 2, 44100, 0, 1000L))
    // mono MPEG1 L3 at 48k, 320 kbps index
    val m2 = AudioHeaders.parse(mp3(brIdx = 14, srIdx = 1, mono = true,
      id3Size = 0, totalBytes = 10 + 40000)).get
    assert(m2.format == "mp3" && m2.channels == 1 && m2.sampleRate == 48000)
    assert(m2.durationMs == 40000L * 8 / 320)
    // corrupt / truncated / non-audio: None, never a throw
    assert(AudioHeaders.parse(wav(2, 44100, 16, 44100).take(20)) == None)
    assert(AudioHeaders.parse(flac(2, 48000, 24, 96000L).take(30)) == None)
    assert(AudioHeaders.parse("RIFFxxxxNOPE".getBytes) == None)
    assert(AudioHeaders.parse("fLaCxxxx".getBytes) == None)
    assert(AudioHeaders.parse("plain text payload".getBytes) == None)
    assert(AudioHeaders.parse("ID3 tagged but no sync".getBytes) == None)
    assert(AudioHeaders.parse(Array.empty[Byte]) == None)
    assert(AudioHeaders.parse(null) == None)
    // free-bitrate (0) and reserved (15) indices are rejected
    assert(AudioHeaders.parse(mp3(0, 0, false, 0, 200)) == None)
    assert(AudioHeaders.parse(mp3(15, 0, false, 0, 200)) == None)
  }

  test("audioMeta expression + SQL surface + batched codec all serve the parsed header") {
    val rows = Seq((1L, wav(2, 44100, 16, 22050)),
      (2L, flac(1, 22050, 16, 22050L)),
      (3L, "not an audio payload".getBytes))
    val df = rows.toDF("id", "payload")
    val got = df.select($"id",
        graft.functions.AudioHeaders.audioMeta($"payload").as("m"))
      .select($"id", $"m.format", $"m.channels", $"m.sample_rate",
        $"m.duration_ms")
      .as[(Long, Option[String], Option[Int], Option[Int], Option[Long])]
      .collect().sortBy(_._1)
    assert(got(0) == ((1L, Some("wav"), Some(2), Some(44100), Some(500L))))
    assert(got(1) == ((2L, Some("flac"), Some(1), Some(22050), Some(1000L))))
    assert(got(2) == ((3L, None, None, None, None)))
    graft.plans.GraftExtensions.install(spark)
    df.createOrReplaceTempView("audio_payloads")
    val viaSql = spark.sql(
      """SELECT id, graft_audio_meta(payload).sample_rate AS r
        |FROM audio_payloads WHERE graft_audio_meta(payload) IS NOT NULL
        |ORDER BY id""".stripMargin)
      .as[(Long, Int)].collect().toSeq
    assert(viaSql == Seq((1L, 44100), (2L, 22050)))
    // the batched codec path: audio containers get REAL header
    // features (0x0 dimensions), text payloads keep the fake
    val decoded = Multimodal.MediaCodec.decodeBatch(rows).sortBy(_.doc_id)
    assert(decoded(0).width == 0 && decoded(0).height == 0)
    assert(decoded(0).features.take(4).toSeq ==
      Seq(2f, 44100f, 16f, 500f))
    assert(decoded(1).features.take(4).toSeq ==
      Seq(1f, 22050f, 16f, 1000f))
    val fake = decoded(2)
    assert(fake.width >= 64 && fake.width < 576)
  }
}
