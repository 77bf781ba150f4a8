package graft

import graft.functions.VideoHeaders
import graft.operators.Multimodal

/** Real video-container header decode: hand-assembled minimal ISO-BMFF
  * (MP4) and RIFF-AVI byte layouts must parse to their exact
  * dimension/duration/track fields through the pure parser, the
  * Catalyst expression, the SQL surface, and the batched codec path;
  * truncated/corrupt/non-video payloads must cost a NULL, never a
  * throw.
  */
class VideoHeadersSpec extends SparkTestBase {
  import spark.implicits._

  private def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  private def box(tpe: String, payload: Array[Byte]): Array[Byte] =
    be32(8 + payload.length) ++ tpe.getBytes("US-ASCII") ++ payload

  private def mvhdV0(timescale: Int, duration: Int): Array[Byte] =
    box("mvhd", new Array[Byte](4) ++ // version 0 + flags
      new Array[Byte](8) ++           // creation + modification
      be32(timescale) ++ be32(duration))

  private def mvhdV1(timescale: Int, duration: Long): Array[Byte] =
    box("mvhd", Array[Byte](1, 0, 0, 0) ++ // version 1 + flags
      new Array[Byte](16) ++               // 64-bit creation + modification
      be32(timescale) ++
      be32(duration >> 32) ++ be32(duration & 0xFFFFFFFFL))

  /** tkhd v0 with 16.16 fixed display dimensions (0x0 = audio track). */
  private def trak(w: Int, h: Int): Array[Byte] =
    box("trak", box("tkhd",
      new Array[Byte](4) ++   // version 0 + flags
      new Array[Byte](20) ++  // creation/modification/id/reserved/duration
      new Array[Byte](8) ++   // reserved
      new Array[Byte](8) ++   // layer/alt-group/volume/reserved
      new Array[Byte](36) ++  // matrix
      be32(w.toLong << 16) ++ be32(h.toLong << 16)))

  private val ftyp = box("ftyp",
    "isom".getBytes("US-ASCII") ++ be32(0))

  private def mp4(mvhd: Array[Byte], traks: Array[Byte]*): Array[Byte] =
    ftyp ++ box("moov", mvhd ++ traks.flatten.toArray)

  /** RIFF-AVI with the mandatory LIST/hdrl → avih main header. */
  private def avi(usPerFrame: Int, totalFrames: Int, streams: Int,
                  w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(12 + 12 + 8 + 56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(12 + 8 + 56 + 4)
    b.put("AVI ".getBytes("US-ASCII"))
    b.put("LIST".getBytes("US-ASCII")).putInt(4 + 8 + 56)
    b.put("hdrl".getBytes("US-ASCII"))
    b.put("avih".getBytes("US-ASCII")).putInt(56)
    b.putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
    b.putInt(totalFrames).putInt(0).putInt(streams).putInt(0)
    b.putInt(w).putInt(h) // + 16 reserved bytes left zero
    b.array()
  }

  test("MP4/AVI headers parse exact fields; corrupt bytes parse to None") {
    // 90k timescale, 900k units = 10 000 ms; video 640x360 + audio 0x0
    val m = VideoHeaders.parse(
      mp4(mvhdV0(90000, 900000), trak(640, 360), trak(0, 0))).get
    assert(m == VideoHeaders.Meta("mp4", 640, 360, 10000L, 2))
    // v1 mvhd: 64-bit duration, 1000 timescale
    val m1 = VideoHeaders.parse(
      mp4(mvhdV1(1000, 123456L), trak(1920, 1080))).get
    assert(m1 == VideoHeaders.Meta("mp4", 1920, 1080, 123456L, 1))
    // timescale 0: duration unknown, dimensions still parse
    assert(VideoHeaders.parse(mp4(mvhdV0(0, 0), trak(320, 240))) ==
      Some(VideoHeaders.Meta("mp4", 320, 240, -1L, 1)))
    // 30 fps (33333 us/frame), 300 frames = 9999 ms, 2 streams
    assert(VideoHeaders.parse(avi(33333, 300, 2, 1280, 720)) ==
      Some(VideoHeaders.Meta("avi", 1280, 720, 9999L, 2)))
    // corrupt / truncated / non-video: None, never a throw
    val good = mp4(mvhdV0(90000, 900000), trak(640, 360))
    assert(VideoHeaders.parse(good.take(20)) == None)
    assert(VideoHeaders.parse(avi(33333, 300, 2, 1280, 720).take(30)) == None)
    assert(VideoHeaders.parse("ftypnope".getBytes) == None)
    assert(VideoHeaders.parse("RIFFxxxxWAVE".getBytes) == None)
    assert(VideoHeaders.parse("plain text payload".getBytes) == None)
    assert(VideoHeaders.parse(Array.empty[Byte]) == None)
    assert(VideoHeaders.parse(null) == None)
    // a WAV container must stay on the AUDIO rung, not parse as video
    val wav = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(4)
      .put("WAVE".getBytes("US-ASCII")).array()
    assert(VideoHeaders.parse(wav) == None)
  }

  test("videoMeta expression + SQL surface + batched codec all serve the parsed header") {
    val rows = Seq(
      (1L, mp4(mvhdV0(90000, 450000), trak(640, 360))),
      (2L, avi(40000, 250, 1, 720, 480)),
      (3L, "not a video payload".getBytes))
    val df = rows.toDF("id", "payload")
    val got = df.select($"id",
        graft.functions.VideoHeaders.videoMeta($"payload").as("m"))
      .select($"id", $"m.format", $"m.width", $"m.height",
        $"m.duration_ms", $"m.n_tracks")
      .as[(Long, Option[String], Option[Int], Option[Int], Option[Long],
           Option[Int])]
      .collect().sortBy(_._1)
    assert(got(0) == ((1L, Some("mp4"), Some(640), Some(360),
      Some(5000L), Some(1))))
    assert(got(1) == ((2L, Some("avi"), Some(720), Some(480),
      Some(10000L), Some(1))))
    assert(got(2) == ((3L, None, None, None, None, None)))
    graft.plans.GraftExtensions.install(spark)
    df.createOrReplaceTempView("video_payloads")
    val viaSql = spark.sql(
      """SELECT id, graft_video_meta(payload).width AS w
        |FROM video_payloads WHERE graft_video_meta(payload) IS NOT NULL
        |ORDER BY id""".stripMargin)
      .as[(Long, Int)].collect().toSeq
    assert(viaSql == Seq((1L, 640), (2L, 720)))
    // the batched codec path: video containers get REAL dimensions,
    // text payloads keep the fake
    val decoded = Multimodal.MediaCodec.decodeBatch(rows).sortBy(_.doc_id)
    assert(decoded(0).width == 640 && decoded(0).height == 360)
    assert(decoded(0).features.take(4).toSeq ==
      Seq(640f, 360f, 5000f, 1f))
    assert(decoded(1).width == 720 && decoded(1).height == 480)
    val fake = decoded(2)
    assert(fake.width >= 64 && fake.width < 576)
  }
}
