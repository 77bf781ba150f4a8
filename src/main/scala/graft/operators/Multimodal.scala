package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads with typed
  * metadata, batch feature extraction, and frame sampling.
  *
  * The decode step is STUBBED — this container has no image/audio
  * codecs — behind [[MediaCodec]]: the Spark-side contract (schema,
  * binary column handling, partition-batched iteration, deterministic
  * output shape) is real and tested; swapping in a JNI/ffmpeg-backed
  * codec is a one-object change with no plan changes.
  */
object Multimodal {

  /** One decoded-feature row per media payload. */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, magic: String,
                           width: Int, height: Int, features: Array[Float])

  /** Encoder target for the decode path (not private: the codegen'd
    * deserializer must reach the constructor).
    */
  case class Payload(doc_id: Long, payload: Array[Byte])

  /** Codec: REAL container-header decode where the payload is a real
    * image container ([[graft.functions.ImageHeaders]] — PNG/JPEG/
    * GIF/BMP dimensions, bit depth, channels parsed from the actual
    * byte layout), deterministic fake features otherwise (this
    * corpus's payloads are text bytes; full PIXEL decode still needs
    * a codec library this container doesn't ship, and would slot in
    * exactly here). Batching, schema, and determinism are identical
    * on both branches.
    */
  object MediaCodec {
    val batchSize = 64
    def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[MediaFeatures] =
      batch.map { case (id, bytes) =>
        val magic = bytes.take(4).map(b => f"$b%02X").mkString
        graft.functions.ImageHeaders.parse(bytes) match {
          case Some(m) =>
            // real container: real dimensions; features carry the
            // parsed header fields until a pixel codec lands
            MediaFeatures(id, bytes.length, magic, m.width, m.height,
              Array(m.bitDepth.toFloat, m.channels.toFloat,
                m.width.toFloat, m.height.toFloat,
                m.width.toFloat * m.height, 0f, 0f, 0f))
          case None => graft.functions.AudioHeaders.parse(bytes) match {
            case Some(a) =>
              // real audio container: width/height are meaningless —
              // report 0×0; features carry the parsed header fields
              // until a sample codec lands
              MediaFeatures(id, bytes.length, magic, 0, 0,
                Array(a.channels.toFloat, a.sampleRate.toFloat,
                  a.bitsPerSample.toFloat, a.durationMs.toFloat,
                  0f, 0f, 0f, 0f))
            case None => graft.functions.VideoHeaders.parse(bytes) match {
              case Some(v) =>
                // real video container: real display dimensions;
                // features carry the parsed header fields until a
                // frame codec lands
                MediaFeatures(id, bytes.length, magic, v.width, v.height,
                  Array(v.width.toFloat, v.height.toFloat,
                    v.durationMs.toFloat, v.nTracks.toFloat,
                    0f, 0f, 0f, 0f))
              case None =>
                // fake dimensions/features derived only from the payload →
                // stable. Long arithmetic: Int math would overflow-wrap for
                // doc ids above 2^31 or ~69 MB payloads and diverge from
                // the BIGINT oracle
                val width = (64 + math.abs(bytes.length.toLong * 31 + id) % 512).toInt
                val height = (64 + math.abs(bytes.length.toLong * 17 + id) % 512).toInt
                val feats = Array.tabulate(8)(i =>
                  (if (bytes.isEmpty) 0f
                   else bytes(i % bytes.length).toFloat / 128f))
                MediaFeatures(id, bytes.length, magic, width, height, feats)
            }
          }
        }
      }
  }

  /** Attach an opaque binary payload column plus the metadata a
    * lakehouse would track alongside it. A frame that ALREADY carries
    * a `payload` column (the container-byte corpus from
    * [[graft.Tables.documentsWithPayload]]) keeps it — the downstream
    * decode / resize / frame-sample operators are payload-agnostic;
    * the text-bytes fallback remains for bare document frames.
    */
  def attachPayload(docs: DataFrame): DataFrame = {
    val withP =
      if (docs.columns.contains("payload")) docs
      else docs.withColumn("payload", col("text").cast("binary"))
    withP.withColumn("n_bytes", octet_length(col("payload")))
      .withColumn("content_md5", md5(col("payload")))
  }

  // --------------------------------------------------------------------
  // Container-payload synthesis — the ONE definition of the multimodal
  // corpus's binary column, shared by the fixture generator (ScaleUp
  // stores these bytes), the schema-branched documents loader (attaches
  // them when a fixture predates the stored column), and the q301
  // header census. Spec-conformant PNG / JPEG(SOF0) / GIF89a / BMP /
  // RIFF-WAVE / MP4(moov) containers are derived from each doc's
  // integer fields as codegen'd hex-concat → unhex expressions (no
  // UDF); doc_id % 7 picks the modality and the remaining ids carry the
  // raw text NUL-prefixed so no container magic can fire. Field map
  // (mirrored arithmetically by every consuming oracle): w = 16 +
  // (id·7) % 2000, h = 16 + (id·13) % 1500, per-format depth/channel/
  // rate lattices as below. [[containerPayloadHexSql]] renders the
  // IDENTICAL synthesis in DuckDB SQL (canonical uppercase hex), so
  // oracles can recompute byte-exact payload transcripts on fixtures
  // where the column is not stored.
  // --------------------------------------------------------------------

  /** Hex string of the low `bytes` bytes of `c`, big-endian. */
  private def beHex(c: Column, bytes: Int): Column =
    lpad(hex(c.cast("long").bitwiseAND(lit((1L << (8 * bytes)) - 1))),
      bytes * 2, "0")

  /** Hex string of the low `bytes` bytes of `c`, LITTLE-endian. */
  private def leHex(c: Column, bytes: Int): Column =
    concat((0 until bytes).map(i =>
      lpad(hex(shiftright(c.cast("long"), 8 * i).bitwiseAND(lit(255L))),
        2, "0")): _*)

  /** The synthesized container payload for (doc_id, text) — binary. */
  def containerPayload(id: Column, text: Column): Column = {
    val m = pmod(id, lit(7L))
    val w = lit(16L) + pmod(id * 7L, lit(2000L))
    val h = lit(16L) + pmod(id * 13L, lit(1500L))
    // PNG: sig, IHDR(len 13), w/h BE32, depth, color type, zeros
    val pngDepth = when(pmod(id, lit(2L)) === 0, 8L).otherwise(16L)
    val pngCtype = element_at(typedLit(Seq(0L, 2L, 6L)),
      (pmod(id, lit(3L)) + 1).cast("int"))
    val pngHex = concat(lit("89504E470D0A1A0A0000000D49484452"),
      beHex(w, 4), beHex(h, 4), beHex(pngDepth, 1), beHex(pngCtype, 1),
      lit("00000000000000"))
    // JPEG: SOI, SOF0 (len 8+3·ncomp, depth 8, h/w BE16), EOI
    val ncomp = lit(1L) + pmod(id, lit(3L))
    val jpgComps = when(ncomp === 1, "010011")
      .when(ncomp === 2, "010011020011").otherwise("010011020011030011")
    val jpgHex = concat(lit("FFD8FFC0"), beHex(lit(8L) + ncomp * 3, 2),
      lit("08"), beHex(h, 2), beHex(w, 2), beHex(ncomp, 1), jpgComps,
      lit("FFD9"))
    // GIF89a: w/h LE16, packed color-resolution bits
    val gifDepth = lit(1L) + pmod(id, lit(8L))
    val gifHex = concat(lit("474946383961"), leHex(w, 2), leHex(h, 2),
      beHex((gifDepth - 1) * 16, 1), lit("0000"))
    // BMP: BM, sizes, BITMAPINFOHEADER w/h LE32, planes, bit count
    val bmpBits = element_at(typedLit(Seq(1L, 8L, 24L, 32L)),
      (pmod(id, lit(4L)) + 1).cast("int"))
    val bmpHex = concat(
      lit("424D46000000000000004600000028000000"),
      leHex(w, 4), leHex(h, 4), lit("0100"), leHex(bmpBits, 2))
    // WAV: RIFF/WAVE, fmt (PCM, ch, rate, block align, bits), data
    val wavCh = lit(1L) + pmod(id, lit(2L))
    val rateH = lit(80L) * (lit(1L) + pmod(id, lit(5L))) // rate / 100
    val wavRate = rateH * 100
    val wavBits = element_at(typedLit(Seq(8L, 16L, 24L)),
      (pmod(id, lit(3L)) + 1).cast("int"))
    val blockAlign = shiftright(wavCh * wavBits, 3)
    val frames = (lit(1L) + pmod(id, lit(100L))) * rateH
    val dataSize = frames * blockAlign
    val wavHex = concat(lit("52494646"), leHex(lit(36L) + dataSize, 4),
      lit("57415645666D74201000000001" + "00"),
      leHex(wavCh, 2), leHex(wavRate, 4), leHex(wavRate * blockAlign, 4),
      leHex(blockAlign, 2), leHex(wavBits, 2),
      lit("64617461"), leHex(dataSize, 4))
    // MP4: ftyp(16) + moov(136){ mvhd v0(28): timescale 1000,
    //      duration; trak(100){ tkhd v0(92): 16.16 w/h at offset 76 } }
    val mp4Dur = pmod(id * 17L, lit(100000L))
    val mp4Hex = concat(
      lit("000000106674797069736F6D00000000"),
      lit("000000886D6F6F76"),
      lit("0000001C6D766864" + "00" * 12 + "000003E8"), beHex(mp4Dur, 4),
      lit("000000647472616B" + "0000005C746B6864" + "00" * 76),
      beHex(w, 2), lit("0000"), beHex(h, 2), lit("0000"))
    // raw leg: NUL-prefix the text bytes so no container magic can
    // fire (0x00 fails every signature; text bytes are valid UTF-8,
    // which never contains 0xFF, so the MP3 sync can't match either)
    val rawBin = concat(unhex(lit("00")), text.cast("binary"))
    when(m === 0, unhex(pngHex))
      .when(m === 1, unhex(jpgHex))
      .when(m === 2, unhex(gifHex))
      .when(m === 3, unhex(bmpHex))
      .when(m === 4, unhex(wavHex))
      .when(m === 5, unhex(mp4Hex))
      .otherwise(rawBin)
  }

  /** The DuckDB-SQL mirror of [[containerPayload]]: an expression over
    * `doc_id` / `text` producing the payload's CANONICAL-UPPERCASE hex
    * transcript (byte-identical to Spark's `hex(payload)`). Oracles
    * work entirely on this transcript — octet lengths as
    * `length(..)//2`, magic as `substr(.., 1, 8)`, fingerprints as
    * `md5(..)` — because DuckDB 1.0 has no BLOB md5; the Spark side of
    * those queries fingerprints `hex(payload)` for the same reason
    * (the md5-of-hex convention).
    */
  def containerPayloadHexSql(id: String = "doc_id",
                             text: String = "text"): String = {
    def be(e: String, bytes: Int): String =
      s"lpad(hex(CAST(($e) AS BIGINT) % ${1L << (8 * bytes)}), ${bytes * 2}, '0')"
    def le(e: String, bytes: Int): String =
      (0 until bytes).map(i =>
        s"lpad(hex((CAST(($e) AS BIGINT) // ${1L << (8 * i)}) % 256), 2, '0')")
        .mkString("concat(", ", ", ")")
    def cat(parts: String*): String = parts.mkString("concat(", ", ", ")")
    def l(s: String): String = s"'$s'"
    val w = s"(16 + ($id * 7) % 2000)"
    val h = s"(16 + ($id * 13) % 1500)"
    val png = cat(l("89504E470D0A1A0A0000000D49484452"), be(w, 4), be(h, 4),
      be(s"CASE WHEN $id % 2 = 0 THEN 8 ELSE 16 END", 1),
      be(s"CASE $id % 3 WHEN 0 THEN 0 WHEN 1 THEN 2 ELSE 6 END", 1),
      l("00000000000000"))
    val ncomp = s"(1 + $id % 3)"
    val jpg = cat(l("FFD8FFC0"), be(s"(8 + $ncomp * 3)", 2), l("08"),
      be(h, 2), be(w, 2), be(ncomp, 1),
      s"CASE $ncomp WHEN 1 THEN '010011' WHEN 2 THEN '010011020011' " +
        "ELSE '010011020011030011' END",
      l("FFD9"))
    val gif = cat(l("474946383961"), le(w, 2), le(h, 2),
      be(s"(($id % 8) * 16)", 1), l("0000"))
    val bmp = cat(l("424D46000000000000004600000028000000"), le(w, 4),
      le(h, 4), l("0100"),
      le(s"CASE $id % 4 WHEN 0 THEN 1 WHEN 1 THEN 8 WHEN 2 THEN 24 ELSE 32 END", 2))
    val wavCh = s"(1 + $id % 2)"
    val rateH = s"(80 * (1 + $id % 5))"
    val wavBits = s"CASE $id % 3 WHEN 0 THEN 8 WHEN 1 THEN 16 ELSE 24 END"
    val blockAlign = s"(($wavCh * $wavBits) // 8)"
    val dataSize = s"((1 + $id % 100) * $rateH * $blockAlign)"
    val wav = cat(l("52494646"), le(s"(36 + $dataSize)", 4),
      l("57415645666D74201000000001" + "00"),
      le(wavCh, 2), le(s"($rateH * 100)", 4),
      le(s"($rateH * 100 * $blockAlign)", 4),
      le(blockAlign, 2), le(wavBits, 2),
      l("64617461"), le(dataSize, 4))
    val mp4 = cat(l("000000106674797069736F6D00000000"),
      l("000000886D6F6F76"),
      l("0000001C6D766864" + "00" * 12 + "000003E8"),
      be(s"(($id * 17) % 100000)", 4),
      l("000000647472616B" + "0000005C746B6864" + "00" * 76),
      be(w, 2), l("0000"), be(h, 2), l("0000"))
    val raw = cat(l("00"), s"hex(CAST($text AS BLOB))")
    s"""CASE ($id % 7) WHEN 0 THEN $png WHEN 1 THEN $jpg WHEN 2 THEN $gif
       |WHEN 3 THEN $bmp WHEN 4 THEN $wav WHEN 5 THEN $mp4
       |ELSE $raw END""".stripMargin
  }

  /** Partition-batched feature extraction over the binary column —
    * the Scala analog of `mapInPandas`: each partition is consumed in
    * [[MediaCodec.batchSize]] groups so a real codec could amortize
    * model/codec setup per batch, never per row.
    */
  def decodeFeatures(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    attachPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[Payload]
      .mapPartitions { it =>
        it.grouped(MediaCodec.batchSize).flatMap { batch =>
          MediaCodec.decodeBatch(batch.map(p => (p.doc_id, p.payload)))
        }
      }
  }

  /** "Resize" analog for opaque payloads: keep every `stride`-th byte
    * (the spatial-downsampling stand-in — a real codec would decode,
    * resample, re-encode; the Spark-side contract is a binary→binary
    * column op that composes with the rest of the pipeline). Native
    * expression: one byte loop per row, no HOF boxing.
    */
  def resizePayload(docs: DataFrame, stride: Int = 4): DataFrame =
    attachPayload(docs)
      .withColumn("resized",
        graft.functions.BinaryExpressions.byteStride(col("payload"), stride))
      .withColumn("resized_bytes", octet_length(col("resized")))

  /** Frame sampling for chunked payloads ("video"): split the payload
    * into fixed-size chunks and keep every `stride`-th — pure column
    * ops, no decode needed for temporal subsampling.
    */
  def sampleFrames(docs: DataFrame, chunkBytes: Int = 32,
                   stride: Int = 4): DataFrame =
    attachPayload(docs)
      .select(col("doc_id"), col("payload"), col("n_bytes"))
      .withColumn("frame_idx",
        explode(sequence(lit(0L),
          greatest(floor((col("n_bytes") - 1) / chunkBytes).cast("long"), lit(0L)))))
      .filter(col("frame_idx") % stride === 0)
      .withColumn("frame",
        substring(col("payload"), (col("frame_idx") * chunkBytes + 1).cast("int"), lit(chunkBytes)))
      .select(col("doc_id"), col("frame_idx"), col("frame"))
}
