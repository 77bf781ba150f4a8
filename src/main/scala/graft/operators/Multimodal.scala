package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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

  /** Attach an opaque binary payload column (here: UTF-8 bytes of the
    * document text — the stand-in for real image/audio bytes) plus the
    * metadata a lakehouse would track alongside it.
    */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", col("text").cast("binary"))
      .withColumn("n_bytes", octet_length(col("payload")))
      .withColumn("content_md5", md5(col("payload")))

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
