package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source abstraction behind [[Streams.normalize]]: every streaming
  * twin consumes the CANONICAL events frame (`event_id, ts(µs
  * TimestampType), user_id, event_type, value, props`) and never knows
  * which transport produced it — the kappa contract made explicit.
  *
  * Two transports ship:
  *
  *  - [[FileEvents]] — a parquet landing directory (replay/test path),
  *    normalized by the same footer-branched read plan as the batch
  *    loader, so a unit change in the source encoding is handled
  *    identically on batch and streaming reads.
  *
  *  - [[KafkaShapedEvents]] — a message-bus feed in the EXACT envelope
  *    Spark's Kafka connector emits (`key/value: binary, topic:
  *    string, partition: int, offset: long, timestamp, timestampType`)
  *    with the event JSON-serialized in `value`. The envelope frame is
  *    INJECTED rather than constructed here: in production it comes
  *    from `spark.readStream.format("kafka")` (the connector jar is an
  *    external dependency by design), in tests from any stream wearing
  *    the same schema — the normalization, which is the part this
  *    library owns, is identical either way. Malformed payloads
  *    (unparseable JSON / missing event_id) are DROPPED from the
  *    normalized frame, not poison, and surface verbatim on
  *    [[KafkaShapedEvents.deadLetter]] — the two frames partition the
  *    envelope exactly, so a production job sinks the dead letters
  *    and serves the engine off the same split (spec-pinned with
  *    mixed good/corrupt payloads through a live twin).
  */
sealed trait EventSource {
  /** The canonical normalized events frame for this transport. */
  def normalized(spark: SparkSession): DataFrame
}

/** File-source stream over an events parquet directory — see
  * [[Streams.eventsStream]] for the sniff-once contract.
  */
final case class FileEvents(path: String) extends EventSource {
  override def normalized(spark: SparkSession): DataFrame = {
    val (schema, normalize) =
      try Tables.eventsReadPlan(spark, path)
      catch {
        // empty or not-yet-created landing dir: nothing to sniff at
        // stream construction (the kappa start-then-produce pattern) —
        // fall back to the current-era micros plan instead of failing
        case _: org.apache.spark.sql.AnalysisException =>
          Tables.eventsMicrosPlan
      }
    normalize(spark.readStream.schema(schema).parquet(path))
  }
}

/** Kafka-profile transport: `envelope` must wear
  * [[KafkaShapedEvents.EnvelopeSchema]]; `value` holds the
  * [[KafkaShapedEvents.PayloadSchema]] JSON with `ts` as epoch
  * MICROSECONDS (the producer-side unit is pinned in the wire
  * contract, so the cross-source unit sniffing the file path needs has
  * no message-bus counterpart).
  */
final case class KafkaShapedEvents(envelope: DataFrame) extends EventSource {

  private def requireEnvelope(): Unit =
    require(envelope.schema.fieldNames.toSet ==
      KafkaShapedEvents.EnvelopeSchema.fieldNames.toSet,
      s"not a Kafka-shaped envelope: ${envelope.schema.simpleString}")

  override def normalized(spark: SparkSession): DataFrame = {
    requireEnvelope()
    envelope
      .select(from_json(col("value").cast("string"),
        KafkaShapedEvents.PayloadSchema).as("e"))
      .filter(col("e.event_id").isNotNull)
      .select(col("e.event_id").as("event_id"),
        timestamp_micros(col("e.ts")).as("ts"),
        col("e.user_id").as("user_id"),
        col("e.event_type").as("event_type"),
        col("e.value").as("value"),
        col("e.props").as("props"))
  }

  /** The complementary split — envelopes whose payload does NOT
    * normalize (unparseable JSON, NULL value, or a parsed object
    * missing event_id), kept IN ENVELOPE FORM so a production job can
    * sink them verbatim for replay/forensics: `writeStream` this frame
    * to the dead-letter topic/table and [[normalized]] to the engine;
    * the two frames partition the input exactly (spec-pinned). Works
    * on batch and streaming envelopes alike (the filter is stateless).
    */
  def deadLetter(spark: SparkSession): DataFrame = {
    requireEnvelope()
    envelope.filter(from_json(col("value").cast("string"),
      KafkaShapedEvents.PayloadSchema).getField("event_id").isNull)
  }
}

object KafkaShapedEvents {

  /** The Kafka connector's fixed output schema, verbatim. */
  val EnvelopeSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Wire payload: the events schema with `ts` as epoch µs. */
  val PayloadSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Producer-side helper (tests, e2e fixtures): wrap a batch events
    * frame in the wire envelope — user-keyed partitioning (the
    * ordering domain a real producer keys on so per-user order
    * survives the bus) and per-partition offsets by event time.
    */
  def envelopeFrom(events: DataFrame, topic: String,
                   nPartitions: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val part = pmod(col("user_id"), lit(nPartitions.toLong)).cast("int")
    events
      .select(col("user_id").cast("string").cast("binary").as("key"),
        to_json(struct(col("event_id"),
          unix_micros(col("ts")).as("ts"), col("user_id"),
          col("event_type"), col("value"), col("props")))
          .cast("binary").as("value"),
        lit(topic).as("topic"), part.as("partition"),
        col("ts").as("timestamp"), lit(0).as("timestampType"),
        col("event_id").as("__eid"), col("ts").as("__ts"))
      .withColumn("offset", row_number().over(Window
        .partitionBy(col("partition"))
        .orderBy(col("__ts"), col("__eid"))).cast("long") - 1L)
      .drop("__eid", "__ts")
  }
}
