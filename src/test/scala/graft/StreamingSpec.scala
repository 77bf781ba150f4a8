package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Streaming smoke: the sf0.001 events parquet replayed through the
  * file source drives both the watermarked window agg and the stateful
  * sessionizer synchronously (memory sink + processAllAvailable).
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  /** The file stream source needs a directory, not a single file. */
  private lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("watermarked windowed aggregation over the events stream") {
    val stream = Streams.eventsStream(spark, streamDir)
    val q = Streams.windowedCounts(stream).writeStream
      .outputMode("append").format("memory").queryName("win_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    // append mode only emits windows the watermark has passed; replaying a
    // bounded file advances the watermark to max(ts)-1h, so most windows close.
    val out = spark.table("win_out")
    assert(out.count() > 0)
    assert(out.agg(sum("n")).collect()(0).getLong(0) > 0)
  }

  test("stateful sessionization emits gap-closed sessions") {
    val stream = Streams.eventsStream(spark, streamDir)
    val q = Streams.sessionize(spark, stream).writeStream
      .outputMode("append").format("memory").queryName("sess_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val out = spark.table("sess_out")
    assert(out.count() > 0)
    // invariant: session_end >= session_start, n_events >= 1
    assert(out.filter($"session_end" < $"session_start").count() == 0)
    assert(out.filter($"n_events" < 1).count() == 0)
  }

  test("batch and streaming sessionization agree on closed sessions") {
    val batch = SparkEntry.queries("q27_sessionize")(spark, sf)
    val stream = Streams.eventsStream(spark, streamDir)
    val q = Streams.sessionize(spark, stream).writeStream
      .outputMode("append").format("memory").queryName("sess_cmp").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = spark.table("sess_cmp")
      .select($"user_id", $"session_start", $"n_events")
    // every streamed (closed) session appears in the batch result
    val missing = streamed.join(
      batch.select($"user_id", $"session_start", $"n_events"),
      Seq("user_id", "session_start", "n_events"), "left_anti")
    assert(missing.count() == 0)
  }
}
