package graft

/** The events loader's footer-branched read plan and its ts-range data
  * contract. The r9 failure mode was a silent unit flip (the testdata
  * re-materialized from TIMESTAMP(NANOS) to TIMESTAMP_MICROS while the
  * loader kept dividing by 1000): the whole 30-day tape collapsed into
  * ~43 minutes of 1970 and surfaced only as 37 downstream oracle hash
  * mismatches. These tests pin that (a) both encodings load to the same
  * contract (`ts: TimestampType`, µs), and (b) a wrong-unit tape fails
  * loudly at load time with a named error.
  */
class TablesSpec extends SparkTestBase {
  import spark.implicits._

  test("events loader accepts both nanos-long and micros-timestamp encodings") {
    // the real testdata is the micros-timestamp encoding
    val real = Tables.events(spark, sf)
    assert(real.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // nanos-era encoding: raw BIGINT nanos column
    val dir = java.nio.file.Files.createTempDirectory("graft_tables").toString
    val t0ns = 19723L * 86400L * 1000000000L // 2024-01-01 00:00 UTC in ns
    Seq((1L, t0ns, 1L, "t", 1.0, "{}"),
        (2L, t0ns + 3600L * 1000000000L, 1L, "t", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val nanosRead = Tables.events(spark, dir)
    assert(nanosRead.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(nanosRead.select("ts").as[java.sql.Timestamp].collect()
      .map(_.toInstant.toString).sorted.toSeq ==
      Seq("2024-01-01T00:00:00Z", "2024-01-01T01:00:00Z"))
  }

  test("an empty events table loads as an empty frame, not a guard error") {
    // the guard is about unit drift, not emptiness: min/max NULL passes
    val dir = java.nio.file.Files.createTempDirectory("graft_tables").toString
    Tables.events(spark, sf).filter(org.apache.spark.sql.functions.lit(false))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(Tables.events(spark, dir).count() == 0)
  }

  test("ts-range contract guard fires loudly on a wrong-unit tape") {
    // µs values stored in a raw long column: the nanos branch divides by
    // 1000 and the tape lands in 1970 — exactly the r9 drift signature,
    // which must now be a load-time error, not a silent wrong answer
    val dir = java.nio.file.Files.createTempDirectory("graft_tables").toString
    val t0us = 19723L * 86400L * 1000000L
    Seq((1L, t0us, 1L, "t", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException] { Tables.events(spark, dir) }
    assert(e.getMessage.contains("data contract violated"), e.getMessage)
  }
}
