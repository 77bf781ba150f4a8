package graft

import org.apache.spark.sql.functions._

/** Smoke + invariant checks for every SparkEntry query at sf0.001.
  * (Value-level correctness is enforced by the DuckDB oracle gate at
  * sf0.01 — see tools/check_oracle.py; these tests pin structure and
  * cheap invariants so `sbt test` catches regressions early.)
  */
class QueriesSpec extends SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("q1 groups by returnflag x linestatus") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf)
    assert(df.columns.toSet.contains("sum_qty"))
    assert(df.count() <= 6)
  }

  test("q9 topk returns exactly 25 descending rows") {
    val rows = SparkEntry.queries("q9_topk")(spark, sf).collect()
    assert(rows.length == 25)
    val prices = rows.map(_.getDouble(2))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q104 boundary: an exact 30-minute gap merges into one native session") {
    // the sf fixtures have no exact-gap pairs, so the oracle can't
    // certify this boundary — pin the engine behavior (and thus the
    // oracle's `>`-splits mirror) on a synthetic pair
    import spark.implicits._
    val two = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00")))
      .toDF("user_id", "ts")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .count()
    assert(two.count() == 1, "exact-gap events must merge into one session")
    val split = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00.000001")))
      .toDF("user_id", "ts")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .count()
    assert(split.count() == 2, "a gap beyond 30 minutes must split")
  }

  test("q29 pit latest: one row per (user, event_type)") {
    val df = SparkEntry.queries("q29_pit_latest")(spark, sf)
    assert(df.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("q27 sessions cover all events") {
    val sessions = SparkEntry.queries("q27_sessionize")(spark, sf)
    val total = sessions.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }

  test("q35 brute-force ANN: 5 neighbors per query, cos in [-1,1]") {
    val df = SparkEntry.queries("q35_ann_bruteforce")(spark, sf)
    assert(df.groupBy("query_id").count().filter(col("count") =!= 5).count() == 0)
    assert(df.filter(abs(col("cos_sim")) > 1.000001).count() == 0)
  }
}
