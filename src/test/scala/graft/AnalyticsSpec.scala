package graft

import org.apache.spark.sql.functions._

/** Invariant checks for the round-5 analytics batch (q73–q84).
  * Value-level correctness is the DuckDB oracle gate; these pin the
  * semantic contracts that survive any data change, plus synthetic-
  * fixture differentials for the order-sensitive operators.
  */
class AnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  /** Synthetic events fixture: (event_id, ts_micros-offset, user_id, type,
    * value) written the way the nanos-era table is stored (raw nanos
    * longs). Offsets are rebased to 2024-01-01 00:00 UTC so the tape
    * satisfies the loader's ts-range contract guard.
    */
  private val t0d = 19723L // 2024-01-01 in epoch days
  private val t0 = t0d * 86400L * 1000000L

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_synth").toString
    rows.map { case (id, us, u, t, v) => (id, (t0 + us) * 1000L, u, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q83 equals brute-force interval stacking, including a zero-concurrency day") {
    val h = 3600L * 1000000L
    // three overlapping clicks in one burst, one isolated click whose
    // 30-min interval ends on the NEXT day (that day's max conc is 0)
    val rows = Seq(
      (1L, 10 * h, 1L, "click", 1.0),                 // day0 10:00
      (2L, 10 * h + 600L * 1000000L, 2L, "click", 1.0), // 10:10
      (3L, 10 * h + 1200L * 1000000L, 3L, "click", 1.0), // 10:20
      (4L, 47 * h + 3000L * 1000000L, 4L, "click", 1.0)) // day1 23:50 → ends day2
    val dir = writeEvents(rows)
    val got = SparkEntry.queries("q83_concurrency")(spark, dir)
      .select($"day", $"max_concurrency").as[(java.sql.Timestamp, Long)]
      .collect().toMap.map { case (d, c) => (d.getTime / 86400000L - t0d, c) }
    // brute force: conc(pt) = #{intervals with start <= pt < end}
    val iv = rows.map { case (_, us, _, _, _) => (us, us + 1800L * 1000000L) }
    val pts = iv.flatMap { case (s, e) => Seq(s, e) }.distinct
    val expected = pts.groupBy(_ / (86400L * 1000000L)).map { case (day, ps) =>
      day -> ps.map(p => iv.count { case (s, e) => s <= p && p < e }.toLong).max
    }
    assert(got == expected, s"got=$got expected=$expected")
    assert(expected.values.exists(_ == 0L)) // the end-points-only day is present
    assert(expected.values.max == 3L)
  }

  test("q82 linear interpolation matches hand computation on a gapped series") {
    val day = 86400L * 1000000L
    val noon = 12L * 3600L * 1000000L
    // user 9: values on days 0, 3, 6 only → days 1-2 and 4-5 interpolate
    val rows = Seq(
      (1L, 0 * day + noon, 9L, "view", 1.0),
      (2L, 3 * day + noon, 9L, "view", 4.0),
      (3L, 6 * day + noon, 9L, "view", 10.0))
    val dir = writeEvents(rows)
    val got = SparkEntry.queries("q82_interpolate")(spark, dir)
      .select($"day", $"close_interp").as[(java.sql.Timestamp, Double)]
      .collect().toMap.map { case (d, v) => (d.getTime / 86400000L - t0d, v) }
    val expected = Map(0L -> 1.0, 1L -> 2.0, 2L -> 3.0, 3L -> 4.0,
      4L -> 6.0, 5L -> 8.0, 6L -> 10.0)
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("q73 drawdown is non-negative and bounded by the peak") {
    val df = SparkEntry.queries("q73_drawdown")(spark, sf)
    assert(df.filter(col("max_drawdown") < 0).count() == 0)
    assert(df.filter(col("max_drawdown") > col("peak_value")).count() == 0)
  }

  test("q74 vwap lies within the per-group price/quantity envelope") {
    // vwap = sum(price)/sum(qty); with qty >= 1 it must be positive and
    // no larger than the max extendedprice in the group
    val df = SparkEntry.queries("q74_vwap")(spark, sf)
    assert(df.filter(col("vwap") <= 0).count() == 0)
  }

  test("q75 rollup grand total equals the table total") {
    val df = SparkEntry.queries("q75_calendar_rollup")(spark, sf)
    val grand = df.filter(col("yr") === -1 && col("qtr") === -1 && col("mo") === -1)
      .select("n_orders").collect()
    assert(grand.length == 1)
    assert(grand(0).getLong(0) == Tables.orders(spark, sf).count())
  }

  test("q76 beta of the market against itself would be 1; users are finite") {
    val df = SparkEntry.queries("q76_beta")(spark, sf)
    assert(df.filter(col("beta").isNull || isnan(col("beta"))).count() == 0)
    assert(df.filter(col("n_days") < 10).count() == 0)
  }

  test("q77 anti join excludes every customer with an urgent order") {
    val df = SparkEntry.queries("q77_no_order_customers")(spark, sf)
    val urgentCust = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct().count()
    val total = Tables.customer(spark, sf).count()
    val kept = df.agg(sum("n_cust")).collect()(0).getLong(0)
    assert(kept <= total - urgentCust)
  }

  test("q78 emits at most 3 rows per brand with ranks 1..3") {
    val df = SparkEntry.queries("q78_topn_per_group")(spark, sf)
    assert(df.groupBy("p_brand").count().filter(col("count") > 3).count() == 0)
    assert(df.filter(col("rnk") < 1 || col("rnk") > 3).count() == 0)
  }

  test("q79 histogram counts and shares are consistent") {
    val rows = SparkEntry.queries("q79_histogram")(spark, sf)
      .orderBy("bucket_lo").collect()
    val total = rows.map(_.getLong(1)).sum
    assert(rows.last.getLong(2) == total)          // cum_n reaches total
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-9)
  }

  test("q80 MAD is non-negative and outliers are a minority") {
    val df = SparkEntry.queries("q80_mad_outliers")(spark, sf)
    assert(df.filter(col("mad") < 0).count() == 0)
    val ev = Tables.events(spark, sf).count()
    val out = df.agg(sum("n_outliers")).collect()(0).getLong(0)
    assert(out < ev / 2)
  }

  test("q81 twap lies within each user's value range") {
    val twap = SparkEntry.queries("q81_twap")(spark, sf)
    val bounds = Tables.events(spark, sf).groupBy("user_id")
      .agg(min("value").as("lo"), max("value").as("hi"))
    val bad = twap.join(bounds, Seq("user_id"))
      .filter(col("twap") < col("lo") - 1e-6 || col("twap") > col("hi") + 1e-6)
    assert(bad.count() == 0)
  }

  test("q82 interpolation fills every spine day and stays in the neighbor envelope") {
    val df = SparkEntry.queries("q82_interpolate")(spark, sf)
    assert(df.filter(col("close_interp").isNull).count() == 0)
    // same spine as q60: row count matches the forward-fill variant
    val ff = SparkEntry.queries("q60_gap_fill")(spark, sf)
    assert(df.count() == ff.count())
  }

  test("q83 concurrency is non-negative and bounded by events per type") {
    val df = SparkEntry.queries("q83_concurrency")(spark, sf)
    // >= 0, not >= 1: a day whose only sweep points are interval ENDS
    // (last event of a type within 30 min of midnight) legitimately
    // reports concurrency 0
    assert(df.filter(col("max_concurrency") < 0).count() == 0)
    val perType = Tables.events(spark, sf).groupBy("event_type").count()
    val bad = df.groupBy("event_type").agg(max("max_concurrency").as("mx"))
      .join(perType, Seq("event_type"))
      .filter(col("mx") > col("count"))
    assert(bad.count() == 0)
  }

  test("q88 overlap never exceeds the trading window length per session-day") {
    val df = SparkEntry.queries("q88_interval_overlap")(spark, sf)
    val windowUs = (16L * 3600 - (9L * 3600 + 1800)) * 1000000L
    assert(df.filter(col("overlap_us") <= 0).count() == 0)
    assert(df.filter(col("overlap_us") > col("n_sessions") * windowUs).count() == 0)
  }

  test("q84 retention: week-0 cohort sizes sum to the distinct user count") {
    val df = SparkEntry.queries("q84_retention")(spark, sf)
    val week0 = df.filter(col("weeks_since") === 0)
      .agg(sum("n_users")).collect()(0).getLong(0)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(week0 == users) // every user is active in their cohort week
    assert(df.filter(col("weeks_since") < 0).count() == 0)
  }
}
