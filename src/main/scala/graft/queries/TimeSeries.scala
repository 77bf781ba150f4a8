package graft.queries

import graft.Tables
import graft.operators.AsOf
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / security-master operators (SURVEY §2, q21–q30).
  *
  * All keyed by `user_id` (the high-cardinality key at scale): every
  * window shuffles once on the key and sorts within partitions — the
  * plan that survives a 100× scale-up by just raising partition count.
  */
object TimeSeries {

  /** q21_asof_join — each purchase matched to the user's latest signup
    * at-or-before it (price-as-of-trade-time analog). See [[AsOf]].
    */
  def q21AsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id", $"ts", $"value")
    AsOf.join(purchases, signups, key = "user_id",
      leftTs = "ts", rightTs = "ts",
      rightVals = Seq("ts" -> "ref_ts", "value" -> "ref_value"))
  }

  val q21Sql: String =
    """SELECT p.event_id, p.user_id, p.ts, p.value, s.ts AS ref_ts, s.value AS ref_value
      |FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') p
      |ASOF JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'signup') s
      |  ON p.user_id = s.user_id AND p.ts >= s.ts""".stripMargin

  /** q22_ohlcv_resample — hourly OHLCV bars per event_type: time_bucket
    * + arg_min/arg_max (`min_by`/`max_by`), single hash aggregation.
    */
  def q22OhlcvResample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type", date_trunc("hour", $"ts").as("bucket"))
      .agg(
        min_by($"value", $"ts").as("open"),
        max($"value").as("high"),
        min($"value").as("low"),
        max_by($"value", $"ts").as("close"),
        // money lattice (q5's sf1.0 lesson): bar volume grows with
        // feed density, drift with it
        round(sum($"value"
          .cast(org.apache.spark.sql.types.DecimalType(18, 2))), 2)
          .cast("double").as("volume"),
        count(lit(1)).as("n_trades"))
  }

  val q22Sql: String =
    """SELECT event_type, date_trunc('hour', ts) AS bucket,
      |  arg_min(value, ts) AS open, max(value) AS high, min(value) AS low,
      |  arg_max(value, ts) AS close,
      |  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
      |    AS volume,
      |  count(*) AS n_trades
      |FROM events GROUP BY event_type, date_trunc('hour', ts)""".stripMargin

  /** q23_moving_avg — 7-row rolling mean/stddev per user (rolling
    * volatility analog).
    */
  def q23MovingAvg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-6, Window.currentRow)
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"ts", $"value")
      .withColumn("ma7", round(avg($"value").over(w), 4))
      .withColumn("vol7", round(stddev_samp($"value").over(w), 4))
      .select($"user_id", $"event_id", $"ma7", $"vol7")
  }

  val q23Sql: String =
    """SELECT user_id, event_id,
      |  round(avg(value) OVER w, 4) AS ma7,
      |  round(stddev_samp(value) OVER w, 4) AS vol7
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin

  /** q24_returns — lag-based pct change per user (daily-returns analog). */
  def q24Returns(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"ts", $"value")
      .withColumn("prev", lag($"value", 1).over(w))
      // nullif guards ANSI divide-by-zero (value can be exactly 0.0).
      // The round happens in DECIMAL space: a ratio like 8.0046875
      // terminates exactly on a half boundary at 6dp, where Spark's
      // BigDecimal HALF_UP and DuckDB's binary-double rounding disagree
      // (bit one row at sf0.1); via decimal(28,12) both engines apply
      // half-up to the same decimal value — and -0.0 normalizes to 0.
      .withColumn("ret", round((($"value" - $"prev") / nullif($"prev", lit(0.0)))
        .cast(org.apache.spark.sql.types.DecimalType(28, 12)), 6).cast("double"))
      .select($"user_id", $"event_id", $"ret")
  }

  val q24Sql: String =
    """SELECT user_id, event_id,
      |  CAST(round(CAST((value - lag(value) OVER w) / nullif(lag(value) OVER w, 0.0)
      |    AS DECIMAL(28,12)), 6) AS DOUBLE) AS ret
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin

  /** q25_cum_adjustment — cumulative adjustment factor per user as a
    * running product, computed as exp∘sum∘ln for a single window pass
    * (split/dividend back-adjustment analog). Reported in log space
    * for numerical comparability.
    */
  def q25CumAdjustment(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"ts", $"value")
      .withColumn("log_adj",
        round(sum(log(lit(1.0) + $"value" / 1000.0)).over(w), 6))
      .select($"user_id", $"event_id", $"log_adj")
  }

  val q25Sql: String =
    """SELECT user_id, event_id,
      |  round(sum(ln(1.0 + value / 1000.0)) OVER w, 6) AS log_adj
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  /** q26_gap_detect — missing-data screen: intervals > 4h between
    * consecutive events of a user (missing-trading-day analog).
    */
  def q26GapDetect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"ts")
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("gap_sec",
        round((unix_micros($"ts") - unix_micros($"prev_ts")) / 1e6, 3))
      .filter($"gap_sec" > 4 * 3600)
      .select($"user_id", $"prev_ts".as("gap_start"), $"ts".as("gap_end"), $"gap_sec")
  }

  val q26Sql: String =
    """SELECT user_id, prev_ts AS gap_start, ts AS gap_end, gap_sec FROM (
      |  SELECT user_id, ts, lag(ts) OVER w AS prev_ts,
      |    round((epoch_us(ts) - epoch_us(lag(ts) OVER w)) / 1e6, 3) AS gap_sec
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |WHERE gap_sec > 14400""".stripMargin

  /** q27_sessionize — 30-min-inactivity sessions: boundary flag via lag,
    * session id via running sum, then per-session rollup. Two window
    * passes over the same (user_id) shuffle — Catalyst reuses the
    * exchange.
    */
  def q27Sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"ts", $"value")
      .withColumn("prev_ts", lag($"ts", 1).over(wOrd))
      .withColumn("is_new", when($"prev_ts".isNull ||
        (unix_micros($"ts") - unix_micros($"prev_ts")) > 1800L * 1000000L, 1L)
        .otherwise(0L))
      .withColumn("session_id", sum($"is_new").over(wRun))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        min($"ts").as("session_start"),
        max($"ts").as("session_end"),
        round(sum($"value"), 2).as("session_value"))
  }

  val q27Sql: String =
    """SELECT user_id, session_id, count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  round(sum(value), 2) AS session_value
      |FROM (
      |  SELECT user_id, ts, value,
      |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM (
      |    SELECT user_id, event_id, ts, value,
      |      CASE WHEN lag(ts) OVER w IS NULL
      |            OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |           THEN 1 ELSE 0 END AS is_new
      |    FROM events
      |    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)))
      |GROUP BY user_id, session_id""".stripMargin

  /** q104_session_window — the NATIVE `session_window` aggregate (the
    * engine-managed dual of q27's manual lag/cumsum sessionization;
    * same operator Structured Streaming uses for merging session
    * state). Boundary semantics: a session whose start EQUALS the
    * previous session's end is MERGED (verified empirically on Spark
    * 4.1.2 — events exactly 30 min apart form one session), i.e. the
    * same `>`-splits boundary as q27; session_end is last event + gap
    * rather than the last event itself. The boundary is pinned by a
    * synthetic-fixture test, since the sf data contains no exact-gap
    * pairs for the oracle to certify it.
    */
  def q104SessionWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value"), 2).as("session_value"))
      .select($"user_id", $"sw.start".as("session_start"),
        $"sw.end".as("session_end"), $"n_events", $"session_value")
  }

  val q104Sql: String =
    """SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  count(*) AS n_events, round(sum(value), 2) AS session_value
      |FROM (
      |  SELECT user_id, ts, value,
      |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      |  FROM (
      |    SELECT user_id, event_id, ts, value,
      |      CASE WHEN lag(ts) OVER w IS NULL
      |            OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |           THEN 1 ELSE 0 END AS is_new
      |    FROM events
      |    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)))
      |GROUP BY user_id, sid""".stripMargin

  /** q28_scd2_intervals — SCD-type-2 validity intervals per (user,type):
    * valid_from = ts, valid_to = next change (NULL = current record).
    */
  def q28Scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id", $"event_type").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .filter($"event_type".isin("signup", "purchase"))
      .select($"user_id", $"event_type", $"ts", $"value", $"event_id")
      .withColumn("valid_to", lead($"ts", 1).over(w))
      .select($"user_id", $"event_type", $"ts".as("valid_from"), $"valid_to", $"value")
  }

  val q28Sql: String =
    """SELECT user_id, event_type, ts AS valid_from,
      |  lead(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS valid_to,
      |  value
      |FROM events WHERE event_type IN ('signup', 'purchase')""".stripMargin

  /** q29_pit_latest — point-in-time current record per (user, type):
    * dedup-by-recency via row_number, the upsert-compaction primitive.
    */
  def q29PitLatest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts".desc, $"event_id".desc)
    Tables.events(spark, dir)
      .select($"user_id", $"event_type", $"ts", $"value", $"event_id")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type", $"ts".as("latest_ts"), $"value".as("latest_value"))
  }

  val q29Sql: String =
    """SELECT user_id, event_type, ts AS latest_ts, value AS latest_value FROM (
      |  SELECT user_id, event_type, ts, value,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1""".stripMargin

  /** q30_zscore_outliers — per-type z-score screen: group stats are a
    * tiny aggregate broadcast back against the fact table (no second
    * shuffle of the large side).
    */
  def q30ZscoreOutliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val stats = ev.groupBy($"event_type".as("et"))
      .agg(avg($"value").as("m"), stddev_samp($"value").as("s"))
    ev.join(broadcast(stats), $"event_type" === $"et")
      .withColumn("z", ($"value" - $"m") / $"s")
      .filter(abs($"z") > 2.5)
      .select($"event_id", $"event_type", $"value", round($"z", 4).as("z"))
  }

  val q30Sql: String =
    """SELECT event_id, event_type, value, round((value - m) / s, 4) AS z
      |FROM events JOIN (
      |  SELECT event_type AS et, avg(value) AS m, stddev_samp(value) AS s
      |  FROM events GROUP BY event_type) ON event_type = et
      |WHERE abs((value - m) / s) > 2.5""".stripMargin

  /** q71_ewma — exponentially weighted moving average per user: the
    * classic RECURSIVE time-series smoother (ewma_t = α·x_t +
    * (1-α)·ewma_{t-1}) that no SQL window frame expresses. Typed
    * Dataset path: groupByKey + flatMapGroups with an in-group sort —
    * per-group state is one double, group size is one user's history
    * (the same bound every keyed window in this module relies on).
    * rows-only: DuckDB has no recursive-window equivalent.
    */
  case class EwmaRow(user_id: Long, ts_us: Long, event_id: Long,
                     value: Double, ewma: Double)

  /** EWMA display rounding, shared by the batch plan and the s6
    * streaming state so their outputs stay bit-identical. Two-step
    * decimal half-up (scale 12 then scale 4) mirrors the oracle's
    * `round(CAST(s AS DECIMAL(28,12)), 4)` EXACTLY — a single-step
    * round of the full binary expansion diverges when digits 5–12 sit
    * on a …49999… boundary that the decimal(28,12) cast first lifts
    * to …5.
    */
  private[graft] def ewmaRound(s: Double): Double =
    BigDecimal(s).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  def ewma(spark: SparkSession, dir: String, alpha: Double): org.apache.spark.sql.Dataset[EwmaRow] = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id", $"value")
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (user: Long, rows: Iterator[(Long, Long, Long, Double)]) =>
        var s = Double.NaN
        rows.toSeq.sortBy(r => (r._2, r._3)).iterator.map { case (_, tsUs, id, v) =>
          s = if (s.isNaN) v else alpha * v + (1 - alpha) * s
          EwmaRow(user, tsUs, id, v, ewmaRound(s))
        }
      }
  }

  def q71Ewma(spark: SparkSession, dir: String): DataFrame =
    ewma(spark, dir, alpha = 0.2).toDF()

  /** q71's oracle: the same recursion as a recursive CTE. The per-user
    * fold applies the SAME IEEE ops in the SAME order on both engines —
    * the SQL spells out `(1 - 0.2)` to mirror the Scala expression
    * shape `(1 - alpha)` (the values coincide with the literal 0.8;
    * keeping the shapes identical is what makes that a non-question) —
    * and the display round goes through decimal(28,12) then 4 on both
    * sides.
    */
  val q71Sql: String =
    """WITH RECURSIVE seq AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS rn
      |  FROM events),
      |ew AS (
      |  SELECT user_id, rn, ts_us, event_id, value, value AS s
      |  FROM seq WHERE rn = 1
      |  UNION ALL
      |  SELECT s2.user_id, s2.rn, s2.ts_us, s2.event_id, s2.value,
      |    0.2 * s2.value + (1 - 0.2) * ew.s
      |  FROM seq s2 JOIN ew ON s2.user_id = ew.user_id AND s2.rn = ew.rn + 1)
      |SELECT user_id, ts_us, event_id, value,
      |  CAST(round(CAST(s AS DECIMAL(28,12)), 4) AS DOUBLE) AS ewma
      |FROM ew""".stripMargin

  /** q97_rolling_vol — 20-observation realized volatility of simple
    * returns per user. Both window passes (lag → return, 20-row
    * trailing stddev) ride the SAME (user_id, ts) shuffle+sort — one
    * exchange total; partial windows dropped (first 20 returns per
    * user). Decimal-space rounding per the oracle convention.
    */
  def q97RollingVol(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"value")
      // nullif guard: a zero previous observation yields a NULL return
      // (undefined pct-change), not a DIVIDE_BY_ZERO abort under Spark
      // 4's default ANSI mode; stddev then skips it on both engines.
      .withColumn("ret",
        $"value" / nullif(lag($"value", 1).over(w), lit(0.0)) - 1)
      .withColumn("rn", row_number().over(w))
      .withColumn("v", stddev_samp($"ret").over(w.rowsBetween(-19, 0)))
      .filter($"rn" >= 21)
      .select($"event_id", graft.functions.Num.decRound($"v", 4).as("vol20"))
  }

  val q97Sql: String =
    """SELECT event_id, CAST(round(CAST(v AS DECIMAL(28,12)), 4) AS DOUBLE) AS vol20
      |FROM (
      |  SELECT event_id,
      |    stddev_samp(ret) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS v,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM (
      |    SELECT user_id, ts, event_id,
      |      value / nullif(lag(value) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id), 0) - 1 AS ret
      |    FROM events))
      |WHERE rn >= 21""".stripMargin

  /** q98_factor_adjust — the security-master adjustment-factor apply:
    * a daily factor is computed from each day's observations, published
    * at the NEXT midnight, and only every third day (sparse feed); each
    * event is scaled by the factor in effect at its timestamp. The
    * factor table is a GLOBAL tiny dim, so this is
    * [[AsOf.broadcastJoin]] — the event side never shuffles, unlike the
    * keyed union-window as-of (q21) which would funnel a keyless join
    * through one partition.
    */
  /** The sparse factor dim shared by batch q98 and the s10 stream-
    * static twin: per-day mean value, published at the NEXT midnight,
    * only every third day.
    */
  def dailyFactors(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(date_trunc("DAY", $"ts").as("day"))
      .agg(avg($"value").as("r"))
      .filter(dayofmonth($"day") % 3 === 1)
      .select(($"day" + expr("INTERVAL 1 DAY")).as("eff_ts"),
        graft.functions.Num.decRound($"r", 6).as("rate"))
  }

  def q98FactorAdjust(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    AsOf.broadcastJoin(ev.select($"event_id", $"ts", $"value"),
        dailyFactors(spark, dir),
        leftTs = "ts", rightTs = "eff_ts", rightVals = Seq("rate" -> "rate"))
      .select($"event_id", $"value", $"rate",
        graft.functions.Num.decRound($"value" * $"rate", 4).as("adj_value"))
  }

  val q98Sql: String =
    """WITH rates AS (
      |  SELECT date_trunc('day', ts) + INTERVAL 1 DAY AS eff_ts,
      |    CAST(round(CAST(avg(value) AS DECIMAL(28,12)), 6) AS DOUBLE) AS rate
      |  FROM events
      |  GROUP BY date_trunc('day', ts)
      |  HAVING date_part('day', date_trunc('day', ts)) % 3 = 1)
      |SELECT e.event_id, e.value, r.rate,
      |  CAST(round(CAST(e.value * r.rate AS DECIMAL(28,12)), 4) AS DOUBLE)
      |    AS adj_value
      |FROM events e ASOF JOIN rates r ON e.ts >= r.eff_ts""".stripMargin
}
