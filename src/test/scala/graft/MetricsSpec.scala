package graft

import org.apache.spark.sql.functions._

/** Invariant checks + synthetic-fixture differentials for the round-5c
  * metrics batch (q106–q114). Value-level correctness is the DuckDB
  * oracle gate; these pin semantic contracts that survive data changes.
  */
class MetricsSpec extends SparkTestBase {
  import spark.implicits._

  /** Fixture rows are given as µs offsets from 2024-01-01 00:00 UTC so the
    * synthetic tape satisfies the loader's ts-range contract guard. */
  private val t0 = 19723L * 86400L * 1000000L // 2024-01-01 epoch-µs

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_synth").toString
    rows.map { case (id, us, u, t, v) => (id, (t0 + us) * 1000L, u, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_synth").toString
    rows.map { case (id, t) => (id, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q106 rsi: monotone-up series pins 100, flat pins 50, monotone-down pins 0") {
    val h = 3600L * 1000000L
    val rows =
      (1 to 20).map(i => (i.toLong, i * h, 1L, "t", i.toDouble)) ++          // rising
      (1 to 20).map(i => (100L + i, i * h, 2L, "t", 7.0)) ++                 // flat
      (1 to 20).map(i => (200L + i, i * h, 3L, "t", 100.0 - i))              // falling
    val dir = writeEvents(rows)
    val got = SparkEntry.queries("q106_rsi")(spark, dir)
      .groupBy($"user_id").agg(min($"rsi").as("mn"), max($"rsi").as("mx"))
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ((100.0, 100.0)))
    assert(got(2L) == ((50.0, 50.0)))
    assert(got(3L) == ((0.0, 0.0)))
    // full windows only: 20 rows per user -> rows 15..20 emit = 6 each
    assert(SparkEntry.queries("q106_rsi")(spark, dir).count() == 18)
  }

  test("q107 transition probabilities sum to 1 per source state") {
    val df = SparkEntry.queries("q107_transition_matrix")(spark, sf)
    val sums = df.groupBy($"prev_type").agg(sum($"prob").as("s"))
      .as[(String, Double)].collect()
    assert(sums.nonEmpty)
    sums.foreach { case (t, s) =>
      assert(math.abs(s - 1.0) < 1e-3, s"probs for $t sum to $s") }
  }

  test("q108 arrival stats: gap count conservation and CV consistency") {
    val df = SparkEntry.queries("q108_arrival_stats")(spark, sf).cache()
    val ev = Tables.events(spark, sf)
    val totalGaps = df.agg(sum($"n_gaps")).as[Long].head()
    val expected = ev.count() - ev.select($"user_id").distinct().count()
    assert(totalGaps == expected)
    // mean <= max, cv = sd/mean (within rounding of the two roundings)
    assert(df.filter($"mean_gap_s" > $"max_gap_s").count() == 0)
    assert(df.filter(abs($"cv" - $"sd_gap_s" / $"mean_gap_s") > 0.01).count() == 0)
    df.unpersist()
  }

  test("q109 scaled values live in [0,1] and cover the full table") {
    val df = SparkEntry.queries("q109_minmax_scale")(spark, sf).cache()
    assert(df.count() == Tables.events(spark, sf).count())
    assert(df.filter($"scaled" < 0 || $"scaled" > 1).count() == 0)
    df.unpersist()
  }

  test("q110 knn: one prediction per query with 1..5 votes") {
    val df = SparkEntry.queries("q110_knn_classify")(spark, sf).cache()
    val nQueries = Tables.embeddings(spark, sf)
      .filter($"vec_id" % 20 === 0).count()
    assert(df.count() == nQueries)
    assert(df.filter($"votes" < 1 || $"votes" > 5).count() == 0)
    df.unpersist()
  }

  test("q111 ks statistic is a valid [0,1] distance and cohorts partition the data") {
    val df = SparkEntry.queries("q111_ks_drift")(spark, sf).cache()
    assert(df.filter($"ks" < 0 || $"ks" > 1).count() == 0)
    val n = df.agg(sum($"n_train" + $"n_val")).as[Long].head()
    assert(n == Tables.events(spark, sf).count())
    df.unpersist()
  }

  test("q112 seasonal profile: 2024-01-04 maps to Thursday (dow=4) and shares sum to 1") {
    // 2024-01-04 was a Thursday; pins the 0=Sunday convention cross-engine
    val dir = writeEvents(Seq((1L, 3L * 86400L * 1000000L, 1L, "t", 1.0)))
    val row = SparkEntry.queries("q112_seasonal_profile")(spark, dir)
      .select($"dow", $"hr").as[(Int, Int)].head()
    assert(row == ((4, 0)))
    val sums = SparkEntry.queries("q112_seasonal_profile")(spark, sf)
      .groupBy($"event_type").agg(sum($"share").as("s"))
      .as[(String, Double)].collect()
    sums.foreach { case (t, s) =>
      assert(math.abs(s - 1.0) < 1e-3, s"share for $t sums to $s") }
  }

  test("q113 purged split: 20 contiguous days cut 14/2(skip)/2(skip)/2 with embargo days absent") {
    val day = 86400L * 1000000L
    val rows = (0 until 20).map(i =>
      (i.toLong + 1, i * day + 3600L * 1000000L, 1L, "t", 1.0))
    val dir = writeEvents(rows)
    val got = SparkEntry.queries("q113_time_split")(spark, dir)
      .select($"split", $"n_events", $"n_days").as[(String, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // n70 = 14 -> train days 1..14; day 15 embargo; n85 = 17 -> val 16..17;
    // day 18 embargo; test 19..20
    assert(got == Map("train" -> ((14L, 14L)), "val" -> ((2L, 2L)),
      "test" -> ((2L, 2L))), s"got=$got")
    // purge: one full day dropped after each boundary
    assert(got.values.map(_._1).sum == 18L)
  }

  test("q114 pmi matches the closed form on a constructed collocation") {
    // five docs of exactly "x y": U=10 unigrams, B=5 bigrams, c_xy=5,
    // c_x=c_y=5 -> pmi = ln((5/5) / ((5/10)^2)) = ln 4
    val dir = writeDocs((1L to 5L).map(i => (i, "x y")))
    val got = SparkEntry.queries("q114_pmi")(spark, dir)
      .select($"w1", $"w2", $"c_ab", $"pmi")
      .as[(String, String, Long, Double)].collect()
    assert(got.length == 1)
    assert(got.head._1 == "x" && got.head._2 == "y" && got.head._3 == 5L)
    assert(math.abs(got.head._4 - math.log(4.0)) < 1e-4)
  }
}
