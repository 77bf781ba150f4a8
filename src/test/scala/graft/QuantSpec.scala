package graft

import org.apache.spark.sql.functions._

/** Invariant checks + synthetic-fixture differentials for the round-5d
  * quant/corpus batch (q115–q124) and the containment-pairs operator.
  * Value-level correctness is the DuckDB oracle gate; these pin
  * semantic contracts that survive data changes.
  */
class QuantSpec extends SparkTestBase {
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

  private def writeDocs(rows: Seq[(Long, String)], source: Long => String = _ => "synth"): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_synth").toString
    rows.map { case (id, t) => (id, t, "en", source(id), t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private val day = 86400L * 1000000L

  test("q209 turnover stays lazy and yields 0 rows on an empty tape (no eager NPE)") {
    // constructing the frame must run NO job (the max-rk bound is a
    // broadcast scalar join, not a driver-side first()), so an empty
    // events table is an empty result, not an NPE at build time
    val dir = writeEvents(Seq.empty)
    val df = graft.queries.Quant.q209Turnover(spark, dir)
    assert(df.count() == 0L)
  }

  test("containmentPairs: short doc embedded in long doc scores 1.0 where jaccard dilutes") {
    val short = "alpha beta gamma delta epsilon zeta"
    val long_ = short + " " + (1 to 40).map(i => s"filler$i word$i").mkString(" ")
    val docs = Seq((1L, short), (2L, long_),
      (3L, "totally different content here entirely"),
      (4L, "another unrelated document body text")).toDF("doc_id", "text")
    val cont = operators.Dedup.containmentPairs(docs, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(cont.exists { case (a, b, c) => a == 1L && b == 2L && c == 1.0 },
      s"expected (1,2,1.0) in ${cont.toSeq}")
    // the same pair under symmetric jaccard sits far below 0.5
    val jac = operators.Dedup.ngramJaccardPairs(docs, threshold = 0.01)
      .filter($"doc_a" === 1 && $"doc_b" === 2)
      .as[(Long, Long, Double)].collect()
    assert(jac.forall(_._3 < 0.2), s"jaccard unexpectedly high: ${jac.toSeq}")
  }

  test("containmentPairs >= jaccard for every co-reported pair (shared/min >= shared/union)") {
    val docs = Tables.documents(spark, sf)
    val c = operators.Dedup.containmentPairs(docs, threshold = 0.05)
      .withColumnRenamed("containment", "c")
    val j = operators.Dedup.ngramJaccardPairs(docs, threshold = 0.05)
    val joined = c.join(j, Seq("doc_a", "doc_b"))
      .filter($"c" < $"jaccard").count()
    assert(joined == 0)
  }

  test("q115 acf: perfectly alternating series pins acf1 = -1, acf2 = 1") {
    val rows = (1 to 40).map(i =>
      (i.toLong, i * day, 1L, "t", if (i % 2 == 0) 10.0 else 20.0))
    val got = SparkEntry.queries("q115_acf")(spark, writeEvents(rows))
      .as[(String, Long, Double, Double, Double)].collect().head
    assert(got._3 == -1.0 && got._4 == 1.0 && got._5 == -1.0)
  }

  test("q116 streaks: constructed 3-up/2-down daily series pins run lengths") {
    // daily values: 1 2 3 4 (3 up-steps) then 3 2 (2 down-steps) then 2 (flat)
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 2.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, (i + 1) * day, 1L, "t", v) }
    val got = SparkEntry.queries("q116_streaks")(spark, writeEvents(rows))
      .as[(String, Option[Long], Option[Long], Long)].collect().head
    assert(got._2.contains(3L), s"max_up $got")
    assert(got._3.contains(2L), s"max_down $got")
    assert(got._4 == 7L - 1L + 1L) // n_days = diffs + 1
  }

  test("q117 cross-corr: b lagging a by one day pins corr_a_leads = 1") {
    // a: rising noise-free series; b(today) = a(yesterday) => a leads b
    val aVals = Seq(1.0, 3.0, 2.0, 5.0, 4.0, 7.0, 6.0, 9.0)
    val rows =
      aVals.zipWithIndex.map { case (v, i) =>
        ((i + 1).toLong, (i + 1) * day, 1L, "a", v) } ++
      aVals.dropRight(1).zipWithIndex.map { case (v, i) =>
        ((100 + i).toLong, (i + 2) * day, 1L, "b", v) }
    val got = SparkEntry.queries("q117_cross_corr")(spark, writeEvents(rows))
      .as[(String, String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(got._5.contains(1.0), s"corr_a_leads $got")
  }

  test("q118 sharpe: constant-return series yields null sharpe (sd=0), not an ANSI error") {
    // v doubles every day -> r = 1.0 constant -> sd_r = 0, no negatives
    val rows = (1 to 10).map(i =>
      (i.toLong, i * day, 1L, "t", math.pow(2.0, i).toDouble))
    val got = SparkEntry.queries("q118_sharpe")(spark, writeEvents(rows))
      .as[(String, Long, Double, Double, Option[Double], Option[Double])]
      .collect().head
    assert(got._3 == 1.0 && got._4 == 0.0 && got._5.isEmpty && got._6.isEmpty)
  }

  test("q119 entropy: uniform tokens pin log2(n) bits, repeated token pins 0") {
    val dir = writeDocs(Seq((1L, "a b c d"), (2L, "x x x x")))
    val got = SparkEntry.queries("q119_entropy")(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 4L, 1.0, 2.0)))
    assert(got(2L) == ((2L, 4L, 1L, 0.25, 0.0)))
  }

  test("q121 group sample is deterministic and capped at 5 per cell") {
    val df1 = SparkEntry.queries("q121_group_sample")(spark, sf)
    val df2 = SparkEntry.queries("q121_group_sample")(spark, sf)
    assert(df1.exceptAll(df2).isEmpty && df2.exceptAll(df1).isEmpty)
    val over = df1.groupBy($"lang", $"source").count().filter($"count" > 5)
    assert(over.isEmpty)
  }

  test("q123 packing: 800-token docs fill 2000-token bins 3-2-3 per the exclusive-cum rule") {
    // prior-cum: 0,800,1600 -> bin 0; 2400,3200 -> bin 1; 4000,4800,5600 -> bin 2
    val text = Array.fill(800)("w").mkString(" ")
    val dir = writeDocs((1L to 8L).map(i => (i, text)))
    val got = SparkEntry.queries("q123_pack_chunks")(spark, dir)
      .orderBy($"bin_id")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._3).toSeq == Seq(3L, 2L, 3L), got.toSeq.toString)
    assert(got.map(_._4).toSeq == Seq(2400L, 1600L, 2400L))
  }

  private def writeLineitem(rows: Seq[(Long, Long, Double, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_synth").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    rows.zipWithIndex.map { case ((ok, pk, price, disc), i) =>
      (ok, pk, 1L, i + 1, 1.0, price, disc, 0.0, "N", "O", ts) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("q127 skew profile ranks the hottest key first with the right multiplier") {
    // part 1: 8 rows, parts 2..5: 1 row each -> mean 12/5, skew_x 8/(12/5)
    val rows = (1 to 8).map(i => (i.toLong, 1L, 100.0, 0.0)) ++
      (2 to 5).map(p => (100L + p, p.toLong, 100.0, 0.0))
    val got = SparkEntry.queries("q127_skew_profile")(spark, writeLineitem(rows))
      .as[(Int, Long, Long, Long, Double)].collect()
    assert(got.head == ((1, 1L, 8L, 5L, 3.3333)), got.head.toString)
    assert(got.length == 5)
  }

  test("q128 ntile bins split 100 rows into 10 equal deciles in value order") {
    val rows = (1 to 100).map(i =>
      (i.toLong, i * day, 1L, "t", (101 - i).toDouble))
    val got = SparkEntry.queries("q128_ntile_bins")(spark, writeEvents(rows))
      .orderBy($"decile")
      .as[(String, Int, Long, Double, Double, Double)].collect()
    assert(got.length == 10 && got.forall(_._3 == 10L))
    assert(got.head == (("t", 1, 10L, 1.0, 10.0, 5.5)))
    assert(got.last == (("t", 10, 10L, 91.0, 100.0, 95.5)))
  }

  test("q129 abc: 80/15/5 revenue split classifies exactly one part per class") {
    val rows = Seq((1L, 1L, 8000.0, 0.0), (2L, 2L, 1500.0, 0.0),
      (3L, 3L, 500.0, 0.0))
    val got = SparkEntry.queries("q129_abc_class")(spark, writeLineitem(rows))
      .as[(Long, Double, String)].collect().map(r => r._1 -> r._3).toMap
    assert(got == Map(1L -> "A", 2L -> "B", 3L -> "C"), got.toString)
  }

  test("q131 cusum pins the level-shift day on a constructed step series") {
    // 10 days at 5, then 10 days at 15: mean 10, cusum bottoms at -50
    // exactly on the last pre-shift day
    val rows = (1 to 20).map(i =>
      (i.toLong, i * day, 1L, "t", if (i <= 10) 5.0 else 15.0))
    val got = SparkEntry.queries("q131_cusum")(spark, writeEvents(rows))
      .as[(String, Long, java.sql.Timestamp, Double)].collect().head
    assert(got._2 == 20L && got._4 == 50.0, got.toString)
    assert(got._3.toInstant ==
      java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(10 * 86400))
  }

  test("q132 gini is exactly 0 for perfectly even revenues and in [0,1) on real data") {
    val even = (1L to 4L).map(p => (p, p, 1000.0, 0.0))
    val got = SparkEntry.queries("q132_gini")(spark, writeLineitem(even))
      .as[(String, Long, Double)].collect().head
    assert(got._2 == 4L && got._3 == 0.0, got.toString)
    val real = SparkEntry.queries("q132_gini")(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(real.nonEmpty && real.forall(r => r._3 >= 0.0 && r._3 < 1.0))
  }

  test("q133 rank-normalize maps a 5-value series onto exact quarters of [0,1]") {
    val rows = (1 to 5).map(i => (i.toLong, i * day, 1L, "t", i * 10.0))
    val got = SparkEntry.queries("q133_rank_normalize")(spark, writeEvents(rows))
      .orderBy($"value").as[(String, Long, Double, Double)].collect()
    assert(got.map(_._4).toSeq == Seq(0.0, 0.25, 0.5, 0.75, 1.0))
  }

  test("q134 var: one crash day in twenty pins VaR95 to the tail return") {
    // returns: 19 days of +1% and one -50% day -> 5th percentile sits
    // inside the interpolation toward the crash; the crash is the tail
    val vals = (1 to 21).map(i =>
      if (i == 11) 100.0 * math.pow(1.01, 9) * 0.5 else 100.0 * math.pow(1.01, i - 1))
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, (i + 1) * day, 1L, "t", v) }
    val got = SparkEntry.queries("q134_var")(spark, writeEvents(rows))
      .as[(String, Long, Double, Long, Double)].collect().head
    assert(got._2 == 20L, got.toString)       // 20 returns
    // VaR95 is the INTERPOLATED 5th-percentile boundary (pulled negative
    // by the crash); the crash itself shows up in the expected shortfall
    assert(got._3 < 0, s"VaR95 should be negative: $got")
    assert(got._4 == 1L, s"exactly the crash day in the tail: $got")
    assert(got._5 == -0.5, s"ES95 is the crash return: $got")
  }

  test("q124 bollinger: flat series breaks no bands; one spike breaks above") {
    val flat = (1 to 30).map(i => (i.toLong, i * day, 1L, "t", 5.0))
    val spiky = (1 to 30).map(i =>
      (100L + i, i * day, 2L, "t", if (i == 25) 500.0 else 5.0 + (i % 3) * 0.1))
    val got = SparkEntry.queries("q124_bollinger")(spark, writeEvents(flat ++ spiky))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 11L, 0L, 0L)))
    assert(got(2L)._3 == 1L, s"spike not flagged: ${got(2L)}")
  }
}
