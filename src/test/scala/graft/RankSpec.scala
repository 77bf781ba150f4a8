package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Differential tests for the two-pass scalable rank (q128/q133
  * machinery): on data small enough for the single-window form, the
  * range-partitioned rank must reproduce Spark's own window functions
  * bit-for-bit — same integer ranks, same ntile buckets, same
  * percent_rank doubles.
  */
class RankSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val ev = Tables.events(spark, sf)
    .select($"event_type", $"event_id", $"value")

  private lazy val wOrd =
    Window.partitionBy($"event_type").orderBy($"value", $"event_id")

  test("groupRowNumber matches the native per-group window row_number") {
    val twoPass = operators.Rank.groupRowNumber(ev,
      Seq("event_type"), Seq("value", "event_id"), "r", "n_total",
      twoPass = Some(true))
    val native = ev
      .withColumn("r_native", row_number().over(wOrd).cast("long"))
      .withColumn("n_native",
        count(lit(1)).over(Window.partitionBy($"event_type")))
    val joined = twoPass.join(native, Seq("event_type", "event_id", "value"))
    assert(joined.count() == ev.count(), "join lost rows")
    assert(joined.filter($"r" =!= $"r_native" ||
      $"n_total" =!= $"n_native").count() == 0,
      "two-pass rank diverges from native window")
  }

  test("ntileFromRank and percentRankFromRank match native ntile/percent_rank") {
    val twoPass = operators.Rank.groupRowNumber(ev,
      Seq("event_type"), Seq("value", "event_id"), "r", "n_total",
      twoPass = Some(true))
      .withColumn("dec", operators.Rank.ntileFromRank($"r", $"n_total", 10))
      .withColumn("pr", operators.Rank.percentRankFromRank($"r", $"n_total"))
    val native = ev
      .withColumn("dec_native", ntile(10).over(wOrd))
      .withColumn("pr_native", percent_rank().over(wOrd))
    val joined = twoPass.join(native, Seq("event_type", "event_id", "value"))
    // percent_rank compares EXACTLY: both are (r-1)/(n-1) on identical
    // integer operands, so the doubles must be bit-equal
    assert(joined.filter($"dec" =!= $"dec_native" ||
      $"pr" =!= $"pr_native").count() == 0,
      "derived ntile/percent_rank diverge from native window functions")
  }

  test("groupRunningSum matches the native per-group cumulative window sum") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"n_chars")
    val native = docs.withColumn("cum_native",
      sum($"n_chars").over(Window.partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val twoPass = operators.Rank.groupRunningSum(docs,
      Seq("source"), Seq("doc_id"), "n_chars", "cum",
      twoPass = Some(true))
    val joined = twoPass.join(native, Seq("doc_id", "source", "n_chars"))
    assert(joined.count() == docs.count(), "join lost rows")
    assert(joined.filter($"cum" =!= $"cum_native").count() == 0,
      "two-pass running sum diverges from native window")
  }

  test("two-pass rank is exact under extreme group skew (one group dominates every slice)") {
    // 95% of rows in ONE group: the range partitioner must split that
    // group across slices and the offset merge must stitch it exactly
    val rows = (1 to 20000).map { i =>
      (if (i <= 19000) "dominant" else s"tail${i % 53}", i.toLong)
    }
    val df = rows.toDF("g", "v").repartition(8) // scatter input first
    val twoPass = operators.Rank.groupRowNumber(df, Seq("g"), Seq("v"), "r", "n",
      twoPass = Some(true))
    val native = df.withColumn("r_native",
      row_number().over(Window.partitionBy($"g").orderBy($"v")).cast("long"))
    val joined = twoPass.join(native, Seq("g", "v"))
    assert(joined.count() == 20000)
    assert(joined.filter($"r" =!= $"r_native").count() == 0)
    // the dominant group really does span multiple slices
    val slices = df.repartitionByRange(
      spark.sessionState.conf.numShufflePartitions, $"g", $"v")
      .select(org.apache.spark.sql.functions.spark_partition_id().as("p"), $"g")
      .filter($"g" === "dominant").select($"p").distinct().count()
    assert(slices > 1, s"dominant group landed in $slices slice(s)")
  }

  test("two-pass rank is exact on supplementary-plane string order keys") {
    // surrogate-pair keys ("😀" = U+1F600) sort BELOW
    // "ﬁ" in java's UTF-16 code-unit order but ABOVE it in
    // Spark's UTF8String code-point order — the exact divergence that
    // would make driver-sorted slice bounds non-monotone and silently
    // renumber rows. Mix both planes densely so boundary candidates
    // land on them.
    val alphabet = Vector("😀", "ﬁ", "a", "😁",
      "ﬂ", "z", "𐀀", "�")
    val rnd = new scala.util.Random(42)
    val rows = (0L until 4000L).map { id =>
      val key = Seq.fill(3)(alphabet(rnd.nextInt(alphabet.size))).mkString
      (id, key, id % 4)
    }
    val df = rows.toDF("id", "k", "g")
      .repartition(spark.sessionState.conf.numShufflePartitions, $"id")
    val twoPass = operators.Rank.groupRowNumber(df, Seq("g"), Seq("k", "id"),
      "r", "n_total", twoPass = Some(true))
    val native = operators.Rank.groupRowNumber(df, Seq("g"), Seq("k", "id"),
      "r2", "n2", twoPass = Some(false))
    val joined = twoPass.join(native, Seq("g", "id", "k"))
    assert(joined.count() == 4000)
    assert(joined.filter($"r" =!= $"r2" || $"n_total" =!= $"n2").count() == 0,
      "two-pass rank diverges from native on supplementary-plane keys")
  }

  test("rank operators handle empty and single-row inputs without failing") {
    val empty = ev.filter(lit(false))
    assert(operators.Rank.groupRowNumber(empty,
      Seq("event_type"), Seq("value", "event_id"),
      twoPass = Some(true)).count() == 0)
    assert(operators.Rank.groupRunningSum(
      Seq((1L, "a", 5L)).toDF("id", "g", "v").filter(lit(false)),
      Seq("g"), Seq("id"), "v", twoPass = Some(true)).count() == 0)
    val one = Seq((1L, "a", 5L)).toDF("id", "g", "v")
    val r1 = operators.Rank.groupRowNumber(one, Seq("g"), Seq("id"),
      "r", "n", twoPass = Some(true))
      .select($"r", $"n").as[(Long, Long)].collect()
    assert(r1.toSeq == Seq((1L, 1L)))
    val c1 = operators.Rank.groupRunningSum(one, Seq("g"), Seq("id"), "v",
      twoPass = Some(true))
      .select($"cum").as[Long].collect()
    assert(c1.toSeq == Seq(5L))
    // percent_rank of a single-row group is 0.0 (SQL standard), not NaN
    assert(operators.Rank.percentRankFromRank(lit(1L), lit(1L)) != null)
    val pr = one.select(operators.Rank.percentRankFromRank(lit(1L), lit(1L)))
      .as[Double].collect()(0)
    assert(pr == 0.0)
  }

  test("plan choice: auto uses the native window below the size threshold, two-pass stays forceable") {
    // sf-test inputs are far below NativeWindowByteLimit: auto mode
    // must plan the plain window (no __slice machinery, no extra jobs)
    val auto = operators.Rank.groupRowNumber(ev,
      Seq("event_type"), Seq("value", "event_id"), "r", "n_total")
    assert(!auto.queryExecution.optimizedPlan.toString.contains("__slice"),
      "auto mode planned the two-pass path on a tiny input")
    val forced = operators.Rank.groupRowNumber(ev,
      Seq("event_type"), Seq("value", "event_id"), "r", "n_total",
      twoPass = Some(true))
    assert(forced.queryExecution.optimizedPlan.toString.contains("__slice"),
      "forced two-pass did not engage the sliced plan")
    // and the two emit identical results (bit-equality is covered by
    // the differential tests; this guards the AUTO wiring end-to-end)
    assert(auto.select($"event_id", $"r", $"n_total")
      .except(forced.select($"event_id", $"r", $"n_total")).count() == 0)
  }

  test("plan choice keys on group cardinality: high-cardinality frames take the native window") {
    // a high-cardinality group set would make the two-pass offset
    // collect data-sized (slices x |groups| driver rows); such frames
    // cannot straggle the native window's hash partitioning, so the
    // guard must route them native even when the byte-size statistic
    // says "big". nativeByteLimit=0 forces the stats branch here.
    val manyGroups = (1L to 5000L).map(i => (i, i * 7 % 1000))
      .toDF("g", "k")
    assert(operators.Rank.useNative(manyGroups, Seq("g"), None,
      nativeByteLimit = 0L, offsetRowCap = 1000L),
      "5000 groups with cap 1000 must choose the native window")
    // few groups, big-by-stats: the two-pass path stays chosen
    assert(!operators.Rank.useNative(manyGroups, Seq("k"), None,
      nativeByteLimit = 0L, offsetRowCap = 1000000L),
      "low-cardinality big input must keep the two-pass path")
  }

  test("forced two-pass past the offset-row cap fails loudly, not with a driver OOM") {
    // the forced path has no cardinality guard; the bounded collect is
    // its backstop. 5000 distinct groups x >=1 slice overflows a
    // temporarily-lowered cap and must surface the named contract
    // error, never a silent data-sized collect.
    val manyGroups = (1L to 5000L).map(i => (i, i)).toDF("g", "k")
    assert(operators.Rank.DriverOffsetRowCap >= 1000000L,
      "production cap must stay model-sized-large")
    val e = intercept[IllegalArgumentException] {
      operators.Rank.groupRowNumber(manyGroups, Seq("g"), Seq("k"),
        twoPass = Some(true), offsetRowCap = 100L).collect()
    }
    assert(e.getMessage.contains("DriverOffsetRowCap"), e.getMessage)
  }

  test("ntileFromRank follows the SQL bucket-size rule when rows < buckets and on remainders") {
    // 13 rows, 5 buckets: sizes 3,3,3,2,2
    val sizes = (1 to 13).map(r =>
      ((r, 13), ())).map(_._1)
    val df = sizes.toDF("r", "n")
      .select(operators.Rank.ntileFromRank($"r".cast("long"),
        $"n".cast("long"), 5).as("b"))
    val got = df.groupBy($"b").count().orderBy($"b")
      .as[(Int, Long)].collect().toSeq
    assert(got == Seq((1, 3L), (2, 3L), (3, 3L), (4, 2L), (5, 2L)), got.toString)
    // 3 rows, 10 buckets: each row its own leading bucket
    val tiny = (1 to 3).map(r => (r.toLong, 3L)).toDF("r", "n")
      .select(operators.Rank.ntileFromRank($"r", $"n", 10).as("b"))
      .as[Int].collect().toSeq
    assert(tiny == Seq(1, 2, 3), tiny.toString)
  }
}
