package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** Differential test: AsOf.join vs an in-memory brute-force reference
  * over seeded random datasets — covers key/timestamp collisions between
  * sides, NULL right values, tolerance bounds, inner/outer, in
  * combinations a hand-written example suite won't reach.
  *
  * (key, rts) pairs are unique on the right so the expected match is
  * well-defined; left rows collide freely with right timestamps to
  * exercise the >= (ref-at-t matches query-at-t) convention.
  */
class AsOfPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private def runCase(seed: Int, inner: Boolean, tol: Option[Long],
                      direction: String = "backward"): Unit = {
    val rnd = new scala.util.Random(seed)
    val nKeys = 1 + rnd.nextInt(4)
    val left = (0 until 30).map { i =>
      (rnd.nextInt(nKeys).toLong, ts(rnd.nextInt(1000).toLong), i.toLong)
    }
    val rightPairs = rnd.shuffle((0 until 1000).toList).take(25)
    val right = rightPairs.map { t =>
      (rnd.nextInt(nKeys).toLong, ts(t.toLong),
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(100).toDouble))
    }.distinct // unique (key, rts, v); (key, rts) dups removed below
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq

    val lDf = left.toDF("k", "ts", "row_id")
    val rDf = right.toDF("k", "rts", "v")

    val got = AsOf.join(lDf, rDf, "k", "ts", "rts",
      Seq("v" -> "v"), inner = inner, toleranceSec = tol,
      direction = direction)
      .select($"row_id", $"v").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

    // brute force: backward = latest right row with rts <= ts; forward =
    // earliest with rts >= ts — same key, within tol, either way
    val backward = direction == "backward"
    val expected = left.map { case (k, lts, id) =>
      val matches = right.filter { case (rk, rts, _) =>
        rk == k &&
          (if (backward) !rts.after(lts) else !rts.before(lts)) &&
          tol.forall { t =>
            val gapMs = if (backward) lts.getTime - rts.getTime
                        else rts.getTime - lts.getTime
            gapMs / 1000 <= t
          }
      }
      val best = if (matches.isEmpty) None
        else Some(if (backward) matches.maxBy(_._2.getTime)
                  else matches.minBy(_._2.getTime))
      (id, best)
    }.filter { case (_, best) => !inner || best.isDefined }
      .map { case (id, best) => id -> best.flatMap(_._3) }
      .toMap

    assert(got == expected,
      s"$direction seed=$seed inner=$inner tol=$tol:\n got=$got\n exp=$expected")
  }

  test("as-of join matches brute force over 60 random cases") {
    for (seed <- 0 until 20) {
      runCase(seed, inner = true, tol = None)
      runCase(seed + 1000, inner = false, tol = None)
      runCase(seed + 2000, inner = true, tol = Some(50L))
    }
  }

  test("forward as-of join matches brute force over 60 random cases") {
    for (seed <- 0 until 20) {
      runCase(seed, inner = true, tol = None, direction = "forward")
      runCase(seed + 1000, inner = false, tol = None, direction = "forward")
      runCase(seed + 2000, inner = true, tol = Some(50L), direction = "forward")
    }
  }

  test("broadcastJoin matches brute force over 20 random global-dim cases") {
    for (seed <- 0 until 10; inner <- Seq(true, false)) {
      val rnd = new scala.util.Random(seed + 5000)
      val left = (0 until 30).map { i =>
        (ts(rnd.nextInt(1000).toLong), i.toLong)
      }
      // unique rts by contract (see broadcastJoin scaladoc)
      val right = rnd.shuffle((0 until 1000).toList).take(15)
        .map(t => (ts(t.toLong), rnd.nextInt(100).toDouble))
      val rows = AsOf.broadcastJoin(left.toDF("ts", "row_id"),
          right.toDF("rts", "v"), "ts", "rts", Seq("v" -> "v"), inner = inner)
        .select($"row_id", $"v").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      val got = rows.toMap
      // the oversized-dim fallback (keyless: constant-key window) must
      // be output-identical to the broadcast plan
      val fb = AsOf.broadcastJoin(left.toDF("ts", "row_id"),
          right.toDF("rts", "v"), "ts", "rts", Seq("v" -> "v"),
          inner = inner, dimBroadcast = Some(false))
        .select($"row_id", $"v").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      assert(fb == got, s"seed=$seed inner=$inner: fallback != broadcast")
      // exactly one output row per matched left row — overlapping
      // intervals would duplicate and the map would silently hide it
      assert(rows.length == got.size, s"seed=$seed: duplicate join rows")
      val expected = left.map { case (lts, id) =>
        val m = right.filter { case (rts, _) => !rts.after(lts) }
        (id, if (m.isEmpty) None else Some(m.maxBy(_._1.getTime)._2))
      }.filter { case (_, best) => !inner || best.isDefined }.toMap
      assert(got == expected, s"seed=$seed inner=$inner:\n got=$got\n exp=$expected")
    }
  }

  test("broadcastJoin auto-routes an oversized dim to the window fallback") {
    // a 20M-row Range estimates hundreds of MB — far over
    // BroadcastDimByteLimit — WITHOUT being executed: the guard must
    // pick the window plan (its __rv running-match marker) and the
    // broadcast intervalization (__eff/__next) must not appear. Plan
    // inspection only; nothing runs.
    val bigDim = spark.range(20000000L).select(
      timestamp_seconds($"id").as("rts"),
      ($"id" % 100).cast("double").as("v"))
    assert(bigDim.queryExecution.optimizedPlan.stats.sizeInBytes >
      AsOf.BroadcastDimByteLimit)
    val left = Seq((ts(10), 1L)).toDF("ts", "row_id")
    val planned = AsOf.broadcastJoin(left, bigDim, "ts", "rts",
      Seq("v" -> "v"))
    val plan = planned.queryExecution.analyzed.toString
    assert(plan.contains("__rv") && !plan.contains("__eff"),
      s"oversized dim did not take the window fallback:\n$plan")
    // and a model-sized dim still takes the broadcast intervalization
    val smallPlan = AsOf.broadcastJoin(left,
        Seq((ts(5), 1.0)).toDF("rts", "v"), "ts", "rts", Seq("v" -> "v"))
      .queryExecution.analyzed.toString
    assert(smallPlan.contains("__eff"), s"small dim lost broadcast:\n$smallPlan")
  }

  test("keyed broadcastJoin matches the keyed window as-of over 20 random cases") {
    // the r7 `key` extension: per-key intervalization must be
    // indistinguishable from AsOf.join on the same key — including
    // keys present on only one side and duplicate left timestamps
    for (seed <- 0 until 10; inner <- Seq(true, false)) {
      val rnd = new scala.util.Random(seed + 9000)
      val left = (0 until 60).map { i =>
        (s"k${rnd.nextInt(5)}", ts(rnd.nextInt(1000).toLong), i.toLong)
      }
      // unique (key, rts) by contract
      val right = (for (k <- 0 until 4) yield
        rnd.shuffle((0 until 1000).toList).take(8)
          .map(t => (s"k$k", ts(t.toLong), rnd.nextInt(100).toDouble))
        ).flatten
      val viaBroadcast = AsOf.broadcastJoin(
          left.toDF("k", "ts", "row_id"), right.toDF("k", "rts", "v"),
          "ts", "rts", Seq("v" -> "v"), inner = inner, key = Some("k"))
        .select($"row_id", $"v").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      val viaWindow = AsOf.join(
          left.toDF("k", "ts", "row_id"), right.toDF("k", "rts", "v"),
          key = "k", leftTs = "ts", rightTs = "rts",
          rightVals = Seq("v" -> "v"), inner = inner)
        .select($"row_id", $"v").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      assert(viaBroadcast == viaWindow,
        s"seed=$seed inner=$inner:\n bc=$viaBroadcast\n win=$viaWindow")
      // the keyed oversized-dim fallback routes through the same keyed
      // window as-of — pin the forced path and prove it too
      val viaForcedFallback = AsOf.broadcastJoin(
          left.toDF("k", "ts", "row_id"), right.toDF("k", "rts", "v"),
          "ts", "rts", Seq("v" -> "v"), inner = inner, key = Some("k"),
          dimBroadcast = Some(false))
        .select($"row_id", $"v").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      assert(viaForcedFallback == viaWindow,
        s"seed=$seed inner=$inner: forced fallback != window")
      // k4 rows exist on the left only: inner drops them, outer keeps
      val k4 = left.filter(_._1 == "k4").map(_._3).toSet
      if (inner) assert(k4.forall(!viaBroadcast.contains(_)))
      else assert(k4.forall(id => viaBroadcast.get(id).contains(None)))
    }
  }

  test("custom AsOfJoinExec equals the union+window plan across all regimes") {
    // the option-(c) operator must be output-identical to the composed
    // plan it prices against — every (direction, tolerance, inner)
    // combination over the same seeded random cases
    for (seed <- 0 until 6; inner <- Seq(true, false);
         tol <- Seq(None, Some(50L), Some(0L));
         direction <- Seq("backward", "forward")) {
      val rnd = new scala.util.Random(seed)
      val nKeys = 1 + rnd.nextInt(4)
      val left = (0 until 30).map { i =>
        (rnd.nextInt(nKeys).toLong, ts(rnd.nextInt(1000).toLong), i.toLong)
      }
      val right = rnd.shuffle((0 until 1000).toList).take(25).map { t =>
        (rnd.nextInt(nKeys).toLong, ts(t.toLong),
          if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(100).toDouble))
      }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val lDf = left.toDF("k", "ts", "row_id")
      val rDf = right.toDF("k", "rts", "v")
      def collectMap(df: org.apache.spark.sql.DataFrame) =
        df.select($"row_id", $"v").collect()
          .map(r => (r.getLong(0),
            if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      val viaExec = collectMap(AsOf.execJoin(lDf, rDf, "k", "ts", "rts",
        Seq("v" -> "v"), inner = inner, toleranceSec = tol,
        direction = direction))
      val viaWindow = collectMap(AsOf.join(lDf, rDf, "k", "ts", "rts",
        Seq("v" -> "v"), inner = inner, toleranceSec = tol,
        direction = direction))
      assert(viaExec == viaWindow,
        s"seed=$seed inner=$inner tol=$tol dir=$direction:\n" +
          s" exec=$viaExec\n win=$viaWindow")
    }
  }

  test("custom AsOfJoinExec resolves same-instant duplicate refs to the greatest values") {
    // two refs at the SAME (key, ts): both plans must pick the max
    // value tuple, both directions — the tie rule lives in the exec's
    // required child ordering, so this is the case that would break
    // first if that ordering regressed
    val lDf = Seq((1L, ts(100), 0L), (1L, ts(50), 1L)).toDF("k", "ts", "row_id")
    val rDf = Seq((1L, ts(100), 10.0), (1L, ts(100), 99.0), (1L, ts(30), 5.0))
      .toDF("k", "rts", "v")
    for (direction <- Seq("backward", "forward")) {
      val exec = AsOf.execJoin(lDf, rDf, "k", "ts", "rts", Seq("v" -> "v"),
        direction = direction).select($"row_id", $"v")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val win = AsOf.join(lDf, rDf, "k", "ts", "rts", Seq("v" -> "v"),
        direction = direction).select($"row_id", $"v")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(exec == win, s"$direction: exec=$exec win=$win")
      assert(exec(0L) == 99.0, s"$direction tie must pick the greatest value")
    }
  }

  test("custom AsOfJoinExec handles the self-as-of q21 shape on real events") {
    // trades and quotes derive from ONE table: the execJoin alias
    // projection must keep the children's attribute ids disjoint
    val ev = Tables.events(spark, sf)
    val trades = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val quotes = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts", $"value")
    val exec = AsOf.execJoin(trades, quotes, "user_id", "ts", "ts",
      Seq("value" -> "quote"), inner = true)
      .select($"event_id", $"quote").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val win = AsOf.join(trades, quotes, "user_id", "ts", "ts",
      Seq("value" -> "quote"), inner = true)
      .select($"event_id", $"quote").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(exec == win && exec.nonEmpty)
  }

  test("autoJoin dispatches by statistics and honors the null-key attestation") {
    val ev = Tables.events(spark, sf)
    val trades = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    val quotes = ev.filter($"event_type" === "signup")
      .select($"user_id", $"ts", $"value")
    def planOf(threshold: Long, nonNull: Boolean) =
      AsOf.autoJoin(trades, quotes, "user_id", "ts", "ts",
        Seq("value" -> "quote"), keysNonNull = nonNull,
        execByteThreshold = threshold)
    // big-by-stats + attested non-null -> the custom exec plans
    val execPlan = planOf(0L, nonNull = true)
    assert(execPlan.queryExecution.executedPlan.toString
      .contains("AsOfJoin"), "expected the custom exec above threshold")
    // small-by-stats keeps the composed plan; so does a null-unsafe key
    for (p <- Seq(planOf(Long.MaxValue, nonNull = true),
        planOf(0L, nonNull = false))) {
      assert(!p.queryExecution.executedPlan.toString.contains("AsOfJoin"),
        "expected the composed union+window plan")
    }
    // and both dispatch branches return the same rows
    val a = execPlan.select($"event_id", $"quote").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = planOf(Long.MaxValue, nonNull = true)
      .select($"event_id", $"quote").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b && a.nonEmpty)
  }
}
