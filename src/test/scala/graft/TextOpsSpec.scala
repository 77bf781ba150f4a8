package graft

import org.apache.spark.sql.functions._

/** Structure + invariant checks for q92–q98 at sf0.001 (value-level
  * correctness is the DuckDB oracle gate at sf0.01).
  */
class TextOpsSpec extends SparkTestBase {

  test("q92 normalization only ever merges documents") {
    val rows = SparkEntry.queries("q92_stopword_normalize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nDocs = r.getAs[Long]("n_docs")
      val raw = r.getAs[Long]("n_distinct_raw")
      val norm = r.getAs[Long]("n_distinct_norm")
      assert(norm <= raw && raw <= nDocs)
      assert(r.getAs[Long]("tokens_kept") <= r.getAs[Long]("tokens_raw"))
    }
  }

  test("q93 chunks cover every doc, sizes within [1,30]") {
    val df = SparkEntry.queries("q93_chunking")(spark, sf).cache()
    val nDocs = Tables.documents(spark, sf).count()
    assert(df.select("doc_id").distinct().count() == nDocs)
    assert(df.filter(col("chunk_idx") === 0).count() == nDocs)
    assert(df.filter(col("n_tokens") < 1 || col("n_tokens") > 30).count() == 0)
    // stride 20 < size 30: consecutive chunks overlap, so every token
    // index is covered — chunk count must be ceil(n_tokens/20) per doc.
    val bad = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(lower(trim(col("text"))), "\\s+")).as("n"))
      .join(df.groupBy("doc_id").agg(count(lit(1)).as("chunks")), "doc_id")
      .filter(col("chunks") =!= ceil(col("n") / lit(20.0)).cast("long"))
    assert(bad.count() == 0)
    df.unpersist()
  }

  test("q94 contamination pairs respect the eval/corpus split") {
    val rows = SparkEntry.queries("q94_contamination")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("eval_id") % 97 == 0)
      assert(r.getAs[Long]("corpus_id") % 97 != 0)
      assert(r.getAs[Long]("n_shared") >= 3)
    }
  }

  test("q95 posting heads are sorted, capped at 15, df consistent") {
    val rows = SparkEntry.queries("q95_posting_lists")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ids = r.getAs[String]("postings_head").split(",").map(_.toLong)
      assert(ids.length <= 15 && ids.length <= r.getAs[Long]("df"))
      assert(ids.sameElements(ids.sorted))
      assert(r.getAs[Long]("df") >= 5)
    }
  }

  test("q96 repetition ratio in (0,1], distinct <= total") {
    val rows = SparkEntry.queries("q96_repetition")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_distinct") <= r.getAs[Int]("n_bigrams"))
      val ratio = r.getAs[Double]("distinct_ratio")
      assert(ratio > 0 && ratio <= 1.0)
    }
  }

  test("q100 unigram logprob: negative scores, every doc scored") {
    val df = SparkEntry.queries("q100_unigram_logprob")(spark, sf).cache()
    assert(df.count() == Tables.documents(spark, sf).count())
    // every token probability is < 1, so every mean log-prob is < 0
    assert(df.filter(col("avg_logprob") >= 0).count() == 0)
    df.unpersist()
  }

  test("q97 rolling vol: non-negative, one row per obs past the 20th return") {
    val df = SparkEntry.queries("q97_rolling_vol")(spark, sf).cache()
    assert(df.filter(col("vol20") < 0).count() == 0)
    val expected = Tables.events(spark, sf).groupBy("user_id").count()
      .agg(sum(greatest(col("count") - 20, lit(0L)))).collect()(0).getLong(0)
    assert(df.count() == expected)
    df.unpersist()
  }

  test("q98 / AsOf.broadcastJoin matches the keyed as-of on a constant key") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"value").withColumn("k", lit(0))
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val rates = Tables.events(spark, sf)
      .groupBy(date_trunc("DAY", $"ts").as("day"))
      .agg(avg($"value").as("r"))
      .filter(dayofmonth($"day") % 3 === 1)
      .select(($"day" + expr("INTERVAL 1 DAY")).as("eff_ts"),
        round($"r".cast(dec), 6).cast("double").as("rate"))
      .withColumn("k", lit(0))
    val viaBroadcast = graft.operators.AsOf.broadcastJoin(
      ev.drop("k"), rates.drop("k"), "ts", "eff_ts", Seq("rate" -> "rate"))
    val viaKeyed = graft.operators.AsOf.join(ev, rates, key = "k",
        leftTs = "ts", rightTs = "eff_ts", rightVals = Seq("rate" -> "rate"))
      .drop("k")
    assert(viaBroadcast.count() > 0)
    assert(viaBroadcast.exceptAll(viaKeyed).count() == 0)
    assert(viaKeyed.exceptAll(viaBroadcast).count() == 0)
  }

  test("q206 water-filling: cap, redistribute to uncapped, re-cap") {
    import spark.implicits._
    // skew the organic corpus doesn't exhibit: sqrt-upweighted small
    // sources blow past the cap, the big source absorbs the leftover
    val tok = Seq(("a", 100L), ("b", 10000L), ("c", 40000L)).toDF("source", "t")
    // cap 2.0 with budget 2×ΣT: a and b cap at pass 1, c's boost
    // 1.6161… + leftover/T_c lands above 2.0 and RE-CAPS — full
    // allocation equals the budget exactly
    val r2 = graft.queries.TextOps.waterFill(tok, capEpochs = 2.0)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("epochs_final"), r.getAs[Double]("alloc_tokens"))).toMap
    assert(r2.values.forall(_._1 == 2.0), r2.toString)
    assert(math.abs(r2.values.map(_._2).sum - 2.0 * 50100) < 0.01)
    // cap 3.0: a and b cap, c stays under after its boost — the
    // redistributed allocation recovers the budget to rounding noise
    val r3 = graft.queries.TextOps.waterFill(tok, capEpochs = 3.0)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("epochs_pass1"), r.getAs[Double]("epochs_final"),
          r.getAs[Double]("alloc_tokens"))).toMap
    assert(r3("a")._1 == 3.0 && r3("b")._1 == 3.0)
    assert(r3("c")._1 < 2.0 && r3("c")._2 > r3("c")._1 && r3("c")._2 < 3.0,
      r3.toString)
    assert(math.abs(r3.values.map(_._3).sum - 2.0 * 50100) < 1.0)
  }

  test("CharProfile counts code points, not UTF-16 units (non-BMP text)") {
    import spark.implicits._
    // "😀😀a": 3 code points (5 UTF-16 units). Per-SYMBOL semantics:
    // p(😀)=2/3, p(a)=1/3 → H = log2(3) − 2/3; printable ratio 1/3.
    // A charAt walk would histogram the surrogate halves separately
    // (H over {2/5,2/5,1/5}) and report printable 1/5.
    val got = Seq("😀😀a").toDF("t")
      .select(graft.functions.TextExpressions.charProfile($"t").as("p"))
      .as[Seq[Double]].head()
    val hExp = (math.log(3.0) / math.log(2.0)) - 2.0 / 3.0
    assert(math.abs(got(0) - hExp) < 1e-12, s"entropy ${got(0)} != $hExp")
    assert(math.abs(got(1) - 1.0 / 3.0) < 1e-12,
      s"printable ratio ${got(1)} != 1/3")
    // ASCII behavior unchanged (the corpus the oracle gates on)
    val ascii = Seq("aab").toDF("t")
      .select(graft.functions.TextExpressions.charProfile($"t").as("p"))
      .as[Seq[Double]].head()
    assert(math.abs(ascii(0) - hExp) < 1e-12 && ascii(1) == 1.0)
  }
}
