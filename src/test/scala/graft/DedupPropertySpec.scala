package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Differential tests for the dedup family over seeded random corpora:
  * the banded/indexed operators must reproduce brute-force results
  * exactly when their pruning knobs are opened up.
  */
class DedupPropertySpec extends SparkTestBase {
  import spark.implicits._

  /** Random docs over a small vocabulary → plenty of shared n-grams. */
  private def randomDocs(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("red", "blue", "fox", "dog", "runs", "jumps", "high", "low")
    (0L until n).map { id =>
      val len = 1 + rnd.nextInt(8)
      (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
  }

  /** Mirror of ShingleSet semantics: distinct word bigrams; shorter
    * inputs collapse to the whole text.
    */
  private def shingles(text: String, n: Int): Set[String] = {
    val toks = text.trim.toLowerCase.split("\\s+").toSeq
    if (toks.length <= n) Set(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  test("ngram jaccard with open df cap equals brute force (5 seeds)") {
    for (seed <- 0 until 5) {
      val docs = randomDocs(seed, 25)
      val got = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
        n = 2, maxDf = 1000, threshold = 0.3)
        .select($"doc_a", $"doc_b", $"jaccard")
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, j) => (a, b) -> j }.toMap
      val expected = (for {
        (ida, ta) <- docs; (idb, tb) <- docs if ida < idb
        sa = shingles(ta, 2); sb = shingles(tb, 2)
        inter = (sa & sb).size if inter > 0
        j = inter.toDouble / (sa.size + sb.size - inter)
        if BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP) >= 0.3
      } yield (ida, idb) ->
        BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
      assert(got == expected, s"seed=$seed\n got=$got\n exp=$expected")
    }
  }

  test("hot-bucket cap bounds the candidate blowup from duplicate mass") {
    // 120 identical docs: every band collides → 7140 pairs uncapped
    val dupes = (0L until 120L).map(i => (i, "same text every time here"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.minHashPairs(dupes, threshold = 0.0).count()
    assert(uncapped == 120L * 119 / 2)
    // cap below the bucket size → the degenerate bucket is dropped
    val capped = Dedup.minHashPairs(dupes, threshold = 0.0, maxBucket = 50).count()
    assert(capped == 0, s"expected degenerate bucket dropped, got $capped pairs")
  }

  test("incremental jaccard == full pairs restricted to delta-touching") {
    val docs = Tables.documents(spark, sf)
    val delta = col("doc_id") % 5 === 0
    val inc = Dedup.ngramJaccardPairsIncremental(docs, delta)
      .as[(Long, Long, Double)].collect().toSet
    val full = Dedup.ngramJaccardPairs(docs)
      .filter(col("doc_a") % 5 === 0 || col("doc_b") % 5 === 0)
      .as[(Long, Long, Double)].collect().toSet
    assert(inc == full, s"incremental diverged: ${inc.diff(full)} / ${full.diff(inc)}")
  }

  test("prefix-filtered set-jaccard equals the all-pairs plan") {
    // order baskets at sf0.001 (small sets) plus a high-threshold text
    // run: both shapes must agree exactly with the default plan.
    val baskets = Tables.lineitem(spark, sf)
      .groupBy($"l_orderkey").agg(collect_set($"l_partkey").as("parts"))
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val viaPrefix = Dedup.setJaccardPairs(baskets, "l_orderkey", "parts",
        maxDf = 50, threshold = t, prefixFilter = true)
        .as[(Long, Long, Double)].collect().toSet
      val viaAll = Dedup.setJaccardPairs(baskets, "l_orderkey", "parts",
        maxDf = 50, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      assert(viaPrefix == viaAll,
        s"t=$t: extra=${viaPrefix.diff(viaAll)} missing=${viaAll.diff(viaPrefix)}")
      assert(t > 0.3 || viaAll.nonEmpty) // the comparison must compare something
    }
  }

  test("saturated tier recovers the pairs the df cap drops at ×30 duplication") {
    for (seed <- 0 until 3) {
      val base = randomDocs(seed + 200, 20)
      // every text verbatim 30× with shifted ids — the sf3.0 stress
      // shape where round 7 measured the plain tier emitting ZERO pairs
      val corpus = for { (id, t) <- base; c <- 0 until 30 }
        yield (id + 1000L * c, t)
      val cDf = corpus.toDF("doc_id", "text")
      val plain = Dedup.ngramJaccardPairs(cDf, maxDf = 10, threshold = 0.3)
      assert(plain.count() == 0,
        s"seed=$seed: saturation premise broken — plain tier found pairs")
      val got = Dedup.ngramJaccardPairsSaturated(cDf, maxDf = 10,
          threshold = 0.3)
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, j) => (a, b) -> j }.toMap

      // brute-force model of the defined semantics: df over DISTINCT
      // texts; intra-group pairs 1.0; rep-pair scores expand to the
      // member bipartite
      val byText = corpus.groupBy(_._2)
      val reps = byText.map { case (t, ms) => (ms.map(_._1).min, t) }
        .toSeq.sortBy(_._1)
      val df = reps.flatMap { case (_, t) => shingles(t, 2).toSeq }
        .groupBy(identity).map { case (g, xs) => g -> xs.size }
      val kept = df.collect { case (g, d) if d >= 2 && d <= 10 => g }.toSet
      val cross = for {
        (ra, ta) <- reps; (rb, tb) <- reps if ra < rb
        sa = shingles(ta, 2); sb = shingles(tb, 2)
        shared = (sa & sb & kept).size if shared > 0
        jr = BigDecimal(shared.toDouble / (sa.size + sb.size - shared))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP) if jr >= 0.3
        ia <- byText(ta).map(_._1); ib <- byText(tb).map(_._1)
      } yield (math.min(ia, ib), math.max(ia, ib)) -> jr.toDouble
      val intra = byText.values.flatMap { ms =>
        val ids = ms.map(_._1).sorted
        for (i <- ids.indices; j <- (i + 1) until ids.size)
          yield (ids(i), ids(j)) -> 1.0
      }
      val expected = (cross ++ intra).toMap
      assert(got == expected, s"seed=$seed: got ${got.size} pairs, " +
        s"expected ${expected.size}; " +
        s"extra=${got.keySet.diff(expected.keySet).take(5)} " +
        s"missing=${expected.keySet.diff(got.keySet).take(5)}")
      // differential vs the exact tier (q31 shape): every duplicate
      // group exact-hash finds must appear as a 1.0 clique
      val exactGroups = Dedup.exact(cDf)
        .filter($"n_copies" > 1).count()
      assert(exactGroups == byText.size.toLong,
        s"seed=$seed: ×30 must make every text a >1 exact group")
      val cliquePairs = got.count { case (_, j) => j == 1.0 }
      assert(cliquePairs >= intra.size,
        s"seed=$seed: 1.0 cliques smaller than the verbatim-dup mass")
    }
  }

  test("simhash banding recall is complete up to maxHamming (3 seeds)") {
    for (seed <- 0 until 3) {
      val docs = randomDocs(seed + 100, 40).toDF("doc_id", "text")
      val sims = docs.select($"doc_id",
        graft.functions.SimHash.simhash64(
          graft.functions.Text.tokens($"text")).as("sim"))
        .as[(Long, Long)].collect().toMap
      for (h <- Seq(0, 3, 7)) {
        val got = Dedup.simHashPairs(docs, maxHamming = h)
          .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
        val expected = (for {
          (a, sa) <- sims.toSeq; (b, sb) <- sims.toSeq if a < b
          if java.lang.Long.bitCount(sa ^ sb) <= h
        } yield (a, b)).toSet
        assert(got == expected, s"seed=$seed h=$h: got ${got.size}, expected ${expected.size}")
      }
    }
  }

  test("duplicateSpans pins shared blocks, merges at gap=k, splits at gap=k+1") {
    val k = 4
    // doc 1 = S1 ++ S2 back-to-back; doc 2 shares S1, doc 3 shares S2,
    // each wrapped in per-doc-unique filler so no accidental grams match.
    // Marked window positions in doc 1: 1..5 (S1) and 9..13 (S2) — the
    // boundary windows straddling S1|S2 are unshared, leaving a position
    // gap of exactly k, which the ≤k rule merges into ONE maximal span
    // covering the whole 16-char doc.
    val adjacent = Seq(
      (1L, "ABCDEFGH" + "ijklmnop"),
      (2L, "qrst" + "ABCDEFGH" + "uvwx"),
      (3L, "0123" + "ijklmnop" + "4567")).toDF("doc_id", "text")
    val gotA = Dedup.duplicateSpans(adjacent, k = k)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(gotA.size == 3, gotA.toString)
    assert(gotA(1L) == ((1L, 16L, 16L)), s"gap=k must merge: ${gotA(1L)}")
    assert(gotA(2L) == ((5L, 12L, 8L)), s"S1 occurrence exactly: ${gotA(2L)}")
    assert(gotA(3L) == ((5L, 12L, 8L)), s"S2 occurrence exactly: ${gotA(3L)}")

    // one filler char between the blocks pushes the position gap to k+1:
    // the span must break into the two exact block occurrences
    val split = Seq(
      (1L, "ABCDEFGH" + "z" + "ijklmnop"),
      (2L, "qrst" + "ABCDEFGH" + "uvwx"),
      (3L, "0123" + "ijklmnop" + "4567")).toDF("doc_id", "text")
    val gotB = Dedup.duplicateSpans(split, k = k)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (d, rs) =>
        d -> rs.map(r => (r._2, r._3, r._4)).sortBy(_._1).toSeq }
    assert(gotB(1L) == Seq((1L, 8L, 8L), (10L, 17L, 8L)),
      s"gap=k+1 must split: ${gotB(1L)}")

    // intra-doc-only repetition: grams repeated inside ONE doc but found
    // nowhere else must produce no spans (count_distinct(doc_id) >= 2)
    val intra = Seq(
      (1L, "ABCDABCDABCDABCD"),
      (2L, "wxyz5678wxyz5678")).toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(intra, k = k).count() == 0,
      "intra-doc repeats are not cross-doc duplication")
  }

  test("duplicateSpansIncremental equals the full run restricted to delta docs") {
    val k = 4
    val all = Seq(
      (1L, "ABCDEFGH" + "ijklmnop", false),
      (2L, "qrst" + "ABCDEFGH" + "uvwx", true),
      (3L, "0123" + "ijklmnop" + "4567", true)).toDF("doc_id", "text", "d")
    val inc = Dedup.duplicateSpansIncremental(all, $"d", k = k)
      .as[(Long, Long, Long, Long)].collect().toSet
    val full = Dedup.duplicateSpans(all.drop("d"), k = k)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(inc == full.filter(r => r._1 == 2L || r._1 == 3L), inc.toString)
    assert(inc.nonEmpty && !inc.exists(_._1 == 1L),
      "base doc must not be re-scored")
  }

  test("duplicateSpans reuses the gram exchange (explode+md5 runs once)") {
    val docs = randomDocs(7, 30).toDF("doc_id", "text")
    val df = Dedup.duplicateSpans(docs, k = 8)
    df.collect() // AQE finalizes stage reuse only on execution
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"gram exchange must be reused, not recomputed:\n$plan")
  }
}
