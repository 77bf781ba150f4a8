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
}
