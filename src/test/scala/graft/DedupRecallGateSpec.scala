package graft

import org.apache.spark.sql.functions._

/** The permanent zero-output/recall audit (r15's manual PLANS.md audit
  * mechanized): green on the organic fixture, and its winnow leg must
  * actually DETECT the r15 collapse geometry — the audit is only worth
  * committing per round if a collapsed tier turns it red.
  */
class DedupRecallGateSpec extends SparkTestBase {
  import spark.implicits._

  test("audit is green on the organic fixture (every zero/nonzero data-driven)") {
    val json = tools.DedupRecallGate.audit(spark, sf)
    assert(!json.contains("\"ok\": false"), json)
    // the recount leg must actually have compared something
    assert(json.contains("\"recount_pairs\""), json)
  }

  test("the audit's collapse detector fires on the r15 geometry") {
    // Reproduce the densified-bucket collapse the OLD code had: every
    // global bucket over the cap AND the rescue backstop too small to
    // keep anything (prefixMaxDf = 1 drops every rescued bucket). The
    // production defaults rescue this geometry (the r15 fix); with the
    // backstop strangled the tier returns zero pairs while the exact
    // plan finds plenty — exactly the state the audit must flag, and
    // jwWinnowRescueStats is the instrument that sees it.
    val base = Tables.part(spark, sf)
      .select($"p_partkey", $"p_name", $"p_brand")
    val maxKey = base.agg(max($"p_partkey")).as[Long].head() + 1L
    val derived = (0 until 10).map { c =>
      val tag = ('A' + c).toChar.toString * 12
      if (c == 0) base
      else base.select(($"p_partkey" + lit(c * maxKey)).as("p_partkey"),
        concat($"p_name", lit(s" $tag")).as("p_name"), $"p_brand")
    }.reduce(_ unionByName _)
    val collapsed = operators.EditDistance.jwPairsWinnow(derived,
      "p_partkey", "p_name", maxDf = 1, prefixMaxDf = 1)
    val exact = operators.EditDistance.jwPairsBlocked(base,
      "p_partkey", "p_name", Seq("p_brand"))
    assert(exact.count() > 0L)
    assert(collapsed.count() == 0L,
      "collapse geometry unexpectedly produced pairs — retune the spec")
    val rs = operators.EditDistance.jwWinnowRescueStats(derived,
        "p_partkey", "p_name", maxDf = 1, prefixMaxDf = 1)
      .as[(Long, Long, Long, Long)].head()
    assert(rs._2 > 0L, s"uncovered names not seen: $rs")
    assert(rs._4 > 0L, s"backstop drops not counted: $rs")
  }
}
