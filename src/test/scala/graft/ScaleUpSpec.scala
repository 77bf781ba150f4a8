package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.tools.ScaleUp

/** ScaleUp is the scale-validation data derivation (sf0.1 ×10 → "sf1")
  * — if its key-shift replication is wrong, every sf1 measurement is
  * measuring the wrong distribution. Pin the three properties the
  * scale runs rely on: row counts multiply, surrogate-key cardinality
  * multiplies (new keys, not duplicated keys), and the copies stay
  * disjoint so join fan-out per key is unchanged.
  */
class ScaleUpSpec extends SparkTestBase {
  import spark.implicits._

  test("key-shifted replication multiplies rows AND key cardinality, dims fixed") {
    val dst = Files.createTempDirectory("graft_scaleup").toString
    for (t <- Seq("region", "orders", "events"))
      ScaleUp.scaleTable(spark, sf, dst, t, factor = 3)

    // fixed dim: copied verbatim
    val region0 = Tables.load(spark, sf, "region")
    val region3 = spark.read.parquet(s"$dst/region.parquet")
    assert(region3.count() == region0.count())

    val orders0 = Tables.load(spark, sf, "orders")
    val orders3 = spark.read.parquet(s"$dst/orders.parquet")
    assert(orders3.count() == 3 * orders0.count())
    // every shifted key column keeps its per-copy cardinality: 3× the
    // distinct keys, and each key carries exactly the original row count
    for (k <- Seq("o_orderkey", "o_custkey")) {
      val d0 = orders0.select(k).distinct().count()
      assert(orders3.select(k).distinct().count() == 3 * d0,
        s"$k cardinality must triple")
    }
    // copies are key-disjoint: the per-orderkey row-count histogram is
    // unchanged (here: orderkey unique before implies unique after)
    assert(orders3.groupBy("o_orderkey").count()
      .agg(max("count")).first().getLong(0) ==
      orders0.groupBy("o_orderkey").count()
        .agg(max("count")).first().getLong(0))

    // events: ts round-trips through the footer-branched read plan and is
    // written back as a standard µs timestamp; payload columns verbatim,
    // event_type cardinality fixed
    val events3raw = spark.read.parquet(s"$dst/events.parquet")
    assert(events3raw.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // read back through the same Tables.events path the queries use
    val events0 = Tables.events(spark, sf)
    val events3 = Tables.events(spark, dst)
    assert(events3.count() == 3 * events0.count())
    assert(events3.select("event_type").distinct().count() ==
      events0.select("event_type").distinct().count(),
      "low-cardinality columns must NOT be shifted")
    // timestamps left alone: same span, 3× the volume in it
    val span0 = events0.agg(min("ts"), max("ts")).first()
    val span3 = events3.agg(min("ts"), max("ts")).first()
    assert(span0 == span3, "timestamps must be left alone")
  }

  test("organic payload perturbation: within-copy structure exact, cross-copy near-dups gone") {
    import spark.implicits._
    val dst = Files.createTempDirectory("graft_organic").toString
    for (t <- Seq("documents", "part", "embeddings"))
      ScaleUp.scaleTable(spark, sf, dst, t, factor = 3)

    // documents: copy 0 verbatim; per-copy token suffixing keeps
    // within-copy token-set Jaccard EXACTLY the source's and zeroes
    // cross-copy token overlap (near-dup outputs scale linearly, not
    // quadratically, with the factor)
    val docs0 = Tables.documents(spark, sf)
    val nDocs = docs0.count()
    val docs3 = Tables.documents(spark, dst)
    assert(docs3.count() == 3 * nDocs)
    val verbatim = docs3.as("d3").join(docs0.as("d0"), "doc_id")
    assert(verbatim.count() == nDocs, "copy 0 keys must be unshifted")
    assert(verbatim.filter(col("d3.text") =!= col("d0.text")).count() == 0,
      "copy 0 text must stay verbatim")
    val tok3 = docs3.select($"doc_id", explode(
      graft.functions.Text.tokens($"text")).as("tok"))
      .filter(length($"tok") > 0)
    val copyOf = (floor($"doc_id" /
      lit(docs0.agg(max($"doc_id")).first().getLong(0) + 1L))).as("copy")
    val crossCopyShared = tok3.select($"tok", copyOf).distinct()
      .groupBy($"tok").agg(countDistinct($"copy").as("nc"))
      .filter($"nc" > 1).count()
    assert(crossCopyShared == 0,
      s"$crossCopyShared tokens shared across copies — cross-copy dedup " +
        "pairs would be generator artifacts again")
    // n_chars contract holds on every copy
    assert(docs3.filter($"n_chars" =!= length($"text")).count() == 0)

    // part: within-copy edit distances unchanged (shared suffix),
    // cross-copy distance pushed past the maxDist=3 matcher band
    val p3 = spark.read.parquet(s"$dst/part.parquet")
    val p0 = Tables.load(spark, sf, "part")
    val nP = p0.count()
    val off = p0.agg(max($"p_partkey")).first().getLong(0) + 1L
    val same = p3.as("a").join(p3.as("b"),
      col("a.p_partkey") + lit(off) === col("b.p_partkey"))
      .select(levenshtein(col("a.p_name"), col("b.p_name")).as("d"))
    assert(same.filter($"d" <= 3).count() == 0,
      "a part and its next-copy twin must sit outside the matcher band")

    // embeddings: the circular shift is orthogonal — every copy keeps
    // the exact norm multiset; vec and its shifted twin differ
    val e3 = Tables.embeddings(spark, dst)
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val nE = Tables.embeddings(spark, sf).count()
    val eoff = Tables.embeddings(spark, sf)
      .agg(max($"vec_id")).first().getLong(0) + 1L
    val norms = e3.select(($"vec_id" >= eoff).as("copied"),
      graft.functions.Num.decRound(
        sqrt(aggregate($"e", lit(0.0), (a, x) => a + x * x)), 6).as("n"))
    val normSets = norms.groupBy($"copied")
      .agg(countDistinct($"n").as("dn")).collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(normSets(true) == normSets(false),
      "orthogonal shift must preserve the norm multiset")
    val twins = e3.as("a").join(e3.as("b"),
      col("a.vec_id") + lit(eoff) === col("b.vec_id"))
      .filter(col("a.e") === col("b.e")).count()
    assert(twins == 0, "cross-copy vectors must no longer be identical")
  }

  test("GraphGate invariants hold on a ×3 derivation (the q125 scale gate)") {
    // the scaled co-purchase graph is 3 disjoint isomorphic copies, so
    // PageRank must scale exactly linearly — the gate that replaces
    // the DuckDB CTE unroll at sf1 (temp-disk bound). Exercised here
    // at toy scale so the gate logic itself is covered by sbt test.
    val dst = Files.createTempDirectory("graft_ggate").toString
    ScaleUp.scaleTable(spark, sf, dst, "lineitem", factor = 3)
    val (checks, line) = graft.tools.GraphGate.check(spark, sf, dst, 3)
    assert(checks.forall(_._2), s"gate failed: $line")
    // the q288 LPA gate rides the same disjoint-copy structure:
    // node/community counts scale by the factor, the top community is
    // size-invariant with copy-0's label, and modularity transforms
    // exactly as Q' = I/m − D/(factor·m²)
    val (checksLpa, lineLpa) = graft.tools.GraphGate.checkLpa(spark, sf, dst, 3)
    assert(checksLpa.forall(_._2), s"lpa gate failed: $lineLpa")
    // r15: the q255/q259 gates extend the same structure — per-bucket
    // cc censuses scale with bit-invariant means; component counts
    // scale with an invariant largest component and a transformed
    // share
    val (checksLcc, lineLcc) = graft.tools.GraphGate.checkLcc(spark, sf, dst, 3)
    assert(checksLcc.forall(_._2), s"lcc gate failed: $lineLcc")
    val (checksCc, lineCc) = graft.tools.GraphGate.checkCc(spark, sf, dst, 3)
    assert(checksCc.forall(_._2), s"cc gate failed: $lineCc")
    // r16: q175/q182 join the gate (the top-2 sf1 wall-time families)
    // — every triangle-census integer scales by the factor with a
    // bit-invariant clustering coefficient, and every k-core peel
    // round's survivor counts scale by the factor
    val (checksTri, lineTri) =
      graft.tools.GraphGate.checkTriangle(spark, sf, dst, 3)
    assert(checksTri.forall(_._2), s"triangle gate failed: $lineTri")
    val (checksCore, lineCore) =
      graft.tools.GraphGate.checkKcore(spark, sf, dst, 3)
    assert(checksCore.forall(_._2), s"kcore gate failed: $lineCore")
  }

  test("derived documents STORE the container payload, byte-identical to the loader's synthesis") {
    // r16 (verdict ask #3): ScaleUp materializes the multimodal binary
    // column from the FINAL (shifted id, perturbed text) pair, so (a)
    // documentsWithPayload takes the stored branch on a derived dir —
    // a plain parquet read, no synthesis expression in the plan — and
    // (b) the stored bytes equal what the synthesis would attach,
    // byte for byte (one shared definition, two delivery paths).
    val dst = Files.createTempDirectory("graft_mmfix").toString
    ScaleUp.scaleTable(spark, sf, dst, "documents", factor = 2)
    val stored = Tables.documentsWithPayload(spark, dst)
    assert(stored.schema.fieldNames.contains("payload"))
    val p = stored.queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("unhex"),
      s"stored branch must not synthesize:\n$p")
    val resynth = Tables.documents(spark, dst)
      .select($"doc_id",
        graft.operators.Multimodal.containerPayload($"doc_id", $"text")
          .as("p2"))
    val diff = stored.select($"doc_id", $"payload").join(resynth, "doc_id")
      .filter(md5($"payload") =!= md5($"p2")).count()
    assert(diff == 0L, s"$diff stored payloads diverge from the synthesis")
    // the synthesized-at-read fallback stays active on the read-only
    // base fixture (no stored column there)
    val fallback = Tables.documentsWithPayload(spark, sf)
    assert(fallback.schema.fieldNames.contains("payload"))
    assert(fallback.queryExecution.executedPlan.toString.toLowerCase
      .contains("unhex"), "base fixture should synthesize at read")
  }
}
