package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Permanent zero-output / recall audit for the df-capped dedup family
  * (the r15 winnow collapse, mechanized — verdict r15 ask #4).
  *
  * The df-capped operators' DuckDB oracles MIRROR the cap, so the
  * correctness gate is structurally blind to a densification collapse:
  * when every bucket crosses the cap, operator and oracle both emit
  * zero and the gate stays green. r15 proved the global winnow tier
  * did exactly that at sf1 and audited the rest of the family by hand;
  * this tool makes that audit a per-round artifact. For each fixture
  * dir it recomputes the family's ground truth from FIRST PRINCIPLES —
  * plain Spark expressions mirroring the oracle SQL (zip_with bigrams,
  * window-free df census), never the operators' own internals — and
  * asserts every zero/nonzero is data-driven:
  *
  *  - q34/q61/q87 (word-bigram Jaccard, df band [2,50]): the recount
  *    rebuilds the in-band candidate set and exact 4dp-latticed scores
  *    and must match the operator's pair count EXACTLY (q61's cluster
  *    rows are nonzero iff the pair stream is; q87's delta recount
  *    filters to delta-touching pairs).
  *  - q150 (saturated tier at its ×5 geometry): the intra-clique mass
  *    Σ C(5·|md5 group|, 2) − dup-free-part is a provable LOWER bound
  *    (every verbatim-duplicate pair scores 1.0); rows must cover it.
  *  - global winnow JW tier: containment vs the independent exact
  *    blocked plan (different code path), plus the rescue audit
  *    ([[graft.operators.EditDistance.jwWinnowRescueStats]]) — a
  *    backstop drop with missing recall is the collapse signature.
  *
  * Usage: `DedupRecallGate <out.json> <sfDir> [sfDir ...]`; the driver
  * convention runs it at sf0.1 and the pinned sf1 fixture and commits
  * `results/DEDUPGATE_r{N}.json`. Any `"ok": false` is a gate failure.
  */
object DedupRecallGate {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DedupRecallGate <out.json> <sfDir>...")
    val out = args.head
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val blocks = args.tail.map(dir => s""""$dir": ${audit(spark, dir)}""")
    val allOk = !blocks.exists(_.contains("\"ok\": false"))
    val json =
      s"""{"gate": "dedup_recall", "all_ok": $allOk, ${blocks.mkString(", ")}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    println(json)
    spark.stop()
    if (!allOk) sys.exit(1)
  }

  private val dec4 = (c: Column) =>
    round(c.cast(DecimalType(28, 12)), 4).cast("double")

  /** Word-bigram sets via zip_with — deliberately NOT
    * TextExpressions.shingleSet (independence from the code under
    * audit); mirrors the oracle SQL's `len(t) <= 2` whole-text case.
    */
  private def bigrams(text: Column): Column = {
    val t = split(lower(trim(text)), "\\s+")
    when(size(t) <= 2, array(concat_ws(" ", t)))
      .otherwise(array_distinct(zip_with(
        slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b))))
  }

  /** Exact in-band pair scores for an (id, grams) frame: candidates
    * through grams with df in [2, maxDf], 4dp-latticed Jaccard.
    */
  private def recountPairs(prepared: DataFrame, maxDf: Int,
                           threshold: Double): DataFrame = {
    val ex = prepared.select(col("id"), size(col("grams")).as("n_grams"),
      explode(col("grams")).as("gram"))
    val rare = ex.groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, maxDf)).select(col("gram"))
    val f = ex.join(rare, Seq("gram"))
    f.as("a").join(f.as("b"),
        col("a.gram") === col("b.gram") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        col("a.n_grams").as("n_a"), col("b.n_grams").as("n_b"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("jaccard", dec4(col("shared").cast("double") /
        (col("n_a") + col("n_b") - col("shared")).cast("double")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  private[graft] def audit(spark: SparkSession, dir: String): String = {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir)

    // ---- df census + q34/q61/q87 recount (band [2,50], t = 0.2)
    val prepared = docs.select($"doc_id".as("id"),
      bigrams($"text").as("grams"))
    val census = prepared
      .select(explode($"grams").as("gram"))
      .groupBy($"gram").agg(count(lit(1)).as("df"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"df".between(2, 50), 1L).otherwise(0L)).as("n_inband"),
        max($"df").as("max_df"))
      .collect()(0)
    val recount = recountPairs(prepared, maxDf = 50, threshold = 0.2)
      .persist()
    val recountN = recount.count()
    val q34N = graft.operators.Dedup.ngramJaccardPairs(docs).count()
    val q61N = graft.SparkEntry.queries("q61_dedup_clusters")(spark, dir)
      .count()
    val q87RecountN = recount
      .filter($"doc_a" % 5 === 0 || $"doc_b" % 5 === 0).count()
    val q87N = graft.operators.Dedup.ngramJaccardPairsIncremental(
      docs, isDelta = $"doc_id" % 5 === 0).count()
    recount.unpersist()
    val gramOk = q34N == recountN && q87N == q87RecountN &&
      ((q61N > 0) == (recountN > 0))

    // ---- q150 saturated tier at its ×5 geometry: intra-clique lower
    // bound. Each md5-identity group of size g in the ×5 corpus (5×
    // the base group) contributes C(g, 2) pairs at jaccard 1.0.
    val groups = docs.select(md5($"text").as("h"))
      .groupBy($"h").agg((count(lit(1)) * 5).as("g"))
    val intraLower = groups
      .agg(coalesce(sum(($"g" * ($"g" - 1) / 2).cast("long")), lit(0L))
        .cast("long"))
      .collect()(0).getLong(0)
    val q150N = graft.SparkEntry.queries("q150_dedup_saturated")(spark, dir)
      .count()
    val satOk = q150N >= intraLower && (intraLower == 0 || q150N > 0)

    // ---- global winnow JW tier vs the independent exact blocked plan
    val part = graft.Tables.part(spark, dir)
      .select($"p_partkey", $"p_name", $"p_brand",
        split($"p_name", " ").getItem(0).as("tok"))
    val winnow = graft.operators.EditDistance
      .jwPairsWinnow(part, "p_partkey", "p_name")
      .select($"key_a", $"key_b").persist()
    val winnowN = winnow.count()
    val exact = graft.operators.EditDistance
      .jwPairsBlocked(part, "p_partkey", "p_name", Seq("p_brand", "tok"))
      .select($"key_a", $"key_b")
    val missing = exact.join(winnow, Seq("key_a", "key_b"), "left_anti")
      .count()
    val exactN = exact.count()
    winnow.unpersist()
    val rs = graft.operators.EditDistance
      .jwWinnowRescueStats(part, "p_partkey", "p_name")
      .collect()(0)
    val missFrac = if (exactN == 0) 0.0 else missing.toDouble / exactN
    val winnowOk = (exactN == 0 || winnowN > 0) && missFrac <= 0.01

    s"""{"gram_census": {"n_grams": ${census.getLong(0)}, """ +
      s""""n_inband_2_50": ${census.getLong(1)}, "max_df": ${census.getLong(2)}}, """ +
      s""""q34_q61_q87": {"recount_pairs": $recountN, "q34_rows": $q34N, """ +
      s""""q61_clusters": $q61N, "q87_recount": $q87RecountN, "q87_rows": $q87N, "ok": $gramOk}, """ +
      s""""q150_saturated": {"intra_lower_bound": $intraLower, "rows": $q150N, "ok": $satOk}, """ +
      s""""winnow_global": {"pairs": $winnowN, "exact_blocked_pairs": $exactN, """ +
      s""""missing_from_winnow": $missing, "miss_frac": $missFrac, """ +
      s""""n_uncovered": ${rs.getLong(1)}, "rescued_fps": ${rs.getLong(2)}, """ +
      s""""dropped_fps": ${rs.getLong(3)}, "ok": $winnowOk}}"""
  }
}
