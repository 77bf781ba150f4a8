package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-level correctness gate for the graph path
  * (`GraphGate <baseDir> <scaledDir> <factor>`).
  *
  * q125's DuckDB oracle (the 5-CTE iteration unroll) exceeds the
  * oracle engine's temp disk at sf1, so the ×N derived dirs get this
  * gate instead — and it is STRONGER than a generic convergence check,
  * because [[ScaleUp]]'s key-shifted replication makes the scaled
  * co-purchase graph exactly `factor` DISJOINT isomorphic copies of
  * the base graph. PageRank is linear in the rank vector and the
  * teleport term scales as 1/n, so in exact arithmetic every derived
  * vertex's rank is the base vertex's rank divided by `factor`. The
  * gate checks, on the SAME pageRank operator the query ships:
  *
  *  1. mass conservation — Σ pr = 1 on both graphs (no dangling
  *     vertices by construction, so the damped walk conserves mass);
  *  2. teleport floor — min pr ≥ (1−d)/n on the scaled graph;
  *  3. vertex-count structure — n_scaled = factor × n_base, and every
  *     scaled vertex maps (mod the [[ScaleUp]] key offset) onto a base
  *     vertex;
  *  4. exact linear scaling — max relative error of
  *     factor·pr_scaled vs pr_base across ALL vertices ≤ 1e−9
  *     (FP contribution-sum order is the only engine-side freedom;
  *     after 5 iterations the drift is ≤1e−13 relative, so 1e−9 flags
  *     any structural wrong answer while never flagging noise).
  *
  * Emits one JSON line (the bench convention) and exits non-zero on
  * violation so the scale harness can treat it as a hard gate.
  */
object GraphGate {

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: GraphGate <baseDir> <scaledDir> <factor>")
    val Array(base, scaled, fStr) = args
    val factor = fStr.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-graph-gate").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val (checks, line) = check(spark, base, scaled, factor)
      println(line)
      val (checksLpa, lineLpa) = checkLpa(spark, base, scaled, factor)
      println(lineLpa)
      val (checksLcc, lineLcc) = checkLcc(spark, base, scaled, factor)
      println(lineLcc)
      val (checksCc, lineCc) = checkCc(spark, base, scaled, factor)
      println(lineCc)
      val (checksTri, lineTri) = checkTriangle(spark, base, scaled, factor)
      println(lineTri)
      val (checksCore, lineCore) = checkKcore(spark, base, scaled, factor)
      println(lineCore)
      if (!checks.forall(_._2) || !checksLpa.forall(_._2) ||
          !checksLcc.forall(_._2) || !checksCc.forall(_._2) ||
          !checksTri.forall(_._2) || !checksCore.forall(_._2)) sys.exit(1)
    } finally spark.stop()
  }

  /** q288's scale gate (its DuckDB oracle — two LPA-round unrolls plus
    * the intra-edge census — exhausts the oracle engine's temp disk at
    * sf1, the q125 situation exactly). [[ScaleUp]] makes the scaled
    * graph `factor` DISJOINT ISOMORPHIC copies of the base, and the
    * LPA tie-break (count desc, label asc) is shift-invariant within a
    * copy, so propagation is copy-isomorphic EXACTLY:
    *
    *  1. n_nodes and n_communities scale by exactly `factor`;
    *  2. the largest community's SIZE is invariant, and its label is
    *     copy 0's (verbatim base ids — the cross-copy size tie
    *     resolves on label asc);
    *  3. modularity transforms EXACTLY: with base totals I = Σ_c
    *     intra_c, D = Σ_c d_c², m directed edges — each base
    *     community appears `factor` times unchanged while m scales,
    *     so Q_scaled = I/m − D/(factor·m²), checked against the
    *     production query's output within the 12dp-lattice tolerance.
    */
  def checkLpa(spark: SparkSession, base: String, scaled: String,
               factor: Int): (Seq[(String, Boolean)], String) = {
    import org.apache.spark.sql.DataFrame
    val parts = spark.sessionState.conf.numShufflePartitions
    def baseTotals(dir: String): (Long, Long, Long, Double, Double) = {
      val e = graft.operators.Graph.checkpointKeepLayout(
        graft.operators.Graph.coOrderEdges(
            graft.Tables.lineitem(spark, dir))
          .repartition(parts, col("dst")))
      val lab = graft.operators.Graph.labelPropagation(e, rounds = 2,
        symmetric = true)
      val mdir = e.count()
      val deg = e.groupBy(col("dst").as("node"))
        .agg(count(lit(1)).as("deg"))
      val ls = lab.select(col("node").as("src"), col("lbl").as("l_s"))
      val ld = lab.select(col("node").as("dst"), col("lbl").as("l_d"))
      val intra = e.join(ls, "src").join(ld, "dst")
        .filter(col("l_s") === col("l_d"))
        .groupBy(col("l_s").as("lbl")).agg(count(lit(1)).as("i"))
      val comm = deg.join(lab, "node")
        .groupBy("lbl").agg(sum("deg").as("d"), count(lit(1)).as("sz"))
        .join(intra, Seq("lbl"), "left").na.fill(0L, Seq("i"))
      val r = comm.agg(count(lit(1)).as("nc"), sum(col("i")).as("bigI"),
          sum(col("d") * col("d")).as("bigD")).collect()(0)
      (mdir, r.getLong(0), deg.count(),
        r.getLong(1).toDouble, r.getLong(2).toDouble)
    }
    def queryRow(dir: String) =
      graft.SparkEntry.queries("q288_label_prop")(spark, dir).collect()(0)
    val (mB, ncB, nnB, bigI, bigD) = baseTotals(base)
    val rowB = queryRow(base)
    val rowS = queryRow(scaled)
    val qExpected = bigI / mB.toDouble -
      bigD / (factor.toDouble * mB.toDouble * mB.toDouble)
    val qScaled = rowS.getDouble(rowS.fieldIndex("modularity"))
    val checks = Seq(
      "lpa_vertex_scaling" ->
        (rowS.getLong(rowS.fieldIndex("n_nodes")) == factor * nnB),
      "lpa_community_scaling" ->
        (rowS.getLong(rowS.fieldIndex("n_communities")) == factor * ncB),
      "lpa_top_size_invariant" ->
        (rowS.getLong(rowS.fieldIndex("top_size")) ==
          rowB.getLong(rowB.fieldIndex("top_size"))),
      "lpa_top_label_copy0" ->
        (rowS.getLong(rowS.fieldIndex("top_label")) ==
          rowB.getLong(rowB.fieldIndex("top_label"))),
      "lpa_modularity_transform" ->
        (math.abs(qScaled - qExpected) <= 1e-4))
    val passed = checks.forall(_._2)
    val cs = checks.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    (checks,
      f"""{"gate":"q288_sf_invariants","pass":$passed,$cs,"n_comm_base":$ncB,"q_expected":$qExpected%.6f,"q_scaled":$qScaled%.6f,"factor":$factor}""")
  }

  /** q255's scale gate (r15 insurance — its wedge-enumeration DuckDB
    * oracle is the same O(m^1.5) self-join family whose temp-disk
    * footprint took q125/q288 off the sf1 oracle): on `factor`
    * DISJOINT ISOMORPHIC copies every per-copy cc multiset repeats
    * verbatim, so per degree bucket n_nodes / sum_deg /
    * sum_triangles scale by exactly `factor` while mean_cc and
    * cc_zero_share are BIT-INVARIANT (identical decimal sums divided
    * by identically-scaled counts round identically).
    */
  def checkLcc(spark: SparkSession, base: String, scaled: String,
               factor: Int): (Seq[(String, Boolean)], String) = {
    def census(dir: String) =
      graft.SparkEntry.queries("q255_local_cc")(spark, dir)
    val b = census(base).select(col("bucket"), col("n_nodes").as("n_b"),
      col("sum_deg").as("d_b"), col("sum_triangles").as("t_b"),
      col("mean_cc").as("m_b"), col("cc_zero_share").as("z_b"))
    val s = census(scaled)
    val j = s.join(b, Seq("bucket"), "full_outer")
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(col("n_b").isNull || col("n_nodes").isNull, 1)
          .otherwise(0)).as("bucket_mismatch"),
        sum(when(col("n_nodes") =!= col("n_b") * factor, 1)
          .otherwise(0)).as("n_bad"),
        sum(when(col("sum_deg") =!= col("d_b") * factor, 1)
          .otherwise(0)).as("d_bad"),
        sum(when(col("sum_triangles") =!= col("t_b") * factor, 1)
          .otherwise(0)).as("t_bad"),
        sum(when(col("mean_cc") =!= col("m_b"), 1).otherwise(0)).as("m_bad"),
        sum(when(col("cc_zero_share") =!= col("z_b"), 1)
          .otherwise(0)).as("z_bad"))
      .collect()(0)
    val checks = Seq(
      "lcc_bucket_set" -> (j.getLong(j.fieldIndex("bucket_mismatch")) == 0L),
      "lcc_count_scaling" -> (j.getLong(j.fieldIndex("n_bad")) == 0L),
      "lcc_degree_scaling" -> (j.getLong(j.fieldIndex("d_bad")) == 0L),
      "lcc_triangle_scaling" -> (j.getLong(j.fieldIndex("t_bad")) == 0L),
      "lcc_mean_invariant" -> (j.getLong(j.fieldIndex("m_bad")) == 0L),
      "lcc_zero_share_invariant" -> (j.getLong(j.fieldIndex("z_bad")) == 0L))
    val passed = checks.forall(_._2)
    val cs = checks.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    (checks,
      s"""{"gate":"q255_sf_invariants","pass":$passed,$cs,"n_buckets":${j.getLong(j.fieldIndex("n_buckets"))},"factor":$factor}""")
  }

  /** q259's scale gate (same insurance — its oracle unrolls 10
    * hash-min rounds as materialized CTEs over the scaled edge list):
    * disjoint copies converge copy-locally, so n_nodes and
    * n_components scale by exactly `factor`, the largest component's
    * SIZE is invariant, its SHARE divides by `factor` (checked via
    * the production query's own 6dp lattice), and the zero-change
    * fixpoint flag is invariant.
    */
  def checkCc(spark: SparkSession, base: String, scaled: String,
              factor: Int): (Seq[(String, Boolean)], String) = {
    def row(dir: String) =
      graft.SparkEntry.queries("q259_connected_components")(spark, dir)
        .collect()(0)
    val rb = row(base)
    val rs = row(scaled)
    def l(r: org.apache.spark.sql.Row, f: String) = r.getLong(r.fieldIndex(f))
    val shareExpected = BigDecimal(l(rb, "largest_size"))./(
      BigDecimal(l(rb, "n_nodes") * factor.toLong))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val checks = Seq(
      "cc_vertex_scaling" -> (l(rs, "n_nodes") == factor * l(rb, "n_nodes")),
      "cc_component_scaling" ->
        (l(rs, "n_components") == factor * l(rb, "n_components")),
      "cc_largest_invariant" ->
        (l(rs, "largest_size") == l(rb, "largest_size")),
      "cc_share_transform" ->
        (math.abs(rs.getDouble(rs.fieldIndex("largest_share"))
          - shareExpected) <= 1e-6),
      "cc_fixpoint_invariant" ->
        (l(rs, "n_changed_last") == l(rb, "n_changed_last")))
    val passed = checks.forall(_._2)
    val cs = checks.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    (checks,
      s"""{"gate":"q259_sf_invariants","pass":$passed,$cs,"largest_base":${l(rb, "largest_size")},"factor":$factor}""")
  }

  /** q175's scale gate (r16 — the #1 sf1 wall-time family, next to
    * outgrow the oracle's temp disk): on `factor` disjoint isomorphic
    * copies every integer census column (n_nodes, n_edges, n_wedges,
    * n_triangles) scales by EXACTLY `factor`, and global_cc =
    * 3T/W is BIT-invariant (numerator and denominator scale
    * identically, the 6dp decimal round sees the same quotient).
    */
  def checkTriangle(spark: SparkSession, base: String, scaled: String,
                    factor: Int): (Seq[(String, Boolean)], String) = {
    def row(dir: String) =
      graft.SparkEntry.queries("q175_triangle_census")(spark, dir)
        .collect()(0)
    val rb = row(base)
    val rs = row(scaled)
    def l(r: org.apache.spark.sql.Row, f: String) = r.getLong(r.fieldIndex(f))
    val checks = Seq(
      "tri_node_scaling" -> (l(rs, "n_nodes") == factor * l(rb, "n_nodes")),
      "tri_edge_scaling" -> (l(rs, "n_edges") == factor * l(rb, "n_edges")),
      "tri_wedge_scaling" ->
        (l(rs, "n_wedges") == factor * l(rb, "n_wedges")),
      "tri_triangle_scaling" ->
        (l(rs, "n_triangles") == factor * l(rb, "n_triangles")),
      "tri_cc_invariant" ->
        (rs.getDouble(rs.fieldIndex("global_cc")) ==
          rb.getDouble(rb.fieldIndex("global_cc"))))
    val passed = checks.forall(_._2)
    val cs = checks.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    (checks,
      s"""{"gate":"q175_sf_invariants","pass":$passed,$cs,"triangles_base":${l(rb, "n_triangles")},"factor":$factor}""")
  }

  /** q182's scale gate (#2 family by the same criterion): the 3-core
    * peel is copy-local on disjoint copies, so EVERY round's surviving
    * node and edge counts scale by exactly `factor` — all 8 rounds
    * checked, and the round sets must match.
    */
  def checkKcore(spark: SparkSession, base: String, scaled: String,
                 factor: Int): (Seq[(String, Boolean)], String) = {
    def rounds(dir: String) =
      graft.SparkEntry.queries("q182_kcore_peel")(spark, dir)
    val b = rounds(base).select(col("round"), col("n_nodes").as("n_b"),
      col("n_edges").as("e_b"))
    val j = rounds(scaled).join(b, Seq("round"), "full_outer")
      .agg(count(lit(1)).as("n_rounds"),
        sum(when(col("n_b").isNull || col("n_nodes").isNull, 1)
          .otherwise(0)).as("round_mismatch"),
        sum(when(col("n_nodes") =!= col("n_b") * factor, 1)
          .otherwise(0)).as("n_bad"),
        sum(when(col("n_edges") =!= col("e_b") * factor, 1)
          .otherwise(0)).as("e_bad"))
      .collect()(0)
    val checks = Seq(
      "kcore_round_set" -> (j.getLong(j.fieldIndex("round_mismatch")) == 0L),
      "kcore_node_scaling" -> (j.getLong(j.fieldIndex("n_bad")) == 0L),
      "kcore_edge_scaling" -> (j.getLong(j.fieldIndex("e_bad")) == 0L))
    val passed = checks.forall(_._2)
    val cs = checks.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    (checks,
      s"""{"gate":"q182_sf_invariants","pass":$passed,$cs,"n_rounds":${j.getLong(j.fieldIndex("n_rounds"))},"factor":$factor}""")
  }

  /** Core gate logic, reused by the spec at toy scale. Returns the
    * named check results and the one-line JSON report.
    */
  def check(spark: SparkSession, base: String, scaled: String,
            factor: Int): (Seq[(String, Boolean)], String) = {
    {
      val damping = 0.85
      def ranks(dir: String) = graft.operators.Graph.pageRank(
        graft.operators.Graph.coOrderEdges(
          graft.Tables.lineitem(spark, dir)), iterations = 5, damping)
      // the same per-table offset rule ScaleUp used for lineitem keys
      val off = graft.Tables.lineitem(spark, base)
        .agg(max(col("l_partkey"))).collect()(0).getLong(0) + 1L

      val prBase = ranks(base)
        .select(col("part").as("orig"), col("pr").as("pr_base"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val prScaled = ranks(scaled)
      val nBase = prBase.count()
      val stats = prScaled
        .withColumn("orig", col("part") % off)
        .join(prBase, Seq("orig"), "left")
        .agg(count(lit(1)).as("n_scaled"),
          sum(col("pr")).as("mass_scaled"),
          min(col("pr")).as("min_pr"),
          sum(when(col("pr_base").isNull, 1).otherwise(0)).as("unmapped"),
          max(abs(col("pr") * factor - col("pr_base")) / col("pr_base"))
            .as("max_rel_err"))
        .collect()(0)
      val massBase = prBase.agg(sum(col("pr_base"))).collect()(0).getDouble(0)
      prBase.unpersist(blocking = false)

      val nScaled = stats.getLong(0)
      val massScaled = stats.getDouble(1)
      val minPr = stats.getDouble(2)
      val unmapped = stats.getLong(3)
      val maxRelErr = stats.getDouble(4)
      val floor = (1.0 - damping) / nScaled
      val checks = Seq(
        "mass_base" -> (math.abs(massBase - 1.0) <= 1e-9),
        "mass_scaled" -> (math.abs(massScaled - 1.0) <= 1e-9),
        "teleport_floor" -> (minPr >= floor * (1.0 - 1e-12)),
        "vertex_structure" -> (nScaled == factor * nBase && unmapped == 0L),
        "linear_scaling" -> (maxRelErr <= 1e-9))
      val passed = checks.forall(_._2)
      val cs = checks.map { case (k, v) => s""""$k":$v""" }.mkString(",")
      (checks,
        f"""{"gate":"q125_sf_invariants","pass":$passed,$cs,"n_base":$nBase,"n_scaled":$nScaled,"mass_base":$massBase%.12f,"mass_scaled":$massScaled%.12f,"min_pr":$minPr%.3e,"teleport_floor":$floor%.3e,"max_rel_err":$maxRelErr%.3e,"factor":$factor}""")
    }
  }
}
