package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational/OLAP core (SURVEY §2, q1–q20).
  *
  * Every query is a declarative DataFrame plan: filters and projections
  * reach the parquet scan via Catalyst pushdown, dimension joins are
  * explicit broadcasts, and double-valued aggregates are rounded
  * identically to the DuckDB oracle to absorb FP summation-order noise.
  */
object Relational {

  /** q1_pricing_summary — TPC-H Q1 shape: scan→filter→hash-agg.
    * Partial aggregation is map-side (6 groups), so shuffle traffic is
    * O(partitions × groups) regardless of input scale.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      // money lattice (q5's sf1.0 lesson) on the PRICE sums: 6 groups
      // over the whole table, so FP sum-order drift grows with data and
      // eventually crosses the 2dp band. The exact sums run as INTEGER
      // CENTS (x·100 + 0.5 truncated to long — HALF_UP for the
      // non-negative money/discount domain without Spark round()'s
      // per-row BigDecimal allocation — summed in codegen'd 64-bit
      // adds), not Decimal aggregation: the same exact value the
      // DECIMAL(18,2) lattice produces (both round per-row money to
      // 2dp and sum exactly; the oracle keeps the decimal formulation)
      // at double-sum speed, measured 0.50→0.37 s warm at sf0.1 on
      // this flagship scan. Long capacity bounds the contract: Σ cents
      // < 2^63 ($9.2e16) and Σ cents·(100−disc_cents) < 2^63 ($9.2e14
      // at 1e-4 scale) — re-derive through DECIMAL if a deployment can
      // exceed that. The final cents→dollars division happens once per
      // GROUP in decimal (exact), never per row. sum_qty is
      // integer-valued (exact in doubles below 2^53) and the avgs
      // divide the drift back out — both provably safe unlatticed.
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round((sum(($"l_extendedprice" * 100 + 0.5).cast("long"))
            .cast(org.apache.spark.sql.types.DecimalType(28, 0)) / 100), 2)
          .cast("double").as("sum_base_price"),
        round((sum(($"l_extendedprice" * 100 + 0.5).cast("long") *
              (lit(100L) - ($"l_discount" * 100 + 0.5).cast("long")))
            .cast(org.apache.spark.sql.types.DecimalType(28, 0)) / 10000), 2)
          .cast("double").as("sum_disc_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
      |    AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * CAST(1.0 - l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)
      |    AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** q2_filter_pushdown — selective predicate + 3-column projection; both
    * reach the parquet scan (PushedFilters + pruned ReadSchema), so at
    * 100 TB only the matching row groups and 3 columns are read.
    */
  def q2FilterPushdown(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .filter($"p_size".between(10, 20) && $"p_type" === "PROMO")
      .select($"p_partkey", $"p_name", $"p_retailprice")
  }

  val q2Sql: String =
    """SELECT p_partkey, p_name, p_retailprice FROM part
      |WHERE p_size BETWEEN 10 AND 20 AND p_type = 'PROMO'""".stripMargin

  /** q3_join_agg — TPC-H Q3 shape: two shuffle joins + agg + top-k.
    * Top-k is orderBy.limit = TakeOrderedAndProject: O(k) per partition,
    * no global sort. Tie-broken on l_orderkey for determinism.
    */
  def q3JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir).filter($"c_mktsegment" === "BUILDING")
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" < lit("1998-03-15").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" > lit("1998-03-15").cast("timestamp"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** q4_broadcast_join — dimension chain supplier⨝nation⨝region, both dims
    * broadcast: zero shuffle of the (large-at-scale) supplier side.
    */
  def q4BroadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      // money lattice (q5's sf1.0 lesson): 5 region groups over all
      // suppliers — drift grows with data
      .agg(count(lit(1)).as("n_suppliers"),
        round(sum($"s_acctbal"
          .cast(org.apache.spark.sql.types.DecimalType(18, 2))), 2)
          .cast("double").as("total_acctbal"))
  }

  val q4Sql: String =
    """SELECT r_name, count(*) AS n_suppliers,
      |  CAST(round(sum(CAST(s_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
      |    AS total_acctbal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  /** q5_multi_join — TPC-H Q5 shape: 6-way join, dims broadcast, facts
    * shuffle-joined on their keys; revenue by nation.
    */
  def q5MultiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val asiaNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
    Tables.lineitem(spark, dir)
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.supplier(spark, dir)),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(asiaNations), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      // money lattice: at sf>=1 the per-nation double sum's order drift
      // crosses the 2dp rounding band (found by the sf1.0 gate) — the
      // 2dp price/discount terms are exact decimals, so the sum is
      // order-independent exact in both engines
      .agg(round(sum($"l_extendedprice"
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)) *
        (lit(1.0) - $"l_discount")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2))), 2)
        .cast("double").as("revenue"))
  }

  val q5Sql: String =
    """SELECT n_name, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * CAST(1.0 - l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name""".stripMargin

  /** q6_selective_filter — TPC-H Q6 shape: tight range predicates fully
    * pushed to parquet; single-row global aggregate.
    */
  def q6SelectiveFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
      .agg(round(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"))
  }

  val q6Sql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** q7_group_having — groupBy + HAVING on the unrounded aggregate
    * (filter applied post-agg, map-side partial agg keeps shuffle tiny).
    */
  def q7GroupHaving(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_suppkey")
      .agg(sum($"l_quantity").as("raw_qty"), count(lit(1)).as("n_lines"))
      .filter($"raw_qty" > 15500)
      .select($"l_suppkey", round($"raw_qty", 2).as("total_qty"), $"n_lines")
  }

  val q7Sql: String =
    """SELECT l_suppkey, round(sum(l_quantity), 2) AS total_qty, count(*) AS n_lines
      |FROM lineitem GROUP BY l_suppkey HAVING sum(l_quantity) > 15500""".stripMargin

  /** q8_distinct_count — exact multi-column distinct aggregation. */
  def q8DistinctCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderstatus")
      .agg(countDistinct($"o_custkey").as("n_cust"),
        countDistinct($"o_orderpriority").as("n_prio"),
        count(lit(1)).as("n_orders"))
  }

  val q8Sql: String =
    """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust,
      |  count(DISTINCT o_orderpriority) AS n_prio, count(*) AS n_orders
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** q9_topk — global top-k: TakeOrderedAndProject, no full sort. */
  def q9TopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(25)
  }

  val q9Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin

  /** q10_window_rank — rank per mktsegment; partitions by a bounded key
    * but each partition's sort is local to its hash-shuffle bucket.
    */
  def q10WindowRank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".desc, $"c_custkey")
    Tables.customer(spark, dir)
      .select($"c_mktsegment", $"c_custkey", $"c_acctbal")
      .withColumn("rnk", rank().over(w))
      .filter($"rnk" <= 5)
  }

  val q10Sql: String =
    """SELECT * FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk
      |  FROM customer) WHERE rnk <= 5""".stripMargin

  /** q11_semi_anti — EXISTS / NOT EXISTS as left-semi / left-anti joins
    * (no row multiplication, orders side only shuffles its key column).
    */
  def q11SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
    val orderKeys = Tables.orders(spark, dir).select($"o_custkey")
    val withOrders = cust.join(orderKeys, $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n_with"))
    val withoutOrders = cust.join(orderKeys, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n_without"))
    withOrders.join(withoutOrders, Seq("c_mktsegment"), "left_outer")
      .select($"c_mktsegment", $"n_with",
        coalesce($"n_without", lit(0L)).as("n_without"))
  }

  val q11Sql: String =
    """WITH w AS (
      |  SELECT c_mktsegment, count(*) AS n_with FROM customer
      |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  GROUP BY c_mktsegment),
      |wo AS (
      |  SELECT c_mktsegment, count(*) AS n_without FROM customer
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  GROUP BY c_mktsegment)
      |SELECT w.c_mktsegment, n_with, coalesce(n_without, 0) AS n_without
      |FROM w LEFT JOIN wo USING (c_mktsegment)""".stripMargin

  /** q12_conditional_agg — TPC-H Q12 shape: CASE-WHEN counters. */
  def q12ConditionalAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hi = Seq("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_linestatus")
      .agg(
        sum(when($"o_orderpriority".isin(hi: _*), 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!$"o_orderpriority".isin(hi: _*), 1L).otherwise(0L)).as("low_line_count"))
  }

  val q12Sql: String =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY l_linestatus""".stripMargin

  /** q13_outer_join_agg — TPC-H Q13 shape: left outer join preserved
    * through two aggregation levels (customer order-count distribution).
    */
  def q13OuterJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  val q13Sql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |GROUP BY c_count""".stripMargin

  /** q14_union_all — heterogeneous slices unioned then aggregated. */
  def q14UnionAll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter($"event_type" === "click")
      .select(lit("click").as("kind"), $"value")
    val buys = ev.filter($"event_type" === "purchase")
      .select(lit("buy").as("kind"), ($"value" * 2.0).as("value"))
    clicks.unionAll(buys)
      .groupBy($"kind")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
  }

  val q14Sql: String =
    """SELECT kind, count(*) AS n, round(sum(value), 2) AS total FROM (
      |  SELECT 'click' AS kind, value FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT 'buy' AS kind, value * 2.0 AS value FROM events WHERE event_type = 'purchase')
      |GROUP BY kind""".stripMargin

  /** q15_cte_view — TPC-H Q15 shape: derived revenue view + max-equality
    * self-filter.
    *
    * The max is a global window over the ALREADY-AGGREGATED view (one
    * row per suppkey — dimension cardinality even at 100 TB), so
    * lineitem is scanned exactly once; the round-1 plan materialized
    * the view twice (agg for max + again for the join). The surviving
    * (~1-row) side is broadcast into the supplier join.
    */
  def q15CteView(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val revenue = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("total_revenue"))
    val top = revenue
      .withColumn("mx", max($"total_revenue").over(Window.partitionBy()))
      .filter($"total_revenue" === $"mx")
    Tables.supplier(spark, dir)
      .join(broadcast(top), $"s_suppkey" === $"l_suppkey")
      .select($"s_suppkey", $"s_name", $"total_revenue")
  }

  val q15Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""".stripMargin

  /** q16_grouping_sets — ROLLUP over two dims with null-marker coalesce. */
  def q16GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .withColumn("tp",
        $"o_totalprice".cast(org.apache.spark.sql.types.DecimalType(18, 2)))
      .rollup($"c_mktsegment", $"o_orderstatus")
      // money lattice (q5's sf1.0 lesson): exact-decimal sum of the 2dp
      // price so rollup totals are order-independent across engines;
      // cast projected below the rollup so Expand's copies share it
      .agg(count(lit(1)).as("n"),
        round(sum($"tp"), 2).cast("double").as("total"))
      .select(coalesce($"c_mktsegment", lit("ALL")).as("seg"),
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        $"n", $"total")
  }

  val q16Sql: String =
    """SELECT coalesce(c_mktsegment, 'ALL') AS seg, coalesce(o_orderstatus, 'ALL') AS status,
      |  count(*) AS n,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
      |    AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY ROLLUP(c_mktsegment, o_orderstatus)""".stripMargin

  /** q17_subquery_avg — TPC-H Q17 shape: correlated avg subquery
    * decorrelated into a per-partkey aggregate + broadcast-joined filter.
    */
  def q17SubqueryAvg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val partAvg = li.groupBy($"l_partkey".as("avg_partkey"))
      .agg((avg($"l_quantity") * 0.2).as("qty_threshold"))
    val brandParts = Tables.part(spark, dir).filter($"p_brand" === "Brand#1")
      .select($"p_partkey")
    li.join(broadcast(brandParts), $"l_partkey" === $"p_partkey")
      .join(partAvg, $"l_partkey" === $"avg_partkey")
      .filter($"l_quantity" < $"qty_threshold")
      .agg(round(sum($"l_extendedprice") / 7.0, 2).as("avg_yearly"))
  }

  val q17Sql: String =
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#1'
      |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
      |                    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin

  /** q18_in_subquery — TPC-H Q18 shape: IN-subquery on grouped HAVING,
    * planned as a semi join against the pre-aggregated key set.
    */
  def q18InSubquery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val bigOrders = li.groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("q")).filter($"q" > 250)
      .select($"l_orderkey".as("big_orderkey"))
    Tables.orders(spark, dir)
      .join(bigOrders, $"o_orderkey" === $"big_orderkey", "left_semi")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(li, $"o_orderkey" === $"l_orderkey")
      .groupBy($"c_custkey", $"o_orderkey", $"o_totalprice")
      .agg(round(sum($"l_quantity"), 2).as("total_qty"))
  }

  val q18Sql: String =
    """SELECT c_custkey, o_orderkey, o_totalprice, round(sum(l_quantity), 2) AS total_qty
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
      |GROUP BY c_custkey, o_orderkey, o_totalprice""".stripMargin

  /** q19_percentile — exact interpolated percentiles per group (Spark
    * `percentile` ≡ DuckDB `quantile_cont`).
    */
  def q19Percentile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(
        round(percentile($"o_totalprice", lit(0.5)), 2).as("median_price"),
        round(percentile($"o_totalprice", lit(0.9)), 2).as("p90_price"))
  }

  val q19Sql: String =
    """SELECT o_orderpriority,
      |  round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
      |  round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** q20_approx_distinct — HLL approx_count_distinct next to the exact
    * count; rows-only check (sketch estimates are engine-specific).
    *
    * The two aggregates are computed in SEPARATE passes joined on the
    * (tiny) group key: mixing count(DISTINCT) with HLL in one agg makes
    * Catalyst rewrite via Expand, which carries the ~12 KB HLL buffer
    * as partial-agg state for every distinct (event_type, user_id)
    * combination — that was 21 s of the round-1 bench (vs ~1 s split).
    * The exact side is a two-level groupBy (map-side partial agg on the
    * pair key, then count per group), which scales linearly.
    */
  def q20ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // HLL is duplicate-insensitive, so the estimate over the DISTINCT
    // (type, user) pairs equals the estimate over the raw stream — both
    // aggregates ride one two-level pipeline: map-side partial agg on
    // the pair key, then per-type count + sketch. No Expand, no join.
    // the raw HLL estimate is implementation-specific (not portable
    // across engines), so the EMITTED contract is what a sketch
    // promises: the exact cardinality plus a certified accuracy flag
    // (|est/exact − 1| ≤ 5%, 6× headroom over the 0.8% worst case
    // measured across all three SFs) — deterministic on fixed data,
    // hence hash-matchable against the DuckDB oracle
    Tables.events(spark, dir)
      .groupBy($"event_type", $"user_id").agg(count(lit(1)))
      .groupBy($"event_type")
      .agg(approx_count_distinct($"user_id", 0.01).as("approx_users"),
        count(lit(1)).as("exact_users"))
      .select($"event_type", $"exact_users",
        (abs($"approx_users".cast("double") / $"exact_users" - 1.0) <= 0.05)
          .as("approx_within_5pct"))
  }

  val q20Sql: String =
    """SELECT event_type, count(DISTINCT user_id) AS exact_users,
      |  true AS approx_within_5pct
      |FROM events GROUP BY event_type""".stripMargin
}
