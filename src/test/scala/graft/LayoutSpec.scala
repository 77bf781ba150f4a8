package graft

import graft.sources.{Ingest, Layout}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Layout + schema-evolution source specs: the clustered write's
  * skipping property is verified from the actual parquet footers (not
  * trusted from the write path), and evolving feeds project onto the
  * pinned target schema.
  */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("clusteredWrite round-trips and produces disjoint row-group key ranges") {
    val out = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val li = Tables.lineitem(spark, sf)
    Layout.clusteredWrite(li, out, numFiles = 8, "l_orderkey")
    // round trip: nothing lost or duplicated
    val back = spark.read.parquet(out)
    assert(back.count() == li.count())
    assert(back.agg(sum($"l_orderkey")).as[Double].head() ==
      li.agg(sum($"l_orderkey")).as[Double].head())
    // footer audit: every row group carries stats, and ranges ordered by
    // min never overlap (same-key runs may touch at a boundary) — the
    // property a scan's min/max pruning depends on
    val stats = Layout.rowGroupStats(spark, out, "l_orderkey")
    assert(stats.nonEmpty)
    assert(stats.map(_.rows).sum == li.count())
    val ordered = stats.sortBy(s => (s.min, s.max))
    ordered.sliding(2).foreach {
      case Seq(a, b) => assert(a.max <= b.min,
        s"overlapping row groups: $a vs $b")
      case _ => ()
    }
    // the layout is actually selective: one row group covers far less
    // than the whole key domain
    val domain = ordered.last.max - ordered.head.min
    assert(ordered.map(s => s.max - s.min).max < domain)
  }

  test("partitionedWrite: dynamic partition pruning fires through a filtered dim join") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Layout.partitionedWrite(Tables.orders(spark, sf), s"$dir/fact",
      "o_orderpriority")
    // a priority attribute dim on disk (the date_dim shape): the
    // filter is on a NON-join column, so only a runtime subquery can
    // know which fact partitions survive
    Seq(("1-URGENT", "hot"), ("2-HIGH", "hot"), ("3-MEDIUM", "warm"),
        ("4-NOT SPECIFIED", "cold"), ("5-LOW", "cold"))
      .toDF("pri", "tier").write.mode("overwrite").parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim").filter($"tier" === "hot")
    val q = fact.join(dim, fact("o_orderpriority") === dim("pri"))
      .agg(count(lit(1)).as("n"), countDistinct($"o_orderpriority").as("k"))
    val row = q.collect()(0)
    // correctness: only the two hot priorities' partitions contribute
    assert(row.getLong(1) == 2L)
    val expected = Tables.orders(spark, sf)
      .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH")).count()
    assert(row.getLong(0) == expected)
    // the plan must carry the runtime pruning subquery on the fact
    // scan — this is what keeps the 100-TB fact side from listing the
    // pruned directories at all
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$plan")
  }

  test("clusteredWrite rejects an empty key list") {
    intercept[IllegalArgumentException] {
      Layout.clusteredWrite(Tables.region(spark, sf), "/tmp/never", 2)
    }
  }

  test("evolvingRead unions feed versions onto the pinned target schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    // v1: two columns; v2: adds `source`; v3 would retire `value`
    Seq((1L, 10.0), (2L, 20.0)).toDF("event_id", "value")
      .write.parquet(s"$dir/v1")
    Seq((3L, 30.0, "feedB")).toDF("event_id", "value", "source")
      .write.parquet(s"$dir/v2")
    val target = StructType(Seq(
      StructField("event_id", LongType),
      StructField("value", DoubleType),
      StructField("source", StringType),
      StructField("checksum", StringType))) // never written by any version
    val df = Ingest.evolvingRead(spark, target, s"$dir/v1", s"$dir/v2")
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      target.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(df.count() == 3)
    // rows from the old version null-fill the new column
    assert(df.filter($"event_id" < 3 && $"source".isNull).count() == 2)
    assert(df.filter($"event_id" === 3 && $"source" === "feedB").count() == 1)
    assert(df.filter($"checksum".isNotNull).count() == 0)
  }

  test("zorderWrite narrows BOTH key domains where single-key clustering cannot") {
    // the audit that justifies the z-order claim: footer ranges, not
    // writer intent. lineitem's orderkey and partkey are ~independent,
    // so clustering on orderkey alone leaves partkey unprunable.
    val li = Tables.lineitem(spark, sf)
    def avgSpanShare(dir: String, column: String): Double = {
      val stats = Layout.rowGroupStats(spark, dir, column)
      val lo = stats.map(_.min).min
      val hi = stats.map(_.max).max
      val domain = math.max(hi - lo, 1L).toDouble
      stats.map(s => (s.max - s.min).toDouble).sum / stats.size / domain
    }
    val single = java.nio.file.Files.createTempDirectory("graft_zs").toString
    val zord = java.nio.file.Files.createTempDirectory("graft_zz").toString
    Layout.clusteredWrite(li, single, numFiles = 16, "l_orderkey")
    Layout.zorderWrite(li, zord, numFiles = 16, bits = 8,
      "l_orderkey", "l_partkey")
    // round trip: nothing lost
    assert(spark.read.parquet(zord).count() == li.count())
    // single-key layout: partkey spans ~the whole domain per row group
    assert(avgSpanShare(single, "l_partkey") > 0.8,
      "premise broken: partkey is accidentally clustered")
    // z-order: BOTH dimensions prunable — each row group covers a
    // fraction of each domain (16 files over 2 keys ⇒ ~1/4 per key in
    // the ideal curve; allow generous slack for bucket granularity)
    assert(avgSpanShare(zord, "l_orderkey") < 0.6,
      s"orderkey not clustered: ${avgSpanShare(zord, "l_orderkey")}")
    assert(avgSpanShare(zord, "l_partkey") < 0.6,
      s"partkey not clustered: ${avgSpanShare(zord, "l_partkey")}")
  }
}
