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

  test("GraphGate invariants hold on a ×3 derivation (the q125 scale gate)") {
    // the scaled co-purchase graph is 3 disjoint isomorphic copies, so
    // PageRank must scale exactly linearly — the gate that replaces
    // the DuckDB CTE unroll at sf1 (temp-disk bound). Exercised here
    // at toy scale so the gate logic itself is covered by sbt test.
    val dst = Files.createTempDirectory("graft_ggate").toString
    ScaleUp.scaleTable(spark, sf, dst, "lineitem", factor = 3)
    val (checks, line) = graft.tools.GraphGate.check(spark, sf, dst, 3)
    assert(checks.forall(_._2), s"gate failed: $line")
  }
}
