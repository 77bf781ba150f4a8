package graft

import org.apache.spark.sql.functions._

/** Source/sink round-trips: parquet (primary), CSV, JSON, and
  * partitioned-by writes — the ingestion surface of the engine.
  */
class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  private val tmp = java.nio.file.Files.createTempDirectory("graft_io").toString

  test("all ten tables load with their declared schemas") {
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    names.foreach { n =>
      val df = n match {
        case "events" => Tables.events(spark, sf)
        case _ => Tables.load(spark, sf, n)
      }
      assert(df.count() > 0, s"$n empty")
    }
  }

  test("csv round-trip preserves rows") {
    val src = Tables.load(spark, sf, "nation")
    src.write.mode("overwrite").option("header", "true").csv(s"$tmp/nation_csv")
    val back = spark.read.option("header", "true").schema(Tables.nationSchema)
      .csv(s"$tmp/nation_csv")
    assert(back.count() == src.count())
    assert(back.except(src).count() == 0)
  }

  test("json round-trip preserves rows") {
    val src = Tables.load(spark, sf, "region")
    src.write.mode("overwrite").json(s"$tmp/region_json")
    val back = spark.read.schema(Tables.regionSchema).json(s"$tmp/region_json")
    assert(back.except(src).count() == 0 && src.except(back).count() == 0)
  }

  test("partitioned parquet write prunes partitions on read") {
    val src = Tables.load(spark, sf, "customer")
    src.write.mode("overwrite").partitionBy("c_mktsegment")
      .parquet(s"$tmp/cust_part")
    val one = spark.read.parquet(s"$tmp/cust_part")
      .filter($"c_mktsegment" === "BUILDING")
    val expected = src.filter($"c_mktsegment" === "BUILDING").count()
    assert(one.count() == expected)
    // partition pruning visible in the plan: no other segment dirs scanned
    val plan = one.queryExecution.executedPlan.toString
    assert(!plan.contains("AUTOMOBILE"))
  }

  test("parquet writes round numeric aggregates stably") {
    val agg = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag").agg(round(sum($"l_quantity"), 2).as("s"))
    agg.write.mode("overwrite").parquet(s"$tmp/agg")
    val back = spark.read.parquet(s"$tmp/agg")
    assert(back.except(agg).count() == 0)
  }
}
