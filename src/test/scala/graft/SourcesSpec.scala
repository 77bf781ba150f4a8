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

  test("malformed feed rows are quarantined, not dropped silently") {
    // a provider feed with one bad record: PERMISSIVE parse keeps the
    // good rows and captures the raw bad line for quarantine/replay
    val dir = s"$tmp/feed_csv"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/feed.csv"),
      "1,ACME,100.5\n2,GLOBEX,not_a_number\n3,INITECH,99.25\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("px", org.apache.spark.sql.types.DoubleType)))
    val feed = graft.sources.Ingest.quarantineCsv(spark, dir, schema)
    assert(feed.good.count() == 2)
    assert(feed.good.columns.toSeq == Seq("id", "name", "px"))
    assert(feed.quarantined.count() == 1)
    assert(feed.quarantined.select("_corrupt_record").as[String].collect()(0)
      .contains("not_a_number"))
    feed.unpersist()
  }

  test("manifest-tracked incremental ingest is exactly-once across reruns") {
    val root = java.nio.file.Files.createTempDirectory("graft_ingest2")
    val landing = root.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    def drop(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val tmpd = root.resolve(s"tmp_$name").toString
      df.coalesce(1).write.parquet(tmpd)
      val part = new java.io.File(tmpd).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      java.nio.file.Files.copy(part, landing.resolve(s"$name.parquet"))
    }
    val sup = Tables.load(spark, sf, "supplier")
    drop("gen0", sup.filter($"s_suppkey" % 2 === 0))
    drop("gen1", sup.filter($"s_suppkey" % 2 === 1))
    val table = root.resolve("table").toString
    val mf = root.resolve("MANIFEST").toString
    val r1 = graft.sources.Ingest.incrementalIngest(
      spark, landing.toString, table, mf, Tables.supplierSchema)
    assert(r1.newFiles.size == 2 && r1.rowsIngested == sup.count())
    assert(spark.read.parquet(table).count() == sup.count())
    // rerun with nothing new: no-op
    val r2 = graft.sources.Ingest.incrementalIngest(
      spark, landing.toString, table, mf, Tables.supplierSchema)
    assert(r2.newFiles.isEmpty)
    assert(spark.read.parquet(table).count() == sup.count())
    // a third file arrives: only it is ingested
    val extra = sup.filter($"s_suppkey" < 3)
    drop("gen2", extra)
    val r3 = graft.sources.Ingest.incrementalIngest(
      spark, landing.toString, table, mf, Tables.supplierSchema)
    assert(r3.newFiles.size == 1 && r3.rowsIngested == extra.count())
    val total = sup.count() + extra.count()
    assert(spark.read.parquet(table).count() == total)
    // crash replay: manifest lost the gen2 line (crash between data
    // write and manifest advance) — the rerun overwrites gen2's own
    // partition instead of appending duplicates, then heals the manifest
    val lines = java.nio.file.Files.readString(java.nio.file.Paths.get(mf))
      .split("\n").filter(l => l.nonEmpty && !l.contains("gen2"))
    // rewrite through the Hadoop FS API — the local ChecksumFileSystem
    // keeps a .crc sidecar that a direct java.nio write would invalidate
    val mfPath = new org.apache.hadoop.fs.Path(mf)
    val hfs = mfPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = hfs.create(mfPath, true)
    try out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    val r4 = graft.sources.Ingest.incrementalIngest(
      spark, landing.toString, table, mf, Tables.supplierSchema)
    assert(r4.newFiles.size == 1)
    assert(spark.read.parquet(table).count() == total, "replay duplicated rows")
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(mf))
      .contains("gen2"))
  }

  test("compaction collapses small files and preserves every row") {
    val dir = s"$tmp/compact_me"
    val src = Tables.load(spark, sf, "lineitem")
    // simulate a small-file mess: 24 tiny files
    src.repartition(24).write.mode("overwrite").parquet(dir)
    val stats = graft.sources.Compact.compact(spark, dir,
      targetBytes = Long.MaxValue) // everything fits one file
    assert(stats.filesBefore == 24 && stats.filesAfter == 1)
    assert(stats.rows == src.count())
    // multiset equality (the synthetic key isn't guaranteed unique, so
    // a sorted-collect compare would be order-ambiguous)
    val after = spark.read.parquet(dir)
    assert(after.count() == src.count())
    assert(after.exceptAll(src).count() == 0 && src.exceptAll(after).count() == 0)
    // no stray swap dirs left behind
    assert(!new java.io.File(dir + ".compact_tmp").exists())
    assert(!new java.io.File(dir + ".pre_compact").exists())
  }

  test("compaction refuses partitioned layouts, sink logs, and leftovers") {
    // partitioned table → loud refusal, never a silent flatten
    val part = s"$tmp/compact_part"
    Tables.load(spark, sf, "region").write.mode("overwrite")
      .partitionBy("r_regionkey").parquet(part)
    val e1 = intercept[IllegalArgumentException] {
      graft.sources.Compact.compact(spark, part)
    }
    assert(e1.getMessage.contains("partition"))
    // leftover swap dir from a crashed run → refuse to start
    val flat = s"$tmp/compact_leftover"
    Tables.load(spark, sf, "region").write.mode("overwrite").parquet(flat)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(flat + ".pre_compact"))
    val e2 = intercept[IllegalArgumentException] {
      graft.sources.Compact.compact(spark, flat)
    }
    assert(e2.getMessage.contains("previous compaction"))
  }

  test("orc round-trip preserves rows") {
    val src = Tables.load(spark, sf, "supplier")
    src.write.mode("overwrite").orc(s"$tmp/supplier_orc")
    val back = spark.read.schema(Tables.supplierSchema).orc(s"$tmp/supplier_orc")
    assert(back.except(src).count() == 0 && src.except(back).count() == 0)
  }

  test("schema evolution: mergeSchema unions columns across file generations") {
    val v1 = Tables.load(spark, sf, "region")
    v1.write.mode("overwrite").parquet(s"$tmp/evolving/gen=1")
    v1.withColumn("r_comment", concat(lit("c_"), $"r_name"))
      .write.mode("overwrite").parquet(s"$tmp/evolving/gen=2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$tmp/evolving")
    assert(merged.columns.toSet ==
      Set("r_regionkey", "r_name", "r_comment", "gen"))
    // old-generation rows surface the new column as NULL
    assert(merged.filter($"gen" === 1 && $"r_comment".isNotNull).count() == 0)
    assert(merged.filter($"gen" === 2 && $"r_comment".isNull).count() == 0)
  }

  test("bucketed tables join without any shuffle exchange") {
    // co-located join: both sides bucketed on the join key → the sort-
    // merge join reads buckets pairwise, no Exchange in the plan. At
    // 100 TB this is the difference between joining in place and
    // re-shuffling both fact tables every query.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.load(spark, sf, "orders")
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_bkt")
      Tables.load(spark, sf, "lineitem")
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_bkt")
      val joined = spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffles:\n$plan")
      // and it computes the same answer as the shuffled join
      val plain = Tables.load(spark, sf, "lineitem")
        .join(Tables.load(spark, sf, "orders"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      assert(joined.except(plain).count() == 0 && plain.except(joined).count() == 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }

  test("parquet writes round numeric aggregates stably") {
    val agg = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag").agg(round(sum($"l_quantity"), 2).as("s"))
    agg.write.mode("overwrite").parquet(s"$tmp/agg")
    val back = spark.read.parquet(s"$tmp/agg")
    assert(back.except(agg).count() == 0)
  }
}
