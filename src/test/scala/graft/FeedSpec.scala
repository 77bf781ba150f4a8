package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end external-feed connectors: a cursor-paged REST pull
  * against a local in-process HTTP stub (no network egress), and a
  * partitioned JDBC read against embedded Derby — each landed through
  * the SAME manifest/overwrite idempotency machinery the parquet
  * ingest uses.
  */
class FeedSpec extends SparkTestBase {
  import spark.implicits._

  private val tmp = java.nio.file.Files.createTempDirectory("graft_feed").toString

  private val feedSchema = StructType(Seq(
    StructField("id", LongType), StructField("px", DoubleType)))

  /** Three-page feed: records 2 per page, next cursor in the header,
    * absent header on the last page. Counts every request served.
    */
  private def startStub(): (HttpServer, AtomicInteger, String) = {
    val served = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val pages = Map(
      None -> (Seq("""{"id":1,"px":10.0}""", """{"id":2,"px":20.0}"""), Some("c2")),
      Some("c2") -> (Seq("""{"id":3,"px":30.0}""", """{"id":4,"px":40.0}"""), Some("c3")),
      Some("c3") -> (Seq("""{"id":5,"px":50.0}""", """{"id":6,"px":60.0}"""), None))
    server.createContext("/feed", (ex: HttpExchange) => {
      served.incrementAndGet()
      val q = Option(ex.getRequestURI.getQuery)
        .flatMap(_.split("&").collectFirst {
          case kv if kv.startsWith("cursor=") => kv.stripPrefix("cursor=") })
      val (records, next) = pages(q)
      next.foreach(c => ex.getResponseHeaders.add("X-Next-Cursor", c))
      val body = records.mkString("", "\n", "\n").getBytes(UTF_8)
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    (server, served, s"http://127.0.0.1:${server.getAddress.getPort}/feed")
  }

  test("paged REST pull is resumable, exactly-once per page, and lands through the manifest") {
    val (server, served, url) = startStub()
    try {
      val landing = s"$tmp/rest_landing"
      val state = s"$tmp/rest_cursor"
      // first pull stops mid-feed; second resumes from the saved cursor
      val first = sources.RestFeed.pull(url, landing, state, maxPages = 2)
      assert(first.pagesFetched == 2 && !first.complete, first.toString)
      val second = sources.RestFeed.pull(url, landing, state)
      assert(second.pagesFetched == 1 && second.complete, second.toString)
      // every page was requested exactly once across both pulls
      assert(served.get() == 3, s"server saw ${served.get()} requests")
      // a third pull is a no-op: the feed is marked done
      assert(sources.RestFeed.pull(url, landing, state) ==
        sources.RestFeed.PullResult(0, 0L, complete = true))
      assert(served.get() == 3)

      // landing -> parquet through the SAME manifest machinery as files
      val table = s"$tmp/rest_table"
      val manifest = s"$tmp/rest_manifest"
      val r1 = sources.Ingest.incrementalIngest(spark, landing, table,
        manifest, feedSchema, format = "json")
      assert(r1.newFiles.size == 3 && r1.rowsIngested == 6L, r1.toString)
      val back = spark.read.parquet(table)
      assert(back.count() == 6)
      assert(back.agg(sum($"px")).as[Double].collect()(0) == 210.0)
      // re-running the ingest against an unchanged landing dir is a no-op
      val r2 = sources.Ingest.incrementalIngest(spark, landing, table,
        manifest, feedSchema, format = "json")
      assert(r2.newFiles.isEmpty && spark.read.parquet(table).count() == 6)
    } finally server.stop(0)
  }

  test("a non-retryable feed error fails the pull loudly; the cursor does not advance") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/gone", (ex: HttpExchange) => {
      ex.sendResponseHeaders(404, -1); ex.close()
    })
    server.start()
    try {
      val state = s"$tmp/err_cursor"
      val e = intercept[sources.RestFeed.FeedStatusException] {
        sources.RestFeed.pull(
          s"http://127.0.0.1:${server.getAddress.getPort}/gone",
          s"$tmp/err_landing", state)
      }
      assert(e.status == 404 && e.getMessage.contains("404"), e.getMessage)
      // no state file written -> a fixed feed restarts from the top
      assert(!new java.io.File(state).exists())
    } finally server.stop(0)
  }

  test("partitioned JDBC read of an empty table keeps the schema and returns no rows") {
    val url = s"jdbc:derby:$tmp/derbyempty;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement()
      .execute("CREATE TABLE novals (id BIGINT PRIMARY KEY, px DOUBLE)")
    finally conn.close()
    val df = sources.JdbcFeed.partitionedRead(spark, url, "novals",
      partitionCol = "id", numPartitions = 4)
    assert(df.columns.toSeq == Seq("ID", "PX") && df.count() == 0)
  }

  test("partitioned JDBC read stripes the source and snapshots land idempotently") {
    val url = s"jdbc:derby:$tmp/derbydb;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE quotes (id BIGINT PRIMARY KEY, px DOUBLE)")
      val ins = conn.prepareStatement("INSERT INTO quotes VALUES (?, ?)")
      (1 to 100).foreach { i =>
        ins.setLong(1, i.toLong); ins.setDouble(2, i * 1.5)
        ins.addBatch()
      }
      ins.executeBatch()
    } finally conn.close()

    val df = sources.JdbcFeed.partitionedRead(spark, url, "quotes",
      partitionCol = "id", numPartitions = 4, props = props)
    // the read really is striped: 4 independent range cursors
    assert(df.rdd.getNumPartitions == 4, s"${df.rdd.getNumPartitions} stripes")
    assert(df.count() == 100)
    assert(df.agg(sum($"px")).as[Double].collect()(0) == 1.5 * 5050)

    val table = s"$tmp/jdbc_table"
    val n1 = sources.JdbcFeed.snapshotToParquet(spark, url, "quotes",
      "id", 4, table, snapshotId = "2024-01-31", props = props)
    // re-running the SAME snapshot overwrites itself, never duplicates
    val n2 = sources.JdbcFeed.snapshotToParquet(spark, url, "quotes",
      "id", 4, table, snapshotId = "2024-01-31", props = props)
    assert(n1 == 100L && n2 == 100L)
    assert(spark.read.parquet(table).count() == 100)
  }

  test("incremental JDBC pull lands only rows above the watermark and advances it") {
    val url = s"jdbc:derby:$tmp/derbyinc;create=true"
    val props = new java.util.Properties()
    def insert(range: Range): Unit = {
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        try st.execute("CREATE TABLE ticks (id BIGINT PRIMARY KEY, px DOUBLE)")
        catch { case _: java.sql.SQLException => () } // exists on 2nd call
        val ins = conn.prepareStatement("INSERT INTO ticks VALUES (?, ?)")
        range.foreach { i =>
          ins.setLong(1, i.toLong); ins.setDouble(2, i * 2.0); ins.addBatch()
        }
        ins.executeBatch()
      } finally conn.close()
    }
    val table = s"$tmp/jdbc_inc"
    val wm = s"$tmp/jdbc_wm"
    insert(1 to 50)
    assert(sources.JdbcFeed.incrementalPull(spark, url, "ticks", "id", 4,
      table, wm, props) == 50L)
    // nothing new -> no-op, no new files, watermark unchanged
    assert(sources.JdbcFeed.incrementalPull(spark, url, "ticks", "id", 4,
      table, wm, props) == 0L)
    assert(spark.read.parquet(table).count() == 50)
    // feed appends; the second pull lands ONLY the new key range
    insert(51 to 80)
    assert(sources.JdbcFeed.incrementalPull(spark, url, "ticks", "id", 4,
      table, wm, props) == 30L)
    val all = spark.read.parquet(table)
    assert(all.count() == 80)
    assert(all.select($"id").distinct().count() == 80)
    assert(all.agg(sum($"px")).as[Double].collect()(0) == 2.0 * (80 * 81) / 2)
    // crash-replay RACING new appends: roll the watermark back to 50
    // (as if the last pull crashed between land and mark-advance),
    // append more rows, and replay. The replay runs from the same
    // from-watermark, so it must OVERWRITE the crashed batch's
    // partition with the longer (50, 90] range — never duplicate the
    // (50, 80] overlap under a second tag.
    val fs = new org.apache.hadoop.fs.Path(wm)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(wm), true)
    try out.write("50".getBytes("UTF-8")) finally out.close()
    insert(81 to 90)
    assert(sources.JdbcFeed.incrementalPull(spark, url, "ticks", "id", 4,
      table, wm, props) == 40L)
    val replayed = spark.read.parquet(table)
    assert(replayed.count() == 90, "crash-replay duplicated the overlap")
    assert(replayed.select($"id").distinct().count() == 90)
  }

  test("JDBC upsert sink merges by key: updates, inserts, and idempotent replay") {
    val url = s"jdbc:derby:$tmp/derbyup;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute(
      "CREATE TABLE master (id BIGINT PRIMARY KEY, px DOUBLE, src VARCHAR(4000))")
    finally conn.close()

    // first publish: pure inserts
    val v1 = (1L to 50L).map(i => (i, i * 2.0, "feedA")).toDF("id", "px", "src")
    assert(sources.JdbcFeed.upsertWrite(v1, url, "master",
      keyCols = Seq("id"), batchSize = 16) == 50L)
    val r1 = spark.read.jdbc(url, "master", props)
    assert(r1.count() == 50 &&
      r1.agg(sum($"PX")).as[Double].collect()(0) == 2.0 * 1275)

    // second publish: 25 updates (new px, new src) + 10 inserts
    val v2 = ((26L to 60L)).map(i => (i, i * 3.0, "feedB")).toDF("id", "px", "src")
    sources.JdbcFeed.upsertWrite(v2, url, "master", keyCols = Seq("id"))
    val r2 = spark.read.jdbc(url, "master", props)
    assert(r2.count() == 60, "update path must not duplicate keys")
    assert(r2.filter($"SRC" === "feedB").count() == 35)
    assert(r2.filter($"ID" === 30L).select($"PX").as[Double].collect()(0) == 90.0)

    // replaying the SAME publish converges to the same state
    sources.JdbcFeed.upsertWrite(v2, url, "master", keyCols = Seq("id"))
    val r3 = spark.read.jdbc(url, "master", props)
    assert(r3.count() == 60 && r3.filter($"SRC" === "feedB").count() == 35)
  }

  test("upsert insert-candidate selection handles SUCCESS_NO_INFO batch counts") {
    // Oracle / MySQL-rewriteBatchedStatements return -2 for every row
    // of a batch: an unknown count must be RE-PROBED, not treated as
    // an update hit — otherwise new keys are silently dropped
    import org.apache.spark.sql.Row
    val rows = Seq(Row(1L), Row(2L), Row(3L), Row(4L))
    var probed = List.empty[Long]
    val probe: Row => Int = { r =>
      probed ::= r.getLong(0)
      if (r.getLong(0) % 2 == 0) 0 else 1 // even ids miss -> insert
    }
    // exact counts: only count==0 falls through, no probe at all
    assert(sources.JdbcFeed.insertCandidates(
      rows, Array(1, 0, 1, 1))(probe) == Seq(Row(2L)))
    assert(probed == Nil)
    // SUCCESS_NO_INFO everywhere: every row probed, misses inserted
    assert(sources.JdbcFeed.insertCandidates(
      rows, Array(-2, -2, -2, -2))(probe) == Seq(Row(2L), Row(4L)))
    assert(probed.toSet == Set(1L, 2L, 3L, 4L))
    // EXECUTE_FAILED (-3) is a FAILED update, not an unknown count:
    // converting it into a probe-then-insert would mask the failure
    probed = Nil
    val e = intercept[java.sql.SQLException] {
      sources.JdbcFeed.insertCandidates(rows, Array(1, -3, 1, 1))(probe)
    }
    assert(e.getMessage.contains("-3") && probed == Nil)
  }
}
