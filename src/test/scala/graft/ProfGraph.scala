package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfGraph {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }
    val li = Tables.lineitem(spark, dir)
    val e = operators.Graph.coOrderEdges(li)
    t("edges count (uncached)") { e.count() }
    val cached = e.persist()
    t("edges materialize cache") { cached.count() }
    val deg = t("deg checkpoint") {
      cached.groupBy(col("src").as("part")).agg(count(lit(1)).as("deg"))
        .localCheckpoint(eager = true) }
    val wE = cached.join(broadcast(deg), col("src") === col("part"))
      .select(col("src"), col("dst"), col("deg")).persist()
    t("wEdges materialize") { wE.count() }
    var rank = deg.select(col("part"), lit(1.0 / 20000).as("pr"))
    for (i <- 1 to 5) {
      rank = t(s"iteration $i") {
        val contrib = wE.join(broadcast(rank.withColumnRenamed("part", "r_part")),
            col("src") === col("r_part"))
          .select(col("dst"), (col("pr") / col("deg")).as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("mass"))
        deg.select(col("part"))
          .join(broadcast(contrib), col("part") === col("dst"), "left")
          .select(col("part"), (lit(0.03) + lit(0.85) * coalesce(col("mass"), lit(0.0))).as("pr"))
          .localCheckpoint(eager = true)
      }
    }
    t("full q125 as shipped") {
      SparkEntry.queries("q125_pagerank")(spark, dir).write.mode("overwrite")
        .parquet("/tmp/prof_q125") }
    t("full q126 as shipped") {
      SparkEntry.queries("q126_bfs_hops")(spark, dir).write.mode("overwrite")
        .parquet("/tmp/prof_q126") }
    spark.stop()
  }
}

object ProfGraph2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
    // variant A: current join formulation
    t("A join+distinct") {
      val a = li.select(col("k"), col("p").as("src"))
      val b = li.select(col("k"), col("p").as("dst"))
      a.join(b, Seq("k")).filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst")).distinct().count()
    }
    // variant B: pinned repartition, exchange reused by both sides
    t("B reused-exchange join") {
      val part = li.repartition(32, col("k"))
      val a = part.select(col("k"), col("p").as("src"))
      val b = part.select(col("k"), col("p").as("dst"))
      a.join(b, Seq("k")).filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst")).distinct().count()
    }
    // variant C: row-local pair explosion from collected sets
    t("C collect_set + rowlocal pairs") {
      val sets = li.groupBy(col("k")).agg(collect_set(col("p")).as("ps"))
      sets.select(explode(expr(
        "flatten(transform(ps, x -> transform(ps, y -> struct(x as src, y as dst))))")).as("e"))
        .select(col("e.src"), col("e.dst"))
        .filter(col("src") =!= col("dst")).distinct().count()
    }
    spark.stop()
  }
}
