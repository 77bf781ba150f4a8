package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop micro-bench: times a NAMED SUBSET of SparkEntry queries
  * with the exact Bench methodology (same session confs, noop sink,
  * cold pass + best-of-N warm passes) so a single query's
  * optimization can be measured in seconds instead of re-running the
  * full 300-query board. Optionally dumps each query's
  * `.explain("formatted")` to a directory (the plans/rNN deliverable).
  *
  * Besides wall seconds it reports, per query (summed over the warm
  * pass's stages via a SparkListener): shuffle WRITE bytes + records
  * and executor CPU time. The shuffle volume of a fixed plan over
  * fixed data is DETERMINISTIC — on a host whose noise mode can
  * double a wall measurement (see Bench.scala's warm-pass comment),
  * byte/record deltas are the trustworthy before/after signal for
  * shuffle-removal work, with wall time as the secondary read.
  *
  * Usage: runMain graft.tools.QBench <sfDir> <q1,q2,...> [warmPasses]
  * Env:   QBENCH_PLAN_DIR=plans/r16  QBENCH_PLAN_SUFFIX=_before
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val passes = if (args.length > 2) args(2).toInt else 3
    val planDir = sys.env.get("QBENCH_PLAN_DIR")
    val planSuffix = sys.env.getOrElse("QBENCH_PLAN_SUFFIX", "")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // stage-metric accumulator: zeroed per timed region, summed across
    // every stage that COMPLETES inside it
    val shufBytes = new java.util.concurrent.atomic.AtomicLong
    val shufRecs = new java.util.concurrent.atomic.AtomicLong
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shufBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRecs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          cpuNs.addAndGet(m.executorCpuTime)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // executed-plan capture: operators that materialize eagerly
    // (checkpointed loops) return a bare RDD scan from explain(), so
    // the REAL plans are only observable at execution time via a
    // QueryExecutionListener (the PlanSpec pattern)
    val execPlans = new scala.collection.mutable.ArrayBuffer[String]
    var capture = false
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        def onSuccess(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            ns: Long): Unit =
          if (capture) execPlans.synchronized {
            execPlans += qe.executedPlan.toString }
        def onFailure(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = ()
      })
    spark.range(1000000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()
    planDir.foreach(d =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))
    // forced bench entries (Bench.scala's x_* diagnostics) that are not
    // SparkEntry queries but need the same per-query listener profile
    // during optimization work — kept in lockstep with Bench.scala
    val forcedQueries: Map[String,
        (SparkSession, String) => org.apache.spark.sql.DataFrame] = {
      import org.apache.spark.sql.functions._
      Map(
        "x_namelink_winnow" -> ((s: SparkSession, d: String) =>
          graft.operators.EditDistance.jwPairsWinnow(
            s.read.parquet(s"$d/part.parquet"), "p_partkey", "p_name")),
        "x_namelink_winnow_blocked" -> ((s: SparkSession, d: String) =>
          graft.operators.EditDistance.jwPairsWinnowBlocked(
            s.read.parquet(s"$d/part.parquet")
              .select(col("p_partkey"), col("p_name"), col("p_brand"),
                split(col("p_name"), " ").getItem(0).as("tok")),
            "p_partkey", "p_name", Seq("p_brand", "tok"))),
        "x_namematch_segment" -> ((s: SparkSession, d: String) =>
          graft.operators.EditDistance.pairs(
            s.read.parquet(s"$d/part.parquet"), "p_partkey", "p_name",
            "p_brand", maxDist = 3, segment = Some(true))))
    }
    val rows = names.map { name =>
      val fn = forcedQueries.getOrElse(name,
        graft.SparkEntry.queries.getOrElse(name,
          sys.error(s"unknown query $name")))
      planDir.foreach { d =>
        execPlans.synchronized(execPlans.clear())
        capture = true
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        df.write.format("noop").mode("overwrite").save()
        Thread.sleep(800) // listener bus settle
        capture = false
        val execs = execPlans.synchronized(execPlans.toList)
          .take(24) // iterative operators emit one plan per round
          .zipWithIndex
          .map { case (p, i) => s"==== executed plan ${i + 1} ====\n$p" }
          .mkString("\n")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$d/$name$planSuffix.txt"),
          plan + (if (execs.nonEmpty)
            "\n\n==== EXECUTED PLANS (QueryExecutionListener capture: " +
              "eagerly-materializing operators hide their real plans " +
              "behind the returned checkpoint scan) ====\n" + execs
          else ""))
      }
      def run(): (Double, Long, Long, Double) = {
        // drain listener events from the previous region before zeroing
        // (the bus is private[spark]; a short settle sleep suffices for
        // a dev-loop tool)
        Thread.sleep(400)
        shufBytes.set(0); shufRecs.set(0); cpuNs.set(0)
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(name)
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(400)
        (wall, shufBytes.get, shufRecs.get, cpuNs.get / 1e9)
      }
      val cold = run()
      val warm = (1 to passes).map(_ => run())
      val w = warm.minBy(_._1)
      (name, cold._1, w._1, warm.map(_._1).max - w._1, w._2, w._3, w._4)
    }
    rows.foreach { case (n, c, w, s, b, r, cpu) =>
      println(f"QBENCH $n%-34s cold=$c%7.3f warm_min=$w%7.3f " +
        f"spread=$s%6.3f shuf=${b / 1e6}%9.1f MB recs=$r%10d cpu=$cpu%7.1f s")
    }
    spark.stop()
  }
}
