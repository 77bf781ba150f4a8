package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop plan inspector: prints the physical plan and the
  * exchange/nested-loop census for named queries, so a new query's
  * shuffle shape can be checked (and then pinned in PlanSpec) without
  * writing a throwaway spec first.
  *
  * Usage: runMain graft.tools.PlanProbe <sfDir> <q1,q2,...> [verbose]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val verbose = args.length > 2
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- names) {
      val p = graft.SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      println(s"==== $q exchanges=${p.split("Exchange").length - 1} " +
        s"nestedloop=${p.split("NestedLoop").length - 1} " +
        s"windowGroupLimit=${p.contains("WindowGroupLimit")}")
      if (verbose) println(p)
    }
    spark.stop()
  }
}
