package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-job recall certification for the sketch/hash operators whose
  * internals are engine-specific (MinHash bands, SimHash chunks, LSH
  * buckets, IVF cells): the emitted row is the CONTRACT — the exact
  * ground-truth count plus a recovered-fraction flag.
  *
  * The first formulation ran three jobs (truth.count, then a semi-join
  * count re-evaluating the expensive truth plan, plus the found plan)
  * — it doubled q32's bench cost in round 5. This one runs ONE job:
  * truth left-joins the found keys and a single aggregate produces
  * both the denominator and the hit count, so truth and found are each
  * evaluated exactly once.
  */
private[queries] object Certify {

  /** @param truth distinct ground-truth key rows (evaluated once)
    * @param found distinct reported key rows — MUST be unique on
    *              `keys` (every producer here ends in groupBy/row_number,
    *              so this holds by construction); duplicates would
    *              inflate the emitted denominator via the join
    * @param nCol  name for the emitted ground-truth count column
    */
  def recallContract(spark: SparkSession, truth: DataFrame, found: DataFrame,
                     keys: Seq[String], minRecall: Double,
                     nCol: String): DataFrame = {
    import spark.implicits._
    val f = found.select(keys.map(col): _*).withColumn("__hit", lit(1))
    val row = truth.select(keys.map(col): _*)
      .join(f, keys, "left_outer")
      .agg(count(lit(1)).as("n"),
        coalesce(sum($"__hit"), lit(0L)).as("hits"))
      .collect()(0)
    val n = row.getLong(0)
    val hits = row.getLong(1)
    Seq((n, n == 0 || hits.toDouble / n >= minRecall)).toDF(nCol, "recall_ok")
  }
}
