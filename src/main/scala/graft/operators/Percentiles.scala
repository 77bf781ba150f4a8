package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The percentile plan choice, settled by measurement — closing the
  * "automate the sketch-vs-GK pick" question the bench has priced as
  * x_pctl_sketch vs x_pctl_approx since round 11.
  *
  * Two physical strategies compute the same (group → quantiles) frame:
  *
  *  - `native`: Spark's `percentile_approx` (Greenwald–Khanna summary,
  *    codegen'd ObjectHashAggregate, ε = 1/accuracy).
  *  - `sketch`: the graft KLL-style [[graft.functions.QuantileSketchAgg]]
  *    (k·(log₂(n/k)+2) doubles per group regardless of n, mergeable,
  *    deterministic rank bound under any merge order).
  *
  * Measured crossover (sf0.1 lineitem, 6M rows, local[32], warm): the
  * hypothesis was a cardinality crossover — few huge groups favoring
  * the sketch's lighter partials. It does not exist: native wins BOTH
  * shapes (3 groups: 0.52s vs 0.87s; 20k groups: 0.81s vs 0.96s).
  * GK's native per-row insert beats the typed-Aggregator update at
  * every batch shape, and at MATCHED accuracy the comparison only
  * widens (GK at 10⁴ holds ε = 1e-4; the k = 256 sketch's certified
  * bound at n = 6M is ~6e-2 relative rank — equalizing would need
  * k ≈ 16k and slow the sketch further). So `auto` is a measured
  * CONSTANT, not a stats job: batch plans always take native.
  *
  * The sketch stays first-class for what GK-in-SQL cannot do: its
  * state is STORABLE and MERGEABLE — per-partition/day sketches built
  * once and unioned later (the s-ledger streaming pattern), bounded
  * streaming aggregation state, and merge-order-independent certified
  * bounds. Callers in those regimes opt in with `sketch = Some(true)`;
  * both paths stay priced in the bench, and the agreement spec pins
  * both inside the sketch's closed-form rank-error bound.
  */
object Percentiles {

  /** Grouped approximate quantiles of `valueCol` at `probs`; output is
    * the group columns plus one array column `qs`. `sketch = None`
    * (auto) takes the native plan — see the measurement above;
    * `Some(true)` opts into the mergeable sketch tier. NULL metric
    * rows are dropped on both paths (SQL aggregate semantics).
    */
  def approxQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                      probs: Seq[Double], accuracy: Int = 10000,
                      sketch: Option[Boolean] = None): DataFrame = {
    val metric = col(valueCol).cast("double")
    val grouped = df.filter(metric.isNotNull)
      .groupBy(groupCols.map(col): _*)
    if (sketch.contains(true))
      grouped.agg(graft.functions.QuantileSketch
        .quantiles(metric, probs).as("qs"))
    else
      grouped.agg(percentile_approx(metric,
        array(probs.map(lit): _*), lit(accuracy)).as("qs"))
  }
}
