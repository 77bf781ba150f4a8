package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD-type-2 dimension maintenance.
  *
  * [[graft.queries.TimeSeries.q28Scd2Intervals]] BUILDS the interval
  * table from history; this operator MAINTAINS it: apply a batch of new
  * records to an existing dimension, rebuilding validity intervals only
  * for the keys the delta touches. Untouched keys pass through without
  * being re-sorted or re-shuffled beyond the anti-join — at 100 TB the
  * nightly delta touches a sliver of the key space and this is the
  * difference between an incremental merge and a full rebuild.
  *
  * Invariant (spec + oracle-tested): applyDelta(build(H), D) ==
  * build(H ∪ D) — including deltas that interleave in event time with
  * history (late-arriving records reopen and re-split old intervals).
  */
object Scd2 {

  /** @param dim   existing intervals: keys ++ (ts, value..., rid, valid_to)
    * @param delta new records: same columns minus valid_to
    * @param keys  dimension key columns
    * @param ts    effective-from column name
    * @param rid   deterministic tie-break column (record id)
    */
  def applyDelta(dim: DataFrame, delta: DataFrame, keys: Seq[String],
                 ts: String, rid: String): DataFrame = {
    val touched = delta.select(keys.map(col): _*).distinct()
    val untouched = dim.join(touched, keys, "left_anti")
    val reopened = dim.join(touched, keys, "left_semi").drop("valid_to")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ts), col(rid))
    // H ∪ D is a SET union: a delta record already present in the dim
    // (an at-least-once redelivery, or a replay against an already-
    // published snapshot) must not appear twice — duplicated (keys,
    // ts, rid) rows would mint zero-length intervals. (keys, ts, rid)
    // identifies a record, and duplicates are ADJACENT in the rebuild
    // window's own (ts, rid) sort — so a lag-compare over the same
    // window spec dedupes exactly, reusing the one exchange+sort
    // instead of the extra (keys, ts, rid) shuffle dropDuplicates
    // would pay.
    val rebuilt = reopened.unionByName(delta)
      .withColumn("__pts", lag(col(ts), 1).over(w))
      .withColumn("__prid", lag(col(rid), 1).over(w))
      .filter(!(col("__pts") <=> col(ts) && col("__prid") <=> col(rid)))
      .drop("__pts", "__prid")
      .withColumn("valid_to", lead(col(ts), 1).over(w))
    untouched.unionByName(rebuilt.select(dim.columns.map(col).toIndexedSeq: _*))
  }
}
