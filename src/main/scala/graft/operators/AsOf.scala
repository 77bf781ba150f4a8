package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join.
  *
  * For each left row, attaches the right row with the greatest right
  * timestamp <= the left timestamp, per key — the securities-master
  * primitive for "price as of trade time" / "latest reference record
  * in effect".
  *
  * Spark-first plan: instead of a range join (which Catalyst would
  * execute as a broadcast-nested-loop or an exploding theta join), the
  * two sides are unioned with a side tag and resolved in one window
  * pass:
  *
  *   union → hash-shuffle on key → in-partition sort by (ts, side) →
  *   last(value, ignoreNulls) over rows-unbounded-preceding
  *
  * One shuffle + one sort, linear in |L|+|R|; scales like any keyed
  * window (partition count grows with the cluster, per-key data stays
  * co-located). At equal timestamps the reference row sorts first
  * (side 0 < side 1), so a reference effective AT t matches a query at
  * t — the `>=` convention, same as DuckDB's ASOF JOIN.
  *
  * Precondition: (key, rightTs) should be unique on the reference side
  * — when two reference rows share the same instant, which one wins is
  * partition-order dependent (the same caveat DuckDB's ASOF JOIN
  * carries). Deduplicate to point-in-time-latest first (q29 shape) if
  * the feed can contain same-instant revisions.
  */
object AsOf {

  /** @param left         query side (all its columns are kept)
    * @param right        reference side
    * @param key          equi-key column name present on both sides
    * @param leftTs       event-time column on `left`
    * @param rightTs      event-time column on `right`
    * @param rightVals    (rightColumn, outputName) values carried to the left
    * @param inner        when true, drops left rows with no reference in effect
    * @param toleranceSec max staleness: a reference older than this many
    *                     seconds before the query row counts as NO match
    *                     (the securities-master "quote too stale" rule).
    *                     None = unbounded lookback.
    * @param direction    "backward" (default): greatest rightTs <= leftTs —
    *                     price in effect AT the query time. "forward":
    *                     smallest rightTs >= leftTs — next observation
    *                     after the query time (fill-forward's dual, e.g.
    *                     "first quote after the order"). Both treat an
    *                     equal-timestamp reference as a match, and both
    *                     run as the same single window pass with the
    *                     frame (and the equal-ts tie order) mirrored.
    */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           rightVals: Seq[(String, String)],
           inner: Boolean = true,
           toleranceSec: Option[Long] = None,
           direction: String = "backward"): DataFrame = {
    require(rightVals.forall(_._2 != "__rts"), "__rts is reserved")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val backward = direction == "backward"
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    // All right values ride in ONE struct: the struct itself is non-null
    // for every reference row (even when every field is NULL), so
    // last(..., ignoreNulls) resolves to the matched row's values — a
    // NULL field in the most-recent reference row stays NULL instead of
    // falling back to an older row, and match existence (struct
    // non-null), not value non-nullness, drives inner semantics. Same
    // row-match behavior as DuckDB ASOF JOIN for nullable right columns.
    val r = right.select(col(key), col(rightTs).as("__ts"), lit(0).as("__side"),
      struct(col(rightTs).as("__rts") +:
        rightVals.map { case (in, out) => col(in).as(out) }: _*).as("__rv"))
    // Backward: ref sorts BEFORE the query at equal ts (side 0 < 1) so a
    // ref effective AT t is inside the query's preceding frame. Forward
    // mirrors both the frame and the tie order (query first) so an
    // equal-ts ref lands inside the following frame — the >= convention
    // on both directions.
    val w =
      if (backward) Window.partitionBy(col(key))
        .orderBy(col("__ts").asc, col("__side").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else Window.partitionBy(col(key))
        .orderBy(col("__ts").asc, col("__side").desc)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched =
      if (backward) last(col("__rv"), ignoreNulls = true).over(w)
      else first(col("__rv"), ignoreNulls = true).over(w)
    // staleness: the matched ref's own timestamp rides in the struct, so
    // the tolerance cut is a row-local filter after the window pass
    val gapSec =
      if (backward) col("__ts").cast("double") - matched.getField("__rts").cast("double")
      else matched.getField("__rts").cast("double") - col("__ts").cast("double")
    val withinTol = toleranceSec match {
      case Some(tol) => when(gapSec <= tol.toDouble, matched)
      case None => matched
    }
    val filled = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__match", withinTol)
    val out = filled
      .filter(col("__side") === 1)
    val kept = if (inner) out.filter(col("__match").isNotNull) else out
    kept.select((left.columns.map(col) ++
      rightVals.map { case (_, o) => col("__match").getField(o).as(o) }).toIndexedSeq: _*)
  }
}
