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
  * Same-instant reference rows: when two reference rows share
  * (key, rightTs), the one with the greatest (rts, values…) struct wins
  * — deterministic on both engines via a tie key inside the sort the
  * window already pays for (DuckDB's ASOF JOIN picks arbitrarily
  * here). Prefer deduplicating to point-in-time-latest first (q29
  * shape) if the feed carries same-instant revisions with a meaningful
  * winner, and always when right values are non-orderable (maps).
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
    *                     run as the same single O(n) window pass —
    *                     forward just reverses the time sort.
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
    // Both directions use the SAME incremental unboundedPreceding frame
    // (O(n) per partition — one running-state update per row); forward
    // just reverses the time sort. Scanning timestamps downward, the
    // last reference seen at-or-after the current row IS the smallest
    // rts >= t. The naive currentRow→unboundedFollowing formulation
    // re-aggregates the partition suffix for every output row
    // (UnboundedFollowingWindowFunctionFrame, O(n²) per key) — never
    // use it for as-of. In both sorts the ref at an equal timestamp
    // orders before the query row (side 0 < 1), so a ref effective AT t
    // matches a query at t — the >= convention on both directions.
    // Third sort key __rv: when two reference rows share (key, ts), the
    // greatest (rts, values…) struct wins DETERMINISTICALLY instead of
    // partition-order-dependently — no extra shuffle, just a tie rule
    // inside the sort the window already pays for. (Struct ordering
    // requires orderable value types; deduplicate first if carrying
    // maps.) The query side's __rv is null and __side already separates
    // the sides, so the key only ever breaks ref-vs-ref ties.
    val w = Window.partitionBy(col(key))
      .orderBy(if (backward) col("__ts").asc else col("__ts").desc,
        col("__side").asc, col("__rv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = last(col("__rv"), ignoreNulls = true).over(w)
    // staleness: the matched ref's own timestamp rides in the struct, so
    // the tolerance cut is a row-local filter after the window pass.
    // Exact integer µs: a double-seconds cast has ~0.5 µs ulp at current
    // epochs, enough to flip a row sitting exactly on the bound.
    val gapUs =
      if (backward) unix_micros(col("__ts")) - unix_micros(matched.getField("__rts"))
      else unix_micros(matched.getField("__rts")) - unix_micros(col("__ts"))
    val withinTol = toleranceSec match {
      case Some(tol) => when(gapUs <= tol * 1000000L, matched)
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

  /** [[join]] through the CUSTOM physical operator
    * ([[graft.plans.AsOfJoinExec]] — logical node + strategy +
    * streaming merge exec) instead of the composed union+window plan.
    * Same signature, same semantics, spec-proven identical output
    * (AsOfPropertySpec differentials: both directions × tolerance ×
    * inner/outer, plus same-µs duplicate refs). Each side sorts in its
    * own exchange and the merge streams with O(1) state — no union
    * blow-up, no per-row struct packing, no window frame machinery.
    * Priced against the composed plan by the bench (x_asof_exec); the
    * composed plan stays the default entry point until the numbers
    * argue otherwise. Keys and timestamps must be non-null here (the
    * window plan would instead group null keys into one partition).
    */
  /** Inputs at or below this combined ESTIMATED size take the composed
    * union+window plan in [[autoJoin]]. The bench prices both plans
    * every round: at sf0.1 the custom exec is ~25% ahead on the same
    * shape but both are sub-second — inside one host-spread band, so
    * the cheaper-to-maintain composed plan keeps the small-input
    * default. Past this threshold the exec's advantages compound (each
    * side sorts in its OWN exchange — no union of mismatched schemas,
    * no per-row struct packing, O(1) merge state vs window frame
    * machinery), which is when the dispatch flips.
    */
  val ExecByteThreshold: Long = 256L * 1024 * 1024

  /** Cost-based as-of: picks [[join]] (composed union+window) or
    * [[execJoin]] (custom streaming-merge exec) from optimized-plan
    * statistics — the same driver-side, no-job plan choice Spark's
    * broadcast-vs-shuffle decision and Rank's native-vs-two-pass
    * guard make. Both paths are differentially spec-proven identical
    * (AsOfPropertySpec), so the dispatch is a pure physical decision —
    * with ONE contract caveat the caller must attest: the exec
    * requires NON-NULL keys and timestamps, and the two plans
    * genuinely differ on null keys (the window plan's partitionBy
    * groups null keys together and can match null to null; SQL equi
    * semantics — and the exec — never match null). `keysNonNull` is
    * therefore explicit, not defaulted: pass true only when the key
    * and ts columns are null-free (every tape in this engine), else
    * false pins the composed plan regardless of size.
    */
  def autoJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightVals: Seq[(String, String)],
               keysNonNull: Boolean,
               inner: Boolean = true,
               toleranceSec: Option[Long] = None,
               direction: String = "backward",
               execByteThreshold: Long = ExecByteThreshold): DataFrame = {
    val bytes =
      left.queryExecution.optimizedPlan.stats.sizeInBytes +
        right.queryExecution.optimizedPlan.stats.sizeInBytes
    if (keysNonNull && bytes > execByteThreshold)
      execJoin(left, right, key, leftTs, rightTs, rightVals, inner,
        toleranceSec, direction)
    else
      join(left, right, key, leftTs, rightTs, rightVals, inner,
        toleranceSec, direction)
  }

  def execJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightVals: Seq[(String, String)],
               inner: Boolean = true,
               toleranceSec: Option[Long] = None,
               direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val spark = left.sparkSession
    org.apache.spark.sql.GraftPlanBridge.ensureStrategy(spark,
      graft.plans.AsOfJoinStrategy)
    // fresh exprIds on the right via aliases — a self-as-of (trades vs
    // quotes derived from one table) must not present one attribute id
    // from both children
    val r = right.select(col(key).as("__rk") +: col(rightTs).as("__rt") +:
      rightVals.map { case (in, out) => col(in).as(out) }: _*)
    val lPlan = org.apache.spark.sql.GraftPlanBridge.analyzed(left)
    val rPlan = org.apache.spark.sql.GraftPlanBridge.analyzed(r)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not found"))
    val node = graft.plans.AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, key), attr(lPlan, leftTs),
      attr(rPlan, "__rk"), attr(rPlan, "__rt"),
      toleranceSec.map(_ * 1000000L), forward = direction == "forward",
      inner = inner)
    org.apache.spark.sql.GraftPlanBridge.ofRows(spark, node)
  }

  /** As-of join against a SMALL GLOBAL reference (no key): calendars,
    * published adjustment factors, index fixings — dims of at most a
    * few thousand rows matched by billions of query rows.
    *
    * The keyed union-window plan above has no key to spread on here:
    * it would funnel every query row through ONE window partition. The
    * scale-correct plan for a tiny global dim is the opposite shape —
    * interval-ize the reference with lead() (each row in effect from
    * its timestamp until the next one) and BROADCAST it; each query
    * row then finds its unique in-effect interval in a broadcast range
    * join. The big side never shuffles and never sorts: the plan is
    * embarrassingly parallel, cost |L|·|R| comparisons with |R| tiny
    * and in cache.
    *
    * `right` must have distinct `rightTs` values — per key when `key`
    * is set — (equal timestamps would make intervals overlap and
    * duplicate matches) — dedupe to point-in-time-latest (q29 shape)
    * first if the feed revises.
    *
    * `key`: optional equality key (e.g. currency, exchange). The dim
    * is intervalized PER KEY and the key equality rides in the same
    * broadcast range join. This is the right plan precisely when the
    * key is LOW-cardinality (a handful of currencies): the keyed
    * window as-of ([[join]]) would put each key's entire fact
    * partition in one task, while here the fact side still never
    * shuffles and never sorts.
    *
    * The tiny-dim contract is ENFORCED, not assumed: the dim's
    * estimated size is checked against [[BroadcastDimByteLimit]]
    * (same stats-derived plan choice as Rank / EditDistance /
    * Graph.broadcastState) and an oversized dim falls back to the
    * keyed union-window as-of — a perf degradation (low-cardinality
    * keys serialize per-key partitions), never a driver/executor OOM.
    * A caller that KNOWS the dim is model-sized (or wants the
    * fallback priced, as the bench does) can pin the choice with
    * `dimBroadcast`.
    */
  def broadcastJoin(left: DataFrame, right: DataFrame,
                    leftTs: String, rightTs: String,
                    rightVals: Seq[(String, String)],
                    inner: Boolean = true,
                    key: Option[String] = None,
                    dimBroadcast: Option[Boolean] = None): DataFrame = {
    if (!dimBroadcast.getOrElse(
        right.queryExecution.optimizedPlan.stats.sizeInBytes <=
          BroadcastDimByteLimit))
      return windowFallback(left, right, leftTs, rightTs, rightVals,
        inner, key)
    require(!left.columns.contains("__eff") && !left.columns.contains("__next"),
      "__eff/__next are reserved column names on the left side")
    require(key.isEmpty || !left.columns.contains("__k"),
      "__k is a reserved column name on the left side when key is set")
    rightVals.foreach { case (_, out) =>
      require(!left.columns.contains(out),
        s"output column '$out' already exists on the left side")
      require(out != "__eff" && out != "__next" && out != "__k",
        "__eff/__next/__k are reserved")
    }
    // Single-partition window over the dim is fine: the dim is tiny by
    // contract (that's what makes the broadcast legal in the first
    // place). With a key, the window partitions by it — same contract.
    val w =
      if (key.isDefined) Window.partitionBy(col("__k")).orderBy(col("__eff"))
      else Window.orderBy(col("__eff"))
    val iv = right.select(
        (key.map(k => col(k).as("__k")).toSeq ++
          (col(rightTs).as("__eff") +:
            rightVals.map { case (in, out) => col(in).as(out) })): _*)
      .withColumn("__next", lead(col("__eff"), 1).over(w))
    val range = col(leftTs) >= col("__eff") &&
      (col("__next").isNull || col(leftTs) < col("__next"))
    val cond = key.map(k => col(k) === col("__k") && range).getOrElse(range)
    left.join(broadcast(iv), cond, if (inner) "inner" else "left_outer")
      .select((left.columns.map(col) ++
        rightVals.map { case (_, o) => col(o) }).toIndexedSeq: _*)
  }

  /** Dims at or below this ESTIMATED size broadcast; above it,
    * [[broadcastJoin]] routes to [[windowFallback]]. 64 MB estimated
    * (the Rank / EditDistance convention) stays an order of magnitude
    * under Spark's 8 GB broadcast hard limit and the default driver
    * memory, with room for the estimate being off.
    */
  val BroadcastDimByteLimit: Long = 64L * 1024 * 1024

  /** The safe plan for a dim too big to broadcast: the keyed
    * union-window as-of ([[join]]). With no key the union spreads on a
    * constant — a single sorted partition, the honest cost of an
    * as-of against a keyless dim that outgrew broadcast (there is no
    * equality key to shuffle on; if this path is hot, pre-collapse the
    * dim onto a bounded time grid instead). Outputs are identical to
    * the broadcast plan under its distinct-(key, rightTs) contract —
    * spec-proven, and priced by the bench's forced x_fx_window entry.
    */
  def windowFallback(left: DataFrame, right: DataFrame,
                     leftTs: String, rightTs: String,
                     rightVals: Seq[(String, String)],
                     inner: Boolean = true,
                     key: Option[String] = None): DataFrame =
    key match {
      case Some(k) => join(left, right, k, leftTs, rightTs, rightVals, inner)
      case None =>
        require(!left.columns.contains("__gk"),
          "__gk is a reserved column name on the left side")
        join(left.withColumn("__gk", lit(1)),
            right.withColumn("__gk", lit(1)),
            "__gk", leftTs, rightTs, rightVals, inner)
          .drop("__gk")
    }
}
