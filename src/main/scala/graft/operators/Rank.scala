package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global ranking: per-group row numbers (and group totals)
  * without ever putting a whole group in one task.
  *
  * A plain `row_number() OVER (PARTITION BY g ORDER BY k)` hash-
  * partitions on g — with a low-cardinality g (an event_type, an
  * exchange code) each partition is ONE task holding 1/|g| of the
  * table, which stalls at 100 TB no matter how many executors exist.
  * This operator runs the classic two-pass shape instead:
  *
  *   1. range-repartition on (g, k): rows land in P globally ordered
  *      slices, each slice a normal-sized task;
  *   2. count rows per (slice, g) — a P×|g|-row frame — and turn it
  *      into per-slice prefix offsets with a window over that TINY
  *      frame;
  *   3. rank locally within (slice, g) and add the broadcast offset.
  *
  * The per-(slice, g) window is keyed on P×|g| values, so parallelism
  * scales with P, not |g|. Output is identical to the single-window
  * form whenever (g, k) is a total order (callers pass a unique
  * tiebreaker — ties could otherwise land in either of two adjacent
  * slices and renumber within the tie run).
  */
object Rank {

  /** Adds `rankCol` (1-based global row number within each group, long)
    * and `totalCol` (group row count, long) to `df`. `order` columns
    * together with `group` must form a total order over the rows.
    *
    * ONE data-sized shuffle and ONE sort total: the counts branch
    * reads the range exchange directly (ReusedExchange, no sort), and
    * the ranked branch derives each row's position inside its slice
    * from `monotonically_increasing_id()` evaluated ABOVE the
    * in-partition sort (id = slice << 33 | row index in slice-sorted
    * order; the optimizer never reorders a nondeterministic projection
    * across the sort). The broadcast offsets frame carries, per
    * (slice, group): rows of EARLIER groups inside the slice (groups
    * are contiguous in the slice sort, so position − prior = local
    * rank) and rows of the group in earlier slices. No Window operator
    * and no per-row codec ever touches the data-sized side. Bound: ≤
    * 2^33 rows per slice — raise partition count long before that.
    */
  def groupRowNumber(df: DataFrame, group: Seq[String], order: Seq[String],
                     rankCol: String = "rn",
                     totalCol: String = "n_total"): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val composite = (group ++ order).map(col)
    // one range exchange with EXPLICIT partition count: both branches
    // read the same materialized stage, and the explicit count exempts
    // it from AQE coalescing — the two readers must agree on slice ids
    val ranged = df.repartitionByRange(p, composite: _*)
    val counts = ranged.withColumn("__slice", spark_partition_id())
      .groupBy(("__slice" +: group).map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
    // all three windows run over the P×|groups| counts frame
    val wOff = Window.partitionBy(group.map(col): _*).orderBy(col("__slice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(group.map(col): _*)
    val wPrior = Window.partitionBy(col("__slice"))
      .orderBy(group.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .withColumn(totalCol, sum(col("__cnt")).over(wTot))
      .withColumn("__prior", coalesce(sum(col("__cnt")).over(wPrior), lit(0L)))
      .drop("__cnt")
    val ranked = ranged.sortWithinPartitions(composite: _*)
      .withColumn("__slice", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
    ranked.join(broadcast(offsets), "__slice" +: group)
      .withColumn(rankCol,
        col("__mid") - shiftleft(col("__slice").cast("long"), 33) -
          col("__prior") + col("__off") + 1)
      .drop("__slice", "__mid", "__prior", "__off")
  }

  /** Adds `out` = the inclusive running sum of integer `valueCol`
    * within each group in (group, order) order, without a
    * low-cardinality single-task window — the q123 token-packing
    * shape, where `PARTITION BY source` would put one source's whole
    * corpus in one task. Same two-pass plan as [[groupRowNumber]]:
    * range-partition, per-(slice, group) partial sums → broadcast
    * prior-slice offsets, and the in-slice prefix from a sorted
    * streaming scan (running sums need per-row state, so this is the
    * one mapPartitions in the family — row-local, exact long
    * arithmetic, order-independent result). `valueCol` must be a
    * non-null integral column; (group, order) must totally order rows.
    */
  def groupRunningSum(df: DataFrame, group: Seq[String], order: Seq[String],
                      valueCol: String, out: String = "cum"): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val composite = (group ++ order).map(col)
    val ranged = df.repartitionByRange(p, composite: _*)
    val sums = ranged.withColumn("__slice", spark_partition_id())
      .groupBy(("__slice" +: group).map(col): _*)
      .agg(sum(col(valueCol)).as("__s"))
    val wOff = Window.partitionBy(group.map(col): _*).orderBy(col("__slice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sums
      .withColumn("__soff", coalesce(sum(col("__s")).over(wOff), lit(0L)))
      .drop("__s")
    val groupIdx = group.map(df.schema.fieldNames.indexOf(_))
    val valIdx = df.schema.fieldNames.indexOf(valueCol)
    val outSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+
        org.apache.spark.sql.types.StructField("__slice",
          org.apache.spark.sql.types.IntegerType, nullable = false) :+
        org.apache.spark.sql.types.StructField("__lcum",
          org.apache.spark.sql.types.LongType, nullable = false))
    val local = ranged.sortWithinPartitions(composite: _*)
      .mapPartitions { it =>
        val slice = org.apache.spark.TaskContext.getPartitionId()
        var curKey: Seq[Any] = null
        var acc = 0L
        it.map { row =>
          val key = groupIdx.map(row.get)
          if (key != curKey) { curKey = key; acc = 0L }
          acc += row.getAs[Number](valIdx).longValue
          org.apache.spark.sql.Row.fromSeq(row.toSeq :+ slice :+ acc)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
    local.join(broadcast(offsets), "__slice" +: group)
      .withColumn(out, col("__lcum") + col("__soff"))
      .drop("__slice", "__lcum", "__soff")
  }

  /** SQL-standard ntile bucket from a global rank and group total:
    * n mod k leading buckets of size ceil(n/k), the rest floor(n/k) —
    * exactly Spark's and DuckDB's ntile, as pure integer arithmetic,
    * so it composes with [[groupRowNumber]] into a scalable ntile.
    */
  def ntileFromRank(rank: Column, total: Column, k: Int): Column = {
    val q = ldiv(total, lit(k.toLong))
    val rem = total - q * k
    val big = q + 1L
    // guard the small-bucket divisor: when q = 0 (fewer rows than
    // buckets) every row takes the big-bucket branch, but Spark still
    // evaluates the other branch's expression under ANSI mode
    val qSafe = greatest(q, lit(1L))
    (when(rank <= big * rem, ldiv(rank - 1, big))
      .otherwise(rem + ldiv(rank - 1 - big * rem, qSafe)) + 1)
      .cast("int")
  }

  /** Exact long floor-division for non-negative operands: `/` on longs
    * promotes to double, whose quotient can misround next to 2^52 —
    * subtracting the remainder first keeps every step in exact integer
    * arithmetic.
    */
  private def ldiv(a: Column, b: Column): Column =
    ((a - a % b) / b).cast("long")

  /** percent_rank from a global rank over a TOTAL order (no ties):
    * (rank−1)/(n−1), with the SQL-standard 0.0 for single-row groups.
    * Division happens on identical integer-derived operands in any
    * engine — bit-exact, no rounding needed.
    */
  def percentRankFromRank(rank: Column, total: Column): Column =
    when(total > 1,
      (rank - 1).cast("double") / (total - 1).cast("double"))
      .otherwise(lit(0.0))
}
