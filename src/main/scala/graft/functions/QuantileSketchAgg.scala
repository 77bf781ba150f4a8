package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{col, udaf}

/** Bounded-state mergeable quantile sketch: a deterministic KLL-style
  * level summary as a typed [[Aggregator]], completing the bounded
  * aggregator family (TopK / Misra–Gries / Bitmap / Gram) with the
  * percentile member — the quantiles-without-a-sort path at 100 TB.
  *
  * Structure: level l holds at most k values, each standing for 2^l
  * input rows. An overflowing level sorts its buffer and promotes the
  * EVEN-ranked half to level l+1 (deterministic selection — no RNG, so
  * a given reduce/merge order reproduces exactly; merge ORDER remains
  * Spark's choice, which is why the contract below is a rank-error
  * bound, not bit-equality — same certification style as the ANN
  * recall contracts). Merging concatenates levelwise then re-compacts:
  * associative, state ≤ k·(log₂(n/k)+2) doubles REGARDLESS of n,
  * and map-side combine means the shuffle carries one summary per
  * (group, partition) where percentile_approx's GK buffers or a full
  * sort would carry the population.
  *
  * Error contract: one compaction at level l displaces any rank by at
  * most 2^l; with ≤ ⌈n/(k·2^l)⌉ compactions per level the total rank
  * error is ≤ n·(log₂(n/k)+2)/k — [[QuantileSketchAgg.rankErrorBound]]
  * is that closed form and the spec certifies measured error against
  * it across partitionings and skews.
  *
  * Query semantics: [[finish]] returns, for each requested probability
  * p, the smallest summarized value whose cumulative weight reaches
  * p·n — the lower-quantile convention. NULLs must be filtered by the
  * caller (primitive Double input, same contract as TopKAgg).
  */
class QuantileSketchAgg(probs: Seq[Double], k: Int = 256)
    extends Aggregator[Double, Seq[(Int, Seq[Double])], Seq[Double]] {
  require(k >= 8 && k % 2 == 0, s"capacity must be even and >= 8, got $k")
  require(probs.nonEmpty && probs.forall(p => p > 0.0 && p <= 1.0),
    s"probabilities must be in (0, 1], got $probs")

  type Buf = Seq[(Int, Seq[Double])]

  override def zero: Buf = Seq.empty

  /** Promote overflowing levels upward until every level fits. */
  private def compact(levels: Buf): Buf = {
    var ls = levels.sortBy(_._1).toVector
    var l = 0
    while (l < ls.size) {
      val (lvl, items) = ls(l)
      if (items.size > k) {
        val sorted = items.sorted
        val promoted = sorted.indices.collect {
          case i if i % 2 == 0 => sorted(i)
        }
        ls = ls.updated(l, (lvl, Seq.empty[Double]))
        val nextIdx = ls.indexWhere(_._1 == lvl + 1)
        ls = if (nextIdx >= 0)
          ls.updated(nextIdx, (lvl + 1, ls(nextIdx)._2 ++ promoted))
        else (ls :+ (lvl + 1, promoted: Seq[Double])).sortBy(_._1)
      } else l += 1
    }
    ls.filter(_._2.nonEmpty)
  }

  override def reduce(b: Buf, x: Double): Buf = {
    // level 0 accumulates as a Vector — effectively O(1) append where
    // the default Seq's `:+` copied the whole level per row (the r12
    // perf nit: O(k) per input row). A freshly-deserialized level 0
    // (post-shuffle ArraySeq) converts once and stays a Vector. Levels
    // > 0 only grow in compact/merge, which bound themselves, so only
    // level 0 is size-checked per row.
    val idx = b.indexWhere(_._1 == 0)
    if (idx < 0) b :+ ((0, Vector(x): Seq[Double]))
    else {
      val v = (b(idx)._2 match {
        case v: Vector[Double @unchecked] => v
        case o => o.toVector
      }) :+ x
      val withX = b.updated(idx, (0, v: Seq[Double]))
      if (v.size > k) compact(withX) else withX
    }
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val byLevel = (a ++ b).groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (lvl, es) => (lvl, es.flatMap(_._2)) }
    if (byLevel.exists(_._2.size > k)) compact(byLevel) else byLevel
  }

  override def finish(b: Buf): Seq[Double] = {
    val weighted = b.flatMap { case (lvl, items) =>
      val w = 1L << lvl
      items.map(v => (v, w))
    }.sortBy(_._1)
    if (weighted.isEmpty) return probs.map(_ => Double.NaN)
    val total = weighted.map(_._2).sum
    probs.map { p =>
      val target = math.max(1L, math.ceil(p * total).toLong)
      var cum = 0L
      var ans = weighted.last._1
      var i = 0
      var found = false
      while (i < weighted.size && !found) {
        cum += weighted(i)._2
        if (cum >= target) { ans = weighted(i)._1; found = true }
        i += 1
      }
      ans
    }
  }

  override def bufferEncoder: Encoder[Buf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}

object QuantileSketch {
  /** Column form: sketch quantiles of `metric` at `probs`. */
  def quantiles(metric: Column, probs: Seq[Double], k: Int = 256): Column =
    udaf(new QuantileSketchAgg(probs, k),
      org.apache.spark.sql.Encoders.scalaDouble)
      .apply(metric.cast("double"))

  /** SQL-surface wrapper: boxed input so SQL NULLs are SKIPPED rather
    * than deserialized to 0.0 (the primitive-Double encoder's silent
    * coercion would drag sparse columns' quantiles toward zero). The
    * DSL Aggregator keeps its documented caller-filters-NULLs
    * primitive contract; this shell is what `graft_pctl_sketch` in
    * SQL registers against.
    */
  def nullSafe(probs: Seq[Double], k: Int = 256)
      : Aggregator[java.lang.Double, Seq[(Int, Seq[Double])], Seq[Double]] = {
    val inner = new QuantileSketchAgg(probs, k)
    new Aggregator[java.lang.Double, Seq[(Int, Seq[Double])], Seq[Double]] {
      override def zero: Seq[(Int, Seq[Double])] = inner.zero
      override def reduce(b: Seq[(Int, Seq[Double])], x: java.lang.Double)
          : Seq[(Int, Seq[Double])] =
        if (x == null) b else inner.reduce(b, x.doubleValue)
      override def merge(a: Seq[(Int, Seq[Double])],
                         b: Seq[(Int, Seq[Double])]): Seq[(Int, Seq[Double])] =
        inner.merge(a, b)
      override def finish(b: Seq[(Int, Seq[Double])]): Seq[Double] =
        inner.finish(b)
      override def bufferEncoder: Encoder[Seq[(Int, Seq[Double])]] =
        inner.bufferEncoder
      override def outputEncoder: Encoder[Seq[Double]] = inner.outputEncoder
    }
  }

  /** The deterministic worst-case RANK error of a k-capacity sketch
    * over n rows: n·(log₂(n/k)+2)/k — every compaction at level l
    * displaces a rank by ≤ 2^l and at most ⌈n/(k·2^l)⌉ happen there.
    */
  def rankErrorBound(n: Long, k: Int): Double =
    if (n <= k) 0.0
    else n.toDouble * (math.log(n.toDouble / k) / math.log(2.0) + 2.0) / k
}
