package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-state heavy hitters: Misra–Gries frequency summarization as
  * a typed [[Aggregator]] with AT MOST k counters of state per group,
  * mergeable in the Agarwal et al. "Mergeable Summaries" sense — so
  * heavy-hitter detection runs as an ordinary aggregation with
  * map-side partials, and the shuffle carries ≤ k (item, count) pairs
  * per (group, partition) no matter how many distinct items the group
  * holds. The exact groupBy-count alternative shuffles one row per
  * DISTINCT item — at 100 TB with an unbounded token/URL/id domain,
  * that is the difference between a fixed-size sketch and a
  * vocabulary-sized exchange.
  *
  * Guarantee (standard MG): for every item, the reported count
  * undercounts the true count by at most n/(k+1) (n = group size), so
  * every item with true frequency > n/(k+1) is GUARANTEED present in
  * the summary. The spec asserts both properties; the summary is NOT
  * deterministic under re-partitioning for near-threshold items (the
  * usual sketch caveat, same as approx_count_distinct), which is why
  * this ships as a library aggregator + SQL function rather than an
  * oracle-gated query.
  *
  * finish() orders (count desc, item asc) so consumers see a stable
  * presentation of whatever summary was reached.
  */
class FreqItemsAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(k >= 1, s"heavy hitters needs k >= 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    // NULL inputs are skipped, matching SQL aggregate semantics (a
    // null key would otherwise NPE finish()'s String ordering)
    if (x == null) b
    else b.get(x) match {
      case Some(c) => b.updated(x, c + 1L)
      case None if b.size < k => b.updated(x, 1L)
      case None => // decrement-all, drop zeros (the MG eviction step)
        b.flatMap { case (i, c) => if (c > 1L) Some(i -> (c - 1L)) else None }
    }

  override def merge(a: Map[String, Long],
                     b: Map[String, Long]): Map[String, Long] = {
    // sum counters, then if over k, subtract the (k+1)-th largest
    // count from every counter and keep the positives — the mergeable-
    // summaries construction that preserves the n/(k+1) error bound
    val summed = b.foldLeft(a) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (i, c) =>
        if (c > cut) Some(i -> (c - cut)) else None
      }
    }
  }

  override def finish(b: Map[String, Long]): Seq[(String, Long)] =
    b.toSeq.sortBy { case (i, c) => (-c, i) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}

object FreqItems {
  /** `freqItems(item, k)` — aggregate Column producing the group's
    * Misra–Gries summary as `array<struct<item, count>>`, count-desc.
    */
  def freqItems(item: Column, k: Int): Column =
    udaf(new FreqItemsAgg(k), Encoders.STRING).apply(item.cast("string"))
}
