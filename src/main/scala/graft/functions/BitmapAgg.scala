package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact distinct-count over a BOUNDED non-negative id domain via a
  * dense bitmap — the OLAP-engine workhorse for "exact distinct users
  * per cell" when ids are dictionary-encoded (the security-master /
  * clickstream norm). A typed [[Aggregator]]: per-partition bitmaps OR
  * together in the merge phase, so the shuffle carries one bitmap per
  * group per partition (map-side combined) instead of one row per
  * (group, id) — at 100 TB that is the difference between a
  * count-distinct expand-shuffle and a few KB per group.
  *
  * The buffer grows lazily to the highest word touched (ceil(maxId/64)
  * longs). Ids must sit in [0, 2^26): beyond that, dictionary-encode
  * first, segment the domain, or switch to the HLL sketches (q20/q52)
  * — an unbounded-domain dense bitmap is a memory bomb, so the bound
  * is enforced, not assumed.
  */
object BitmapDistinct extends Aggregator[java.lang.Long, Array[Long], Long] {
  /** Domain bound: 2^26 ids = at most 8 MB of bitmap per group. */
  val MaxId: Long = 1L << 26

  override def zero: Array[Long] = Array.emptyLongArray

  /** NULL ids are skipped — same semantics as `count(DISTINCT id)`
    * (hence the boxed input type: a primitive-Long encoder would abort
    * the job on the first NULL row instead).
    */
  override def reduce(b: Array[Long], boxed: java.lang.Long): Array[Long] = {
    if (boxed == null) return b
    val id = boxed.longValue()
    require(id >= 0 && id < MaxId,
      s"BitmapDistinct id outside [0, $MaxId): $id — dictionary-encode or use HLL")
    val w = (id >>> 6).toInt
    val buf =
      if (w < b.length) b
      else java.util.Arrays.copyOf(b, math.max(w + 1, b.length * 2))
    buf(w) |= 1L << (id & 63)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < small.length) { big(i) |= small(i); i += 1 }
    big
  }

  override def finish(b: Array[Long]): Long = {
    var i = 0; var n = 0L
    while (i < b.length) { n += java.lang.Long.bitCount(b(i)); i += 1 }
    n
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong

  /** The UserDefinedFunction form (explicit boxed-input encoder so
    * NULLs reach [[reduce]] instead of failing deserialization).
    */
  def udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(BitmapDistinct, Encoders.LONG)

  /** Column form, usable in any groupBy().agg(...). */
  def distinctCount(ids: Column): Column = udf.apply(ids)
}
