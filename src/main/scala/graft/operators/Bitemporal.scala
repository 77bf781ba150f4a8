package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bitemporal (valid-time × transaction-time) record keeping.
  *
  * [[Scd2]] tracks ONE time axis — when a fact was in effect. A
  * securities master needs a second one: when the system LEARNED each
  * value, so that "what did we believe about day V as of knowledge
  * date K" is answerable after late corrections arrive. Each input row
  * is a correction event: (keys, validTs = the instant the fact is
  * about, txTs = when it was recorded, values…).
  *
  * Both operators are one keyed window / filter — the q28/q29 shuffle
  * shape on (keys, validTs), which is the high-cardinality composite,
  * so partitions stay balanced at any corpus size.
  */
object Bitemporal {

  /** Closes each correction's transaction-time interval: adds `tx_to` =
    * the next correction's txTs for the same (keys, validTs), NULL for
    * the currently-believed record. `tie` breaks same-instant
    * corrections deterministically (the later `tie` wins, holding an
    * empty [t, t) interval loser that no knowledge time selects).
    */
  def intervals(df: DataFrame, keys: Seq[String], validTs: String,
                txTs: String, tie: String): DataFrame = {
    val w = Window.partitionBy((keys :+ validTs).map(col): _*)
      .orderBy(col(txTs), col(tie))
    df.withColumn("tx_to", lead(col(txTs), 1).over(w))
  }

  /** The snapshot believed current at knowledge time `k`: for every
    * (keys, validTs) with at least one correction recorded at-or-before
    * `k`, exactly the record whose transaction interval covers `k`.
    * Facts first recorded after `k` are absent — they were not known.
    */
  def asKnownAt(iv: DataFrame, txTs: String, k: Column): DataFrame =
    iv.filter(col(txTs) <= k && (col("tx_to").isNull || k < col("tx_to")))
}
