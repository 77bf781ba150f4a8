package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: classify every key of two table versions as
  * ADDED / REMOVED / CHANGED / UNCHANGED — the audit an ETL pipeline
  * runs between yesterday's publish and today's before swapping
  * pointers (catches a feed that silently dropped a partition or
  * rewrote history).
  *
  * Scale design: ONE full-outer shuffle join on the key — both sides
  * hash-partition once, comparisons are row-local, and the downstream
  * per-class aggregate is map-side combined to four rows. Null-safe
  * equality (`<=>`) makes NULL→value transitions count as CHANGED
  * rather than vanishing in three-valued logic.
  */
object Reconcile {

  def snapshotDiff(a: DataFrame, b: DataFrame, keyCol: String,
                   valueCols: Seq[String]): DataFrame = {
    // the b-side is disambiguated by a b_ prefix and presence is
    // tracked in __a/__b marker columns — reject inputs that would
    // silently collide with either convention
    val reserved = (keyCol +: valueCols).filter(c =>
      c.startsWith("b_") || c.startsWith("__"))
    require(reserved.isEmpty,
      s"snapshotDiff: column names ${reserved.mkString(", ")} collide " +
        "with the b_/__ internal prefixes — rename before diffing")
    val aa = a.select((keyCol +: valueCols).map(col): _*)
      .withColumn("__a", lit(1))
    val bb = b.select((keyCol +: valueCols).map(c =>
        col(c).as(s"b_$c")): _*)
      .withColumnRenamed(s"b_$keyCol", keyCol)
      .withColumn("__b", lit(1))
    val changed = valueCols
      .map(c => !(col(c) <=> col(s"b_$c")))
      .reduce(_ || _)
    aa.join(bb, Seq(keyCol), "full_outer")
      .withColumn("diff_class",
        when(col("__a").isNull, "ADDED")
          .when(col("__b").isNull, "REMOVED")
          .when(changed, "CHANGED")
          .otherwise("UNCHANGED"))
      .select(col(keyCol), col("diff_class"))
  }
}
