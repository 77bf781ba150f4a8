package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant join helpers.
  *
  * AQE's skew-join handling splits oversized partitions at runtime, but
  * only for sort-merge joins and only per-shuffle-block; explicit
  * hot-key salting remains the portable pattern when a handful of keys
  * dominate (the "AOL user" / "null key" shape every 100 TB fact table
  * has somewhere).
  */
object Skew {

  /** Hot-key salted inner equi-join.
    *
    * A cheap map-side-combinable pre-aggregation finds the fact keys
    * with multiplicity above `hotThreshold`; only those are salted.
    * Hot fact rows get `saltSource mod salts`, hot dim rows are
    * replicated once per salt value, and everything else joins plainly
    * on salt 0 — the dimension pays replication only for the (tiny,
    * broadcast) hot set instead of ×salts across the board. The result
    * is identical to `fact.join(dim, factKey === dimKey)`.
    *
    * @param saltSource deterministic per-row expression spreading a hot
    *                   key's rows across reducers (e.g. a hash of a
    *                   fine-grained column)
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: String, dimKey: String,
                 saltSource: Column, salts: Int = 8,
                 hotThreshold: Long = 1000000L): DataFrame = {
    require(salts > 0, "salts must be positive")
    val hot = fact.groupBy(col(factKey)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold)
      .select(col(factKey).as("__hot_key"))
    val f = fact
      .join(broadcast(hot), col(factKey) === col("__hot_key"), "left_outer")
      // coalesce: a NULL saltSource on a hot row would null the join
      // key and silently DROP the row from the inner join — salt 0
      // keeps it (mildly unbalanced beats wrong)
      .withColumn("__salt", when(col("__hot_key").isNotNull,
          coalesce(pmod(saltSource, lit(salts)).cast("int"), lit(0)))
        .otherwise(lit(0)))
      .drop("__hot_key")
    val d = dim
      .join(broadcast(hot), col(dimKey) === col("__hot_key"), "left_outer")
      .withColumn("__salt", explode(when(col("__hot_key").isNotNull,
          typedlit((0 until salts).toArray))
        .otherwise(typedlit(Array(0)))))
      .drop("__hot_key")
    f.join(d, f(factKey) === d(dimKey) && f("__salt") === d("__salt"))
      .drop("__salt")
  }
}
