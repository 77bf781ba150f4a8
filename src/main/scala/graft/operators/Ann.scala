package graft.operators

import graft.functions.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers, mirroring how a 100 TB corpus is actually served:
  *  - [[bruteForceTopK]]: exact cosine top-k with the (small) query set
  *    broadcast against the corpus — one pass over the data, no corpus
  *    shuffle, `TakeOrdered`-style window per query. The correctness
  *    baseline.
  *  - [[lshTopK]]: random-hyperplane LSH (Charikar) with L independent
  *    tables of b bits. Corpus and queries are bucketed row-locally
  *    (zero shuffle to compute buckets), candidates come from an
  *    equi-join on (table, bucket) — linear, skew-bounded — and only
  *    candidates pay the exact cosine rerank.
  */
object Ann {

  /** Deterministic ±1 hyperplanes: seeded so every executor and every
    * run derives the identical family (required for resumable pipelines
    * and for bucketing new data against an existing index).
    */
  private def hyperplanes(tables: Int, bits: Int, dim: Int,
                          seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bits, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Exact top-k cosine neighbors for each query vector. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_raw").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_raw", Vectors.cosine(col("q_vec"), col("c_vec")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_raw"), 6).as("cos_sim"), col("rnk"))
  }

  /** LSH-bucketed ANN: candidates from any of `tables` b-bit sign
    * buckets, exact cosine rerank, top-k per query.
    *
    * `dim = -1` (default) derives the dimension from the corpus with
    * one LIMIT-1 scan at plan time: a wrong hardcoded dim would make
    * `zip_with` null-pad every dot product, collapsing all vectors into
    * bucket 0 and degenerating the candidate join toward a cross
    * product — so the dimension is validated, never assumed.
    *
    * Bucket ids come from a native Catalyst expression
    * ([[graft.functions.LshSig]]) — one primitive loop per row. The
    * unrolled per-bit `when` formulation shipped a >1 MB task binary,
    * and the HOF rewrite allocated boxed structs per (table, bit,
    * component); both dominated q36's wall time.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              tables: Int = 8, bits: Int = 8, dim: Int = -1,
              seed: Long = 42L, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val d = if (dim > 0) dim
            else corpus.select(size(col(vecCol)).as("d")).first().getInt(0)
    require(d > 0, s"embedding dimension must be positive, got $d")
    val planes = hyperplanes(tables, bits, d, seed)
    val planesSeq: Seq[Seq[Seq[Double]]] = planes.map(_.map(_.toSeq).toSeq).toSeq
    def bucketsCol(vec: Column): Column =
      graft.functions.VectorExpressions.lshSig(vec, planesSeq)
    def withBuckets(df: DataFrame, id: String, vec: String) = df
      .select(col(idCol).as(id), col(vecCol).as(vec),
        posexplode(bucketsCol(col(vecCol))))
      .withColumnRenamed("pos", "table_idx")
      .withColumnRenamed("col", "bucket")
    val qb = withBuckets(queries, "query_id", "q_vec")
    val cb = withBuckets(corpus, "neighbor_id", "c_vec")
      .select(col("table_idx"), col("bucket"), col("neighbor_id"), col("c_vec"))
    val candidates = qb.join(cb, Seq("table_idx", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("q_vec"), col("neighbor_id"), col("c_vec"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_raw").desc, col("neighbor_id"))
    candidates
      .withColumn("cos_raw", Vectors.cosine(col("q_vec"), col("c_vec")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_raw"), 6).as("cos_sim"), col("rnk"))
  }
}
