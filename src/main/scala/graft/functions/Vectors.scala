package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float>` embedding columns.
  *
  * All math happens in double precision via codegen-friendly
  * higher-order functions (`zip_with` / `aggregate` / `transform`) —
  * no UDF serialization boundary, no driver-side loops, and the
  * accumulation order (left-to-right over the array) is deterministic,
  * which keeps results reproducible across partitionings and engines.
  */
object Vectors {

  /** Element-wise double cast: float embeddings accumulate error fast
    * in 64+ dim dot products; everything downstream is f64.
    */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity of two (non-zero) vectors, in double.
    * Delegates to the fused native expression — identical accumulation
    * order (hence identical result) to the HOF formulation
    * `dot(a,b)/(norm2(a)*norm2(b))`, at a fraction of the per-pair cost.
    */
  def cosine(a: Column, b: Column): Column = VectorExpressions.cosine(a, b)
}
