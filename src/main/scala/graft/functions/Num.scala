package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.round
import org.apache.spark.sql.types.DecimalType

/** Numeric display conventions shared by every oracle-backed query. */
object Num {
  /** Decimal-space rounding: cast to DECIMAL(28,12), round half-up,
    * back to double. Spark's plain `round` on doubles and DuckDB's
    * round the raw binary value differently at half boundaries (and
    * -0.0 hash-differs from 0.0); routing both engines through the
    * same decimal pins half-up everywhere. The oracle-side mirror is
    * `CAST(round(CAST(x AS DECIMAL(28,12)), d) AS DOUBLE)` — change
    * them TOGETHER or every derived-double oracle diverges.
    */
  def decRound(c: Column, scale: Int): Column =
    round(c.cast(DecimalType(28, 12)), scale).cast("double")
}
