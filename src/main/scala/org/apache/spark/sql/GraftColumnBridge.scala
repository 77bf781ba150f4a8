package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ↔ Catalyst Expression converters.
  *
  * Spark 4 moved `new Column(expr)` behind `classic.ExpressionUtils`;
  * extension libraries conventionally expose it from a shim in the
  * `org.apache.spark.sql` package (same pattern as public Spark
  * extension projects, e.g. the DatasetFactory shims).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
