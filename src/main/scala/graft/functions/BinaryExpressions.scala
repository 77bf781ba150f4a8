package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Every `stride`-th byte of a binary payload — the downsampling
  * primitive behind [[graft.operators.Multimodal.resizePayload]].
  */
case class ByteStride(child: Expression, stride: Int)
    extends UnaryExpression with CodegenFallback {
  require(stride >= 1, "stride must be >= 1")

  override def dataType: DataType = BinaryType

  override def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[Array[Byte]]
    val out = new Array[Byte]((in.length + stride - 1) / stride)
    var i = 0
    while (i < out.length) { out(i) = in(i * stride); i += 1 }
    out
  }

  override protected def withNewChildInternal(c: Expression): ByteStride =
    copy(child = c)
}

object BinaryExpressions {
  /** binary: every stride-th byte of the payload. */
  def byteStride(payload: Column, stride: Int): Column =
    GraftColumnBridge.column(ByteStride(
      GraftColumnBridge.expression(payload), stride))
}
