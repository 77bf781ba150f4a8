package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

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

/** Per-payload byte statistics in ONE row-local pass — the binary
  * analog of [[TextExpressions.charProfile]]: [Shannon entropy in
  * bits/byte over the 256-symbol byte alphabet, printable-ASCII byte
  * ratio (0x20–0x7E)]. NULL for an empty payload (no distribution to
  * measure — the caller's length filter owns that edge). A fixed
  * 256-slot histogram, no per-byte explode: the corpus×len row blowup
  * is exactly what the native expression kills at 100 TB.
  */
case class ByteProfile(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[Array[Byte]]
    val n = in.length
    if (n == 0) return null
    val counts = new Array[Int](256)
    var printable = 0
    var i = 0
    while (i < n) {
      val b = in(i) & 0xFF
      counts(b) += 1
      if (b >= 0x20 && b <= 0x7E) printable += 1
      i += 1
    }
    var ent = 0.0
    val ln2 = math.log(2.0)
    var s = 0
    while (s < 256) {
      if (counts(s) > 0) {
        val p = counts(s).toDouble / n
        ent -= p * (math.log(p) / ln2)
      }
      s += 1
    }
    new GenericArrayData(Array(ent, printable.toDouble / n))
  }

  override protected def withNewChildInternal(c: Expression): ByteProfile =
    copy(child = c)
}

object BinaryExpressions {
  /** binary: every stride-th byte of the payload. */
  def byteStride(payload: Column, stride: Int): Column =
    GraftColumnBridge.column(ByteStride(
      GraftColumnBridge.expression(payload), stride))

  /** array<double>: [entropy bits/byte, printable-ASCII byte ratio]. */
  def byteProfile(payload: Column): Column =
    GraftColumnBridge.column(ByteProfile(
      GraftColumnBridge.expression(payload)))
}
