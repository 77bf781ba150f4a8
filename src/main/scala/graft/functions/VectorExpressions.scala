package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression for random-hyperplane LSH signatures.
  *
  * Computes, for each of the `planes.length` hash tables, a b-bit
  * bucket id: bit j is the sign of plane(t)(j) · v. One primitive
  * double loop per row — the higher-order-function formulation
  * (zip_with + aggregate with a struct accumulator per bit) allocated
  * millions of boxed structs per corpus pass and dominated the LSH-ANN
  * wall time; this is the same arithmetic with zero allocation beyond
  * the output array.
  *
  * Accepts array<float> or array<double> input; dot products run in
  * f64. Components beyond the plane dimension are ignored, shorter
  * vectors use the available components (dimension is validated by the
  * caller, which derives it from the data — see Ann.lshTopK).
  */
case class LshSig(child: Expression, planes: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val planeArr: Array[Array[Array[Double]]] =
    planes.map(_.map(_.toArray).toArray).toArray

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (arr.isNullAt(i)) 0.0
             else if (isFloat) arr.getFloat(i).toDouble
             else arr.getDouble(i)
      i += 1
    }
    val out = new Array[Long](planeArr.length)
    var t = 0
    while (t < planeArr.length) {
      val tbl = planeArr(t)
      var bucket = 0L
      var b = 0
      while (b < tbl.length) {
        val plane = tbl(b)
        val d = math.min(n, plane.length)
        var dot = 0.0
        var j = 0
        while (j < d) { dot += v(j) * plane(j); j += 1 }
        if (dot > 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): LshSig = copy(child = c)
}

object VectorExpressions {
  /** array<long>: per-table random-hyperplane bucket ids of a vector. */
  def lshSig(vec: Column, planes: Seq[Seq[Seq[Double]]]): Column =
    GraftColumnBridge.column(LshSig(GraftColumnBridge.expression(vec), planes))
}
