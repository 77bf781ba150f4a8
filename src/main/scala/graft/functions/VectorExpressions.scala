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

/** Cosine similarity of two vectors as a native expression: one fused
  * primitive loop (dot + both norms) in f64, identical accumulation
  * order to the HOF formulation in [[Vectors.cosine]] — bit-for-bit the
  * same result, without materializing the zip_with array or paying
  * interpreted per-element lambda dispatch three times per pair.
  */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val lFloat = isFloat(left)
  @transient private lazy val rFloat = isFloat(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (lFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    // tail components of the longer vector still count toward its norm
    var j = n
    while (j < a.numElements()) {
      val x = if (lFloat) a.getFloat(j).toDouble else a.getDouble(j); na += x * x; j += 1
    }
    j = n
    while (j < b.numElements()) {
      val y = if (rFloat) b.getFloat(j).toDouble else b.getDouble(j); nb += y * y; j += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** Positions of the `n` nearest centroids (by cosine, descending; ties
  * to the lower position) for a vector — the IVF coarse-quantizer
  * assignment as ONE row-local expression over the centroid matrix.
  * Replaces a broadcast-join + vector-keyed groupBy argmax: the corpus
  * is never shuffled to learn its cell.
  */
case class NearestCells(child: Expression, centroids: Seq[Seq[Double]], n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val cent: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val centNorm: Array[Double] =
    cent.map(c => math.sqrt(c.map(x => x * x).sum))

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val v = new Array[Double](m)
    var i = 0
    while (i < m) {
      v(i) = if (arr.isNullAt(i)) 0.0
             else if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val sims = new Array[Double](cent.length)
    var c = 0
    while (c < cent.length) {
      val p = cent(c)
      val d = math.min(m, p.length)
      var dot = 0.0; var j = 0
      while (j < d) { dot += v(j) * p(j); j += 1 }
      sims(c) = dot / centNorm(c) // query norm is constant across cells
      c += 1
    }
    val k = math.min(n, cent.length)
    val out = new Array[Long](k)
    val taken = new Array[Boolean](cent.length)
    var s = 0
    while (s < k) {
      var best = -1
      var c2 = 0
      while (c2 < cent.length) {
        if (!taken(c2) && (best < 0 || sims(c2) > sims(best))) best = c2
        c2 += 1
      }
      taken(best) = true
      out(s) = best.toLong
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): NearestCells = copy(child = c)
}

object VectorExpressions {
  /** array<long>: per-table random-hyperplane bucket ids of a vector. */
  def lshSig(vec: Column, planes: Seq[Seq[Seq[Double]]]): Column =
    GraftColumnBridge.column(LshSig(GraftColumnBridge.expression(vec), planes))

  /** double: cosine similarity, fused native loop. */
  def cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSim(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** array<long>: positions of the n nearest centroids for a vector. */
  def nearestCells(vec: Column, centroids: Seq[Seq[Double]], n: Int): Column =
    GraftColumnBridge.column(NearestCells(
      GraftColumnBridge.expression(vec), centroids, n))
}
