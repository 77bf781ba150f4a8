package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** 64-bit SimHash of a token array as a native Catalyst expression.
  *
  * Classic Charikar SimHash with term-frequency weighting: every token
  * occurrence votes ±1 on each of the 64 bit positions of its xxhash64;
  * the sign of the tally becomes the output bit. Documents with mostly
  * shared token distributions land within a few bits of each other, so
  * near-dup candidate generation is a cheap equality join on bit bands
  * (see graft.operators.Dedup.simHashPairs) instead of an O(n²) scan.
  *
  * Implemented as an Expression rather than a UDF so it runs on Catalyst
  * internal rows (UTF8String, no codec round-trip). The per-row work is
  * O(tokens × 64) bit ops, which dwarfs the non-codegen call overhead —
  * CodegenFallback costs nothing measurable here.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val tally = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (tally(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash {
  /** Column API: simhash64(array<string>) -> long. */
  def simhash64(tokens: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(SimHash64(
      org.apache.spark.sql.GraftColumnBridge.expression(tokens)))
}
